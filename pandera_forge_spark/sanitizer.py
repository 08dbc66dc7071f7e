"""Column / class name sanitization.

Behavioral parity with the reference's NameSanitizer
(reference: name_sanitizer.py:16-64; expected outputs locked by
reference tests/test_name_sanitizer.py:15-81). Pure driver-side string
functions — these operate on column *names*, never on data.
"""

from __future__ import annotations

import keyword
import re
from typing import Union


def _force_identifier(out: str) -> str:
    """Last-resort guard: regex ``\\w`` admits a few Unicode characters
    (e.g. superscript digits like '¹') that are NOT valid in Python
    identifiers (XID_Continue); found by property testing. Replace any
    character the identifier grammar rejects."""
    if out.isidentifier():
        return out
    return "".join(
        ch if ("x" + ch).isidentifier() else "_" for ch in out
    )


def sanitize_column_name(name: Union[str, int, float]) -> tuple[str, bool]:
    """Make ``name`` a valid Python identifier.

    Returns ``(sanitized, was_valid)``; ``was_valid`` is False whenever
    any rewrite was needed (including non-string input), so callers know
    to emit an ``alias=`` back-mapping.

    Rules (reference: name_sanitizer.py:16-48):
      - non-string names are str()'d
      - runs of whitespace → "_", then runs of non-word chars → "_"
      - digit-leading or python-keyword names get a "col_" prefix
      - empty result → "col_unnamed"
    """
    was_valid = True
    if not isinstance(name, str):
        was_valid = False
        name = str(name)

    out = re.sub(r"\s+", "_", name)
    out = re.sub(r"\W+", "_", out)
    out = _force_identifier(out)
    if out != name:
        was_valid = False

    if out and (out[0].isdigit() or keyword.iskeyword(out)):
        out = "col_" + out
        was_valid = False

    if not out:
        out = "col_unnamed"
        was_valid = False

    return out, was_valid


def sanitize_class_name(name: str) -> str:
    """Make ``name`` a valid Python class identifier.

    Rules (reference: name_sanitizer.py:51-64): each non-word char → "_"
    (single char, not runs), "Model" prefix when digit-leading,
    "DataFrameModel" when empty.
    """
    out = _force_identifier(re.sub(r"\W", "_", name))
    if out and out[0].isdigit():
        out = "Model" + out
    if not out:
        out = "DataFrameModel"
    return out
