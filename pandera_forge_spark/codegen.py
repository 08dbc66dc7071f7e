"""Optional Pandera-source renderer — output parity with the reference.

The engine's real artifact is the TableSchema IR (schema.py); this
module renders it to the same Pandera ``DataFrameModel`` source text the
reference produces (reference: code_generator.py:14-123,
core/base_generator.py:143-167, constants.py:5-20) so a reference user
gets byte-compatible model files. Includes the reference's
syntax-validation step (exec the code, check the class exists —
reference: validator.py:15-41).
"""

from __future__ import annotations

import math
from typing import Optional

from pandera_forge_spark.schema import ColumnSpec, TableSchema

# Same import preamble the reference emits (constants.py:5-20) so
# generated files work with both modern and legacy pandera layouts.
PANDERA_IMPORTS = """
try:
    from pandera import DataFrameModel, Field
except ImportError:
    from pandera.pandas import DataFrameModel, Field
try:
    from pandera.typing import Timestamp
except ImportError:
    try:
        from pandera.pandas import Timestamp
    except ImportError:
        # Fallback: Timestamp might be in pandera directly
        from pandera import Timestamp
from pandera.typing.pandas import Series, Int64, Int32, Int16, Int8, Float64, Float32, Float16, String, Bool, DateTime, Category, Object
from typing import Optional
"""


def _fmt_isin_value(v) -> Optional[str]:
    """None/NaN skipped; strings double-quoted; numerics/bools bare;
    anything else str()'d and single-quoted
    (reference: code_generator.py:59-75)."""
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return None
    if isinstance(v, str):
        return f'"{v}"'
    if isinstance(v, (bool, int, float)):
        return str(v)
    return f"'{str(v)}'"


def render_comment(spec: ColumnSpec) -> str:
    """The reference's statistics field comment, byte-exact
    (reference: code_generator.py:94-109 ``generate_comment``):
    ``  # N distinct values, examples: ["a", "b"]`` when both examples
    and a distinct count exist, ``  # examples: [...]`` with examples
    only, ``""`` otherwise; at most 5 examples, strings double-quoted,
    everything else ``str()``'d bare (None/NaN included — the
    reference does NOT filter them here, unlike the isin list). Note
    the reference defines this but never wires it into its generate
    flow (no call site outside its tests) — mirrored here: emission is
    opt-in via ``render_class(..., stats_comments=True)``."""
    examples = spec.examples or []
    if not examples:
        return ""
    examples_str = ", ".join(
        f'"{ex}"' if isinstance(ex, str) else str(ex) for ex in examples[:5]
    )
    if spec.distinct_count is not None:
        return f"  # {spec.distinct_count} distinct values, examples: [{examples_str}]"
    return f"  # examples: [{examples_str}]"


def render_field(spec: ColumnSpec, stats_comment: bool = False) -> str:
    """One ``\\tname: Series[Type] = Field(...)`` line, trailing
    ``# pattern:`` comment when detected
    (reference: code_generator.py:39-91, base_generator.py:163-165);
    ``stats_comment=True`` appends the reference's
    ``generate_comment`` output as well (see ``render_comment``)."""
    params: list[str] = []
    if spec.ge is not None and spec.le is not None:
        params.append(f"ge={spec.ge}")
        params.append(f"le={spec.le}")
    if spec.unique:
        params.append("unique=True")
    if spec.nullable:
        params.append("nullable=True")
    if spec.isin is not None:
        vals = [s for s in (_fmt_isin_value(v) for v in spec.isin) if s is not None]
        if vals:
            params.append(f"isin=[{', '.join(vals)}]")

    params_str = ", ".join(params)
    if not spec.name_was_valid:
        if params_str:
            params_str += ", "
        # numeric original names render unquoted (code_generator.py:84-87)
        try:
            num = int(spec.name)
            params_str += f"alias={num}"
        except (TypeError, ValueError):
            params_str += f'alias="{spec.name}"'

    line = f"\t{spec.sanitized_name}: Series[{spec.pandera_type}] = Field({params_str})"
    if stats_comment:
        line += render_comment(spec)
    sc = spec.string_constraints
    if sc is not None and sc.pattern_name:
        line += f"  # pattern: {sc.pattern_name}"
    return line


def render_class(schema: TableSchema, stats_comments: bool = False) -> str:
    """Class body; empty schema renders ``pass``
    (reference: code_generator.py:117-123)."""
    fields = [
        render_field(c, stats_comment=stats_comments)
        for c in schema.columns
        if c.pandera_type
    ]
    out = f"class {schema.name}(DataFrameModel):\n"
    out += "\n".join(fields) if fields else "\tpass"
    return out


def render_model(schema: TableSchema, stats_comments: bool = False) -> str:
    """Full model file: the byte-exact import preamble, the reference's
    two blank lines, the class (reference: pandas_generator.py:64-66
    ``generate_imports() + "\\n\\n\\n" + class_code``)."""
    return PANDERA_IMPORTS + "\n\n\n" + render_class(schema, stats_comments)


def validate_model_code(code: str, class_name: str) -> tuple[bool, Optional[str]]:
    """Syntax-level validation: compile + exec in a scratch namespace and
    confirm the class exists (reference: validator.py:15-41). Pandera is
    not installed in this sandbox, so the import preamble is stubbed out
    during the exec — what's being validated is OUR generated code."""
    ns: dict = {}
    stub = (
        "class DataFrameModel: pass\n"
        "def Field(*a, **k): return None\n"
        "class _T:\n"
        "    def __getitem__(self, item): return object\n"
        "Series = _T()\n"
        + "\n".join(
            f"{t} = object"
            for t in (
                "Int64 Int32 Int16 Int8 Float64 Float32 Float16 "
                "String Bool DateTime Category Object Timestamp Optional"
            ).split()
        )
        + "\n"
    )
    body = code.split(PANDERA_IMPORTS)[-1]
    try:
        exec(stub + body, ns)  # noqa: S102 — deliberate, mirrors reference
    except SyntaxError as e:
        return False, f"Syntax error in generated code: {e}"
    except Exception as e:  # pragma: no cover
        return False, f"Error executing generated code: {e}"
    if class_name not in ns:
        return False, f"Class {class_name} not found in generated code"
    return True, None
