"""Package pandera_forge_spark as a --py-files zip.

Usage: python scripts/make_pyfiles_zip.py [/tmp/pfs.zip]
"""

from __future__ import annotations

import sys
import zipfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def build(out: str) -> str:
    pkg = REPO / "pandera_forge_spark"
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for py in sorted(pkg.rglob("*.py")):
            z.write(py, py.relative_to(REPO))
    return out


if __name__ == "__main__":
    dest = sys.argv[1] if len(sys.argv) > 1 else "/tmp/pfs.zip"
    print(build(dest))
