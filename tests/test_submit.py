"""End-to-end spark-submit --py-files deployment (north rule: "deploys
via spark-submit --py-files on multi-executor clusters"): package the
engine as a zip, submit the validation job from OUTSIDE the repo so
imports can only come from --py-files, then resume and verify no
bucket is recomputed."""

import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def _submit(pfs_zip, tmp_path, audit, extra):
    cmd = [
        "spark-submit",
        "--master", "local[2]",
        "--conf", "spark.ui.enabled=false",
        "--conf", "spark.sql.shuffle.partitions=4",
        "--py-files", str(pfs_zip),
        str(REPO / "scripts" / "run_validation_job.py"),
        "--fixture", "400",
        "--audit", str(audit),
        *extra,
    ]
    return subprocess.run(
        cmd, capture_output=True, text=True, timeout=300, cwd=str(tmp_path)
    )


def test_spark_submit_pyfiles_and_resume(tmp_path):
    pfs_zip = tmp_path / "pfs.zip"
    subprocess.run(
        [sys.executable, str(REPO / "scripts" / "make_pyfiles_zip.py"), str(pfs_zip)],
        check=True, capture_output=True,
    )
    audit = tmp_path / "audit"

    first = _submit(pfs_zip, tmp_path, audit, [])
    assert first.returncode == 0, first.stderr[-2000:]
    assert "audit verdict rows: 8" in first.stdout

    # resume: all 8 buckets complete -> nothing recomputed, rows stay 8
    second = _submit(pfs_zip, tmp_path, audit, ["--resume"])
    assert second.returncode == 0, second.stderr[-2000:]
    combined = second.stdout + second.stderr
    assert "resume: skipping 8 completed buckets" in combined
    assert "audit verdict rows: 8" in second.stdout
