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


def test_spark_submit_dedup_job(tmp_path):
    """Third deployment shape: the curation job (exact + near dedup +
    stratified sample) submitted from outside the repo with imports
    only from --py-files."""
    import json

    pfs_zip = tmp_path / "pfs.zip"
    subprocess.run(
        [sys.executable, str(REPO / "scripts" / "make_pyfiles_zip.py"), str(pfs_zip)],
        check=True, capture_output=True,
    )
    out = tmp_path / "curated"
    cmd = [
        "spark-submit",
        "--master", "local[2]",
        "--conf", "spark.ui.enabled=false",
        "--conf", "spark.sql.shuffle.partitions=4",
        "--py-files", str(pfs_zip),
        str(REPO / "scripts" / "run_dedup_job.py"),
        "--fixture", "300",
        "--out", str(out),
        "--threshold", "0.6",
        "--sample-per-stratum", "20",
    ]
    run = subprocess.run(
        cmd, capture_output=True, text=True, timeout=300, cwd=str(tmp_path)
    )
    assert run.returncode == 0, run.stderr[-2000:]
    report = json.loads(
        [l for l in run.stdout.splitlines() if l.startswith("{")][-1]
    )
    # fixture: ids 10k..10k+9 share a body per k; exact dedup keeps the
    # min of each identical group, near dedup collapses the ' tail'
    # mutants into the same cluster — far fewer than 300 survive
    assert report["docs_in"] == 300
    assert report["corpus_out"] < 100
    assert report["dropped"] == 300 - report["corpus_out"]
    assert report["clustered_ids"] > 0
    assert report["sample"] is not None and report["sample"] <= 60


def test_spark_submit_stream_dedup_job(tmp_path):
    """Fourth deployment shape: the streaming near-dedup job in
    catch-up (availableNow) mode, submitted from outside the repo with
    imports only from --py-files. Three fixture epochs with planted
    cross-epoch near-dups: epoch 0 initializes the index, epochs 1-2
    probe-then-append; a second catch-up run resumes from the
    checkpoint and finds nothing new (no double-reported matches)."""
    import json

    pfs_zip = tmp_path / "pfs.zip"
    subprocess.run(
        [sys.executable, str(REPO / "scripts" / "make_pyfiles_zip.py"), str(pfs_zip)],
        check=True, capture_output=True,
    )

    def submit(extra):
        cmd = [
            "spark-submit",
            "--master", "local[2]",
            "--conf", "spark.ui.enabled=false",
            "--conf", "spark.sql.shuffle.partitions=4",
            "--py-files", str(pfs_zip),
            str(REPO / "scripts" / "run_stream_dedup_job.py"),
            "--input", str(tmp_path / "arrivals"),
            "--index", str(tmp_path / "band_index"),
            "--matches", str(tmp_path / "matches"),
            "--checkpoint", str(tmp_path / "ckpt"),
            *extra,
        ]
        return subprocess.run(
            cmd, capture_output=True, text=True, timeout=420, cwd=str(tmp_path)
        )

    first = submit(["--fixture", "90", "--threshold", "0.6", "--full-report"])
    assert first.returncode == 0, first.stderr[-2000:]
    report = json.loads(
        [l for l in first.stdout.splitlines() if l.startswith("{")][-1]
    )
    # wave1 docs match wave0 (30 pairs); wave2 match wave0+wave1 (60)
    assert report["new_match_epochs"] == 2
    assert report["new_matches"] == 90
    assert report["matches_total"] == 90
    assert report["docs_indexed"] == 90

    # resume with no new files: the checkpoint replays nothing — zero
    # NEW matches (nothing double-reported), history and index unchanged
    second = submit(["--threshold", "0.6", "--full-report"])
    assert second.returncode == 0, second.stderr[-2000:]
    report2 = json.loads(
        [l for l in second.stdout.splitlines() if l.startswith("{")][-1]
    )
    assert report2["new_match_epochs"] == 0 and report2["new_matches"] == 0
    assert report2["matches_total"] == 90 and report2["docs_indexed"] == 90


def test_spark_submit_incremental_job(tmp_path):
    """Fourth deployment shape: the nightly incremental re-validation
    job — full run, changelog, then a run that re-validates ONLY the
    moved partitions with verdicts carried for the rest."""
    import json

    pfs_zip = tmp_path / "pfs.zip"
    subprocess.run(
        [sys.executable, str(REPO / "scripts" / "make_pyfiles_zip.py"), str(pfs_zip)],
        check=True, capture_output=True,
    )

    def submit(extra):
        cmd = [
            "spark-submit",
            "--master", "local[2]",
            "--conf", "spark.ui.enabled=false",
            "--conf", "spark.sql.shuffle.partitions=4",
            "--py-files", str(pfs_zip),
            str(REPO / "scripts" / "run_incremental_job.py"),
            *extra,
        ]
        r = subprocess.run(
            cmd, capture_output=True, text=True, timeout=300, cwd=str(tmp_path)
        )
        assert r.returncode == 0, r.stderr[-2000:]
        return json.loads(r.stdout.strip().splitlines()[-1])

    v0, v1 = tmp_path / "v0", tmp_path / "v1"
    submit(["--fixture", "800", "--snapshot", str(v0)])
    submit(["--mutate-from", str(v0), "--snapshot", str(v1)])

    common = ["--partition-col", "day", "--cols", "id,cat,val_micro",
              "--schema", str(tmp_path / "contract.json")]
    day0 = submit([
        "--snapshot", str(v0), "--checksums", str(tmp_path / "cs0"),
        "--audit", str(tmp_path / "a0"), *common,
    ])
    assert len(day0["revalidated"]) == 8 and day0["carried"] == []
    assert day0["violations"] == {}

    day1 = submit([
        "--snapshot", str(v1), "--checksums", str(tmp_path / "cs1"),
        "--audit", str(tmp_path / "a1"), *common,
        "--prev-checksums", str(tmp_path / "cs0"),
        "--prev-audit", str(tmp_path / "a0"),
    ])
    assert day1["revalidated"] == ["d2", "d8"]
    assert len(day1["carried"]) == 6 and day1["removed"] == ["d5"]
    # the planted NULL cats violate the day-0 contract, inside d2 only
    assert set(day1["violations"]) == {"d2"} and day1["violations"]["d2"] > 0
