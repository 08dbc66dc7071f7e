"""Versioned parquet storage with time travel — Iceberg-in-miniature.

The reference reads old table versions through Spark options
(``databricks/connector.py:196-212``: ``versionAsOf`` /
``timestampAsOf``); ``read_table`` (sources/readers.py) plumbs the
equivalent ``snapshot-id`` / ``as-of-timestamp`` options, but no jar in
this sandbox can EXECUTE them. This module gives the engine a storage
layer of its own that executes the same semantics end-to-end:

- every ``commit`` writes its data files under a fresh
  ``data/commit-<n>/`` directory (append-only — nothing is rewritten,
  so old snapshots stay readable forever until ``expire``);
- a JSON snapshot manifest ``_versions/v<n>.json`` lists the FULL file
  set of that version (parent files + the new commit's for append; the
  new commit's only for overwrite), plus a wall-clock timestamp and the
  operation;
- readers resolve a version (or the newest manifest whose timestamp is
  <= ``as_of``, Delta's ``timestampAsOf`` rule) and hand Spark the
  explicit file list — no directory listing on the read path.

Scale notes (the design IS Iceberg's, minus the catalog):
- The manifest is O(files) driver-side metadata, the same asymptotic
  class as Iceberg's avro manifest lists; reads plan from the manifest,
  so S3 LIST storms and eventually-consistent listings never happen.
- Commit atomicity: data files land first, the manifest LAST, and
  readers only believe manifests — a writer killed mid-commit leaves
  orphan data files (cleaned by ``expire``), never a torn snapshot.
  Version numbers are claimed by the manifest write itself; two racing
  writers colliding on v<n> fail loudly on the second write rather
  than silently dropping a snapshot (a real multi-writer deployment
  binds to Iceberg, whose catalog arbitrates the race atomically).
- Everything goes through DriverFS (Hadoop FileSystem), so the root
  may be ``s3a://`` / ``hdfs://`` / local alike.
"""

from __future__ import annotations

import json
import time
from typing import Optional

from pyspark.sql import DataFrame, SparkSession


class VersionedParquet:
    """A table root with snapshot manifests: ``commit`` appends or
    overwrites and returns the new version number; ``read`` time-travels
    by version number or timestamp."""

    def __init__(self, spark: SparkSession, root: str):
        from pandera_forge_spark.sources.fs import DriverFS

        self.spark = spark
        self.root = root.rstrip("/")
        self.fs = DriverFS(spark)

    # ------------------------------------------------------------ manifests

    def _manifest_dir(self) -> str:
        return f"{self.root}/_versions"

    def versions(self) -> list[dict]:
        """All snapshot manifests, oldest first. O(versions) metadata
        reads, no data touched."""
        mdir = self._manifest_dir()
        if not self.fs.exists(mdir):
            return []
        names = sorted(
            n for n in self.fs.listdir(mdir)
            if n.startswith("v") and n.endswith(".json")
        )
        return [json.loads(self.fs.read_bytes(f"{mdir}/{n}")) for n in names]

    def _resolve(
        self, version: Optional[int], as_of: Optional[float]
    ) -> dict:
        if version is not None and as_of is not None:
            raise ValueError("pass version OR as_of, not both")
        vs = self.versions()
        if not vs:
            raise FileNotFoundError(f"no snapshots at {self.root}")
        if version is not None:
            for m in vs:
                if m["version"] == int(version):
                    return m
            raise ValueError(
                f"version {version} not found (have "
                f"{[m['version'] for m in vs]})"
            )
        if as_of is not None:
            eligible = [m for m in vs if m["timestamp"] <= float(as_of)]
            if not eligible:
                raise ValueError(
                    f"no snapshot at or before timestamp {as_of} "
                    f"(earliest is {vs[0]['timestamp']})"
                )
            return eligible[-1]
        return vs[-1]

    # ------------------------------------------------------------- commits

    def commit(
        self, df: DataFrame, mode: str = "append", operation: Optional[str] = None
    ) -> int:
        """Write ``df`` as a new snapshot. ``append`` unions the parent
        snapshot's files with the new commit's; ``overwrite`` starts the
        file set fresh. ``operation`` overrides the label recorded in
        the manifest (``compact`` uses it); file-set semantics follow
        ``mode`` alone. Returns the new version number."""
        if mode not in ("append", "overwrite"):
            raise ValueError("mode must be append or overwrite")
        vs = self.versions()
        n = (vs[-1]["version"] + 1) if vs else 1
        # probe a free dir: a TORN prior attempt (data written, manifest
        # not) leaves commit-<n> orphaned; writing the retry beside it
        # (-r1, -r2…) keeps recovery unblocked — the orphan stays
        # invisible (manifests list explicit files) until expire() sweeps
        commit_dir = f"{self.root}/data/commit-{n:06d}"
        retry = 0
        while self.fs.exists(commit_dir):
            retry += 1
            commit_dir = f"{self.root}/data/commit-{n:06d}-r{retry}"
        df.write.mode("error").parquet(commit_dir)
        new_files = sorted(
            f"{commit_dir}/{name}"
            for name in self.fs.listdir(commit_dir)
            if name.endswith(".parquet")
        )
        files = new_files if (mode == "overwrite" or not vs) else (
            vs[-1]["files"] + new_files
        )
        manifest = {
            "version": n,
            "timestamp": time.time(),
            "operation": operation or mode,
            "files": files,
            # snapshot schema rides in the manifest so an empty
            # snapshot (or a schema audit) never needs a data file
            "schema": df.schema.json(),
        }
        mpath = f"{self._manifest_dir()}/v{n:09d}.json"
        self.fs.mkdirs(self._manifest_dir())
        if self.fs.exists(mpath):  # concurrent writer claimed this version
            raise FileExistsError(
                f"snapshot {n} already committed at {self.root}; retry"
            )
        # write-then-rename: a writer killed mid-write leaves only a
        # .tmp (invisible to versions(), which filters on .json), never
        # a torn manifest that would brick every later read and commit
        tmp = f"{mpath}.tmp.{commit_dir.rsplit('-', 1)[-1]}"
        self.fs.write_bytes(
            tmp, json.dumps(manifest, sort_keys=True).encode()
        )
        if not self.fs.rename(tmp, mpath):
            self.fs.delete(tmp)
            raise FileExistsError(
                f"snapshot {n} already committed at {self.root}; retry"
            )
        return n

    # --------------------------------------------------------------- reads

    def read(
        self,
        version: Optional[int] = None,
        as_of: Optional[float] = None,
    ) -> DataFrame:
        """Snapshot read. No arguments: latest. ``version=k``:
        ``versionAsOf`` semantics. ``as_of=<epoch secs>``: the newest
        snapshot committed at or before that instant (``timestampAsOf``).
        The plan scans exactly the manifest's file list."""
        m = self._resolve(version, as_of)
        if not m["files"]:
            from pyspark.sql import types as T

            schema = T.StructType.fromJson(json.loads(m["schema"]))
            return self.spark.createDataFrame([], schema)
        return self.spark.read.parquet(*m["files"])

    # --------------------------------------------------------- compaction

    def compact(self, target_files: Optional[int] = None) -> int:
        """Rewrite the LATEST snapshot's file set into a fresh compacted
        commit and publish it as a new version — Iceberg's
        ``rewrite_data_files`` in miniature. An append-heavy table
        accumulates one small commit dir per ingest (the incremental
        near-dedup index and the nightly re-validation runner both
        write this shape); after a few hundred commits every read
        plans hundreds of tiny files. Compaction is the maintenance
        verb that fixes it WITHOUT breaking time travel: the rewrite is
        just another snapshot (operation ``compact``, written through
        the same claim-by-manifest race protocol), so every older
        version stays readable until ``expire`` retires it — and
        running ``expire(keep_last=1)`` right after is the
        storage-reclaim idiom.

        ``target_files=None`` lets Spark's planner pick the output
        split (files ~ ``maxPartitionBytes``-sized input splits);
        pass an explicit count to coalesce further (``coalesce``, a
        NARROW repack — no shuffle; the rows are merely re-bin-packed
        into fewer writers). Returns the new version number; a no-op
        on an empty table returns the current version unchanged.

        Equality contract (pytest-asserted): the compacted snapshot
        reads back row-identical to the snapshot it rewrote."""
        vs = self.versions()
        if not vs:
            raise ValueError(f"compact: no snapshots at {self.root}")
        latest = vs[-1]
        if not latest["files"]:
            return latest["version"]
        if target_files is not None and int(target_files) < 1:
            raise ValueError(
                f"compact: target_files must be >= 1, got {target_files}"
            )
        df = self.spark.read.parquet(*latest["files"])
        if target_files is not None:
            df = df.coalesce(int(target_files))
        return self.commit(df, mode="overwrite", operation="compact")

    # ------------------------------------------------------------- expiry

    def expire(self, keep_last: int = 1) -> list[str]:
        """Drop all but the newest ``keep_last`` snapshot manifests and
        delete data files no surviving snapshot references (orphans from
        killed commits included). Returns the deleted paths. The
        retention walk is O(files) driver metadata, like Iceberg's
        expire_snapshots."""
        if keep_last < 1:
            raise ValueError("keep_last must be >= 1")
        vs = self.versions()
        keep, drop = vs[-keep_last:], vs[:-keep_last]
        live = {f for m in keep for f in m["files"]}
        deleted: list[str] = []
        data_root = f"{self.root}/data"
        if self.fs.exists(data_root):
            for cdir in self.fs.listdir(data_root):
                cpath = f"{data_root}/{cdir}"
                for name in self.fs.listdir(cpath):
                    fpath = f"{cpath}/{name}"
                    if name.endswith(".parquet") and fpath not in live:
                        self.fs.delete(fpath)
                        deleted.append(fpath)
        for m in drop:
            mpath = f"{self._manifest_dir()}/v{m['version']:09d}.json"
            self.fs.delete(mpath)
            deleted.append(mpath)
        return deleted


def export_with_manifest(
    df: DataFrame,
    path: str,
    checksum_cols: Optional[list] = None,
) -> dict:
    """Export-integrity write: the frame lands as parquet AND an
    ``_integrity.json`` manifest records its row count, schema, and the
    order-insensitive content checksum (``sketches.table_checksum`` —
    XOR/sum lanes, partitioning-independent) computed from the SAME
    DataFrame. A downstream consumer — another cluster, another engine,
    another team — calls :func:`verify_export` and learns whether the
    bytes they can read reproduce the content that was written: lost
    part files, a torn copy, a rogue extra file, or a silently-
    truncated transfer all flip the checksum or the count. This is the
    hand-off contract a 100-TB export needs and a _SUCCESS marker does
    not provide (_SUCCESS says the JOB finished, not that YOUR copy of
    the files is whole).

    ``checksum_cols`` defaults to every exact-renderable column
    (table_checksum's type fence refuses floats/timestamps; pass an
    explicit exact projection to include quantized forms). The write
    itself is a plain ``df.write.parquet`` — one extra aggregate scan
    pays for the checksum, said out loud. Returns the manifest dict."""
    from pandera_forge_spark.sketches import table_checksum

    spark = df.sparkSession
    fs_df = df if checksum_cols is None else df.select(*checksum_cols)
    if checksum_cols is None:
        exact = [
            c
            for c, t in fs_df.dtypes
            if not (
                t in ("float", "double")
                or t.startswith(("timestamp", "decimal"))
                or t in ("binary",)
                or "<" in t
            )
        ]
        if not exact:
            raise ValueError(
                "export_with_manifest: no exact-renderable columns to "
                "checksum — pass checksum_cols with an exact projection"
            )
        fs_df = fs_df.select(*exact)
    row = table_checksum(fs_df).collect()[0]
    df.write.mode("error").parquet(path)
    manifest = {
        "n_rows": int(row["n_rows"]),
        "xor_lo": int(row["xor_lo"]),
        "xor_hi": int(row["xor_hi"]),
        "sum_mod": int(row["sum_mod"]),
        "checksum_cols": list(fs_df.columns),
        "schema": df.schema.json(),
    }
    from pandera_forge_spark.sources.fs import DriverFS

    DriverFS(spark).write_bytes(
        f"{path.rstrip('/')}/_integrity.json",
        json.dumps(manifest, sort_keys=True).encode(),
    )
    return manifest


def verify_export(spark: SparkSession, path: str) -> dict:
    """Recompute the export's content checksum from the files actually
    on disk and compare against its ``_integrity.json``. Returns
    ``{"ok": bool, "expected": {...}, "actual": {...}}`` — ``ok`` iff
    row count and all three checksum lanes match. One aggregate scan
    of the export; no sort, no data movement."""
    from pandera_forge_spark.sketches import table_checksum
    from pandera_forge_spark.sources.fs import DriverFS

    fs = DriverFS(spark)
    mpath = f"{path.rstrip('/')}/_integrity.json"
    if not fs.exists(mpath):
        raise FileNotFoundError(
            f"verify_export: no _integrity.json under {path}"
        )
    expected = json.loads(fs.read_bytes(mpath))
    df = spark.read.parquet(path)
    row = table_checksum(df.select(*expected["checksum_cols"])).collect()[0]
    actual = {
        "n_rows": int(row["n_rows"]),
        "xor_lo": int(row["xor_lo"]),
        "xor_hi": int(row["xor_hi"]),
        "sum_mod": int(row["sum_mod"]),
    }
    ok = all(actual[k] == expected[k] for k in actual)
    return {"ok": ok, "expected": expected, "actual": actual}
