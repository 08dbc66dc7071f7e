"""Session bootstrap: Databricks runtime detection, env/profile
config resolution, Spark Connect remote sessions, tuned local fallback.

Mirrors the reference's connector surface
(reference: databricks/connector.py:13-95 — env-var defaults :33-38,
runtime detection :224-226, remote-session config :64-82; CLI profile
parsing :247-274) re-expressed for modern Spark: remote sessions use
the PUBLIC Spark Connect protocol (``sc://`` URLs — what Databricks
Connect v2 itself speaks) instead of the legacy
``spark.databricks.service.*`` configs, and the local fallback ships
the engine's preferred AQE/shuffle settings. Config resolution and URL
building are pure functions (unit-testable with no cluster); only
``get_spark_session`` touches a real builder.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from pathlib import Path
from typing import Mapping, Optional


@dataclass
class SessionConfig:
    """Resolved connection settings (reference: connector.py:13-38)."""

    host: Optional[str] = None
    token: Optional[str] = None
    cluster_id: Optional[str] = None
    catalog: Optional[str] = None
    schema: Optional[str] = None

    @property
    def can_connect_remote(self) -> bool:
        return bool(self.host and self.token)


def is_databricks_runtime(env: Optional[Mapping[str, str]] = None) -> bool:
    """True when already running inside a Databricks runtime — use the
    ambient session, never build a remote one
    (reference: connector.py:224-226)."""
    return "DATABRICKS_RUNTIME_VERSION" in (os.environ if env is None else env)


def read_cli_profile(
    profile: str = "DEFAULT", path: Optional[str] = None
) -> dict[str, str]:
    """Parse one profile from ``~/.databrickscfg`` (the Databricks CLI
    ini format; reference: connector.py:247-274 — same line-based
    parser, same missing-file → empty-dict behavior)."""
    config_path = Path(path) if path else Path.home() / ".databrickscfg"
    config: dict[str, str] = {}
    if not config_path.exists():
        return config
    current = None
    for line in config_path.read_text().splitlines():
        line = line.strip()
        if line.startswith("[") and line.endswith("]"):
            current = line[1:-1]
        elif current == profile and "=" in line:
            key, value = line.split("=", 1)
            config[key.strip()] = value.strip()
    return config


def resolve_config(
    host: Optional[str] = None,
    token: Optional[str] = None,
    cluster_id: Optional[str] = None,
    catalog: Optional[str] = None,
    schema: Optional[str] = None,
    profile: Optional[str] = None,
    env: Optional[Mapping[str, str]] = None,
    profile_path: Optional[str] = None,
) -> SessionConfig:
    """Resolution order per field: explicit argument → CLI profile
    (when ``profile`` given) → environment variable → default.
    Environment names match the reference exactly
    (reference: connector.py:33-38): DATABRICKS_HOST / _TOKEN /
    _CLUSTER_ID / _CATALOG (default ``hive_metastore``) / _SCHEMA
    (default ``default``)."""
    e = os.environ if env is None else env
    prof = read_cli_profile(profile, profile_path) if profile else {}
    return SessionConfig(
        host=host or prof.get("host") or e.get("DATABRICKS_HOST"),
        token=token or prof.get("token") or e.get("DATABRICKS_TOKEN"),
        cluster_id=cluster_id
        or prof.get("cluster_id")
        or e.get("DATABRICKS_CLUSTER_ID"),
        catalog=catalog or e.get("DATABRICKS_CATALOG", "hive_metastore"),
        schema=schema or e.get("DATABRICKS_SCHEMA", "default"),
    )


def spark_connect_url(cfg: SessionConfig) -> str:
    """Spark Connect remote URL for a Databricks workspace:
    ``sc://<host>:443/;token=<pat>;x-databricks-cluster-id=<id>``.
    This is the public Spark Connect connection-string format; the
    scheme/port/params are what ``databricks-connect`` v2 constructs
    from the same settings the reference passed as legacy
    ``spark.databricks.service.*`` configs
    (reference: connector.py:68-76)."""
    if not cfg.can_connect_remote:
        raise ValueError("host and token are required for a remote session")
    host = cfg.host.replace("https://", "").replace("http://", "").rstrip("/")
    url = f"sc://{host}:443/;token={cfg.token}"
    if cfg.cluster_id:
        url += f";x-databricks-cluster-id={cfg.cluster_id}"
    return url


LOCAL_DEFAULTS = {
    # the engine's preferred execution settings (same rationale as
    # bench.build_spark, minus bench-only JVM tuning): AQE replans
    # skewed joins at runtime; shuffle parallelism follows cores
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
}


def get_spark_session(
    app_name: str = "pandera_forge_spark",
    config: Optional[SessionConfig] = None,
    local_cores: str = "*",
    shuffle_partitions: Optional[int] = None,
):
    """Session entry point (reference: connector.py:43-95):

    1. inside a Databricks runtime → the ambient session
       (``getOrCreate`` attaches; never builds remote-to-self);
    2. resolved host+token → Spark Connect remote session;
    3. otherwise → ``local[local_cores]`` with the engine's defaults.

    Catalog/schema defaults are applied with USE statements when the
    session supports them (reference: connector.py:85-88)."""
    from pyspark.sql import SparkSession

    cfg = config or resolve_config()
    if is_databricks_runtime():
        spark = SparkSession.builder.getOrCreate()
    elif cfg.can_connect_remote:
        spark = (
            SparkSession.builder.appName(app_name)
            .remote(spark_connect_url(cfg))
            .getOrCreate()
        )
    else:
        builder = SparkSession.builder.appName(app_name).master(
            f"local[{local_cores}]"
        )
        for k, v in LOCAL_DEFAULTS.items():
            builder = builder.config(k, v)
        if shuffle_partitions is not None:
            builder = builder.config(
                "spark.sql.shuffle.partitions", str(shuffle_partitions)
            )
        spark = builder.getOrCreate()

    # gate on the RESOLVED settings, not on how they arrived: the
    # env-var path (resolve_config default) must apply catalog/schema
    # exactly like an explicit config argument does
    catalog_ok = True
    if cfg.catalog:
        try:
            spark.sql(f"USE CATALOG {cfg.catalog}")
        except Exception:  # noqa: BLE001 — local sessions have no catalogs
            catalog_ok = False
    # apply the schema only when the catalog context it belongs to is in
    # effect — a USE SCHEMA after a failed USE CATALOG would land the
    # schema in whatever catalog happened to be current (half-applied
    # context), which is worse than applying neither
    if cfg.schema and catalog_ok:
        try:
            spark.sql(f"USE SCHEMA {cfg.schema}")
        except Exception:  # noqa: BLE001
            pass
    return spark
