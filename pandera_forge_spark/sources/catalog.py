"""Bulk schema generation over a catalog + model-file sink.

Parity with the reference's Databricks bulk path (SURVEY.md §2.1
S8/S9): enumerate tables, infer a schema per table (optionally from a
seeded sample), render Pandera model code, write one ``<table>_model.py``
per table plus an ``__init__`` aggregator.

Reference: databricks/generator.py:146-201 (generate_for_catalog),
:203-250 (save_models_to_directory); connector.py:159-194 (sampled
read). Differences by design: sampling is SEEDED (the reference's
unseeded sample is nondeterministic), failures are collected per table
instead of aborting the loop, and the inference itself is the
distributed single-pass profiler rather than per-column jobs.

The driver-side loop over tables is the right shape here — tables are
independent units of work, each already fully parallel inside Spark;
at warehouse scale you fan the table list out across job submissions,
not within one.
"""

from __future__ import annotations

import re
from pathlib import Path
from typing import Optional

from pyspark.sql import SparkSession

from pandera_forge_spark.codegen import render_model
from pandera_forge_spark.inference import infer_schema
from pandera_forge_spark.schema import TableSchema
from pandera_forge_spark.sources.readers import list_tables, read_table


def infer_for_catalog(
    spark: SparkSession,
    catalog: Optional[str] = None,
    schema: Optional[str] = None,
    sample_fraction: Optional[float] = 0.1,
    detect_patterns: bool = True,
    table_filter: Optional[str] = None,
) -> tuple[dict[str, TableSchema], dict[str, str]]:
    """Infer a TableSchema for every table in the catalog/schema.

    Returns (schemas, errors) — a failed table records its error and
    the loop continues (the reference logs-and-continues likewise,
    databricks/generator.py:189-195). ``sample_fraction`` defaults to
    the reference's 0.1 catalog-scan default
    (databricks/generator.py:154); pass None to profile full tables.
    """
    schemas: dict[str, TableSchema] = {}
    errors: dict[str, str] = {}
    names = list_tables(spark, catalog, schema)
    if table_filter:
        rx = re.compile(table_filter)
        names = [n for n in names if rx.search(n)]
    for name in names:
        try:
            df = read_table(spark, name, catalog, schema, sample_fraction)
            schemas[name] = infer_schema(df, name, detect_patterns=detect_patterns)
        except Exception as e:  # noqa: BLE001 — per-table isolation is the contract
            errors[name] = f"{type(e).__name__}: {e}"
    return schemas, errors


def render_models_for_catalog(
    schemas: dict[str, TableSchema],
) -> dict[str, str]:
    """TableSchema → Pandera DataFrameModel source, per table."""
    return {name: render_model(s) for name, s in schemas.items()}


def save_models_to_directory(
    models: dict[str, str],
    output_dir: str,
    create_init: bool = True,
) -> list[str]:
    """Write ``<table>_model.py`` per table (+ ``__init__.py`` re-
    exporting them). Returns the written paths. Reference:
    databricks/generator.py:203-250."""
    out = Path(output_dir)
    out.mkdir(parents=True, exist_ok=True)
    written: list[str] = []
    safe_names = {}
    for table, code in sorted(models.items()):
        stem = re.sub(r"\W+", "_", table).strip("_") or "table"
        path = out / f"{stem}_model.py"
        path.write_text(code)
        written.append(str(path))
        safe_names[table] = stem
    if create_init:
        lines = [
            '"""Generated Pandera models — one module per source table."""',
            "",
        ]
        for table, stem in sorted(safe_names.items()):
            lines.append(f"from .{stem}_model import *  # noqa: F401,F403 — {table}")
        init = out / "__init__.py"
        init.write_text("\n".join(lines) + "\n")
        written.append(str(init))
    return written
