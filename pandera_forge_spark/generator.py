"""Drop-in generator facade: the reference's top-level API surface
over the distributed engine.

A reference user calls ``ModelGenerator().generate(df)`` /
``from_csv`` / ``from_excel`` / ``from_parquet`` / ``from_table`` and
gets back the same Pandera model source text (reference:
generator.py:59-94, pandas/pandas_generator.py:24-205,
spark/spark_generator.py:154-237). Differences are all under the hood:

- profiling is the single-pass fused aggregation, not ~6-8 Spark jobs
  per column;
- ``validate=True`` runs REAL distributed data validation
  (``validate_table``) — the reference prints "Skipping DataFrame
  validation for Spark (requires full collect)" and skips it
  (reference: spark/spark_generator.py:101-109); here it is one
  aggregation pass, so it works at any scale;
- pandas DataFrames are accepted and converted to Spark, so the
  pandas entry points keep working against the same engine.

Contract parity kept deliberately: Optional[str] returns with
warnings printed on failure (not raised), model names derived from
file stems with space/dash → underscore, ``validate=False`` defaults
on the Spark ``from_table``/``from_parquet`` paths, and the
``# Example implementation`` trailer when a source file is given.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Dict, Optional

from pandera_forge_spark.codegen import render_model, validate_model_code
from pandera_forge_spark.inference import infer_schema
from pandera_forge_spark.sanitizer import sanitize_class_name
from pandera_forge_spark.validator import validate_table


def _implementation_example(model_name: str, source_file: Path) -> str:
    """Byte-parity port of the reference's usage trailer
    (reference: core/base_generator.py:169-206)."""
    return f"""# Example implementation


if __name__ == "__main__":
    from pathlib import Path
    import pandas as pd

    # Load the data
    file_path = Path("{source_file.absolute()}")

    # Read file based on extension
    if file_path.suffix == ".csv":
        df = pd.read_csv(file_path)
    elif file_path.suffix in [".xlsx", ".xls"]:
        df = pd.read_excel(file_path)
    elif file_path.suffix == ".parquet":
        df = pd.read_parquet(file_path)
    elif file_path.suffix == ".json":
        df = pd.read_json(file_path)
    else:
        raise ValueError(f"Unsupported file type: {source_file.suffix}")

    # Validate the DataFrame
    validated_df = {model_name}.validate(df)
    print(f"Successfully validated {{len(validated_df)}} rows")
"""


def _model_name_from_stem(stem: str) -> str:
    """File-stem → model-name rule (reference:
    pandas_generator.py:134, spark_generator.py:228)."""
    return stem.replace(" ", "_").replace("-", "_")


class ModelGenerator:
    """One-call schema generation (reference: generator.py:21-134).

    ``exact_distinct`` / ``pattern_sample`` tune the underlying
    profiler: the defaults are the warehouse-scale path (HLL +
    candidate-then-verify uniqueness, full-scan pattern detection);
    pass ``pattern_sample=10_000`` to mirror the reference's sampled
    pattern detection on huge tables."""

    def __init__(
        self,
        exact_distinct: Any = "auto",
        pattern_sample: Optional[int] = None,
    ):
        self.exact_distinct = exact_distinct
        self.pattern_sample = pattern_sample

    # ------------------------------------------------------------ core

    def generate(
        self,
        df: Any,
        model_name: str = "DataFrameModel",
        validate: bool = True,
        include_examples: bool = True,
        detect_patterns: bool = True,
        source_file: Optional[Path] = None,
    ) -> Optional[str]:
        """DataFrame (Spark or pandas) → Pandera model source, or None
        on failure — same contract as the reference's
        ``ModelGenerator.generate`` (reference: generator.py:59-94,
        pandas_generator.py:24-87), with data validation distributed
        instead of skipped."""
        sdf = self._to_spark(df)
        if sdf is None:
            return None
        class_name = sanitize_class_name(model_name)
        schema = infer_schema(
            sdf,
            class_name,
            exact_distinct=self.exact_distinct,
            detect_patterns=detect_patterns,
            with_examples=include_examples,
            pattern_sample=self.pattern_sample,
        )
        if not any(c.pandera_type for c in schema.columns):
            print(f"Warning: No valid fields generated for model {class_name}")
            return None
        full_code = render_model(schema)

        if validate:
            ok, err = validate_model_code(full_code, class_name)
            if not ok:
                print(f"Warning: Generated model has syntax errors: {err}")
                return None
            # the V3 rewrite: distributed assertions instead of the
            # reference's full-collect pandas validation
            result = validate_table(sdf, schema)
            if not result.ok:
                print(
                    "Warning: Model validation against DataFrame failed: "
                    f"{result.error_message}"
                )
                return None

        if source_file is not None:
            full_code += "\n\n" + _implementation_example(
                class_name, Path(source_file)
            )
        return full_code

    # --------------------------------------------------------- sources

    def from_csv(
        self,
        spark,
        csv_path,
        validate: bool = True,
        include_examples: bool = True,
        detect_patterns: bool = True,
    ) -> Optional[str]:
        """CSV → model code; encoding fallback handled by
        ``sources.readers.read_csv`` (reference:
        pandas_generator.py:101-142)."""
        from pandera_forge_spark.sources.readers import read_csv

        p = Path(csv_path)
        try:
            df = read_csv(spark, str(p))
        except Exception as e:  # noqa: BLE001 — reference prints + None
            print(f"Error reading CSV file {p}: {e}")
            return None
        return self.generate(
            df,
            model_name=_model_name_from_stem(p.stem),
            validate=validate,
            include_examples=include_examples,
            detect_patterns=detect_patterns,
            source_file=p,
        )

    def from_excel(
        self,
        spark,
        xlsx_path,
        validate: bool = True,
        include_examples: bool = True,
        detect_patterns: bool = True,
    ) -> Dict[str, str]:
        """All sheets → {sheet: model code}; multi-sheet names are
        ``<stem>_<sheet>``, single-sheet is keyed by the stem
        (reference: pandas_generator.py:144-205)."""
        from pandera_forge_spark.sources.readers import read_excel

        p = Path(xlsx_path)
        models: Dict[str, str] = {}
        try:
            sheets = read_excel(spark, str(p))
        except NotImplementedError:
            raise
        except Exception as e:  # noqa: BLE001
            print(f"Error reading Excel file {p}: {e}")
            return models
        multi = len(sheets) > 1
        for sheet, df in sheets.items():
            name = f"{p.stem}_{sheet}" if multi else p.stem
            code = self.generate(
                df,
                model_name=_model_name_from_stem(name),
                validate=validate,
                include_examples=include_examples,
                detect_patterns=detect_patterns,
                source_file=p,
            )
            if code:
                models[sheet if multi else p.stem] = code
        return models

    def from_parquet(
        self,
        parquet_path: str,
        spark_session,
        model_name: Optional[str] = None,
        validate: bool = False,
        include_examples: bool = True,
        detect_patterns: bool = True,
    ) -> Optional[str]:
        """Parquet → model code (reference:
        spark_generator.py:196-237, same ``validate=False`` default —
        though here turning it on costs one aggregation, not a
        collect)."""
        try:
            df = spark_session.read.parquet(parquet_path)
        except Exception as e:  # noqa: BLE001
            print(f"Error reading Parquet file {parquet_path}: {e}")
            return None
        if model_name is None:
            model_name = _model_name_from_stem(Path(parquet_path).stem)
        return self.generate(
            df,
            model_name=model_name,
            validate=validate,
            include_examples=include_examples,
            detect_patterns=detect_patterns,
            source_file=Path(parquet_path),
        )

    def from_table(
        self,
        table_name: str,
        spark_session,
        model_name: Optional[str] = None,
        validate: bool = False,
        include_examples: bool = True,
        detect_patterns: bool = True,
    ) -> Optional[str]:
        """Catalog table → model code (reference:
        spark_generator.py:154-194; dots in qualified names become
        underscores in the default model name)."""
        try:
            df = spark_session.table(table_name)
        except Exception as e:  # noqa: BLE001
            print(f"Error reading Spark table {table_name}: {e}")
            return None
        if model_name is None:
            model_name = table_name.replace(".", "_")
        return self.generate(
            df,
            model_name=model_name,
            validate=validate,
            include_examples=include_examples,
            detect_patterns=detect_patterns,
        )

    # --------------------------------------------------------- helpers

    def _to_spark(self, df: Any):
        """Accept Spark or pandas frames (reference:
        generator.py:96-134 dispatches by type; here pandas is
        converted so ONE engine serves both)."""
        from pyspark.sql import DataFrame as SparkDataFrame
        from pyspark.sql import SparkSession

        if isinstance(df, SparkDataFrame):
            return df
        try:
            import pandas as pd

            if isinstance(df, pd.DataFrame):
                spark = SparkSession.getActiveSession()
                if spark is None:
                    from pandera_forge_spark.sources.session import (
                        get_spark_session,
                    )

                    spark = get_spark_session()
                return spark.createDataFrame(df)
        except ImportError:
            pass
        print(f"Error: unsupported DataFrame type {type(df)!r}")
        return None
