"""pandera_forge_spark — a from-scratch PySpark-native schema-inference
and constraint-validation engine.

Re-expresses the capabilities of ``thijshakkenbergecolab/pandera-forge``
(reference at /root/reference, see SURVEY.md) as distributed Spark
DataFrame computations:

- single-pass column profiling (one ``df.agg`` for all columns × stats,
  vs the reference's ~6-8 Spark jobs per column,
  reference: spark/spark_field_analyzer.py:39-53),
- constraint inference with the reference's exact rules
  (reference: code_generator.py:39-75, field_analyzer.py:34-76),
- distributed validation with per-partition pass/fail verdicts and
  violation rows (the reference skips Spark-side validation entirely,
  reference: spark/spark_generator.py:101-109),
- uniqueness / referential-integrity anti-joins with skew salting,
- distribution drift (PSI / KS) over quantile sketches,
- interleaved text+media span operators (order invariant, sequence
  equality) for the north-rule input table,
- checkpointed, resumable partition-manifest runner with an audit sink,
- large-scale training-data operators (dedup, similarity search, text
  quality, multimodal plumbing).
"""

from pandera_forge_spark.schema import (
    Check,
    ColumnProfile,
    ColumnSpec,
    StringConstraints,
    TableSchema,
)
from pandera_forge_spark.sanitizer import sanitize_class_name, sanitize_column_name
from pandera_forge_spark.sketches import (
    baseline_from_kll,
    cms_estimate,
    cms_merge,
    cms_partition_sketch,
    incremental_sketch_store,
    load_sketch_store,
    merge_checksums,
    merge_sketches,
    new_key_estimate,
    partition_sketches,
    table_checksum,
    update_sketches,
)
from pandera_forge_spark.patterns import NAMED_PATTERNS
from pandera_forge_spark.profiler import profile_by_group, profile_table
from pandera_forge_spark.inference import infer_and_validate, infer_schema, infer_semantic_type
from pandera_forge_spark.enrichment import (
    HeuristicEnricher,
    HttpEnricher,
    enrich_schema,
    generate_documentation,
)
from pandera_forge_spark.sources.versioned import VersionedParquet
from pandera_forge_spark.sources.readers import read_excel
from pandera_forge_spark.operators.text import (
    boilerplate_lines,
    collapse_repeated_lines,
    contamination_bloom,
    fingerprint_overlap_pairs,
    lm_score,
    strip_boilerplate,
    train_bigram_lm,
    winnow_fingerprints,
)
from pandera_forge_spark.generator import ModelGenerator
from pandera_forge_spark.pipeline import interleaved_verdicts
from pandera_forge_spark.sources.session import (
    SessionConfig,
    get_spark_session,
    resolve_config,
)
from pandera_forge_spark.schema import schema_diff
from pandera_forge_spark.operators.pii import (
    pii_flagged_rows,
    pii_scan,
    redact,
)
from pandera_forge_spark.operators.sampling import deterministic_shuffle
from pandera_forge_spark.operators.layout import (
    cluster_by_zorder,
    file_minmax_stats,
    pruned_file_fraction,
    quantize_dim,
    zorder_value,
)
from pandera_forge_spark.operators.search import (
    bm25_index,
    bm25_join,
    bm25_topk,
    corpus_stats,
    rrf_fuse,
)
from pandera_forge_spark.operators.temporal import (
    asof_join,
    cusum_scores,
    duplicate_events,
    event_funnel,
    interval_join,
    interval_overlaps,
    monotonic_violations,
    resample_ffill,
    resample_interpolate,
    retention_cohorts,
    rolling_zscore,
    sequence_gaps,
    session_stats,
    sessionize,
    time_rollup,
    time_weighted_average,
    trend_slope,
)
from pandera_forge_spark.operators.cdc import (
    apply_changelog,
    golden_records,
    latest_by_key,
    scd2_history,
)
from pandera_forge_spark.operators.sampling import (
    calibrate_scores,
    split_balance_report,
    mixture_quotas,
    mixture_sample,
    train_val_test_split,
    weighted_take,
)
from pandera_forge_spark.operators.linkage import (
    best_match_pairs,
    fuzzy_join,
    fuzzy_pairs,
    sorted_neighborhood_pairs,
)
from pandera_forge_spark.operators.labels import (
    annotator_agreement,
    label_conflicts,
    majority_label,
)
from pandera_forge_spark.operators.web import (
    canonicalize_url,
    domain_filter,
    per_domain_cap,
    registrable_domain,
    url_host,
)
from pandera_forge_spark.operators.similarity import (
    assign_cells,
    embedding_health,
    ivf_topk_partitioned,
    quantize_embeddings,
    semantic_dedup,
    write_ivf_partitioned,
)
from pandera_forge_spark.operators.text import chunk_documents, normalize_text
from pandera_forge_spark.profiler import (
    association_pairs,
    benford_profile,
    concentration_profile,
    correlation_matrix,
    cube_profile,
    entropy_profile,
    mutual_information,
    null_correlation,
    quantile_profile,
    string_hygiene_report,
    type_headroom_report,
)
from pandera_forge_spark.runner import audit_summary
from pandera_forge_spark.sources.readers import corrupt_record_report, read_jsonl
from pandera_forge_spark.spans import (
    chunk_interleaved,
    span_ref_violations,
    span_transition_matrix,
)
from pandera_forge_spark.validator import (
    duplicate_keys,
    duplicate_rows,
    functional_dependency_violations,
    join_cardinality_report,
    soft_fd_report,
    grouped_outlier_rows,
    has_duplicate_keys,
    iqr_bounds,
    orphan_rows,
    outlier_rows,
    skew_report,
    quarantine_split,
    snapshot_diff,
    snapshot_diff_summary,
    validate_table,
    violation_examples,
    violation_rows,
)

__version__ = "0.1.0"

__all__ = [
    "Check",
    "ColumnProfile",
    "ColumnSpec",
    "StringConstraints",
    "TableSchema",
    "NAMED_PATTERNS",
    "sanitize_class_name",
    "sanitize_column_name",
    "profile_table",
    "profile_by_group",
    "partition_sketches",
    "table_checksum",
    "merge_checksums",
    "merge_sketches",
    "update_sketches",
    "cms_partition_sketch",
    "cms_merge",
    "cms_estimate",
    "new_key_estimate",
    "baseline_from_kll",
    "incremental_sketch_store",
    "load_sketch_store",
    "HeuristicEnricher",
    "HttpEnricher",
    "enrich_schema",
    "generate_documentation",
    "VersionedParquet",
    "read_excel",
    "boilerplate_lines",
    "contamination_bloom",
    "strip_boilerplate",
    "fingerprint_overlap_pairs",
    "winnow_fingerprints",
    "train_bigram_lm",
    "lm_score",
    "collapse_repeated_lines",
    "infer_and_validate",
    "infer_schema",
    "infer_semantic_type",
    "interleaved_verdicts",
    "ModelGenerator",
    "SessionConfig",
    "get_spark_session",
    "resolve_config",
    "quarantine_split",
    "schema_diff",
    "validate_table",
    "violation_rows",
    "duplicate_keys",
    "duplicate_rows",
    "has_duplicate_keys",
    "orphan_rows",
    "skew_report",
    "snapshot_diff",
    "snapshot_diff_summary",
    "pii_flagged_rows",
    "pii_scan",
    "redact",
    "deterministic_shuffle",
    "bm25_index",
    "bm25_join",
    "bm25_topk",
    "corpus_stats",
    "rrf_fuse",
    "cluster_by_zorder",
    "file_minmax_stats",
    "pruned_file_fraction",
    "quantize_dim",
    "zorder_value",
    "asof_join",
    "event_funnel",
    "interval_join",
    "interval_overlaps",
    "duplicate_events",
    "monotonic_violations",
    "retention_cohorts",
    "cusum_scores",
    "resample_ffill",
    "resample_interpolate",
    "rolling_zscore",
    "sequence_gaps",
    "session_stats",
    "sessionize",
    "time_rollup",
    "apply_changelog",
    "latest_by_key",
    "scd2_history",
    "golden_records",
    "sorted_neighborhood_pairs",
    "time_weighted_average",
    "trend_slope",
    "annotator_agreement",
    "label_conflicts",
    "majority_label",
    "span_ref_violations",
    "functional_dependency_violations",
    "join_cardinality_report",
    "soft_fd_report",
    "association_pairs",
    "benford_profile",
    "concentration_profile",
    "mutual_information",
    "string_hygiene_report",
    "type_headroom_report",
    "correlation_matrix",
    "cube_profile",
    "entropy_profile",
    "null_correlation",
    "quantile_profile",
    "iqr_bounds",
    "outlier_rows",
    "grouped_outlier_rows",
    "violation_examples",
    "chunk_documents",
    "normalize_text",
    "weighted_take",
    "train_val_test_split",
    "mixture_quotas",
    "mixture_sample",
    "fuzzy_join",
    "best_match_pairs",
    "calibrate_scores",
    "split_balance_report",
    "fuzzy_pairs",
    "canonicalize_url",
    "domain_filter",
    "per_domain_cap",
    "registrable_domain",
    "url_host",
    "embedding_health",
    "ivf_topk_partitioned",
    "assign_cells",
    "quantize_embeddings",
    "semantic_dedup",
    "write_ivf_partitioned",
    "span_transition_matrix",
    "chunk_interleaved",
    "audit_summary",
    "read_jsonl",
    "corrupt_record_report",
]
