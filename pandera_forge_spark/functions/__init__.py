"""The engine's scalar/array function surface (SURVEY.md §2.8), in one
namespace.

Everything here is a ``Column -> Column`` expression builder backed by
built-in ``pyspark.sql.functions`` (JVM-side, whole-stage codegen — no
Python in the hot path). Grouped by family:

- string/pattern: the 17 named regexes + match-ratio aggregates
  (reference: pattern_detector.py:26-46)
- text analytics: tokenization, counts, quality, language ID,
  fingerprints (training-data additions)
- similarity: dot/norm/cosine over array<float> embeddings
- dedup hashing: shingles, jaccard, simhash, hamming
- spans: interleaved-document invariants and canonicalization
- media: magic-byte MIME sniffing and header-field extraction over
  binary payload columns (JVM-side, no media library)
- web: URL canonicalization, host + registrable-domain extraction,
  delete-neighborhood expansion for edit-distance blocking
"""

from pandera_forge_spark.patterns import (
    NAMED_PATTERNS,
    match_ratio_expr,
    pattern_ratio_exprs,
)
from pandera_forge_spark.operators.text import (
    char_count,
    detect_language,
    fingerprint,
    language_margin,
    punct_ratio,
    quality_score,
    stopword_ratio,
    token_count,
    tokens,
    upper_ratio,
    word_count_bpe_ish,
)
from pandera_forge_spark.operators.similarity import cosine, dot, norm
from pandera_forge_spark.operators.dedup import (
    hamming64,
    hashed_shingles,
    jaccard,
    shingles,
    simhash64,
)
from pandera_forge_spark.operators.multimodal import (
    gif_dimensions,
    png_dimensions,
    sniff_mime,
    wav_sample_rate,
)
from pandera_forge_spark.spans import (
    canonical_spans,
    kind_consistency_ok,
    offsets_nondecreasing,
)
from pandera_forge_spark.operators.linkage import delete_variants
from pandera_forge_spark.operators.web import (
    canonicalize_url,
    registrable_domain,
    url_host,
)

__all__ = [
    "NAMED_PATTERNS",
    "match_ratio_expr",
    "pattern_ratio_exprs",
    "char_count",
    "detect_language",
    "fingerprint",
    "language_margin",
    "punct_ratio",
    "quality_score",
    "stopword_ratio",
    "token_count",
    "tokens",
    "upper_ratio",
    "word_count_bpe_ish",
    "cosine",
    "dot",
    "norm",
    "hamming64",
    "hashed_shingles",
    "jaccard",
    "shingles",
    "simhash64",
    "canonical_spans",
    "kind_consistency_ok",
    "offsets_nondecreasing",
    "sniff_mime",
    "png_dimensions",
    "gif_dimensions",
    "wav_sample_rate",
    "canonicalize_url",
    "registrable_domain",
    "url_host",
    "delete_variants",
]
