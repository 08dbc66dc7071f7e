"""URL hygiene for web-crawl corpora: canonicalize, domain, filter, cap.

Every large-scale web-text pipeline (C4, CCNet, RefinedWeb — public
recipes) starts with URL curation: canonicalize so the same page
fetched twice dedupes exactly, extract the registrable domain, drop
blocklisted domains, and cap how many documents any one domain may
contribute to the training mix. These are those four operators,
expressed as pure Spark column algebra — zero UDFs, every one a narrow
projection or a broadcast join, so at 100 TB they ride the scan that
already runs.

Engine-replayability: the string algebra uses only regexp/split/array
functions every SQL engine has, and the per-domain cap reuses
``sampling.stratified_take``'s md5 rank — so a DuckDB oracle re-derives
every output exactly (same discipline as the samplers).

No reference counterpart (pandera-forge has no web-corpus surface);
this extends the curation family per the training-data-pipeline
mandate.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, functions as F

# query parameters that track, not address, content — dropped by
# canonicalize_url. Public, well-known set (utm_* is matched by prefix).
TRACKING_PARAMS = ("gclid", "fbclid", "msclkid", "ref", "igshid")

# multi-part public suffixes the 2-label heuristic would split wrongly.
# Deliberately a SMALL built-in set: the full Public Suffix List is a
# versioned external artifact; pass `extra_multipart_suffixes` to extend
# it deliberately rather than silently depending on a vendored snapshot.
MULTIPART_SUFFIXES = (
    "co.uk", "org.uk", "ac.uk", "gov.uk",
    "com.au", "net.au", "org.au",
    "co.jp", "or.jp", "ne.jp",
    "com.br", "com.cn", "com.mx", "co.in", "co.kr", "co.za",
)


def _query_without_tracking(query: Column) -> Column:
    """Drop tracking params from a raw query string, sort the rest for
    order-insensitive equality, re-join. Empty/absent query -> ''."""
    params = F.filter(
        F.split(query, "&"),
        lambda p: ~(
            p.startswith("utm_")
            | F.split(p, "=").getItem(0).isin(*TRACKING_PARAMS)
            | (p == "")
        ),
    )
    return F.array_join(F.array_sort(params), "&")


def canonicalize_url(url: Column) -> Column:
    """Canonical form of an http(s) URL so byte-equality means
    page-identity: lowercase scheme+host, strip the default port, drop
    the fragment, drop tracking query params and sort the survivors,
    '/' for an empty path. Non-URL strings (no scheme://) pass through
    unchanged rather than being mangled."""
    scheme = F.lower(F.regexp_extract(url, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    host = F.lower(F.regexp_extract(url, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1))
    host = F.when(
        ((scheme == "http") & host.endswith(":80"))
        | ((scheme == "https") & host.endswith(":443")),
        F.regexp_replace(host, r":\d+$", ""),
    ).otherwise(host)
    path = F.regexp_extract(url, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    # anchor the query '?' BEFORE any '#': a bare \? would match a '?'
    # inside the fragment ('page#frag?x=1') and leak fragment content
    # into the canonical form
    query = _query_without_tracking(
        F.regexp_extract(url, r"^[^#]*?\?([^#]*)", 1)
    )
    canon = F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(query == "", F.lit("")).otherwise(F.concat(F.lit("?"), query)),
    )
    return F.when(scheme == "", url).otherwise(canon)


def registrable_domain(
    host: Column,
    extra_multipart_suffixes: Sequence[str] = (),
) -> Column:
    """The registrable domain of a hostname: last two labels, or three
    when the last two form a known multi-part public suffix (co.uk
    etc. — see MULTIPART_SUFFIXES for why the set is deliberately
    small). Hosts with one label (localhost, intranet names) pass
    through."""
    labels = F.split(F.lower(host), r"\.")
    n = F.size(labels)
    last2 = F.array_join(F.slice(labels, n - 1, 2), ".")
    last3 = F.array_join(F.slice(labels, n - 2, 3), ".")
    suffixes = tuple(MULTIPART_SUFFIXES) + tuple(extra_multipart_suffixes)
    return (
        F.when(n <= 1, F.lower(host))
        .when((n >= 3) & last2.isin(*suffixes), last3)
        .otherwise(last2)
    )


def url_host(url: Column) -> Column:
    """Lowercased hostname (no port) of an http(s) URL."""
    host = F.lower(
        F.regexp_extract(url, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1)
    )
    return F.regexp_replace(host, r":\d+$", "")


def domain_filter(
    df: DataFrame,
    url_col: str,
    blocked_domains: Sequence[str],
    keep: bool = False,
) -> DataFrame:
    """Drop (or with ``keep=True`` retain only) rows whose registrable
    domain is in the list. The list is a driver-side Sequence because
    blocklists are small curated artifacts — it broadcasts as an isin
    literal, no join, no shuffle. For a multi-million-entry blocklist
    table, join against it yourself; this is the curated-list shape."""
    dom = registrable_domain(url_host(F.col(url_col)))
    blocked = [d.lower() for d in blocked_domains]
    # coalesce: a NULL url yields a NULL membership test, and a bare
    # ~NULL is NULL — blocklist mode would silently drop every
    # null-URL row as a side effect. NULL domain => "not blocked".
    cond = (
        F.coalesce(dom.isin(*blocked), F.lit(False))
        if blocked
        else F.lit(False)
    )
    return df.where(cond if keep else ~cond)


def per_domain_cap(
    df: DataFrame,
    url_col: str,
    n: int,
    id_col: str,
    domain_col: str = "__domain",
) -> DataFrame:
    """At most ``n`` documents per registrable domain, chosen in
    deterministic md5 hash order — the anti-monoculture cap every
    training mix applies so one mega-site cannot dominate. Delegates to
    ``sampling.stratified_take`` (same two-phase prefiltered shape, so
    the 100-TB argument — O(domains × n) shuffle, never a global sort —
    is inherited, not re-proven). The domain is left on the result in
    ``domain_col``."""
    from pandera_forge_spark.operators.sampling import stratified_take

    with_dom = df.withColumn(
        domain_col, registrable_domain(url_host(F.col(url_col)))
    )
    return stratified_take(with_dom, [domain_col], n, id_col)
