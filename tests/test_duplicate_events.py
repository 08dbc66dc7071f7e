"""At-least-once redelivery audit (operators.temporal.duplicate_events)."""

import pytest

from pandera_forge_spark.operators.temporal import duplicate_events
from pandera_forge_spark.plans.inspect import has_python_udf


def _rows(out):
    return sorted(
        (r["k"], r["ts"], r["payload"], r["dup_gap_seconds"])
        for r in out.collect()
    )


def _replay(rows, within):
    """brute force: sort per key by ts, compare consecutive."""
    from collections import defaultdict

    by_key = defaultdict(list)
    for k, ts, p in rows:
        by_key[k].append((ts, p))
    hits = []
    for k, evs in by_key.items():
        evs.sort(key=lambda e: e[0])
        for (pts, pp), (ts, p) in zip(evs, evs[1:]):
            if ts - pts <= within and p == pp:
                hits.append((k, ts, p, float(ts - pts)))
    return sorted(hits)


BASE = [
    ("a", 100, "x"),
    ("a", 102, "x"),   # dup (gap 2)
    ("a", 200, "x"),   # same payload, too far
    ("a", 203, "y"),   # close, different payload
    ("b", 50, "z"),
    ("b", 50, "z"),    # exact duplicate (gap 0)
    ("b", 55, "z"),    # triplicate -> second redelivery
]


def test_planted_pairs(spark):
    df = spark.createDataFrame(BASE, "k string, ts bigint, payload string")
    got = _rows(duplicate_events(df, ["k"], "ts", within_seconds=10))
    assert got == _replay(BASE, 10)
    assert len(got) == 3


def test_boundary_is_inclusive(spark):
    rows = [("a", 0, "x"), ("a", 10, "x"), ("a", 21, "x")]
    df = spark.createDataFrame(rows, "k string, ts bigint, payload string")
    got = _rows(duplicate_events(df, ["k"], "ts", within_seconds=10))
    assert [(g[1], g[3]) for g in got] == [(10, 10.0)]


def test_null_payload_matches_null(spark):
    rows = [("a", 1, None), ("a", 2, None), ("a", 3, "x")]
    df = spark.createDataFrame(rows, "k string, ts bigint, payload string")
    got = duplicate_events(df, ["k"], "ts", within_seconds=5).collect()
    assert len(got) == 1 and got[0]["ts"] == 2


def test_split_equals_unsplit(spark):
    import random

    rng = random.Random(19)
    rows = [
        (f"k{rng.randrange(4)}", rng.randrange(0, 500), rng.choice("xy"))
        for _ in range(300)
    ]
    # force exact ts duplicates too
    rows += [("k0", 42, "x"), ("k0", 42, "x")]
    df = spark.createDataFrame(rows, "k string, ts bigint, payload string")
    base = duplicate_events(
        df,
        ["k"],
        "ts",
        within_seconds=3,
        payload_cols=["payload"],
        order_cols=["ts", "payload"],
    )
    split = duplicate_events(
        df,
        ["k"],
        "ts",
        within_seconds=3,
        payload_cols=["payload"],
        order_cols=["ts", "payload"],
        split_every=50.0,
    )
    assert _rows(base) == _rows(split)


def test_payload_defaults_exclude_keys_ts_order(spark):
    rows = [("a", 1, 1, "x"), ("a", 2, 2, "x")]
    df = spark.createDataFrame(rows, "k string, ts bigint, oid bigint, p string")
    # default payload = {p} when oid is an order col -> dup
    got = duplicate_events(df, ["k"], "ts", 5, order_cols=["ts", "oid"])
    assert got.count() == 1
    # explicit payload including oid -> no dup (oids differ)
    got2 = duplicate_events(df, ["k"], "ts", 5, payload_cols=["oid", "p"])
    assert got2.count() == 0


def test_prev_ts_column_emitted(spark):
    df = spark.createDataFrame(
        [("a", 1, "x"), ("a", 2, "x")], "k string, ts bigint, payload string"
    )
    row = duplicate_events(df, ["k"], "ts", 5).collect()[0]
    assert row["prev_ts"] == 1 and row["ts"] == 2


def test_fences(spark):
    df = spark.createDataFrame([("a", 1)], "k string, ts bigint")
    with pytest.raises(ValueError, match="non-empty"):
        duplicate_events(df, ["k"], "ts", 5)  # nothing left as payload
    df2 = spark.createDataFrame([("a", 1, "x")], "k string, ts bigint, p string")
    with pytest.raises(ValueError, match="not in frame"):
        duplicate_events(df2, ["k"], "ts", 5, payload_cols=["zzz"])


def test_no_python_udf(spark):
    df = spark.createDataFrame(
        [("a", 1, "x")], "k string, ts bigint, payload string"
    )
    assert not has_python_udf(duplicate_events(df, ["k"], "ts", 5))


def test_negative_gap_from_non_ts_order_not_a_dup(spark):
    # review fix: order by id puts a LATER event as predecessor; the
    # negative gap must not pass the within filter
    rows = [("a", 5000, 2, "x"), ("a", 100, 3, "x")]
    df = spark.createDataFrame(rows, "k string, ts bigint, oid bigint, p string")
    got = duplicate_events(
        df, ["k"], "ts", within_seconds=5,
        payload_cols=["p"], order_cols=["oid"],
    )
    assert got.count() == 0
