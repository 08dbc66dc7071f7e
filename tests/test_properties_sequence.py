"""Property-based differentials (hypothesis) for the CDC, sequence,
and CMS operators: the Spark answer must equal a plain-python replay
of the declared semantics on randomized inputs — order tuples with
NULLs, ties, empty groups, collisions and all. Few examples per test
(each example runs Spark jobs), wide shrinkage when one fails."""

import hashlib

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

SPARK_SETTINGS = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_keys = st.sampled_from(["a", "b", None])
_ts = st.one_of(st.none(), st.floats(min_value=0, max_value=100, allow_nan=False, width=32))
_val = st.one_of(st.none(), st.integers(-3, 3))


def _sort_key(ts, seq):
    # Spark struct ordering: NULL field lowest, then value, then seq
    return (ts is not None, ts if ts is not None else 0.0, seq)


@given(st.lists(st.tuples(_keys, _ts, _val), max_size=12))
@settings(**SPARK_SETTINGS)
def test_latest_by_key_matches_python(spark, rows):
    from pandera_forge_spark.operators.cdc import latest_by_key

    data = [(k, t, i, v) for i, (k, t, v) in enumerate(rows)]
    df = spark.createDataFrame(
        data, "key string, ts double, seq int, val int"
    ).repartition(3)
    got = {
        r["key"]: (r["ts"], r["seq"], r["val"])
        for r in latest_by_key(df, ["key"], ["ts", "seq"]).collect()
    }
    expect = {}
    for k, t, i, v in data:
        cur = expect.get(k)
        if cur is None or _sort_key(t, i) > _sort_key(cur[0], cur[1]):
            expect[k] = (t, i, v)
    assert set(got) == set(expect)
    for k in expect:
        et, ei, ev = expect[k]
        gt, gi, gv = got[k]
        assert gi == ei and gv == ev and gt == et


@given(st.lists(st.tuples(_keys, _val), max_size=14))
@settings(**SPARK_SETTINGS)
def test_monotonic_matches_python(spark, rows):
    from pandera_forge_spark.operators.temporal import monotonic_violations

    data = [(k, i, v) for i, (k, v) in enumerate(rows)]
    df = spark.createDataFrame(data, "key string, seq int, v int").repartition(3)
    got = {
        (r["key"], r["seq"]): r["prev_v"]
        for r in monotonic_violations(df, ["key"], ["seq"], "v").collect()
    }
    expect = {}
    last = {}  # lag is positional: EVERY row becomes the new prev
    for k, i, v in data:  # seq == insertion order, already sorted
        prev = last.get(k)
        if prev is not None and v is not None and prev > v:
            expect[(k, i)] = prev
        last[k] = v
    assert got == expect


@given(
    st.lists(st.tuples(_keys, st.floats(min_value=0, max_value=200, allow_nan=False, width=16)), max_size=14),
    st.floats(min_value=1.0, max_value=300.0, allow_nan=False),
    st.floats(min_value=5.0, max_value=80.0, allow_nan=False),
)
@settings(**SPARK_SETTINGS)
def test_sequence_gaps_split_matches_unsplit_and_python(spark, rows, split, gap):
    from pandera_forge_spark.operators.temporal import sequence_gaps

    data = [(k, t, i) for i, (k, t) in enumerate(rows)]
    df = spark.createDataFrame(data, "key string, t double, id int").repartition(3)
    a = sorted(
        ((r["key"], r["gap_start"], r["gap_end"], r["gap_seconds"])
         for r in sequence_gaps(df, ["key"], "t", gap, order_cols=["t", "id"]).collect()),
        key=repr,
    )
    b = sorted(
        ((r["key"], r["gap_start"], r["gap_end"], r["gap_seconds"])
         for r in sequence_gaps(
             df, ["key"], "t", gap, order_cols=["t", "id"], split_every=split
         ).collect()),
        key=repr,
    )
    assert a == b
    # python replay of the lag in (t, id) order
    expect = []
    by_key = {}
    for k, t, i in data:
        by_key.setdefault(k, []).append((t, i))
    for k, seq in by_key.items():
        seq.sort()
        for (t0, _), (t1, i1) in zip(seq, seq[1:]):
            if t1 - t0 > gap:
                expect.append((k, t0, t1, t1 - t0))
    assert a == sorted(expect, key=repr)


@given(
    st.lists(st.integers(0, 9), min_size=1, max_size=10, unique=True).map(set),
    st.lists(st.tuples(st.integers(0, 12), st.sampled_from(["U", "D", None]), _val), max_size=10),
)
@settings(**SPARK_SETTINGS)
def test_apply_then_diff_is_consistent(spark, base_keys, changes):
    """Algebraic consistency: snapshot_diff(base, apply_changelog(base,
    changes)) classifies every key exactly as the compacted changelog
    dictates (NULL op = upsert)."""
    from pandera_forge_spark.operators.cdc import apply_changelog
    from pandera_forge_spark.validator import snapshot_diff

    base_rows = [(k, k * 10) for k in sorted(base_keys)]
    ch_rows = [(k, g, op, v) for g, (k, op, v) in enumerate(changes)]
    base = spark.createDataFrame(base_rows, "key int, val int")
    ch = spark.createDataFrame(ch_rows, "key int, gen int, op string, val int")
    applied = apply_changelog(base, ch, ["key"], ["gen"])
    got = {r["key"]: r["change"] for r in snapshot_diff(base, applied, ["key"]).collect()}

    compact = {}
    for k, g, op, v in ch_rows:
        if k not in compact or g > compact[k][0]:
            compact[k] = (g, op, v)
    expect = {}
    for k, (_, op, v) in compact.items():
        in_base = k in base_keys
        if op == "D":
            if in_base:
                expect[k] = "removed"
        elif not in_base:
            expect[k] = "added"
        elif v != k * 10:  # changed iff the payload actually differs
            expect[k] = "changed"
    assert got == expect


@given(
    st.lists(st.text(alphabet="abcxyz", min_size=0, max_size=4), min_size=1, max_size=20),
    st.integers(1, 3),
    st.integers(1, 16),
)
@settings(**SPARK_SETTINGS)
def test_cms_matches_python_replay(spark, values, depth, width):
    from pandera_forge_spark.sketches import (
        cms_estimate,
        cms_merge,
        cms_partition_sketch,
    )

    df = spark.createDataFrame([(v,) for v in values], "s string").repartition(3)
    sk = cms_merge(cms_partition_sketch(df, "s", depth=depth, width=width))
    probe_vals = sorted(set(values))
    keys = spark.createDataFrame([(v,) for v in probe_vals], "s string")
    got = {r["s"]: r["est"] for r in cms_estimate(keys, sk, "s").collect()}

    counters = [[0] * width for _ in range(depth)]

    def bucket(v, r):
        h = hashlib.md5(f"cms:{r}:{v}".encode()).hexdigest()
        return int(h[:8], 16) % width

    for v in values:
        for r in range(depth):
            counters[r][bucket(v, r)] += 1
    for v in probe_vals:
        expect = min(counters[r][bucket(v, r)] for r in range(depth))
        assert got[v] == expect
        assert got[v] >= values.count(v)


@given(
    st.lists(
        st.tuples(
            _keys,
            st.one_of(st.none(), st.floats(min_value=0, max_value=50, allow_nan=False, width=16)),
            st.floats(min_value=-10, max_value=60, allow_nan=False, width=16),
        ),
        max_size=14,
    )
)
@settings(**SPARK_SETTINGS)
def test_interval_overlaps_matches_bruteforce(spark, rows):
    """Running-max == brute force 'max masked end among earlier rows in
    (start, id) order exceeds my start' — NULL starts neither violate
    nor accuse, NULL ends contribute nothing, inverted intervals
    (end < start) pass through like any other value."""
    from pandera_forge_spark.operators.temporal import interval_overlaps

    data = [
        (k, s, (s + d) if s is not None else None, i)
        for i, (k, s, d) in enumerate(rows)
    ]
    df = spark.createDataFrame(
        data, "key string, s double, e double, id int"
    ).repartition(3)
    got = {
        (r["key"], r["id"]): r["prev_end"]
        for r in interval_overlaps(
            df, ["key"], "s", "e", order_cols=["s", "id"]
        ).collect()
    }
    got_split = {
        (r["key"], r["id"]): r["prev_end"]
        for r in interval_overlaps(
            df, ["key"], "s", "e", order_cols=["s", "id"], split_every=17.0
        ).collect()
    }
    assert got_split == got
    expect = {}
    by_key = {}
    for k, s, e, i in data:
        by_key.setdefault(k, []).append((s is not None, s or 0.0, i, s, e))
    for k, seq in by_key.items():
        seq.sort()
        best = None
        for _, _, i, s, e in seq:
            if best is not None and s is not None and best > s:
                expect[(k, i)] = best
            if s is not None and e is not None:  # masked end: NULL start never accuses
                best = e if best is None else max(best, e)
    assert got == expect
