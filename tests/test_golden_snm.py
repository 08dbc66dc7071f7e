"""Golden-record survivorship (operators/cdc.golden_records) and
sorted-neighborhood blocking (operators/linkage.sorted_neighborhood_pairs)."""

import random
import string

import pytest
from pyspark.sql import functions as F

from pandera_forge_spark.operators.cdc import golden_records
from pandera_forge_spark.operators.linkage import sorted_neighborhood_pairs
from pandera_forge_spark.plans.inspect import executed_plan, has_python_udf


@pytest.fixture(scope="module")
def history(spark):
    # (key, ts, seq, email, phone): newest record of k1 has NULL email —
    # latest-row-wins would lose the email; survivorship keeps it
    rows = [
        ("k1", 1.0, 1, "a@x", "111"),
        ("k1", 2.0, 2, "b@x", None),
        ("k1", 3.0, 3, None, "333"),
        ("k2", 1.0, 4, None, None),
        ("k3", 5.0, 5, "c@y", "555"),
        ("k3", 5.0, 6, "d@y", "556"),  # full-order tie -> value breaks it
    ]
    return spark.createDataFrame(
        rows, "key string, ts double, seq int, email string, phone string"
    )


def test_golden_latest_nonnull_per_field(history):
    out = golden_records(history, ["key"], ["ts", "seq"])
    got = {r["key"]: (r["email"], r["phone"], r["n_records"]) for r in out.collect()}
    assert got["k1"] == ("b@x", "333", 3)
    assert got["k2"] == (None, None, 1)


def test_golden_tie_breaks_by_value(history):
    out = golden_records(history, ["key"], ["ts"], field_cols=["email"])
    got = {r["key"]: r["email"] for r in out.collect()}
    # ts ties at 5.0 -> greatest value wins (deterministic)
    assert got["k3"] == "d@y"


def test_golden_vs_latest_by_key_difference(history):
    from pandera_forge_spark.operators.cdc import latest_by_key

    latest = {
        r["key"]: r["email"]
        for r in latest_by_key(history, ["key"], ["ts", "seq"]).collect()
    }
    golden = {
        r["key"]: r["email"]
        for r in golden_records(history, ["key"], ["ts", "seq"]).collect()
    }
    assert latest["k1"] is None  # newest row's NULL propagates
    assert golden["k1"] == "b@x"  # survivorship fills it


def test_golden_fences(history):
    with pytest.raises(ValueError, match="key/order"):
        golden_records(history, ["key"], ["ts"], field_cols=["ts"])
    with pytest.raises(ValueError, match="at least one"):
        golden_records(history.select("key", "ts"), ["key"], ["ts"])
    with pytest.raises(ValueError, match="n_records"):
        golden_records(
            history.withColumnRenamed("email", "n_records"), ["key"], ["ts"]
        )


def test_golden_aggregate_shaped(history):
    out = golden_records(history, ["key"], ["ts", "seq"])
    assert not has_python_udf(out)
    assert "Window" not in executed_plan(out)


def test_golden_partition_independent(history):
    a = golden_records(history.repartition(7), ["key"], ["ts", "seq"])
    b = golden_records(history.coalesce(1), ["key"], ["ts", "seq"])
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


# ------------------------------------------------ sorted neighborhood


def _brute_pairs(rows, window):
    srt = sorted(rows)  # (key, id) tuples
    out = set()
    for j, b in enumerate(srt):
        for a in srt[max(0, j - window): j]:
            out.add((a[0], a[1], b[0], b[1]))
    return out


def _spark_pairs(df, **kw):
    out = sorted_neighborhood_pairs(df, "name", "id", **kw)
    return {(r["key_a"], r["id_a"], r["key_b"], r["id_b"]) for r in out.collect()}


@pytest.fixture(scope="module")
def names(spark):
    rng = random.Random(42)
    rows = []
    for i in range(300):
        base = "".join(rng.choices(string.ascii_lowercase[:6], k=5))
        rows.append((base, i))
    # heavy shared-prefix cluster to force multi-row chunks
    for i in range(300, 340):
        rows.append(("aaa" + str(i % 7), i))
    # tiny chunks: single rows under rare prefixes (carry must span
    # several chunks back)
    for i in range(340, 350):
        rows.append((string.ascii_lowercase[i - 340 + 10] + "zz", i))
    return spark.createDataFrame(rows, "name string, id long"), rows


@pytest.mark.parametrize("window,prefix_len", [(1, 1), (3, 2), (5, 1), (8, 3)])
def test_snm_matches_bruteforce(names, window, prefix_len):
    df, rows = names
    got = _spark_pairs(df, window=window, prefix_len=prefix_len)
    assert got == _brute_pairs(rows, window)


def test_snm_partition_independent(names):
    df, rows = names
    a = _spark_pairs(df.repartition(13), window=4, prefix_len=2)
    assert a == _brute_pairs(rows, 4)


def test_snm_verify_distance(spark):
    df = spark.createDataFrame(
        [("smith", 1), ("smyth", 2), ("smithh", 3), ("zzz", 4)],
        "name string, id long",
    )
    out = sorted_neighborhood_pairs(df, "name", "id", window=3, max_distance=1)
    got = {(r["key_a"], r["key_b"]): r["distance"] for r in out.collect()}
    assert got[("smith", "smithh")] == 1
    assert got[("smith", "smyth")] == 1
    assert ("smithh", "zzz") not in got
    # smithh vs smyth is distance 2 -> filtered
    assert ("smithh", "smyth")not in got and ("smyth", "smithh") not in got


def test_snm_null_keys_sort_first(spark):
    df = spark.createDataFrame(
        [(None, 1), (None, 2), ("aa", 3)], "name string, id long"
    )
    got = {
        (r["id_a"], r["id_b"])
        for r in sorted_neighborhood_pairs(df, "name", "id", window=1).collect()
    }
    assert got == {(1, 2), (2, 3)}


def test_snm_fences(spark):
    df = spark.createDataFrame([("a", 1)], "name string, id long")
    with pytest.raises(ValueError, match="window"):
        sorted_neighborhood_pairs(df, "name", "id", window=0)
    with pytest.raises(ValueError, match="lag ladder"):
        sorted_neighborhood_pairs(df, "name", "id", window=100)
    with pytest.raises(ValueError, match="prefix_len"):
        sorted_neighborhood_pairs(df, "name", "id", prefix_len=0)
    with pytest.raises(ValueError, match="collides"):
        sorted_neighborhood_pairs(
            df.withColumn("__chunk", F.lit(1)), "name", "id"
        )


def test_snm_no_python_udf(names):
    df, _ = names
    assert not has_python_udf(sorted_neighborhood_pairs(df, "name", "id"))
