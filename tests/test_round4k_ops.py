"""Round-4 batch 8: pivot matrix + sketch gates — the fixed-vocabulary
pivot contract and the sketch-vs-exact bounds at adversarial shapes."""

from pyspark.sql import functions as F

import __spark_entry__ as entry


def test_fetch_status_matrix_zero_fills_absent_statuses(spark):
    # a domain with only 'F' rows must report 0 (not NULL) for O/P
    out = {
        r["domain"]: (r["n_failed"], r["n_ok"], r["n_pending"])
        for r in entry.QUERIES["fetch_status_matrix"](
            spark, "/root/testdata/sf0.001"
        ).collect()
    }
    assert all(all(v is not None for v in t) for t in out.values())
    totals = [sum(t) for t in out.values()]
    assert all(n > 0 for n in totals)


def test_hll_gate_holds_on_skewed_cardinalities(spark):
    # tiny group (1 distinct) and wide group (5000 distinct): the rsd=2%
    # sketch must stay within the 5% gate on both extremes
    rows = [("small", "only")] + [("big", f"w{i}") for i in range(5000)]
    df = spark.createDataFrame(rows, ["lang", "w"])
    agg = df.groupBy("lang").agg(
        F.count_distinct("w").alias("exact"),
        F.approx_count_distinct("w", rsd=0.02).alias("approx"),
    )
    for r in agg.collect():
        assert abs(r["approx"] - r["exact"]) <= 0.05 * r["exact"]


def test_quantile_sketch_gate_exact_on_small_groups(spark):
    # percentile_approx with a 10k accuracy budget is EXACT when the
    # group fits the sketch — pin that so the 5% gate never hides a
    # regression at test scale
    rows = [("l", float(x)) for x in range(1, 101)]
    df = spark.createDataFrame(rows, ["lang", "x"])
    got = df.groupBy("lang").agg(
        F.percentile_approx("x", 0.5, 10_000).alias("p50"),
        F.percentile_approx("x", 0.95, 10_000).alias("p95"),
    ).collect()[0]
    assert got["p50"] == 50.0  # nearest-rank ceil(100*.5)=50
    assert got["p95"] == 95.0


def test_gate_rows_all_true_at_sf0001(spark):
    for q in ("hll_count_gate", "quantile_sketch_gate"):
        rows = entry.QUERIES[q](spark, "/root/testdata/sf0.001").collect()
        assert rows
        for r in rows:
            flags = [v for k, v in r.asDict().items()
                     if k.endswith("_ok") or k.startswith("within")]
            assert all(flags), (q, r)


def test_zorder_key_bit_interleave_and_locality(spark):
    from etherscan_contract_crawler_spark.analytics.packing import zorder_key

    rows = [(1, 0b1010, 0b0101), (2, 0, 0), (3, 65535, 65535), (4, 1, 0), (5, 0, 1)]
    df = spark.createDataFrame(rows, ["k", "a", "b"])
    out = {r["k"]: r["zkey"] for r in zorder_key(df, "a", "b").collect()}
    def morton(a, b):
        z = 0
        for i in range(16):
            z |= ((a >> i) & 1) << (2 * i)
            z |= ((b >> i) & 1) << (2 * i + 1)
        return z
    for k, a, b in rows:
        assert out[k] == morton(a, b)
    assert out[4] == 1 and out[5] == 2  # a -> even bits, b -> odd bits
    assert out[3] == (1 << 32) - 1


def test_zorder_key_masks_high_bits(spark):
    from etherscan_contract_crawler_spark.analytics.packing import zorder_key

    df = spark.createDataFrame([(1, 65536 + 3, 0)], ["k", "a", "b"])
    out = zorder_key(df, "a", "b").collect()[0]
    assert out["zkey"] == 0b101  # only the low 16 bits of a participate


def test_quality_calibration_bins_cover_and_sum(spark):
    rows = entry.QUERIES["quality_calibration"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert rows
    for r in rows:
        assert 0 <= r["decile"] <= 9
        assert 0.0 <= r["keep_rate"] <= 1.0
    # bin populations sum to the corpus size
    import duckdb
    n_docs = duckdb.sql(
        "SELECT count(*) FROM '/root/testdata/sf0.001/documents.parquet'"
    ).fetchone()[0]
    assert sum(r["n"] for r in rows) == n_docs


def test_dataset_card_dup_accounting(spark):
    rows = entry.QUERIES["dataset_card"](spark, "/root/testdata/sf0.001").collect()
    assert rows
    for r in rows:
        assert r["n_unique_docs"] <= r["n_docs"]
        assert r["n_docs_in_dup_groups"] <= r["n_docs"]
        # dup-group members + singletons account for every doc exactly
        n_singletons = r["n_unique_docs"] - (
            r["n_docs_in_dup_groups"] - (r["n_docs"] - r["n_unique_docs"])
        )
        assert n_singletons >= 0


def test_corpus_release_diff_accounting_identity(spark):
    import duckdb

    r = entry.QUERIES["corpus_release_diff"](
        spark, "/root/testdata/sf0.001"
    ).collect()[0]
    n = duckdb.sql(
        "SELECT count(*) FROM '/root/testdata/sf0.001/documents.parquet'"
    ).fetchone()[0]
    n_v1 = duckdb.sql(
        "SELECT count(*) FROM '/root/testdata/sf0.001/documents.parquet' "
        "WHERE doc_id % 7 <> 0"
    ).fetchone()[0]
    n_v2 = duckdb.sql(
        "SELECT count(*) FROM '/root/testdata/sf0.001/documents.parquet' "
        "WHERE doc_id % 11 <> 0"
    ).fetchone()[0]
    # every v1 doc is removed/changed/unchanged; every v2 doc is
    # added/changed/unchanged — both identities must hold exactly
    assert r["removed"] + r["changed"] + r["unchanged"] == n_v1
    assert r["added"] + r["changed"] + r["unchanged"] == n_v2
    assert r["changed"] > 0 and r["added"] > 0 and r["removed"] > 0


def test_crossmodal_recall_ranks_are_valid(spark):
    rows = entry.QUERIES["crossmodal_recall"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert rows
    n_caps = len(rows)
    for r in rows:
        assert 1 <= r["true_rank"] <= 100
        assert r["in_top5"] == (r["true_rank"] <= 5)
    # one row per caption, no caption lost by the rank filter
    assert len({r["pair_id"] for r in rows}) == n_caps
