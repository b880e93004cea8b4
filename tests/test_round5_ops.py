"""Round-5 operator pins: the adversarial-distribution fixtures (skewed
embeddings / Zipf groups / Pareto values) and the beyond-batch LSH legs of
the bounded-anchor eval queries.  The driver rows gate these at sf0.01;
these tests pin the fixture PROPERTIES the gates depend on (hash parity
with the oracle derivation, the intended skew shape, floor headroom at the
smallest scale) so a fixture drift can't silently defang a gate."""

import importlib.util
import os

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"

_spec = importlib.util.spec_from_file_location(
    "spark_entry_r5", os.path.join(os.path.dirname(__file__), "..", "__spark_entry__.py")
)
_entry = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_entry)


def test_h01_matches_duckdb_derivation(spark):
    # the oracle SQL re-derives _h01 via '0x'||substr(md5(..),1,15) — the
    # two must agree bit-for-bit or every skew oracle silently diverges
    import duckdb

    df = spark.range(50).select(
        (_entry._h01("zc", F.col("id")) * 1000000).cast("long").alias("h")
    )
    got = [r["h"] for r in df.collect()]
    want = [
        r[0]
        for r in duckdb.sql(
            "SELECT CAST(('0x' || substr(md5(concat_ws('|', 'zc', "
            "CAST(i AS VARCHAR))), 1, 15)) AS BIGINT) % 1000000 "
            "FROM range(50) t(i) ORDER BY i"
        ).fetchall()
    ]
    assert got == want


def test_skew_vecs_cluster_sizes_are_heavy_tailed(spark):
    e = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    sk = _entry._skew_vecs(e)
    # recover the cluster assignment the fixture used
    c = F.floor(F.lit(16) * F.pow(_entry._h01("zc", F.col("vec_id")), F.lit(3.0)))
    sizes = {
        r["c"]: r["n"]
        for r in e.select(c.alias("c")).groupBy("c").count().withColumnRenamed("count", "n").collect()
    }
    total = sum(sizes.values())
    # cubic inverse-CDF: cluster 0 holds (1/16)^(1/3) ~ 40% of vectors
    assert sizes[0] / total > 0.3
    assert sizes[0] > 4 * sizes.get(15, 1)
    # vectors keep the source dimensionality
    assert sk.select(F.size("embedding").alias("d")).distinct().count() == 1


def test_skew_recall_gates_have_headroom_at_smallest_scale(spark):
    # the driver gates at sf0.01; the same flag must hold at sf0.001 so the
    # floors are not razor-thin artifacts of one table size
    for name in (
        "ann_lsh_recall_skew",
        "ann_ivf_recall_skew",
        "hard_negative_recall",
        "crossmodal_recall_lsh",
    ):
        row = _entry.QUERIES[name](spark, SF_DIR).collect()[0]
        assert row["recall_ge_floor"] is True, name


def test_sketch_skew_gates_green_and_groups_skewed(spark):
    hll = _entry.QUERIES["hll_count_gate_skew"](spark, SF_DIR).collect()
    assert all(r["within_5pct"] for r in hll)
    counts = {r["grp"]: r["exact_distinct"] for r in hll}
    assert counts[0] == max(counts.values())  # fat head
    q = _entry.QUERIES["quantile_sketch_gate_skew"](spark, SF_DIR).collect()
    assert all(r["p50_ok"] and r["p95_ok"] for r in q)
    # Pareto values: p95 well separated from p50 (heavy tail, not uniform)
    assert all(r["exact_p95"] > 2 * r["exact_p50"] for r in q)


def test_hard_negative_lsh_never_returns_own_pair(spark):
    out = _entry.QUERIES["hard_negative_mine_lsh"](spark, SF_DIR)
    assert out.filter(F.col("anchor_pair_id") == F.col("neg_pair_id")).count() == 0
    # top-k contract: at most 5 negatives per anchor, ranks 1..5
    per = out.groupBy("anchor_pair_id").count().agg(F.max("count")).first()[0]
    assert per <= 5
    assert out.agg(F.min("rank"), F.max("rank")).first() == (1, 5)
