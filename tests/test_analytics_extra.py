"""Unit tests for the round-1 coverage additions: sessionization,
winnowing fingerprints, embedding-cosine near-dup, salted aggregation."""

from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F

from etherscan_contract_crawler_spark.analytics.sessions import session_stats, sessionize
from etherscan_contract_crawler_spark.analytics.similarity import cosine_neardup_pairs
from etherscan_contract_crawler_spark.analytics.text import winnow_fingerprints
from etherscan_contract_crawler_spark.operators.skew import salted_agg


def test_sessionize_gap_semantics(spark):
    t0 = datetime(2026, 1, 1, 12, 0, 0)
    rows = [
        ("u1", 1, t0),
        ("u1", 2, t0 + timedelta(seconds=100)),      # same session
        ("u1", 3, t0 + timedelta(seconds=100 + 1801)),  # gap > 1800 -> new
        ("u2", 4, t0),                                # separate user
    ]
    df = spark.createDataFrame(rows, "user_id string, event_id long, ts timestamp")
    got = {
        r["event_id"]: (r["session_idx"], r["is_new_session"])
        for r in sessionize(df).collect()
    }
    assert got == {1: (1, 1), 2: (1, 0), 3: (2, 1), 4: (1, 1)}
    stats = {
        (r["user_id"], r["session_idx"]): (r["n_events"], r["duration_s"])
        for r in session_stats(df).collect()
    }
    assert stats[("u1", 1)] == (2, 100)
    assert stats[("u1", 2)] == (1, 0)
    assert stats[("u2", 1)] == (1, 0)


def test_sessionize_gap_boundary_inclusive(spark):
    # gap of exactly 1800s does NOT start a new session (strict >)
    t0 = datetime(2026, 1, 1)
    df = spark.createDataFrame(
        [("u", 1, t0), ("u", 2, t0 + timedelta(seconds=1800))],
        "user_id string, event_id long, ts timestamp",
    )
    out = sessionize(df).collect()
    assert {r["session_idx"] for r in out} == {1}


def test_winnow_shared_substring_overlap(spark):
    shared = "the quick brown fox jumps over the lazy dog near the river bank"
    docs = spark.createDataFrame(
        [
            (1, f"PREFIX AAA {shared} SUFFIX BBB"),
            (2, f"zzz completely different lead-in {shared}"),
            (3, "nothing in common with the others at all whatsoever xyzzy"),
        ],
        "doc_id long, text string",
    )
    rows = winnow_fingerprints(docs, k=8, w=4).collect()
    sets = {}
    for r in rows:
        sets.setdefault(r["doc_id"], set()).add(r["fp"])
    # docs 1 and 2 share a long substring -> many shared fingerprints
    assert len(sets[1] & sets[2]) >= 5
    # doc 3 shares (almost) nothing with doc 1
    assert len(sets[1] & sets[3]) <= 1


def test_winnow_offset_invariance(spark):
    body = "a stable payload string that is long enough to window over properly"
    docs = spark.createDataFrame(
        [(1, body), (2, "shift " + body)], "doc_id long, text string"
    )
    rows = winnow_fingerprints(docs, k=8, w=4).collect()
    sets = {}
    for r in rows:
        sets.setdefault(r["doc_id"], set()).add(r["fp"])
    # winnowing selects local minima, so interior fingerprints survive a shift
    inter = sets[1] & sets[2]
    assert len(inter) / len(sets[1]) > 0.5


def test_cosine_neardup_finds_planted_copies(spark):
    import random

    rng = random.Random(7)
    base = [[rng.uniform(-1, 1) for _ in range(16)] for _ in range(20)]
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(base)]
    # plant: id 100+i = scaled copy of i for i in {0, 5}
    for i in (0, 5):
        rows.append((100 + i, [float(2 * x) for x in base[i]]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    pairs = {(r["id_a"], r["id_b"]) for r in cosine_neardup_pairs(df, 0.99).collect()}
    assert (0, 100) in pairs and (5, 105) in pairs
    # no false positives among random 16-dim vectors at 0.99
    assert all(b - a == 100 for a, b in pairs)


def test_salted_agg_matches_plain_agg(spark):
    df = spark.range(0, 10_000).select(
        (F.col("id") % 3).alias("k"), F.col("id").alias("v")
    )
    plain = {
        r["k"]: (r["n"], r["s"])
        for r in df.groupBy("k").agg(F.count("*").alias("n"), F.sum("v").alias("s")).collect()
    }
    salted = {
        r["k"]: (r["n"], r["s"])
        for r in salted_agg(
            df, ["k"], "v",
            {"n": (F.count("*"), F.sum("n")), "s": (F.sum("v"), F.sum("s"))},
            n_salts=8,
        ).collect()
    }
    assert plain == salted


def test_salted_agg_plan_has_two_aggregations(spark):
    df = spark.range(0, 100).select((F.col("id") % 2).alias("k"), F.col("id").alias("v"))
    out = salted_agg(df, ["k"], "v", {"n": (F.count("*"), F.sum("n"))})
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.lower().count("hashaggregate") >= 2


@pytest.mark.slow
def test_ann_lsh_recall_floor(spark):
    """r1 VERDICT #6: pin ANN recall so future changes can't silently degrade
    it. The sf0.001 embeddings are near-random (weakly-similar neighbors) —
    the WORST case for hyperplane LSH — so these floors are conservative;
    clustered real embeddings sit far above them. Deterministic: planes are
    xxhash64-derived from the seed, data is fixed."""
    from etherscan_contract_crawler_spark.analytics.similarity import (
        cosine_topk,
        lsh_bucket_topk,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = emb.limit(20)
    exact = {(r.query_id, r.neighbor_id) for r in cosine_topk(emb, q, k=5).collect()}

    def recall(planes, tables):
        approx = {
            (r.query_id, r.neighbor_id)
            for r in lsh_bucket_topk(emb, q, k=5, n_planes=planes, n_tables=tables).collect()
        }
        return len(exact & approx) / len(exact)

    assert recall(4, 16) >= 0.75  # high-recall configuration (measured 0.91)
    assert recall(6, 16) >= 0.50  # default configuration (measured 0.59)


def test_jaccard_stop_shingle_cutoff(spark):
    """max_doc_freq drops ubiquitous shingles from the inverted index (the
    quadratic-bucket guard): genuinely-similar pairs survive, pairs related
    only through the stop-shingle don't re-enter, and the jaccard reported
    under the cutoff never exceeds the exact value (lower bound)."""
    from etherscan_contract_crawler_spark.analytics.dedup import jaccard_pairs

    stop = " the quick brown fox jumps over dog"  # shared by every doc
    rows = [(i, f"unique text number {i} alpha beta gamma{stop}") for i in range(20)]
    rows.append((100, "unique text number 0 alpha beta gamma" + stop))  # ~dup of 0
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    exact = {(r.doc_a, r.doc_b): r.jaccard for r in jaccard_pairs(docs, threshold=0.1).collect()}
    cut = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in jaccard_pairs(docs, threshold=0.1, max_doc_freq=5).collect()
    }
    assert (0, 100) in exact and exact[(0, 100)] == 1.0  # true near-dup
    assert (0, 100) in cut  # survives: its unique shingles are below the cutoff
    for pair, j in cut.items():
        assert j <= exact.get(pair, 1.0) + 1e-9  # lower bound under cutoff
    # pairs similar ONLY through stop-shingles are pruned from the index join
    assert len(cut) < len(exact)


@pytest.mark.slow
def test_ann_ivf_recall_floor_and_partition(spark):
    """IVF-flat: recall floors on the worst-case random fixture, and the
    coarse quantizer is a true partition (every vector in exactly one cell)."""
    from etherscan_contract_crawler_spark.analytics.similarity import (
        _nearest_centroid,
        cosine_topk,
        ivf_centroids,
        ivf_topk,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = emb.limit(20)
    exact = {(r.query_id, r.neighbor_id) for r in cosine_topk(emb, q, k=5).collect()}

    def recall(nc, npb):
        approx = {
            (r.query_id, r.neighbor_id)
            for r in ivf_topk(emb, q, k=5, n_centroids=nc, n_probe=npb).collect()
        }
        return len(exact & approx) / len(exact)

    assert recall(16, 8) >= 0.70  # measured 0.84
    assert recall(16, 4) >= 0.40  # measured 0.56 — half the probe cost

    cents = ivf_centroids(emb, n_centroids=16)
    cells = _nearest_centroid(emb, cents, "vec_id", "embedding")
    n = emb.count()
    assert cells.count() == n  # every vector assigned
    assert cells.select("_aid").distinct().count() == n  # exactly once


def test_neardup_components_chain_and_islands(spark):
    """Min-label propagation: a 4-chain needs multi-hop rounds; islands keep
    their own label; a separate pair stays separate."""
    from etherscan_contract_crawler_spark.analytics.dedup import neardup_components

    vertices = spark.createDataFrame([(i,) for i in [1, 2, 3, 4, 7, 10, 11]], "doc_id long")
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], "doc_a long, doc_b long"
    )
    got = {r.doc_id: r.component for r in neardup_components(vertices, edges).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 7: 7, 10: 10, 11: 10}


@pytest.mark.slow
def test_neardup_components_long_chain_converges_fast(spark):
    """A 1000-vertex path graph (diameter 999) must converge within the
    default 25-round budget — pointer jumping makes rounds O(log n); plain
    one-hop propagation would need ~1000 rounds and (since r3) raise
    instead of silently returning wrong labels (r2 ADVICE)."""
    from etherscan_contract_crawler_spark.analytics.dedup import neardup_components

    n = 1000
    vertices = spark.createDataFrame([(f"d{i:04d}",) for i in range(n)], "doc_id string")
    edges = spark.createDataFrame(
        [(f"d{i:04d}", f"d{i + 1:04d}") for i in range(n - 1)],
        "doc_a string, doc_b string",
    )
    got = {r.doc_id: r.component for r in neardup_components(vertices, edges).collect()}
    assert len(got) == n
    assert set(got.values()) == {"d0000"}, "single chain must collapse to one component"


def test_decontam_flags_planted_overlap(spark):
    """A train doc sharing a 5-gram with an eval doc (doc_id % 97 == 0) is
    flagged; disjoint docs audit to n_shared == 0; eval docs are excluded
    from the output."""
    from etherscan_contract_crawler_spark.analytics.decontam import decontaminate

    eval_text = "the quick brown fox jumps over the lazy dog tonight"
    docs = spark.createDataFrame(
        [
            (0, eval_text),  # eval member (0 % 97 == 0)
            (1, "prefix words the quick brown fox jumps and more text here"),
            (2, "completely unrelated content about spark shuffles and joins"),
            (97, "another eval member with its own unique benchmark phrasing"),
            (3, "another eval member with its own unique benchmark phrasing"),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in decontaminate(docs, n=5, eval_mod=97).collect()}
    assert set(got) == {1, 2, 3}, "eval docs must not appear in the audit"
    assert got[1].contaminated and got[1].n_shared == 1
    assert not got[2].contaminated and got[2].n_shared == 0
    assert got[3].contaminated  # exact copy of eval doc 97
    assert got[3].n_shared == got[3].n_shingles


def test_decontam_broadcasts_eval_side(spark):
    """The scale contract: the eval shingle set must ride a broadcast —
    the corpus shingles never shuffle on shingle."""
    from etherscan_contract_crawler_spark.analytics.decontam import decontaminate

    docs = spark.createDataFrame(
        [(i, f"doc {i} filler words padding out five grams {i}") for i in range(20)],
        "doc_id long, text string",
    )
    plan = decontaminate(docs, n=5)._jdf.queryExecution().executedPlan().toString()
    # broadcast LEFT join marks hits in-stream; both counts come from ONE
    # doc_id aggregation — no shingle-keyed shuffle of the corpus side
    assert "BroadcastHashJoin" in plan and "LeftOuter" in plan


def test_embedding_centroid_math(spark, tmp_path):
    """Centroid = per-position mean — exercised through the SHIPPED
    embedding_centroids query (not a private re-implementation, so a
    regression in __spark_entry__ fails here, not only at the oracle)."""
    import __spark_entry__ as entry_mod

    e = spark.createDataFrame(
        [
            (1, [1.0, 2.0, 3.0], 0),
            (2, [3.0, 2.0, 1.0], 0),
            (3, [10.0, 0.0, -10.0], 1),
        ],
        "vec_id long, embedding array<float>, label int",
    )
    e.write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))
    out = entry_mod.queries()["embedding_centroids"](spark, str(tmp_path)).collect()
    got = {(r.label, r.pos): r.c for r in out}
    assert got[(0, 1)] == 2.0 and got[(0, 2)] == 2.0 and got[(0, 3)] == 2.0
    assert got[(1, 1)] == 10.0 and got[(1, 3)] == -10.0
    assert len(got) == 6


def test_repetition_stats_counts_and_short_doc_guard(spark):
    """Duplicate-3-gram fraction on a hand-computed fixture; a doc with
    fewer than 3 words must yield zero grams (Spark's sequence(1,0) is
    descending, not empty — the guard this pins)."""
    from etherscan_contract_crawler_spark.analytics.text import repetition_stats

    docs = spark.createDataFrame(
        [
            (1, "a b c a b c a b c"),  # 9 words, 7 grams, 3 distinct
            (2, "all words distinct here now"),  # 5 words, 3 grams, 3 distinct
            (3, "two words"),  # too short: 0 grams
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in repetition_stats(docs, n=3).collect()}
    assert (got[1].n_words, got[1].n_grams, got[1].n_distinct) == (9, 7, 3)
    assert got[1].rep_ratio == round(1 - 3 / 7, 6)
    assert (got[2].n_grams, got[2].n_distinct, got[2].rep_ratio) == (3, 3, 0.0)
    assert (got[3].n_grams, got[3].n_distinct, got[3].rep_ratio) == (0, 0, 0.0)


def test_shingle_df_short_doc_yields_no_shingles(spark):
    """shingle_df must not fabricate partial shingles for docs shorter
    than the shingle width (the sequence(1,0)-descending trap)."""
    from etherscan_contract_crawler_spark.analytics.dedup import shingle_df

    docs = spark.createDataFrame(
        [(1, "only two"), (2, "one two three four")], "doc_id long, text string"
    )
    got = shingle_df(docs, n=3).collect()
    assert {r.doc_id for r in got} == {2}
    assert len(got) == 2  # "one two three", "two three four"


def test_corpus_curation_flags_consistent(spark):
    """Flagship curation chain (r4): one row per doc, keep == conjunction of
    the stage flags, non-canonical docs are never near-dup representatives,
    eval docs are never kept."""
    import __spark_entry__ as entry_mod

    sf = "/root/testdata/sf0.001"
    n_docs = spark.read.parquet(f"{sf}/documents.parquet").count()
    rows = entry_mod.queries()["corpus_curation"](spark, sf).collect()
    assert len(rows) == n_docs
    assert len({r.doc_id for r in rows}) == n_docs
    for r in rows:
        assert r.keep == (
            r.is_canonical and r.is_neardup_rep and not r.is_eval
            and not r.contaminated and r.retained and r.sampled
        )
        if not r.is_canonical:
            assert not r.is_neardup_rep
        if r.is_eval:
            assert not r.keep
    # the chain must actually filter (and not filter everything)
    kept = sum(1 for r in rows if r.keep)
    assert 0 < kept < n_docs


def test_ann_recall_gate_rows(spark):
    """The driver-visible ANN quality gates must report recall >= floor on
    the sf0.001 fixture (deterministic — hash-derived planes/centroids)."""
    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    for name in ("ann_lsh_recall", "ann_ivf_recall"):
        [row] = qs[name](spark, "/root/testdata/sf0.001").collect()
        assert row.recall_ge_floor, f"{name}: recall below pinned floor"
        assert row.k == 5 and row.n_queries > 0
