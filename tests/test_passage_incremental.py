"""Edge semantics for span-level passage dedup and incremental LSH dedup
(the parts the SQL oracles can't pin: within-doc repeats, empty survivors,
reassembly order, unshingleable docs)."""

from pyspark.sql import functions as F

from etherscan_contract_crawler_spark.analytics.dedup import (
    incremental_lsh_dedup,
    passage_dedup,
)


def _w(n, tag):
    """n distinct words tagged so chunks never collide by accident."""
    return " ".join(f"{tag}{i}" for i in range(n))


def test_passage_dedup_removes_shared_chunk_keeps_rest(spark):
    shared = _w(10, "s")
    a = shared + " " + _w(10, "a")  # chunk0 shared, chunk1 unique
    b = shared + " " + _w(10, "b")
    df = spark.createDataFrame([(1, a), (2, b)], "doc_id long, text string")
    got = {r["doc_id"]: r for r in passage_dedup(df).collect()}
    assert got[1]["n_chunks"] == 2 and got[1]["n_dup_chunks"] == 1
    assert got[1]["kept_text"] == _w(10, "a")
    assert got[2]["kept_text"] == _w(10, "b")


def test_passage_dedup_full_duplicate_empties_both(spark):
    t = _w(25, "x")  # 3 chunks (10+10+5)
    df = spark.createDataFrame([(1, t), (2, t)], "doc_id long, text string")
    for r in passage_dedup(df).collect():
        assert r["n_chunks"] == 3 and r["n_dup_chunks"] == 3
        assert r["kept_text"] == ""


def test_passage_dedup_within_doc_repeat_is_kept(spark):
    # same 10 words twice in ONE doc: df counts DISTINCT docs, so df=1 -> kept
    chunk = _w(10, "r")
    df = spark.createDataFrame([(1, chunk + " " + chunk)], "doc_id long, text string")
    r = passage_dedup(df).collect()[0]
    assert r["n_chunks"] == 2 and r["n_dup_chunks"] == 0
    assert r["kept_text"] == chunk + " " + chunk


def test_passage_dedup_reassembly_preserves_document_order(spark):
    # 4 chunks; chunks 0 and 2 are shared with doc 2 -> kept_text = chunk1 chunk3
    c = [_w(10, f"c{i}_") for i in range(4)]
    doc1 = " ".join(c)
    doc2 = c[0] + " " + _w(10, "z") + " " + c[2]
    df = spark.createDataFrame([(1, doc1), (2, doc2)], "doc_id long, text string")
    got = {r["doc_id"]: r for r in passage_dedup(df).collect()}
    assert got[1]["kept_text"] == c[1] + " " + c[3]
    assert got[1]["n_dup_chunks"] == 2


def test_passage_dedup_short_doc_single_partial_chunk(spark):
    df = spark.createDataFrame([(1, "only three words")], "doc_id long, text string")
    r = passage_dedup(df).collect()[0]
    assert r["n_chunks"] == 1 and r["kept_text"] == "only three words"


def test_incremental_dedup_rejects_mirror_admits_new(spark):
    corpus = spark.createDataFrame(
        [(1, _w(30, "p")), (2, _w(30, "q"))], "doc_id long, text string"
    )
    new = spark.createDataFrame(
        [(-1, _w(30, "p")),  # exact mirror of corpus doc 1 -> all bands collide
         (-2, _w(30, "n"))],  # disjoint vocabulary -> disjoint shingles
        "doc_id long, text string",
    )
    admitted = [r["doc_id"] for r in incremental_lsh_dedup(new, corpus).collect()]
    assert admitted == [-2]


def test_incremental_dedup_empty_batch_and_unshingleable_doc(spark):
    corpus = spark.createDataFrame([(1, _w(30, "p"))], "doc_id long, text string")
    empty = spark.createDataFrame([], "doc_id long, text string")
    assert incremental_lsh_dedup(empty, corpus).count() == 0
    # a 2-word doc has no 3-shingles, no signature, no band -> always admitted
    tiny = spark.createDataFrame([(-9, "two words")], "doc_id long, text string")
    assert [r["doc_id"] for r in incremental_lsh_dedup(tiny, corpus).collect()] == [-9]
