"""Sequence packing — concat-and-chunk documents into training windows.

GPT-style pretraining consumes fixed-length token windows: documents are
concatenated in a deterministic order and cut every ``seq_len`` tokens
(documents may straddle a cut — that IS the standard recipe). This
operator assigns every document its (bucket, seq_idx, offset) placement
without materializing any concatenation: one prefix-sum window per
bucket.

Scale design: a single global ordering would be one giant window
partition (serial at any scale). Packing instead runs per hash BUCKET —
each bucket packs independently and in parallel, and a training reader
consumes buckets as independent shards. At 100 TB that is exactly the
distributed packing layout (shard-local concat order); the only shuffle
is the bucket window's exchange, and per-row state is one running sum.

Beyond-reference operator (reference stores one file per contract,
never builds training batches).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sequence_pack(
    docs: DataFrame,
    seq_len: int = 2048,
    n_buckets: int = 16,
    key_col: str = "doc_id",
    tokens_col: str = "n_tokens",
) -> DataFrame:
    """Assign each doc its packed placement: (bucket, seq_idx, offset).

    bucket   = key % n_buckets (deterministic shard)
    order    = md5(key) within bucket (deterministic pseudo-shuffle)
    seq_idx  = which seq_len-window the doc STARTS in
    offset   = token offset of the doc's start within that window
    """
    key = F.col(key_col)
    bucket = (key % n_buckets).cast("int")
    w = (
        Window.partitionBy("bucket")
        .orderBy(F.md5(key.cast("string")), key)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    with_bucket = docs.select(
        key.alias("doc_id"),
        F.col(tokens_col).cast("long").alias("n_tokens"),
        bucket.alias("bucket"),
    )
    cum_before = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    return with_bucket.select(
        "doc_id",
        "bucket",
        "n_tokens",
        F.floor(cum_before / seq_len).cast("long").alias("seq_idx"),
        (cum_before % seq_len).cast("long").alias("offset"),
    )


def shard_assign(
    docs: DataFrame,
    n_shards: int = 64,
    band_width: int = 512,
    n_salts: int = 64,
    key_col: str = "doc_id",
    tokens_col: str = "n_tokens",
) -> DataFrame:
    """Deterministic size-balanced output-shard assignment.

    Writing a curated corpus as N shards wants near-equal bytes per
    shard (training readers stream shards whole; a fat shard is a
    straggler for every epoch). Plain ``hash(key) % N`` balances counts,
    not bytes — a handful of mega-documents skews it. This operator
    band-stratifies by size then round-robins each stratum over the
    shards: every shard receives (within one) the same NUMBER of docs
    from every size class, so per-shard bytes are balanced to band
    granularity with no global sort.

    Scale design: the obvious rank-all-docs-by-size window is ONE global
    partition — serial at any scale. Bands alone don't fix it (band
    cardinality is dozens), so each band is salted into ``n_salts``
    sub-groups by a key-derived (hence deterministic) salt: the window
    runs per (band, salt) — parallelism = bands x salts, each group
    corpus/(bands*salts) rows. The round-robin start is offset by the
    salt so partially-filled final cycles don't all favor shard 0.
    """
    key = F.col(key_col)
    band = F.expr(
        f"CAST({tokens_col} AS BIGINT) DIV {int(band_width)}"
    )  # integer DIV — no double-divide-then-cast boundary risk
    salt = (key % n_salts).cast("int")
    w = Window.partitionBy("band", "salt").orderBy(
        F.md5(key.cast("string")), key
    )
    return (
        docs.select(
            key.alias("doc_id"),
            F.col(tokens_col).cast("long").alias("n_tokens"),
            band.alias("band"),
            salt.alias("salt"),
        )
        .withColumn("rn", F.row_number().over(w))
        .select(
            "doc_id",
            "n_tokens",
            "band",
            ((F.col("rn") - 1 + F.col("salt")) % n_shards)
            .cast("int")
            .alias("shard"),
        )
    )
