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


def warc_pack(
    records: DataFrame,
    segment_bytes: int = 1 << 30,
    key_col: str = "url_key",
    bytes_col: str = "n_bytes",
    shard_col: str = "shard",
) -> DataFrame:
    """Assign each landed record its WARC segment file and byte offset.

    Common-Crawl-style layout: a crawl epoch's landing is published as
    numbered WARC segment files of ~``segment_bytes`` each, per output
    shard. A record belongs to segment ``floor(cum_before / segment_bytes)``
    where ``cum_before`` is the total bytes of records ahead of it in the
    shard's deterministic order — the greedy writer rule "close the file
    once it reaches the target size": records never split, a segment may
    overrun by at most one record. The reference's closest analog is one
    file per contract (contract_crawler.py:242-248) — no segment packing
    exists there; this is the layout a 100-TB landing actually ships.

    Returns ``(url_key, shard, n_bytes, seg_idx, seg_offset)`` — enough for
    a reader to seek any record: ``open(f"{shard}-{seg_idx}.warc");
    seek(seg_offset)``.

    Scale design — ONE exchange (hash on shard): the naive seg_offset is
    ``cum_before - min(cum_before) OVER (shard, seg_idx)``, a second window
    over a DIFFERENT partitioning that Catalyst plans as a second
    Exchange+Sort. Because seg_idx is monotone in the within-shard order,
    the segment's base offset is equally a running max — over the SAME
    shard window — of cum_before sampled at segment-boundary rows, so all
    three window expressions share one partitioning: the physical plan is
    a single Exchange(shard) + Sort + chained Window operators. The DuckDB
    oracle intentionally uses the naive two-window formulation, so the
    rewrite itself is what the correctness row checks.

    Determinism (r4 ADVICE): the within-shard sort key is
    ``(url_key, n_bytes)`` — every column that feeds the running sums —
    so duplicate url_keys in a shard cannot make cum_before/seg_offset
    depend on partition-merge order: ties are only possible between rows
    identical in ALL projected columns, and permuting identical rows
    yields the identical output multiset.
    """
    w = Window.partitionBy("shard").orderBy("url_key", "n_bytes")
    w_cum = w.rowsBetween(Window.unboundedPreceding, -1)
    w_run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    nb = F.col(bytes_col).cast("long")
    df = (
        records.select(
            F.col(key_col).alias("url_key"),
            F.col(shard_col).alias("shard"),
            nb.alias("n_bytes"),
        )
        .withColumn(
            "_cum_before", F.coalesce(F.sum("n_bytes").over(w_cum), F.lit(0))
        )
        .withColumn(
            "seg_idx",
            F.floor(F.col("_cum_before") / F.lit(int(segment_bytes))).cast(
                "long"
            ),
        )
    )
    # cum_before at segment-boundary rows only (first row is a boundary:
    # lag default -1 never equals a real seg_idx), propagated forward as a
    # running max — monotonicity of both seg_idx and _cum_before makes this
    # exactly min(_cum_before) per (shard, seg_idx) without re-partitioning.
    boundary = F.when(
        F.col("seg_idx") != F.lag("seg_idx", 1, -1).over(w),
        F.col("_cum_before"),
    )
    return df.select(
        "url_key",
        "shard",
        "n_bytes",
        "seg_idx",
        (F.col("_cum_before") - F.max(boundary).over(w_run))
        .cast("long")
        .alias("seg_offset"),
    )


def shard_skew_report(
    assigned: DataFrame,
    shard_col: str = "shard",
    tokens_col: str = "n_tokens",
) -> DataFrame:
    """Balance audit for an output sharding: per-shard load vs the mean.

    The acceptance check for shard_assign (and any layout decision): a
    training reader streams shards whole, so the epoch's wall is the
    FATTEST shard — this reports each shard's document count, token sum,
    and permille deviation from the mean token load, plus an ``ok`` flag
    at ±10% (integer cross-multiplied: ``|1000·t·S − 1000·T| ≤ 100·T``
    with S shards and T total — exact, no float boundary).

    Returns (shard, n_docs, n_tokens, dev_milli, ok).

    Scale notes: one map-side-combinable hash agg to shard cardinality;
    the mean rides a broadcast of the single-row total (no window over
    the corpus). Runs over the full corpus assignment in one pass.
    """
    per = assigned.groupBy(shard_col).agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum(F.col(tokens_col).cast("long")).alias("n_tokens"),
    )
    tot = per.agg(
        F.sum("n_tokens").alias("_t"), F.count("*").alias("_s")
    )
    j = per.crossJoin(F.broadcast(tot))
    dev = F.expr("(1000 * n_tokens * _s - 1000 * _t) DIV _t")
    return j.select(
        F.col(shard_col).alias("shard"),
        "n_docs",
        "n_tokens",
        dev.cast("long").alias("dev_milli"),
        (
            F.abs(1000 * F.col("n_tokens") * F.col("_s") - 1000 * F.col("_t"))
            <= 100 * F.col("_t")
        ).alias("ok"),
    )


def zorder_key(
    df: DataFrame,
    col_a: str,
    col_b: str,
    bits: int = 16,
) -> DataFrame:
    """Z-order (Morton) interleave of two integer columns — the
    multi-dimensional clustering key lakehouse layouts sort by so file
    min/max stats prune on BOTH dimensions (Delta/Iceberg OPTIMIZE
    ZORDER). Sorting the landing by ``zorder_key(domain_hash, ts_bucket)``
    gives per-domain AND per-time file skipping from one sort order —
    at 10^10 rows that is the difference between touching one file and
    touching every file for a (domain, time-range) probe.

    Returns the df with a ``zkey`` column: bit i of each input lands at
    output bit 2i / 2i+1. Inputs are masked to ``bits`` low bits (caller
    buckets/hashes first — the key is a LAYOUT artifact, not an
    identifier). Pure codegen: the interleave is an unrolled
    shift/mask/or expression tree, no UDF, no shuffle; the oracle runs
    the same unrolled arithmetic.
    """
    a = f"(CAST({col_a} AS BIGINT) & {(1 << bits) - 1})"
    b = f"(CAST({col_b} AS BIGINT) & {(1 << bits) - 1})"
    terms = []
    for i in range(bits):
        terms.append(f"((({a} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({b} >> {i}) & 1) << {2 * i + 1})")
    return df.withColumn("zkey", F.expr(" + ".join(terms)).cast("long"))
