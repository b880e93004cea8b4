"""Perceptual-hash near-duplicate detection via banded Hamming join.

The image-side twin of MinHash-LSH text dedup: a 64-bit perceptual hash
(phash — functions/images.py computes one per decoded payload; the crawl
engine lands it with every image row) is near-identical for re-encoded /
resized / slightly-cropped copies of the same picture, so image dedup at
corpus scale is "find all pairs with Hamming(phash_a, phash_b) <= t".

Reference analog: the reference keeps one file per content checksum
(find-duplicates.py:7-24 groups by exact checksum); phash banding is the
web-scale generalization to *near*-identical payloads, exactly as
MinHash-LSH generalizes the text checksum.

Scale design (the 100-TB question):
  * An all-pairs Hamming self-join is O(n^2) and never acceptable. Split
    the hash into ``n_bands`` disjoint bit-bands and equi-join on
    (band_index, band_value): by pigeonhole, two hashes with
    Hamming <= n_bands - 1 agree EXACTLY on at least one band, so for
    ``max_hamming < n_bands`` the banded plan returns the *identical* pair
    set as brute force — this is exact, not approximate, LSH.
  * The only shuffle keys on (band, band_value); its cardinality is ~n x
    n_bands and hot buckets (constant-color thumbnails, tracking pixels)
    are the skew risk — ``max_band_freq`` drops buckets larger than the
    cutoff (the stop-shingle move from dedup.py's Jaccard join; dropping a
    bucket of k rows kills O(k^2) candidate pairs). With the cutoff the
    result is a documented under-approximation; None keeps exactness.
  * Candidate pairs are deduplicated on (id_a, id_b) BEFORE the popcount
    filter so a pair agreeing on several bands is scored once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: 4 bands x 15 bits covers the 60-bit hashes shared with the DuckDB oracle
#: (functions/text._hash60 / dedup._hash60); real 64-bit phashes use 4 x 16.
DEFAULT_BANDS = 4
DEFAULT_BAND_BITS = 15


def phash_neardup_pairs(
    df: DataFrame,
    phash_col: str = "phash",
    key_col: str = "doc_id",
    max_hamming: int = 3,
    n_bands: int = DEFAULT_BANDS,
    band_bits: int = DEFAULT_BAND_BITS,
    max_band_freq: int | None = None,
) -> DataFrame:
    """All (id_a, id_b, hamming) pairs with Hamming distance <= max_hamming.

    Exact (brute-force-equal) whenever ``max_hamming < n_bands``; raises
    otherwise rather than silently under-reporting pairs.
    """
    if max_hamming >= n_bands:
        raise ValueError(
            f"banded join is only exact for max_hamming < n_bands "
            f"(got max_hamming={max_hamming}, n_bands={n_bands}); "
            f"raise n_bands or use more/narrower bands"
        )
    key, ph = F.col(key_col), F.col(phash_col)
    mask = (1 << band_bits) - 1
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.shiftright(ph, b * band_bits).bitwiseAND(F.lit(mask)).alias("bv"),
            )
            for b in range(n_bands)
        ]
    )
    exploded = df.select(
        key.alias("id"), ph.alias("ph"), F.explode(bands).alias("bk")
    ).select("id", "ph", F.col("bk.band").alias("band"), F.col("bk.bv").alias("bv"))
    if max_band_freq is not None:
        # stop-bucket cutoff: a window count would shuffle the same rows
        # twice; an aggregated semi-side stays tiny (distinct hot keys) and
        # broadcasts, so the filter costs no extra exchange of the big side
        hot = (
            exploded.groupBy("band", "bv")
            .count()
            .filter(F.col("count") > max_band_freq)
            .select("band", "bv")
        )
        exploded = exploded.join(F.broadcast(hot), ["band", "bv"], "left_anti")
    a = exploded.alias("a")
    b = exploded.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bv") == F.col("b.bv"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.ph").alias("ph_a"),
            F.col("b.ph").alias("ph_b"),
        )
        .distinct()
    )
    return pairs.select(
        "id_a",
        "id_b",
        F.bit_count(F.col("ph_a").bitwiseXOR(F.col("ph_b"))).alias("hamming"),
    ).filter(F.col("hamming") <= max_hamming)


def _banded(df: DataFrame, key_col: str, phash_col: str, n_bands: int, band_bits: int) -> DataFrame:
    """(id, ph, band, bv) — one row per (row, band)."""
    key, ph = F.col(key_col), F.col(phash_col)
    mask = (1 << band_bits) - 1
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.shiftright(ph, b * band_bits).bitwiseAND(F.lit(mask)).alias("bv"),
            )
            for b in range(n_bands)
        ]
    )
    return df.select(key.alias("id"), ph.alias("ph"), F.explode(bands).alias("bk")).select(
        "id", "ph", F.col("bk.band").alias("band"), F.col("bk.bv").alias("bv")
    )


def phash_screen(
    batch: DataFrame,
    corpus: DataFrame,
    phash_col: str = "phash",
    key_col: str = "image_id",
    max_hamming: int = 3,
    n_bands: int = DEFAULT_BANDS,
    band_bits: int = DEFAULT_BAND_BITS,
) -> DataFrame:
    """Screen a NEW image batch against the existing corpus index: flag each
    batch row that has ANY corpus image within ``max_hamming`` (is_new =
    false). The crawl-loop analog of dedup.incremental_lsh_dedup for the
    image axis — run between fetch and landing so near-identical re-crawled
    images never enter the corpus.

    Exactness: same pigeonhole argument as phash_neardup_pairs (raises for
    max_hamming >= n_bands). Scale: the corpus side reduces to its banded
    index — at 10^10 images that table is built ONCE, stored bucketed by
    (band, bv), and each crawl batch's screen is a co-located equi-join of
    the (small) batch against matching buckets only; the popcount filter
    then runs on candidates, and ONE aggregate per batch id flags hits.
    The corpus never re-shuffles per batch.
    """
    if max_hamming >= n_bands:
        raise ValueError(
            f"banded screen is only exact for max_hamming < n_bands "
            f"(got max_hamming={max_hamming}, n_bands={n_bands})"
        )
    b = _banded(batch, key_col, phash_col, n_bands, band_bits)
    c = _banded(corpus, key_col, phash_col, n_bands, band_bits).select(
        F.col("id").alias("c_id"), F.col("ph").alias("c_ph"), "band", "bv"
    )
    hits = (
        b.join(c, ["band", "bv"])
        .filter(
            F.bit_count(F.col("ph").bitwiseXOR(F.col("c_ph"))) <= max_hamming
        )
        .select("id")
        .distinct()
        .withColumn("hit", F.lit(True))
    )
    return (
        batch.select(F.col(key_col).alias("image_id"), F.col(phash_col).alias("phash"))
        .join(hits, F.col("image_id") == hits["id"], "left")
        .select("image_id", F.coalesce(~F.col("hit"), F.lit(True)).alias("is_new"))
    )
