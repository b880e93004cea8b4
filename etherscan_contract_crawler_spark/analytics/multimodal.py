"""Image+caption pair curation gates — the LAION-style pre-training filter.

Operates on the engine's landing-table shape (BASELINE.json input_hint:
``image_id, bytes, w, h, fmt, caption, phash``) using only the cheap
metadata columns, so the scan never touches ``bytes``: column pruning
keeps a 100 TB pass at metadata-read speed (the binary column stays on
disk). Pure projection — zero shuffles, whole-stage codegen, the same
plan at any scale.

Gate semantics (first failing gate names the reject, CASE order fixed so
the reason is deterministic):
- too_small      min(w, h) < min_dim
- bad_aspect     w/h outside [1/max_aspect, max_aspect] — checked as
                 integer cross-multiplications, no float boundary flips
- bad_fmt        fmt not in the allowlist
- short_caption / long_caption   whitespace token count outside
                 [min_cap_tokens, max_cap_tokens] (CLIP encoders truncate
                 at 77 — overlong captions are silently lossy upstream)

Beyond-reference operator (the reference crawler lands raw payloads with
no curation pass — crawl_contracts.py writes verbatim).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FMT_ALLOWLIST = ["jpeg", "png", "webp"]


def pair_gates(
    pairs: DataFrame,
    min_dim: int = 64,
    max_aspect: int = 3,
    min_cap_tokens: int = 3,
    max_cap_tokens: int = 77,
    fmts: list[str] | None = None,
) -> DataFrame:
    """Per-pair keep/reject with a typed reject_reason (NULL = keep)."""
    fmts = FMT_ALLOWLIST if fmts is None else fmts
    w, h = F.col("w"), F.col("h")
    n_tok = F.size(F.split(F.trim(F.col("caption")), r"\s+"))
    reason = (
        F.when(F.least(w, h) < min_dim, F.lit("too_small"))
        .when(
            (w > max_aspect * h) | (h > max_aspect * w), F.lit("bad_aspect")
        )
        .when(~F.col("fmt").isin(fmts), F.lit("bad_fmt"))
        .when(n_tok < min_cap_tokens, F.lit("short_caption"))
        .when(n_tok > max_cap_tokens, F.lit("long_caption"))
    )
    return pairs.select(
        "image_id",
        "w",
        "h",
        "fmt",
        n_tok.cast("int").alias("n_cap_tokens"),
        reason.alias("reject_reason"),
        reason.isNull().alias("keep"),
    )


#: (bucket label, ratio in milli-units = 1000*w/h, target_w, target_h).
#: Targets are hand-picked multiples of 64 near a 512x512 pixel budget —
#: the SDXL-style bucket table; constants (not computed) so the engine and
#: any independent oracle agree bit-for-bit with zero float arithmetic.
ASPECT_BUCKETS: list[tuple[str, int, int, int]] = [
    ("1:2", 500, 384, 768),
    ("3:4", 750, 448, 576),
    ("1:1", 1000, 512, 512),
    ("4:3", 1333, 576, 448),
    ("2:1", 2000, 768, 384),
]


def aspect_bucket(
    images: DataFrame,
    buckets: list[tuple[str, int, int, int]] | None = None,
) -> DataFrame:
    """Assign each image the nearest aspect-ratio training bucket.

    Variable-aspect training (SDXL / NaViT style) batches images of like
    aspect together and resizes to a per-bucket target resolution; the
    curation pass must therefore stamp every image with its bucket and
    target dims. Nearest bucket = min |1000*w/h - bucket_milli| in
    integer milli-ratio space, ties to the SMALLER ratio — all integer,
    so no float boundary can flip an assignment between engines.

    Scale design: pure projection over metadata columns (bytes never
    read), zero shuffles, whole-stage codegen. The argmin is an
    ``array_min`` over a 5-element literal struct array — struct
    ordering compares (distance, ratio) lexicographically, encoding the
    tie-break for free; no join, no UDF.
    """
    bks = ASPECT_BUCKETS if buckets is None else buckets
    # integer floor-division (DIV), never double-divide-then-cast: a
    # correctly-rounded double quotient a hair under an integer can round
    # UP to it and flip the truncation vs an exact integer oracle
    rm = F.expr("(1000 * CAST(w AS BIGINT)) DIV h")
    cands = F.array(
        *[
            F.struct(
                F.abs(rm - F.lit(c)).alias("d"),
                F.lit(c).alias("ratio_milli"),
                F.lit(name).alias("bucket"),
                F.lit(tw).alias("target_w"),
                F.lit(th).alias("target_h"),
            )
            for (name, c, tw, th) in bks
        ]
    )
    best = F.array_min(cands)
    return images.select(
        "image_id",
        "w",
        "h",
        best["bucket"].alias("bucket"),
        best["ratio_milli"].cast("int").alias("ratio_milli"),
        best["target_w"].alias("target_w"),
        best["target_h"].alias("target_h"),
    )
