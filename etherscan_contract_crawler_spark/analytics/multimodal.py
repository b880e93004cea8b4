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
