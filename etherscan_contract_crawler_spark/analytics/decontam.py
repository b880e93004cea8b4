"""Benchmark decontamination: exact n-gram overlap of a training corpus
against a (small) evaluation set.

The standard LLM-pipeline safeguard (GPT-3 appendix C / PaLM / Llama style):
a training document is contaminated when it shares >= k exact word n-grams
with any benchmark document. The web-scale shape matters more than the rule:

* the EVAL side is tiny (benchmarks are KBs; the corpus is TBs), so its
  distinct-shingle set rides a **broadcast** — the train side's shingles
  stream through a broadcast semi-join + map-side partial count and the
  only shuffle is the final per-doc aggregation on ``doc_id``, never a
  shingle-keyed exchange of the whole corpus;
* shingling reuses ``dedup.shingle_df`` (JVM-side ``sequence``/``transform``
  built-ins — no Python in the hot path), so the scan reads only
  (doc_id, text).

Reference analog: the crawler's own seen-set discipline — "never fetch what
the reference set already has" (blockchain-multichain-monitor.py:83-85) —
applied to corpus/benchmark membership instead of URLs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import shingle_df


def ngram_overlap(
    train: DataFrame,
    eval_docs: DataFrame,
    n: int = 5,
    key_col: str = "doc_id",
) -> DataFrame:
    """Per-train-document exact n-gram overlap against the eval set.

    Returns one row per train document:
    (doc_id, n_shingles, n_shared) — n_shared = how many of the doc's
    distinct word n-grams appear anywhere in the eval set. Docs with zero
    overlap are kept (left join) so the output is a full corpus audit.
    """
    from .dedup import gram_array, normalized_words

    train_sh = shingle_df(train, n=n, key_col=key_col)
    # eval side only needs per-SHINGLE distinctness — going through
    # shingle_df would pay a wasted (doc_id, shingle) distinct shuffle
    # before this one
    eval_sh = (
        eval_docs.select(normalized_words().alias("_w"))
        .select(F.explode(gram_array(n)).alias("shingle"))
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    # ONE pass: broadcast left join marks eval hits in-stream, then a single
    # doc_id aggregation produces both counts — the corpus's shingles never
    # shuffle on shingle and never get scanned twice (plan: the shingle
    # distinct + this agg are the only exchanges)
    return (
        train_sh.join(F.broadcast(eval_sh), "shingle", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_shingles"),
            F.count("_hit").alias("n_shared"),
        )
    )


def decontaminate(
    docs: DataFrame,
    n: int = 5,
    eval_mod: int = 97,
    min_shared: int = 1,
    key_col: str = "doc_id",
) -> DataFrame:
    """Split ``docs`` into train/eval by the deterministic membership rule
    ``doc_id % eval_mod == 0`` (stand-in for a real benchmark table), audit
    every train doc's n-gram overlap, and flag contamination."""
    eval_docs = docs.filter(F.col(key_col) % eval_mod == 0)
    train = docs.filter(F.col(key_col) % eval_mod != 0)
    audit = ngram_overlap(train, eval_docs, n=n, key_col=key_col)
    return audit.withColumn(
        "contaminated", (F.col("n_shared") >= min_shared).cast("boolean")
    )
