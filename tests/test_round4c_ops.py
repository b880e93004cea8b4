"""Round-4 late additions, batch 3: SemDeDup cluster-pruning, product-
quantization codes, asymmetric containment, host language majority —
semantics the per-query DuckDB oracles can't pin alone (prune keeps the
lowest id, codebook members self-encode at distance 0, containment is
directional, majority tie-break)."""

from pyspark.sql import functions as F

from etherscan_contract_crawler_spark.analytics.dedup import containment_pairs
from etherscan_contract_crawler_spark.analytics.similarity import (
    pq_encode,
    semantic_dedup,
)


def _vecs(spark, rows):
    return spark.createDataFrame(rows, ["vec_id", "embedding"]).select(
        "vec_id", F.col("embedding").cast("array<float>").alias("embedding")
    )


def test_semantic_dedup_prunes_higher_id_copy_keeps_lowest(spark):
    # 4 orthogonal-ish directions + a scaled copy of vec 0 (cosine 1.0)
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.0, 1.0, 0.0, 0.0]),
        (2, [0.0, 0.0, 1.0, 0.0]),
        (3, [0.0, 0.0, 0.0, 1.0]),
        (10, [2.0, 0.0, 0.0, 0.0]),  # same direction as 0 -> same cluster
    ]
    out = {
        r.vec_id: (r.cid, r.pruned)
        for r in semantic_dedup(_vecs(spark, rows), n_centroids=4, threshold=0.95).collect()
    }
    assert len(out) == 5  # one row per input vector
    assert out[10] == (0, True)  # copy lands in cluster 0, pruned
    assert out[0] == (0, False)  # the lowest id of the dup pair survives
    assert not any(p for _, (c, p) in out.items() if _ != 10)  # only the copy


def test_semantic_dedup_cross_cluster_dup_not_pruned(spark):
    # identical vectors forced into DIFFERENT clusters are not compared:
    # pruning is within-cluster by design (the SemDeDup cost/recall trade)
    rows = [
        (0, [1.0, 0.0]),
        (1, [0.0, 1.0]),
        (2, [0.0, 1.0]),  # dup of 1, same cluster -> pruned
    ]
    out = {r.vec_id: r.pruned for r in semantic_dedup(_vecs(spark, rows), n_centroids=2, threshold=0.99).collect()}
    assert out == {0: False, 1: False, 2: True}


def test_pq_codebook_members_self_encode_at_zero(spark):
    rows = [
        (0, [1.0, 0.0, 2.0, 0.0]),
        (1, [0.0, 1.0, 0.0, 3.0]),
        (2, [0.9, 0.1, 1.8, 0.1]),  # nearest to 0 in both subspaces
    ]
    out = pq_encode(_vecs(spark, rows), m=2, n_codes=2).collect()
    by = {(r.vec_id, r.sub): (r.code, r.dist) for r in out}
    assert len(by) == 6  # 3 vectors x 2 subspaces
    # codebook members (with distinct subvectors) self-encode at distance 0
    for vid in (0, 1):
        for sub in (0, 1):
            assert by[(vid, sub)][0] == vid and by[(vid, sub)][1] == 0.0
    # vec 2: sub 0 = [0.9, 0.1] nearest [1, 0]; sub 1 = [1.8, 0.1] nearest [2, 0]
    assert by[(2, 0)][0] == 0
    assert by[(2, 1)][0] == 0


def test_pq_distance_tie_breaks_to_lowest_code(spark):
    # query subvector equidistant from both codewords -> code 0 wins
    rows = [
        (0, [1.0, 0.0]),
        (1, [-1.0, 0.0]),
        (5, [0.0, 5.0]),  # dist to both codewords identical in sub 0
    ]
    out = {r.vec_id: r.code for r in pq_encode(_vecs(spark, rows), m=1, n_codes=2).collect()}
    assert out[5] == 0


def test_containment_is_directional(spark):
    # short doc fully inside long doc: containment(short in long) = 1.0,
    # containment(long in short) < 1 — and Jaccard alone would miss it
    short = "alpha beta gamma delta epsilon"
    long = short + " and then a very long unique tail of many extra words"
    docs = spark.createDataFrame([(1, long), (2, short)], ["doc_id", "text"])
    out = {(r.doc_a, r.doc_b): r.containment for r in containment_pairs(docs, n=3, threshold=0.0).collect()}
    assert out[(2, 1)] == 1.0
    assert 0.0 < out[(1, 2)] < 1.0


def test_containment_stop_shingle_guard_is_lower_bound(spark):
    # with max_doc_freq=1 every shared shingle (df=2) is dropped from the
    # index -> no candidate pairs at all; sizes stay exact
    docs = spark.createDataFrame(
        [(1, "a b c d e"), (2, "a b c d e")], ["doc_id", "text"]
    )
    assert containment_pairs(docs, n=3, threshold=0.0, max_doc_freq=1).count() == 0
    full = containment_pairs(docs, n=3, threshold=0.0).collect()
    assert {(r.doc_a, r.doc_b, r.containment) for r in full} == {
        (1, 2, 1.0),
        (2, 1, 1.0),
    }


def test_kcenter_greedy_order_and_tiebreak(spark):
    from etherscan_contract_crawler_spark.analytics.sampling import kcenter_sample

    # line fixture: greedy = seed(0) -> farthest(3 at 10.1) -> middle(4 at
    # 5.0) -> then 1 and 2 tie at 0.1 -> lowest id wins
    rows = [
        (0, [0.0, 0.0]),
        (1, [0.1, 0.0]),
        (2, [10.0, 0.0]),
        (3, [10.1, 0.0]),
        (4, [5.0, 0.0]),
    ]
    out = {r.pick: (r.vec_id, r.dist) for r in kcenter_sample(_vecs(spark, rows), k=4).collect()}
    assert out[0] == (0, 0.0)
    assert out[1] == (3, 10.1)
    assert out[2] == (4, 5.0)
    assert out[3] == (1, 0.1)


def test_tfidf_cosine_identical_docs_score_one(spark):
    from etherscan_contract_crawler_spark.analytics.text import tfidf_cosine_pairs

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta"),
            (2, "alpha beta gamma delta"),
            (3, "totally disjoint vocabulary here"),
        ],
        ["doc_id", "text"],
    )
    out = {(r.doc_a, r.doc_b): r.cosine for r in tfidf_cosine_pairs(docs, threshold=0.0).collect()}
    assert out[(1, 2)] == 1.0
    assert (1, 3) not in out and (2, 3) not in out  # no shared token, no pair


def test_tfidf_cosine_max_df_guard_is_lower_bound(spark):
    from etherscan_contract_crawler_spark.analytics.text import tfidf_cosine_pairs

    # docs 1 and 2 share one token (df=2, idf>0); max_df=1 drops it from
    # the candidate join -> the pair disappears (norms stay exact by
    # design). A token in EVERY doc would not do here: idf = ln(N/N) = 0
    # zeroes its weight, so it can't witness the guard.
    docs = spark.createDataFrame(
        [(1, "shared a1 a2"), (2, "shared b1 b2"), (3, "only c1 c2")],
        ["doc_id", "text"],
    )
    assert tfidf_cosine_pairs(docs, threshold=0.01, max_df=1).count() == 0
    out = tfidf_cosine_pairs(docs, threshold=0.01).collect()
    assert [(r.doc_a, r.doc_b) for r in out] == [(1, 2)]


def test_hreflang_extraction_variants_and_decoys(spark):
    from etherscan_contract_crawler_spark.functions.html import hreflang_alternates

    body = (
        '<link rel="alternate" hreflang="en" href="/p/1?lang=en">'
        "<link hreflang='DE' rel='alternate' href='/p/1?lang=de'>"
        "<LINK REL=ALTERNATE HREFLANG=x-default HREF=/p/1>"
        '<link rel="stylesheet" hreflang="en" href="/x.css">'   # decoy: not alternate
        '<link rel="alternate" type="application/rss+xml" href="/feed">'  # no hreflang
        '<a hreflang="fr" href="/p/1?lang=fr">anchors do not count</a>'
    )
    df = spark.createDataFrame([(1, body), (2, "<p>none</p>")], ["url_id", "body"])
    out = df.select("url_id", hreflang_alternates("body").alias("alts")).collect()
    by = {r.url_id: [(a.lang, a.href) for a in r.alts] for r in out}
    assert by[1] == [
        ("en", "/p/1?lang=en"),
        ("de", "/p/1?lang=de"),          # lang lowercased
        ("x-default", "/p/1"),           # bare attributes parse
    ]
    assert by[2] == []


def test_c4_clean_rule_branches(spark):
    from etherscan_contract_crawler_spark.analytics.text import c4_clean

    docs = spark.createDataFrame(
        [
            # 3 good sentences -> kept page
            (1, "One two three four five six.\nSeven eight nine ten eleven!\n"
                'He said "keep this quoted line please."'),
            # enough words but no terminal punctuation -> all lines dropped
            (2, "one two three four five six\nseven eight nine ten eleven"),
            # javascript mention kills the line; <3 kept -> page dropped
            (3, "Enable javascript to view this content now.\n"
                "A good long sentence stays right here.\n"
                "Another good long sentence stays here too."),
            # lorem ipsum anywhere -> page dropped even with 3 good lines
            (4, "One two three four five six.\nSeven eight nine ten eleven.\n"
                "Twelve thirteen fourteen fifteen sixteen.\nlorem ipsum dolor"),
            # code brace -> page dropped
            (5, "One two three four five six.\nSeven eight nine ten eleven.\n"
                "Twelve thirteen fourteen fifteen sixteen.\nif (x) { y(); }"),
            # whitespace runs normalized before word count: 5 real words
            (6, "a   b\t c  d    e.\nshort one.\nalso too short."),
        ],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r for r in c4_clean(docs).collect()}
    assert out[1].keep and out[1].n_kept_lines == 3
    assert out[1].kept_text.count("\n") == 2
    assert not out[2].keep and out[2].n_kept_lines == 0
    assert not out[3].keep and out[3].n_kept_lines == 2  # js line dropped
    assert out[4].has_lorem and not out[4].keep and out[4].n_kept_lines == 3
    assert out[5].has_code and not out[5].keep
    # doc 6: the run-normalized first line counts 5 words -> kept line,
    # but only 1 kept line total -> page dropped
    assert out[6].n_kept_lines == 1 and not out[6].keep


def test_blocklist_dot_boundary_and_suffix_depth(spark):
    from etherscan_contract_crawler_spark.functions.urls import (
        blocklist_match,
        host_suffixes,
    )
    import pyspark.sql.functions as F

    hosts = spark.createDataFrame(
        [("bad.com",), ("a.bad.com",), ("x.y.bad.com",),
         ("notbad.com",),            # substring trap: must NOT match bad.com
         ("bad.com.evil.org",),      # entry must be a SUFFIX, not a prefix
         ("good.org",)],
        ["host"],
    )
    bl = spark.createDataFrame([("bad.com",), ("y.bad.com",)], ["entry"])
    out = {r.host: (r.blocked, r.matched)
           for r in blocklist_match(hosts, bl).collect()}
    assert out["bad.com"] == (True, "bad.com")
    assert out["a.bad.com"] == (True, "bad.com")
    # two entries match x.y.bad.com; min() keeps the lexicographic min
    assert out["x.y.bad.com"] == (True, "bad.com")
    assert out["notbad.com"] == (False, None)
    assert out["bad.com.evil.org"] == (False, None)
    assert out["good.org"] == (False, None)

    sufs = (
        spark.range(1)
        .select(host_suffixes(F.lit("a.b.site.com")).alias("s"))
        .collect()[0].s
    )
    assert sufs == ["a.b.site.com", "b.site.com", "site.com"]


def test_gopher_rules_each_branch(spark):
    from etherscan_contract_crawler_spark.analytics.text import gopher_rules

    good = ("the quick brown fox jumps over that lazy dog and have with "
            "words " * 8)  # 104 words, all alphabetic, stopwords present
    docs = spark.createDataFrame(
        [
            (1, good),
            (2, "the and of short"),                    # word count < 50
            (3, "ok the word and #tag " * 30),          # >10% symbol words
            (4, "\n".join(["- bullet the and item"] * 10)),  # 100% bullets
            (5, good + "\nRead on...\nAnd more..."),    # 2/3 ellipsis lines
            (6, " ".join(["abcdefghijklmnop"] * 60)),   # mean word len > 10
        ],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r for r in gopher_rules(docs).collect()}
    assert out[1].keep and out[1].n_words == 104 and out[1].n_stop >= 2
    assert not out[2].keep and out[2].n_words == 4
    assert not out[3].keep and out[3].sym_words == 30
    assert not out[4].keep and out[4].bullet_lines == 10
    assert not out[5].keep and out[5].ellipsis_lines == 2
    assert not out[6].keep and out[6].char_sum == 16 * 60
import hashlib


def _w(tok: str) -> int:
    h = hashlib.md5(tok.encode()).hexdigest()
    hexd = "0123456789abcdef"
    b = 16 * hexd.index(h[0]) + hexd.index(h[1])
    return b * 37 % 101 - 50


def test_hashed_quality_score_exact(spark):
    from etherscan_contract_crawler_spark.analytics.text import (
        hashed_quality_score,
    )

    rows = [
        (1, "The quick brown Fox"),
        (2, ""),
        (3, "  spaced   out  tokens "),
        (4, "repeat repeat repeat"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in hashed_quality_score(df).collect()}
    for doc_id, text in rows:
        toks = [t for t in text.lower().split() if t]
        want = sum(_w(t) for t in toks)
        r = out[doc_id]
        assert r.n_tokens == len(toks)
        assert r.score_centi == want, (doc_id, toks)
        assert r.keep == (len(toks) > 0 and want >= 0)
    # empty doc: zero tokens, score 0, never kept
    assert out[2].n_tokens == 0 and out[2].score_centi == 0
    assert out[2].keep is False


def test_img_candidates_harvest(spark):
    from pyspark.sql import functions as F

    from etherscan_contract_crawler_spark.functions.html import (
        img_candidates,
    )

    rows = [
        (1, '<img src="/a.jpg" alt="cat photo">'),
        (2, '<IMG SRC="/up.png">'),                       # case-insensitive
        (3, '<img srcset="/s.png 1x,/m.png 2x" src="/d.png" alt="x">'),
        (4, "<img alt='sq' src='/q.gif'>"),
        (5, '<imgx src="/decoy.jpg"><p>no real img</p>'),
        (6, '<img src="/one.jpg"><img src="/two.jpg" alt="second">'),
    ]
    df = spark.createDataFrame(rows, "doc_id long, body string")
    got = df.select(
        "doc_id", F.explode(img_candidates("body")).alias("c")
    ).select("doc_id", "c.*").collect()
    by_doc = {}
    for r in got:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert [(r.url, r.descr, r.alt, r.from_srcset) for r in by_doc[1]] == [
        ("/a.jpg", "1x", "cat photo", False)]
    assert [(r.url, r.alt) for r in by_doc[2]] == [("/up.png", None)]
    # bare src first (the HTML-spec 1x default), then srcset entries —
    # whitespace-free comma splits included
    assert [(r.url, r.descr, r.from_srcset) for r in by_doc[3]] == [
        ("/d.png", "1x", False), ("/s.png", "1x", True), ("/m.png", "2x", True)]
    assert [(r.url, r.alt) for r in by_doc[4]] == [("/q.gif", "sq")]
    assert 5 not in by_doc                      # decoy tag yields nothing
    assert [(r.img_idx, r.url, r.alt) for r in by_doc[6]] == [
        (1, "/one.jpg", None), (2, "/two.jpg", "second")]


def test_img_candidates_lazy_load(spark):
    from pyspark.sql import functions as F

    from etherscan_contract_crawler_spark.functions.html import (
        img_candidates,
    )

    rows = [
        (1, '<img data-src="/lz.jpg" alt="lazy">'),
        (2, '<img data-srcset="/lz-s.jpg 1x, /lz-m.jpg 2x">'),
        # real src wins over data-src when both present
        (3, '<img src="/real.jpg" data-src="/placeholder.gif">'),
    ]
    df = spark.createDataFrame(rows, "doc_id long, body string")
    got = {}
    for r in df.select(
        "doc_id", F.explode(img_candidates("body")).alias("c")
    ).select("doc_id", "c.*").collect():
        got.setdefault(r.doc_id, []).append(r)
    assert [(r.url, r.descr, r.alt, r.from_srcset) for r in got[1]] == [
        ("/lz.jpg", "1x", "lazy", False)]
    assert [(r.url, r.descr) for r in got[2]] == [
        ("/lz-s.jpg", "1x"), ("/lz-m.jpg", "2x")]
    assert [(r.url,) for r in got[3]] == [("/real.jpg",)]


def test_caption_quality_rules(spark):
    from etherscan_contract_crawler_spark.analytics.text import (
        caption_quality,
    )

    rows = [
        (1, "a dog on the beach", True),
        (2, "IMG_0042.jpg", False),          # filename
        (3, "dsc-123.JPEG", False),          # filename, case-insensitive
        (4, "hi", False),                    # too short
        (5, "mountain", False),              # single word
        (6, "12345 67890", False),           # non-alphabetic
        (7, "x " * 150, False),              # too long (300 chars)
        (8, "my IMG_0042.jpg photo", True),  # filename only when bare
        (9, "ab cd", True),                  # boundary: 5 chars, 2 words
    ]
    df = spark.createDataFrame(
        [(i, a) for i, a, _ in rows], "doc_id long, alt string")
    got = {r.doc_id: r for r in caption_quality(df).collect()}
    for i, a, want in rows:
        assert got[i].keep == want, (i, a, got[i])
    assert got[2].is_filename and got[3].is_filename
    assert not got[8].is_filename
