"""Outlink harvesting (functions/html.py:a_candidates) — the regex-flatten
contract cases: token-match nofollow (never substring), named anchors
dropped, nested-markup anchors skipped, quote/case variants, a_idx counts
kept anchors only."""

from pyspark.sql import functions as F

from etherscan_contract_crawler_spark.functions.html import a_candidates


def _harvest(spark, body):
    df = spark.createDataFrame([(body,)], ["body"])
    return [
        tuple(r)
        for r in df.select(F.explode(a_candidates("body")).alias("c"))
        .select("c.a_idx", "c.href", "c.text", "c.nofollow")
        .collect()
    ]


def test_basic_anchor_and_document_order(spark):
    out = _harvest(
        spark, '<a href="https://a.com/1">one</a><a href="https://a.com/2">two</a>'
    )
    assert out == [
        (1, "https://a.com/1", "one", False),
        (2, "https://a.com/2", "two", False),
    ]


def test_nofollow_is_token_match_not_substring(spark):
    out = _harvest(
        spark,
        '<a href="https://x/1" rel="external nofollower">t</a>'
        '<a href="https://x/2" rel="me,nofollow">m</a>'
        "<a href='https://x/3' rel='NOFOLLOW'>n</a>",
    )
    assert [(r[3]) for r in out] == [False, True, True]


def test_named_anchor_dropped_and_idx_skips_it(spark):
    out = _harvest(
        spark, '<a name="top">skip</a><a href="https://k.com/">kept</a>'
    )
    assert out == [(1, "https://k.com/", "kept", False)]


def test_nested_markup_anchor_skipped_by_contract(spark):
    out = _harvest(
        spark,
        '<a href="https://n.com/"><b>bold</b></a><a href="https://p.com/">p</a>',
    )
    assert out == [(1, "https://p.com/", "p", False)]


def test_uppercase_tag_and_single_quotes(spark):
    out = _harvest(spark, "<A HREF='https://U.com/Path'>UP</A>")
    assert out == [(1, "https://U.com/Path", "UP", False)]


def test_empty_anchor_text_kept_as_empty_string(spark):
    out = _harvest(spark, '<a href="https://e.com/"></a>')
    assert out == [(1, "https://e.com/", "", False)]
