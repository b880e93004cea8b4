"""Listing-crawl source: page fan-out, header-zip projection, seed ordering."""

from pyspark.sql import functions as F

from etherscan_contract_crawler_spark.sources.listing import (
    listing_to_seeds,
    scan_listing,
)
from etherscan_contract_crawler_spark.sources.seeds import seeds_to_frontier


def test_scan_listing_shape(spark):
    df = scan_listing(spark, n_pages=5)
    rows = df.collect()
    assert len(rows) == 5 * 25
    assert {r.page for r in rows} == {1, 2, 3, 4, 5}
    sample = rows[0].row
    assert set(sample.keys()) == {"Address", "Contract Name", "Balance", "Txns"}


def test_listing_to_seeds_order_encoded(spark):
    seeds = listing_to_seeds(scan_listing(spark, n_pages=3))
    got = seeds.orderBy(F.desc("priority")).select("url", "priority").collect()
    assert len(got) == 75
    # priority DESC must reproduce page-major order: first 25 rows from page 1
    pages = [int(-r.priority // 1_000_000) for r in got]
    assert pages == sorted(pages)


def test_listing_seeds_feed_frontier(spark):
    seeds = listing_to_seeds(scan_listing(spark, n_pages=2))
    frontier, rejects = seeds_to_frontier(seeds, n_buckets=8)
    assert rejects.count() == 0
    f = frontier.collect()
    assert len(f) == 50
    # registrable domain strips the 'listing.' host label
    assert all(r.domain == "example.com" for r in f)
