"""S2 — paginated listing scan (the reference's ``fetch_all`` path).

Reference: GET pages 1..20 of an HTML listing, zip <th> headers with <td>
cells into dicts, then crawl each row's address (contract_crawler.py:316-325,
:134-153, :144-145). Spark-first: a DataFrame of page numbers fans out to a
``mapInPandas`` fetch/parse stage (one injected callable — deterministic
synthetic in the sandbox, HTML+session in production), rows come back as a
MapType column (the dynamic header-zip schema, D2), then a typed projection
(P9's key-rename table) turns them into seed rows.

The page fetcher runs inside the iterator-of-batches prologue so a session
is created once per task (U3 semantics, contract_crawler.py:82-126).
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

#: P9 — the reference's in-page label -> canonical field map
#: (contract_crawler.py:38-41)
INPAGE_META_TEXT = {
    "Contract Name:": "contract_name",
    "Compiler Version": "version",
    "Optimization Enabled:": "optimizations",
    "Other Settings:": "settings",
}

LISTING_ROW_DDL = "page int, row map<string,string>"

PageFetcher = Callable[[int], list[dict]]


def synthetic_page_fetcher(page: int) -> list[dict]:
    """Deterministic listing rows for a page (FIXTURES.md §6 shape)."""
    from .synthetic import gen_listing_pages

    pages = gen_listing_pages(n_pages=max(page, 20))
    rows = pages[page - 1]["rows"]
    # header-zip shape: the raw dict the reference builds at :144-145
    return [
        {
            "Address": r["address"],
            "Contract Name": r["contract_name"],
            "Balance": r["balance"],
            "Txns": r["txns"],
        }
        for r in rows
    ]


def scan_listing(
    spark: SparkSession,
    n_pages: int = 20,
    fetcher: PageFetcher = synthetic_page_fetcher,
) -> DataFrame:
    """Fan out pages 1..n (the reference's hard cap, :317) and parse each into
    header-zipped map rows."""
    pages = spark.range(1, n_pages + 1).select(F.col("id").cast("int").alias("page"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        fetch = fetcher  # session prologue point (U3)
        for pdf in batches:
            out_pages, out_rows = [], []
            for p in pdf["page"]:
                for row in fetch(int(p)):
                    out_pages.append(int(p))
                    out_rows.append(row)
            yield pd.DataFrame({"page": out_pages, "row": out_rows})

    return pages.repartition(n_pages).mapInPandas(run, schema=LISTING_ROW_DDL)


def listing_to_seeds(listing: DataFrame) -> DataFrame:
    """P8/P9 — project the dynamic map rows to typed seed rows.

    Listing order is the reference's deterministic crawl order (page asc,
    then row order); it is encoded as priority = -(page * 10^6 + row_idx) so
    the canonical (priority DESC) ordering reproduces it exactly.
    """
    typed = listing.select(
        "page",
        F.lower(F.col("row")["Address"]).alias("address"),
        F.col("row")["Contract Name"].alias("contract_name"),
        F.col("row")["Balance"].alias("balance"),
        F.col("row")["Txns"].cast("int").alias("num_txs"),
    ).withColumn(
        "row_idx", F.row_number().over(Window.partitionBy("page").orderBy("address"))
    )
    return typed.select(
        F.lit(None).cast("long").alias("block"),
        F.lit(None).cast("string").alias("tx_hash"),
        F.concat(
            F.lit("https://listing.example.com/address/"), F.col("address"), F.lit("#code")
        ).alias("url"),
        (-(F.col("page").cast("double") * 1_000_000 + F.col("row_idx"))).alias("priority"),
    )
