"""etherscan_contract_crawler_spark — a PySpark-native crawl-frontier engine.

A brand-new engine (NOT a port) with the query/data-processing capabilities of
the reference repo ``cassc/etherscan-contract-crawler`` (see /root/reference,
surveyed in SURVEY.md): URL-frontier scheduling with per-domain politeness and
priority ordering, bloom/cuckoo URL-seen dedup, deterministic image+caption
payload validation, epoch checkpoints with per-partition lineage, and a
streaming frontier-expansion face.

Everything is expressed Spark-first: DataFrame/SQL plans optimized by Catalyst,
vectorized pandas/Arrow UDFs for the genuinely non-relational parts (image
codecs, bloom bitmaps), and no per-row Python UDFs anywhere.
"""

__version__ = "0.1.0"
