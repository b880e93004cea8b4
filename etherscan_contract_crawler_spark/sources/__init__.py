"""Sources: seed ingestion, listing-page scan, synthetic deterministic data.

Spark-first re-expression of the reference's scans (SURVEY.md §2.1 S1-S9).
"""
