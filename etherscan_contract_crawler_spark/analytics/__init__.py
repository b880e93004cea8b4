"""Training-data pipeline analytics: dedup (exact/minhash/simhash/jaccard),
similarity search (cosine top-k, LSH-bucketed), text analysis (lang-id,
quality, tokens, fingerprints).

These generalize the reference's post-hoc dedup scripts (find-duplicates.py,
solidity-naive-checksum.py) into the operator set a 100 TB training-data
pipeline needs. Everything is built-in-function DataFrame code — the shuffle
per operator is one hash aggregation or one equi-join on a derived key.
"""
