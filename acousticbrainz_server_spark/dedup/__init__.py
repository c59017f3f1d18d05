"""Deduplication operators for the large-scale training-data pipeline:

- exact.py    — content-hash dedup (sha256 groupBy; the reference's
                data_sha256 UNIQUE semantics, db/data.py:250-257)
- minhash.py  — MinHash + LSH band-bucket near-dup candidate join
- ngram.py    — exact n-gram Jaccard similarity (oracle for minhash)
- simhash.py  — SimHash bit-signature near-dup
- embedding.py— embedding-cosine near-dup (brute-force + bucketed)
"""
