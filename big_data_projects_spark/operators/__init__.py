"""Operator library.

relational  — projections/filters/dedup/joins/aggs/windows (reference parity)
asof        — as-of (most-recent-at-or-before) join, no native Spark op
sessionize  — gap-based sessionization via window functions
dedup       — exact / MinHash-LSH / SimHash / n-gram-Jaccard / embedding near-dup
similarity  — cosine top-k (brute force + IVF-style partitioned)
text        — language-ID, quality scoring, token stats, fingerprinting
multimodal  — binary payload columns + typed metadata + pandas-UDF plumbing
"""
