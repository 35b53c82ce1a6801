"""LLM training-data pipeline operators (extension pillar).

Beyond reference parity: the operations a 100 TB training-data pipeline
needs over the ``documents`` (text) and ``embeddings`` (vector) tables —
deduplication (exact, MinHash-LSH, SimHash, n-gram Jaccard), similarity
search (brute-force + LSH-bucketed ANN), text analysis (language ID,
quality scoring, token counting, fingerprinting), and multimodal binary
plumbing.

Design rules: everything stays in built-in Catalyst expressions
(higher-order array functions, xxhash64, md5) except where vectorized
NumPy genuinely wins (ANN signatures, multimodal decode) — those use
Arrow-batched pandas UDFs, never row-at-a-time Python.
"""

from . import dedup, multimodal, similarity, text  # noqa: F401
