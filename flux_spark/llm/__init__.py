"""LLM-data-pipeline operators designed for 100 TB corpora.

Beyond the reference's surface (per BASELINE.json north star): deduplication
(exact / MinHash-LSH / SimHash / n-gram Jaccard / embedding cosine),
similarity search (brute-force + LSH/IVF ANN), text analysis (language id,
quality scoring, token counting, fingerprinting), and multimodal binary
columns with Arrow-batched decode plumbing.
"""

from . import dedup, multimodal, similarity, text

__all__ = ["dedup", "multimodal", "similarity", "text"]
