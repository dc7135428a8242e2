"""Similarity search over embedding columns: brute-force cosine top-k
(baseline) and IVF-bucketed approximate search (scale path), plus
embedding-cosine near-duplicate pairs."""

from sketchlib.similarity.ann import (
    brute_topk,
    cluster_embeddings,
    embedding_near_duplicates,
    ivf_topk,
)

__all__ = ["brute_topk", "ivf_topk", "embedding_near_duplicates"]
