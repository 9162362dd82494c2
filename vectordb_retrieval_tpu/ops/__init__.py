"""Compute kernels: distances, top-k, k-means, quantization, hashing.

All functions here are pure, jit-friendly JAX functions (or Pallas kernels)
operating on device arrays. No host-side state.
"""

from vectordb_retrieval_tpu.ops.distances import (  # noqa: F401
    METRICS,
    exact_search,
    normalize,
    pairwise_distances,
    top_k_smallest,
)
