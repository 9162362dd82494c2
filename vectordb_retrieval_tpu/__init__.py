"""TPU-native vector retrieval benchmarking framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of the reference
``Human-Augment-Analytics/vectordb-retrieval`` framework (CPU/FAISS based):
config-driven benchmarking of vector retrieval algorithms with retrieval
guarantee analysis (recall vs. compute cost), built TPU-first.

Design stance (see SURVEY.md section 7):
  * every index is a pytree of device arrays,
  * every search is a jit-compiled, shardable function
    ``(index, queries[B, d], k) -> (dists[B, k], ids[B, k])``,
  * index *builds* (k-means, codebooks, hashing) are jit-compiled too,
  * host Python exists only for config, I/O and reporting.

Layer map (mirrors reference layers, SURVEY.md section 1):
  scripts/            CLI entry points
  bench/              benchmark orchestration, experiments, evaluation, metrics
  models/             index families (flat, IVF, PQ, SQ8, LSH, graph, covertree)
  ops/                jnp/Pallas kernels: distances, top-k, k-means, quantizers
  parallel/           device mesh + sharded search with collective top-k merge
  data/               dataset loading / synthesis / ground truth / caching
  utils/              timing, hashing, config helpers
"""

__version__ = "0.1.0"

from vectordb_retrieval_tpu.models.base import (  # noqa: F401
    BaseAlgorithm,
    IndexArtifact,
)
