"""Datasets: synthesis, parsers, caching and device-side ground truth."""

from vectordb_retrieval_tpu.data.datasets import Dataset  # noqa: F401
