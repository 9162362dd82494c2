"""Host-side utilities: timing, hashing, vector helpers."""

from vectordb_retrieval_tpu.utils.hashing import stable_hash  # noqa: F401
from vectordb_retrieval_tpu.utils.timing import Timer, time_function  # noqa: F401
