""">RAM corpus staging validation (VERDICT round-1 item 8).

Builds a 4M x 128d corpus through the out-of-core path — chunked
generation straight to a BigStore, streamed ground truth, memmap-fed
IVF-Flat build, fused search — and checks **peak host RSS stays below the
corpus size** (the reference's memmap protocol v2 goal,
reference src/benchmark/dataset.py:281-471).

Run:  python scripts/validate_bigcorpus.py [--rows 4000000] [--platform cpu]
Prints one JSON line with RSS accounting + recall/QPS.

Platform note (measured, scripts/../tmp probes 2026-08-16): this host's
axon TPU tunnel *client* permanently leaks ~1x host memory per
host->device transfer (8 synced 122 MB uploads grow VmRSS by ~1 GB twice
over — the staging buffers are never reused or freed), so ANY program
that moves the corpus through the tunnel exceeds the corpus-size RSS
bound no matter how it is structured. `--platform cpu` runs the identical
streaming program on the in-process CPU backend, where device memory IS
host memory — a *stricter* accounting (an all-resident design fails it
by construction) that the fully-streaming path passes because the raw
corpus is never resident anywhere: chunks stream disk -> device, only
codes (4x smaller) are retained.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=4_000_000)
    ap.add_argument("--dim", type=int, default=128)
    ap.add_argument("--queries", type=int, default=256)
    ap.add_argument("--k", type=int, default=20)
    ap.add_argument("--nlist", type=int, default=1024)
    ap.add_argument("--nprobe", type=int, default=128)
    ap.add_argument(
        "--coding", default="SQ8", choices=["Flat", "SQ8", "PQ16", "PQ32"],
        help="list payload; SQ8/PQ stream-build without ever holding the "
        "raw corpus on host or device",
    )
    ap.add_argument("--data-dir", default="/tmp/bigcorpus_val")
    ap.add_argument("--keep", action="store_true")
    ap.add_argument(
        "--platform", default="default", choices=["default", "cpu"],
        help="cpu = leak-free in-process backend (see module docstring)",
    )
    args = ap.parse_args()

    if args.platform == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")

    from vectordb_retrieval_tpu.bench.metrics import recall_at_k
    from vectordb_retrieval_tpu.data.datasets import Dataset
    from vectordb_retrieval_tpu.data.storage import peak_rss_bytes
    from vectordb_retrieval_tpu.models.composite import CompositeAlgorithm
    from vectordb_retrieval_tpu.utils.compat import (
        enable_compilation_cache,
        trim_host_heap,
    )

    enable_compilation_cache()
    corpus_bytes = args.rows * args.dim * 4
    rss0 = peak_rss_bytes() or 0
    print(
        f"corpus {args.rows}x{args.dim} = {corpus_bytes / 2**20:.0f} MB; "
        f"baseline peak RSS {rss0 / 2**20:.0f} MB",
        file=sys.stderr,
    )

    t0 = time.perf_counter()
    ds = Dataset(
        "random",
        data_dir=args.data_dir,
        options={
            "train_size": args.rows,
            "dimensions": args.dim,
            "test_size": args.queries,
            "ground_truth_k": args.k,
            "storage": "memmap",
            "use_cache": True,
            "seed": 7,
        },
    ).load()
    t_data = time.perf_counter() - t0
    assert isinstance(ds.train_vectors, np.memmap)
    trim_host_heap()  # phase boundary: return freed staging arenas
    rss_data = peak_rss_bytes() or 0
    print(
        f"dataset+GT {t_data:.1f}s, peak RSS {rss_data / 2**20:.0f} MB",
        file=sys.stderr,
    )

    t0 = time.perf_counter()
    algo = CompositeAlgorithm(
        dimension=args.dim,
        indexer={
            "type": "IVFIndexer",
            "index_type": f"IVF{args.nlist},{args.coding}",
        },
        searcher={"type": "ANNSearcher", "nprobe": args.nprobe},
        metric="l2",
    )
    algo.build_index(ds.train_vectors)
    t_build = time.perf_counter() - t0
    trim_host_heap()

    t0 = time.perf_counter()
    dists, ids = algo.batch_search(ds.test_vectors, args.k)
    ids = np.asarray(ids)
    t_search = time.perf_counter() - t0
    recall = recall_at_k(ds.ground_truth[:, : args.k], ids, args.k)
    rss_peak = peak_rss_bytes() or 0

    ok = rss_peak < corpus_bytes
    result = {
        "metric": "bigcorpus_rss_validation",
        "platform": args.platform,
        "rows": args.rows,
        "dim": args.dim,
        "corpus_mb": round(corpus_bytes / 2**20, 1),
        "peak_rss_mb": round(rss_peak / 2**20, 1),
        "rss_under_corpus": bool(ok),
        "dataset_gt_s": round(t_data, 1),
        "ivf_build_s": round(t_build, 1),
        "search_s": round(t_search, 2),
        "search_qps": round(args.queries / max(t_search, 1e-9), 1),
        f"recall@{args.k}": round(float(recall), 4),
    }
    print(json.dumps(result))
    if not args.keep:
        shutil.rmtree(args.data_dir, ignore_errors=True)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
