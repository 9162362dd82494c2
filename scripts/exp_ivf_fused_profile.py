"""Stage profile of the fused probed-blockmin IVF path at 1M (real TPU).

Builds IVF1024,Flat (bf16 lists) on the sift1m surrogate, then times
cumulative stages of ops/ivf._ivf_probed_blockmin:
  1. coarse probes (exact_probe_mask)
  2. + kernel stream (dist_blockmin_pallas bf16)
  3. + probed blockmin gather + selection
  4. + block rescore
  5. + final f32 rescore (full path = ivf_flat_search)
Fused-timing protocol (one compiled program, chained passes).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from vectordb_retrieval_tpu.data.datasets import Dataset
from vectordb_retrieval_tpu.models.factory import ANNSearcher, FactoryIndexer
from vectordb_retrieval_tpu.ops import distances as dops
from vectordb_retrieval_tpu.ops import ivf as ivfops
from vectordb_retrieval_tpu.ops import pallas_kernels as plk
from vectordb_retrieval_tpu.utils.compat import enable_compilation_cache


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=100)
    ap.add_argument("--nprobe", type=int, default=32)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--b", type=int, default=256)
    args = ap.parse_args()
    enable_compilation_cache()

    ds = Dataset(
        "sift1m", data_dir="data",
        options={"subdir": "sift1m_synth", "test_size": args.b,
                 "ground_truth_k": args.k},
    ).load()
    x = ds.train_vectors
    q0 = jnp.asarray(ds.test_vectors[: args.b].astype(np.float32))

    idx = FactoryIndexer(
        index_key="IVF1024,Flat", metric="l2", nprobe=args.nprobe
    )
    t0 = time.time()
    art = idx.build(np.asarray(x), x.shape[1])
    print(f"build {time.time()-t0:.1f}s", flush=True)
    d = art.data
    slot_ids = d["slot_ids"]
    list_vecs = d["list_vecs"]
    coarse = d["centroids"]
    bucket_lists = d["bucket_lists"]
    sqn = d["list_sqnorms"]
    full = d.get("full_vectors")
    nlist = int(art.metadata["nlist"])
    cum = art.metadata["probe_cum"]
    budget = int(cum[args.nprobe - 1])
    n_bkt, L = slot_ids.shape
    w = ivfops._fused_w(L)
    bpb = L // w
    k = args.k
    fetch_k = k + 8
    nb = min(fetch_k + ivfops._BLOCKMIN_SLACK, 10**9)
    print(f"n_bkt={n_bkt} L={L} w={w} budget={budget} bpb={bpb}")

    pen = jnp.where(
        slot_ids.reshape(-1) >= 0, sqn.reshape(-1), jnp.inf
    )

    lcent = d["list_centroids"]

    def probes_of(q, coarse, bucket_lists):
        return ivfops.exact_probe_mask(
            q, coarse, bucket_lists, nlist, args.nprobe, budget,
            list_centroids=lcent,
        )

    def s1(q, coarse, bucket_lists):
        p, v = probes_of(q, coarse, bucket_lists)
        return jnp.sum(p, 1, dtype=jnp.float32) + jnp.sum(v, 1)

    def s2(q, coarse, bucket_lists, list_vecs, pen):
        p, v = probes_of(q, coarse, bucket_lists)
        bm = plk.dist_blockmin_pallas(
            q.astype(jnp.bfloat16), list_vecs.reshape(n_bkt * L, -1),
            pen.reshape(-1, w), w=w,
        )
        return jnp.sum(p, 1, dtype=jnp.float32) + bm[:, 0]

    def sel_of(q, coarse, bucket_lists, list_vecs, pen):
        p, v = probes_of(q, coarse, bucket_lists)
        bm = plk.dist_blockmin_pallas(
            q.astype(jnp.bfloat16), list_vecs.reshape(n_bkt * L, -1),
            pen.reshape(-1, w), w=w,
        )
        pclip = jnp.clip(p, 0, n_bkt - 1)
        mvals = jnp.take_along_axis(
            bm.reshape(args.b, n_bkt, bpb), pclip[:, :, None], axis=1
        ).reshape(args.b, -1)
        mem = (
            pclip[:, :, None] * bpb
            + jax.lax.broadcasted_iota(jnp.int32, (1, 1, bpb), 2)
        ).reshape(args.b, -1)
        mvals = jnp.where(jnp.repeat(v, bpb, axis=1), mvals, jnp.inf)
        nb_ = min(nb, mvals.shape[1])
        sv, msel = dops.top_k_smallest(mvals, nb_)
        blk = jnp.take_along_axis(mem, msel, axis=1)
        return sv, blk

    def s3(q, coarse, bucket_lists, list_vecs, pen):
        sv, blk = sel_of(q, coarse, bucket_lists, list_vecs, pen)
        return jnp.sum(blk, 1).astype(jnp.float32) + sv[:, 0]

    def s4(q, coarse, bucket_lists, list_vecs, pen):
        sv, blk = sel_of(q, coarse, bucket_lists, list_vecs, pen)
        bvecs = list_vecs.reshape(n_bkt * L // w, w, -1)[blk].astype(
            jnp.float32
        )
        diff = bvecs - q[:, None, None, :]
        cd = jnp.sum(diff * diff, axis=-1)
        return jnp.min(cd, axis=(1, 2)) + sv[:, 0]

    def s5(q, coarse, bucket_lists, list_vecs, pen, slot_ids, sqn):
        vals, ids = ivfops.ivf_flat_search(
            q, coarse, slot_ids, list_vecs, sqn, k, budget, metric="l2",
            bucket_lists=bucket_lists, nlist=nlist,
            nprobe_lists=args.nprobe, list_centroids=lcent,
        )
        return vals[:, 0] + ids[:, 0].astype(jnp.float32)

    def time_fn(name, fn, *fargs):
        def chained(q, *rest):
            def body(i, carry):
                out = fn(carry, *rest)
                return carry + (out[:, None] * 0.0).astype(jnp.float32)

            return jax.lax.fori_loop(0, args.iters, body, q)

        f = jax.jit(chained)
        np.asarray(f(q0, *fargs))
        t0 = time.time()
        np.asarray(f(q0, *fargs))
        dt = (time.time() - t0) / args.iters
        print(f"{name:<28s} {dt*1e3:8.2f} ms/pass ({args.b/dt:9.0f} QPS)",
              flush=True)

    time_fn("1 probes", s1, coarse, bucket_lists)
    time_fn("2 +kernel", s2, coarse, bucket_lists, list_vecs, pen)
    time_fn("3 +probed sel", s3, coarse, bucket_lists, list_vecs, pen)
    time_fn("4 +block rescore", s4, coarse, bucket_lists, list_vecs, pen)
    time_fn("5 FULL ivf_flat_search", s5, coarse, bucket_lists, list_vecs,
            pen, slot_ids, sqn)
    del full


if __name__ == "__main__":
    main()
