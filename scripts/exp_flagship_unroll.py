"""Flagship scan-unroll sweep: the XLA while-loop costs ~0.6 ms/iteration
on this backend; unrolling removes it without touching per-batch compute
or the cross-batch checksum dependency chain (measured 126k -> 205k QPS
from unroll 1 -> 32 at B=256, 96 batches)."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from vectordb_retrieval_tpu.ops import distances as dops
from vectordb_retrieval_tpu.utils.compat import enable_compilation_cache
enable_compilation_cache()
N, D, K = 100_000, 384, 20
rng = np.random.default_rng(7)
db = jnp.asarray(rng.standard_normal((N, D)).astype(np.float32))
sqn = dops.sq_norms(db)
def run_cfg(B, reps, unroll):
    qs = jnp.asarray(rng.standard_normal((reps, B, D)).astype(np.float32))
    def stream(qall, db_a, sqn_a):
        def body(carry, qb):
            d, i = dops.exact_search(qb + carry, db_a, K, metric="l2", db_sqnorms=sqn_a)
            chk = (jnp.max(d) + jnp.sum(i).astype(jnp.float32)) * jnp.float32(1e-38)
            return chk, i
        return jax.lax.scan(body, jnp.float32(0.0), qall, unroll=unroll)
    compiled = jax.jit(stream)
    np.asarray(compiled(qs, db, sqn)[0])
    best = None
    for _ in range(2):
        t0 = time.perf_counter(); chk, _ = compiled(qs, db, sqn); np.asarray(chk)
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    print(f"B={B:4d} reps={reps:3d} unroll={unroll:2d}  {B*reps/best:9.0f} QPS ({best/reps*1e3:6.3f} ms/batch)", flush=True)
run_cfg(256, 96, 8)
run_cfg(256, 96, 16)
run_cfg(256, 96, 32)
run_cfg(256, 192, 8)
