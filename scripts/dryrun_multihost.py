"""Multi-host (multi-process) dryrun: DCN x ICI mesh on spoofed CPU hosts.

Real TPU pods are unavailable on this host, so this validates the
multi-host path the same way the driver validates multi-chip: each
subprocess pretends to be one host with N virtual CPU devices
(``xla_force_host_platform_device_count``), ``jax.distributed`` wires
them into one global runtime (Gloo collectives), and the sharded exact
search runs over the hybrid ``(dcn, db)`` mesh — the database sharded
over BOTH axes, candidates merged by one all_gather spanning them.

Run as coordinator (spawns the workers):
    python scripts/dryrun_multihost.py --procs 2 --local-devices 4
Run as one worker (internal):
    python scripts/dryrun_multihost.py --proc-id 0 --procs 2 ...
"""

from __future__ import annotations

import argparse
import os
import socket
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def worker(args) -> int:
    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={args.local_devices}"
    )
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        args.coordinator, num_processes=args.procs, process_id=args.proc_id
    )
    import numpy as np

    sys.path.insert(0, REPO)
    from vectordb_retrieval_tpu.parallel.mesh import (
        host_local_rows,
        make_multihost_mesh,
    )
    from vectordb_retrieval_tpu.parallel.sharded import (
        shard_database,
        sharded_exact_search,
    )

    mesh = make_multihost_mesh()
    assert jax.device_count() == args.procs * args.local_devices
    n, d, k = 256, 16, 5
    rng = np.random.default_rng(0)
    x = rng.standard_normal((n, d)).astype(np.float32)
    q = rng.standard_normal((8, d)).astype(np.float32)
    lo, hi = host_local_rows(n)
    assert hi - lo <= -(-n // args.procs)

    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    # shard over BOTH axes: every host loads only its row slice in real
    # deployments; here the callback slices the full matrix per device
    padded = -(-n // jax.device_count()) * jax.device_count()
    xp = np.concatenate([x, np.zeros((padded - n, d), np.float32)])
    sh = NamedSharding(mesh, P(("dcn", "db"), None))
    db = jax.make_array_from_callback((padded, d), sh, lambda idx: xp[idx])

    dd, ii = sharded_exact_search(
        jnp.asarray(q), db, n, k, mesh, db_axis=("dcn", "db")
    )
    got_d = np.sort(np.asarray(jax.device_get(dd)), axis=1)
    full = ((q[:, None] - x[None]) ** 2).sum(-1)
    exp_d = np.sort(full, axis=1)[:, :k]
    max_err = float(np.abs(got_d - exp_d).max())
    ok = bool(np.allclose(got_d, exp_d, rtol=1e-4, atol=1e-5))
    print(
        f"proc {args.proc_id}: mesh={dict(mesh.shape)} "
        f"devices={jax.device_count()} max_err={max_err:.2e} ok={ok}",
        flush=True,
    )
    return 0 if ok else 1


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--procs", type=int, default=2)
    ap.add_argument("--local-devices", type=int, default=4)
    ap.add_argument("--proc-id", type=int, default=None)
    ap.add_argument("--coordinator", default=None)
    args = ap.parse_args()

    if args.proc_id is not None:
        return worker(args)

    with socket.socket() as s:  # pick a free port
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    coord = f"localhost:{port}"
    procs = [
        subprocess.Popen(
            [
                sys.executable, os.path.abspath(__file__),
                "--proc-id", str(i), "--procs", str(args.procs),
                "--local-devices", str(args.local_devices),
                "--coordinator", coord,
            ],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        )
        for i in range(args.procs)
    ]
    rc = 0
    for p in procs:
        out, _ = p.communicate(timeout=300)
        for line in out.decode().splitlines():
            if "proc " in line or "ok=" in line:
                print(line)
        rc |= p.returncode
    print("dryrun_multihost", "ok" if rc == 0 else "FAILED")
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
