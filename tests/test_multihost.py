"""Multi-host (multi-process) mesh: spoofed 2-host CPU topology.

Real pods are unavailable; this validates the jax.distributed + hybrid
(dcn, db) mesh path end-to-end the same way the driver validates
multi-chip — each subprocess is one "host" with 4 virtual CPU devices,
collectives run over Gloo (scripts/dryrun_multihost.py)."""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_two_process_dcn_mesh_exact_search():
    proc = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "scripts", "dryrun_multihost.py"),
            "--procs", "2", "--local-devices", "4",
        ],
        capture_output=True, text=True, timeout=300,
        env={k: v for k, v in os.environ.items() if k != "XLA_FLAGS"},
    )
    out = proc.stdout + proc.stderr
    assert proc.returncode == 0, out[-2000:]
    assert "dryrun_multihost ok" in out, out[-2000:]
    assert out.count("ok=True") == 2, out[-2000:]
