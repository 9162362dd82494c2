"""Attempt the reference's real-dataset downloads and log the outcome.

The reference benchmarks real GloVe-6B-50d (HTTP zip, dataset.py:611-663),
SIFT1M (FTP tarball, dataset.py:576-609) and MiniLM-embedded MS MARCO
(sentence-transformers model fetch). This host may have no egress; this
script produces a committed, reproducible record of each attempt so the
results doc can state *why* surrogates were used (VERDICT.md Missing-1).

Usage: python scripts/attempt_downloads.py [--log data/download_attempts.log]
"""

from __future__ import annotations

import argparse
import datetime
import os
import socket
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TARGETS = [
    ("glove50 zip (reference dataset.py:611)",
     "https://nlp.stanford.edu/data/glove.6B.zip"),
    ("sift1m tarball (reference dataset.py:576)",
     "ftp://ftp.irisa.fr/local/texmex/corpus/sift.tar.gz"),
    ("ann-benchmarks glove-50 hdf5 (alternate mirror)",
     "http://ann-benchmarks.com/glove-50-angular.hdf5"),
    ("huggingface MiniLM model (reference embed_msmarco.py:149)",
     "https://huggingface.co/sentence-transformers/all-MiniLM-L6-v2/resolve/main/config.json"),
]


def attempt(url: str, timeout: float = 20.0) -> str:
    import urllib.request

    try:
        with urllib.request.urlopen(url, timeout=timeout) as r:
            head = r.read(1024)
            return f"OK status={getattr(r, 'status', '?')} first_bytes={len(head)}"
    except Exception as exc:
        return f"FAILED {type(exc).__name__}: {exc}"


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--log", default="data/download_attempts.log")
    args = ap.parse_args()

    lines = [
        f"# download attempts {datetime.datetime.now().isoformat()}",
        f"# host={socket.gethostname()} python={sys.version.split()[0]}",
    ]
    try:
        socket.getaddrinfo("nlp.stanford.edu", 443)
        lines.append("DNS nlp.stanford.edu: OK")
    except Exception as exc:
        lines.append(f"DNS nlp.stanford.edu: FAILED {type(exc).__name__}: {exc}")
    any_ok = False
    for label, url in TARGETS:
        result = attempt(url)
        any_ok = any_ok or result.startswith("OK")
        lines.append(f"{label}\n  {url}\n  -> {result}")
    os.makedirs(os.path.dirname(args.log) or ".", exist_ok=True)
    with open(args.log, "a") as f:
        f.write("\n".join(lines) + "\n\n")
    print("\n".join(lines))
    return 0 if any_ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
