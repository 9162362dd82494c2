#!/usr/bin/env python
"""MS MARCO dataprep driver: subsample then embed, from one YAML config
(reference pattern: subsample_msmarco.py + embed_msmarco.py driven by
configs/ms_marco_subset_embed.yaml)."""

from __future__ import annotations

import argparse
import os
import sys

import yaml

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", default="configs/ms_marco_subset_embed.yaml")
    args = parser.parse_args()
    with open(args.config) as f:
        cfg = yaml.safe_load(f)

    from vectordb_retrieval_tpu.data.dataprep import embed_msmarco, subsample_msmarco

    sub = cfg.get("subsample", {})
    nc = subsample_msmarco.sample_corpus(
        sub.get("output_dir", "data/msmarco_subset"),
        sub.get("corpus_sample", 1_000_000),
        sub.get("seed", 42),
        sub.get("corpus_tsv", ""),
    )
    nq = subsample_msmarco.sample_queries(
        sub.get("output_dir", "data/msmarco_subset"),
        sub.get("query_sample", 1000),
        sub.get("seed", 42),
        sub.get("queries_tsv", ""),
    )
    print(f"subsampled {nc} passages, {nq} queries")

    emb = cfg.get("embed", {})
    argv = sys.argv
    sys.argv = [
        "embed_msmarco",
        "--input-dir", emb.get("input_dir", "data/msmarco_subset"),
        "--output-dir", emb.get("output_dir", "data/msmarco_embeddings"),
        "--seed", str(emb.get("seed", 42)),
    ] + (["--synthetic"] if emb.get("synthetic") else [])
    try:
        embed_msmarco.main()
    finally:
        sys.argv = argv
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
