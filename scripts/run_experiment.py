#!/usr/bin/env python
"""Registry-based single-experiment runner
(reference src/experiments/run_experiment.py:13-58)."""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", required=True)
    parser.add_argument("--output-dir", default="results")
    args = parser.parse_args()

    from vectordb_retrieval_tpu.bench.config import ExperimentConfig
    from vectordb_retrieval_tpu.bench.experiment import ExperimentRunner

    config = ExperimentConfig.from_yaml(args.config)
    runner = ExperimentRunner(config, output_dir=args.output_dir)
    runner.load_dataset()
    runner.run()
    print(f"results in {args.output_dir}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
