#!/usr/bin/env python
"""Single-experiment entry point (reference main.py:27-88).

Usage: python main.py --config configs/default.yaml [--output-dir results]
"""

from __future__ import annotations

import argparse
import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    parser = argparse.ArgumentParser(description="Run a single experiment")
    parser.add_argument("--config", default="configs/default.yaml")
    parser.add_argument("--output-dir", default="results")
    parser.add_argument("--verbose", action="store_true")
    args = parser.parse_args()

    logging.basicConfig(
        level=logging.DEBUG if args.verbose else logging.INFO,
        format="%(asctime)s %(levelname)s %(message)s",
    )

    from vectordb_retrieval_tpu.bench.config import ExperimentConfig
    from vectordb_retrieval_tpu.bench.experiment import ExperimentRunner

    config = ExperimentConfig.from_yaml(args.config)
    runner = ExperimentRunner(config, output_dir=args.output_dir)
    runner.load_dataset()
    results = runner.run()
    for name, m in results.items():
        if "error" in m:
            print(f"{name}: ERROR {m['error']}")
        else:
            print(
                f"{name}: recall={m.get('recall')} qps={m.get('qps'):.1f} "
                f"build={m.get('build_time_s', 0):.2f}s"
            )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
