"""Benchmark orchestration: metrics, evaluation, experiments, runner."""
