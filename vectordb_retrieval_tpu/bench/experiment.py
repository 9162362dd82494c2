"""ExperimentRunner: single-dataset build -> search -> time -> persist loop.

Contract parity with reference src/experiments/experiment_runner.py:25-780:
  * seeded query subsetting (:138-153),
  * persistence modes build_only / retrieve_only / build_and_retrieve with
    dataset fingerprint + config hash validation (:163-344),
  * batched timing loop with single-query fallback (:420-455),
  * QPS / mean-latency derivation (:457-464) and the result-JSON schema
    (:466-486),
  * per-algorithm JSON + combined JSON + plots (:746-780).

TPU-first timing discipline (SURVEY.md section 7 step 3): one untimed warm-up
batch triggers jit compilation and is reported separately as
``warmup_time_s``; every timed region blocks until device results are ready.
Index memory is the honest device-buffer byte count, not an estimate.
"""

from __future__ import annotations

import json
import logging
import os
import time
from datetime import datetime
from typing import Any, Dict, Optional, Tuple

import numpy as np

from vectordb_retrieval_tpu.bench.config import ExperimentConfig
from vectordb_retrieval_tpu.bench.evaluation import Evaluator
from vectordb_retrieval_tpu.data.datasets import Dataset
from vectordb_retrieval_tpu.models import get_algorithm_instance
from vectordb_retrieval_tpu.models.base import BaseAlgorithm
from vectordb_retrieval_tpu.models.composite import CompositeAlgorithm
from vectordb_retrieval_tpu.utils.hashing import stable_hash

logger = logging.getLogger(__name__)

PERSISTENCE_MODES = ("build_and_retrieve", "build_only", "retrieve_only")


def algorithm_from_config(
    name: str, config: Dict[str, Any], dimension: int
) -> BaseAlgorithm:
    """Instantiate an algorithm from a config dict.

    A config with materialised ``indexer``/``searcher`` dicts becomes a
    CompositeAlgorithm; one with ``type`` goes through the registry factory.
    """
    cfg = {
        k: v
        for k, v in config.items()
        if k not in ("persistence", "enabled", "repeat")
    }
    if "indexer" in cfg and "searcher" in cfg:
        metric = cfg.pop("metric", "l2")
        indexer = cfg.pop("indexer")
        searcher = cfg.pop("searcher")
        cfg.pop("type", None)
        cfg.pop("indexer_ref", None)
        cfg.pop("searcher_ref", None)
        algo = CompositeAlgorithm(
            dimension=dimension,
            indexer=indexer,
            searcher=searcher,
            metric=metric,
            name=name,
            **cfg,
        )
        return algo
    algo_type = cfg.pop("type", None)
    if algo_type is None:
        raise ValueError(
            f"algorithm {name!r} config needs either 'type' or "
            f"'indexer'+'searcher': {config!r}"
        )
    algo = get_algorithm_instance(algo_type, dimension, **cfg)
    algo.name = name
    return algo


class ExperimentRunner:
    def __init__(self, config: ExperimentConfig, output_dir: str = "results"):
        from vectordb_retrieval_tpu.utils.compat import enable_compilation_cache

        enable_compilation_cache()
        self.config = config
        self.output_dir = output_dir
        os.makedirs(output_dir, exist_ok=True)
        self.dataset: Optional[Dataset] = None
        self.algorithms: Dict[str, BaseAlgorithm] = {}
        self.results: Dict[str, Dict[str, Any]] = {}

    # -- setup -----------------------------------------------------------
    def load_dataset(self) -> Dataset:
        options = dict(self.config.dataset_options)
        if self.config.metric and "metric" not in options:
            options["metric"] = self.config.metric
        self.dataset = Dataset(
            self.config.dataset, data_dir=self.config.data_dir, options=options
        ).load()
        return self.dataset

    def register_algorithm(self, name: str, algorithm: BaseAlgorithm) -> None:
        self.algorithms[name] = algorithm

    def _select_query_subset(self) -> Tuple[np.ndarray, np.ndarray]:
        """Seeded subset of test queries + matching GT rows
        (reference experiment_runner.py:138-153)."""
        assert self.dataset is not None
        test = self.dataset.test_vectors
        gt = self.dataset.ground_truth
        n = min(int(self.config.n_queries), test.shape[0])
        if n < test.shape[0]:
            rng = np.random.default_rng(self.config.seed)
            idx = rng.choice(test.shape[0], size=n, replace=False)
            return np.ascontiguousarray(test[idx]), np.ascontiguousarray(gt[idx])
        return test, gt

    # -- persistence helpers (reference experiment_runner.py:155-257) ----
    def _extract_persistence_config(
        self, algo_config: Dict[str, Any]
    ) -> Dict[str, Any]:
        p = dict(algo_config.get("persistence") or {})
        mode = p.get("mode", "build_and_retrieve")
        if mode not in PERSISTENCE_MODES:
            raise ValueError(
                f"invalid persistence mode {mode!r}; expected {PERSISTENCE_MODES}"
            )
        p.setdefault("enabled", bool(algo_config.get("persistence")))
        p.setdefault("path_policy", "fixed")
        p.setdefault("force_rebuild", False)
        p.setdefault("fail_if_missing", True)
        p["mode"] = mode
        return p

    def _dataset_fingerprint(self, algo_name: str, algo_config: Dict[str, Any]) -> str:
        assert self.dataset is not None
        payload = {
            "dataset": self.config.dataset,
            "algorithm": algo_name,
            "metric": algo_config.get("metric", self.config.metric),
            "dimensions": int(self.dataset.train_vectors.shape[1]),
            "train_count": int(self.dataset.train_vectors.shape[0]),
            "dataset_options": self.config.dataset_options,
        }
        emb_dir = self.config.dataset_options.get("embedded_dataset_dir")
        if emb_dir:
            emb = os.path.join(emb_dir, "passage_embeddings.npy")
            if os.path.exists(emb):
                st = os.stat(emb)
                payload["embeddings_file"] = {
                    "size": st.st_size,
                    "mtime": int(st.st_mtime),
                }
        return stable_hash(payload)

    def _config_hash(self, algo_config: Dict[str, Any]) -> str:
        payload = {
            "algorithm_config": {
                # repeat only affects timing amortisation, never the
                # artifact — excluding it keeps persisted indexes valid
                # across timing-protocol changes
                k: v
                for k, v in algo_config.items()
                if k not in ("persistence", "repeat")
            },
            "dataset_options": self.config.dataset_options,
            "topk": self.config.topk,
            "n_queries": self.config.n_queries,
            "query_batch_size": self.config.query_batch_size,
        }
        return stable_hash(payload)

    def _resolve_persist_dir(
        self, algo_name: str, p: Dict[str, Any], config_hash: str
    ) -> str:
        base = p.get("artifact_dir") or os.path.join(self.output_dir, "artifacts")
        if p["path_policy"] == "versioned":
            return os.path.join(base, f"{algo_name}_{config_hash[:12]}")
        if p["path_policy"] != "fixed":
            raise ValueError(f"invalid path_policy {p['path_policy']!r}")
        return os.path.join(base, algo_name)

    # -- main loop -------------------------------------------------------
    def run(self) -> Dict[str, Dict[str, Any]]:
        if self.dataset is None:
            self.load_dataset()
        queries, gt = self._select_query_subset()
        evaluator = Evaluator(gt, k_values=[min(self.config.topk, 100)])

        if not self.algorithms:
            dim = int(self.dataset.train_vectors.shape[1])
            for name, cfg in self.config.algorithms.items():
                try:
                    self.register_algorithm(
                        name, algorithm_from_config(name, cfg, dim)
                    )
                except Exception as exc:
                    logger.error("failed to construct %s: %s", name, exc)
                    self.results[name] = {"algorithm": name, "error": str(exc)}

        for name, algo in self.algorithms.items():
            algo_config = self.config.algorithms.get(name, {})
            try:
                try:
                    metrics, indices, query_times = self._run_single_algorithm(
                        name, algo, algo_config, queries
                    )
                except Exception as exc:
                    # remote-compile services flake transiently (HTTP 5xx /
                    # closed-body); one retry rescues the whole row
                    if "remote_compile" not in str(exc):
                        raise
                    logger.warning(
                        "%s hit a transient compile failure (%s); retrying",
                        name, exc,
                    )
                    metrics, indices, query_times = self._run_single_algorithm(
                        name, algo, algo_config, queries
                    )
                if metrics.get("status") == "build_only":
                    self.results[name] = metrics
                else:
                    quality = evaluator.evaluate(name, indices, query_times)
                    metrics.update(quality)
                    # Let the ops-vs-recall plot see op counters (fallback
                    # chain, reference evaluation.py:68-120).
                    evaluator.results[name] = metrics
                    metrics["recall"] = metrics.get(
                        f"recall@{min(100, self.config.topk)}",
                        metrics.get("recall@10"),
                    )
                    self.results[name] = metrics
                self._save_algorithm_results(name)
            except Exception as exc:
                logger.exception("algorithm %s failed", name)
                self.results[name] = {"algorithm": name, "error": str(exc)}
        self._save_combined_results()
        self._generate_plots(evaluator)
        return self.results

    def _run_single_algorithm(
        self,
        name: str,
        algorithm: BaseAlgorithm,
        algo_config: Dict[str, Any],
        queries: np.ndarray,
    ) -> Tuple[Dict[str, Any], np.ndarray, np.ndarray]:
        assert self.dataset is not None
        train = self.dataset.train_vectors
        k = min(self.config.topk, train.shape[0])

        p = self._extract_persistence_config(algo_config)
        persistence_enabled = bool(p.get("enabled"))
        mode = p["mode"]
        fingerprint = config_hash = persist_dir = None
        context: Dict[str, Any] = {}
        if persistence_enabled:
            fingerprint = self._dataset_fingerprint(name, algo_config)
            config_hash = self._config_hash(algo_config)
            persist_dir = self._resolve_persist_dir(name, p, config_hash)
            context = {
                "dataset_fingerprint": fingerprint,
                "config_hash": config_hash,
            }

        build_time = 0.0
        index_load_time = 0.0
        index_source = "built"
        if persistence_enabled and mode == "retrieve_only":
            if not os.path.isdir(persist_dir):
                if p["fail_if_missing"]:
                    raise FileNotFoundError(
                        f"persisted index missing for {name}: {persist_dir}"
                    )
                logger.warning(
                    "%s: persisted index missing, rebuilding", name
                )
                start = time.perf_counter()
                algorithm.build_index(train)
                build_time = time.perf_counter() - start
            else:
                start = time.perf_counter()
                algorithm.load_index(persist_dir, context)
                index_load_time = time.perf_counter() - start
                index_source = "loaded"
        else:
            start = time.perf_counter()
            algorithm.build_index(train)
            build_time = time.perf_counter() - start
            if persistence_enabled and mode in ("build_only", "build_and_retrieve"):
                if p.get("force_rebuild") or not os.path.isdir(persist_dir):
                    algorithm.save_index(persist_dir, context)

        memory_mb = algorithm.index_memory_bytes() / (1024.0 * 1024.0)

        base_metrics: Dict[str, Any] = {
            "algorithm": name,
            "parameters": algorithm.get_parameters(),
            "dataset": self.config.dataset,
            "n_train": int(train.shape[0]),
            "n_test": int(queries.shape[0]),
            "dimensions": int(train.shape[1]),
            "topk": self.config.topk,
            "build_time_s": float(build_time),
            "index_memory_mb": float(memory_mb),
            "index_load_time_s": float(index_load_time),
            "index_source": index_source,
            "persistence_mode": mode if persistence_enabled else None,
            "persist_dir": persist_dir if persistence_enabled else None,
            "dataset_fingerprint": fingerprint if persistence_enabled else None,
            "config_hash": config_hash if persistence_enabled else None,
            "timestamp": datetime.now().isoformat(),
        }

        if persistence_enabled and mode == "build_only":
            base_metrics["status"] = "build_only"
            return base_metrics, np.zeros((0, k), np.int64), np.zeros(0)

        indices, query_times, warmup_s, total_time = self._timed_search(
            algorithm, queries, k, repeat=algo_config.get("repeat")
        )
        mean_ms = (
            (total_time / max(len(queries), 1)) * 1000.0 if len(queries) else 0.0
        )
        ops = algorithm.get_operations()
        base_metrics.update(
            {
                "qps": float(len(queries) / total_time) if total_time > 0 else 0.0,
                "mean_query_time_ms": float(mean_ms),
                "total_query_time_s": float(total_time),
                "warmup_time_s": float(warmup_s),
                "operations": ops,
            }
        )
        if ops.get("ndis"):
            base_metrics["operations_per_query"] = ops["ndis"] / max(len(queries), 1)
        roof = self._roofline(algorithm, queries, k, base_metrics["qps"])
        if roof:
            base_metrics.update(roof)
        return base_metrics, indices, query_times

    def _roofline(
        self,
        algorithm: BaseAlgorithm,
        queries: np.ndarray,
        k: int,
        qps: float,
    ) -> Dict[str, float]:
        """Achieved TFLOP/s and GB/s from XLA cost analysis of one batch.

        Round-3 verdict item: roofline columns in every committed roster
        so selection/bandwidth regressions are visible per row. FLOPs and
        bytes are the COMPILER-reported per-batch costs of the device
        kernel (includes 3-pass HIGH matmul decompositions, masked lanes,
        and padded work — honest about what the device executes, not the
        algorithmic minimum); throughput = per-batch cost x batches/s at
        the measured fused QPS.
        """
        if not getattr(algorithm, "has_device_kernel", False) or qps <= 0:
            return {}
        import jax
        import jax.numpy as jnp

        from vectordb_retrieval_tpu.utils.profiling import cost_estimate

        n = queries.shape[0]
        batch = min(self.config.query_batch_size or n, n)
        art = getattr(algorithm, "artifact", None)
        leaves, treedef = jax.tree_util.tree_flatten(
            art.data if art is not None else {}
        )
        qb = jnp.asarray(queries[:batch].astype(np.float32))

        def one(qb, leaves):
            if art is not None:
                art.data = jax.tree_util.tree_unflatten(treedef, leaves)
            return algorithm.device_kernel(qb, k)

        try:
            cost = cost_estimate(one, qb, leaves)
        finally:
            if art is not None:
                art.data = jax.tree_util.tree_unflatten(treedef, leaves)
        if not cost:
            return {}
        batches_per_s = qps / float(batch)
        out: Dict[str, float] = {}
        if "flops" in cost:
            out["kernel_flops_per_batch"] = cost["flops"]
            out["achieved_tflops"] = cost["flops"] * batches_per_s / 1e12
        if "bytes_accessed" in cost:
            out["kernel_bytes_per_batch"] = cost["bytes_accessed"]
            out["achieved_gbps"] = (
                cost["bytes_accessed"] * batches_per_s / 1e9
            )
        return out

    def _timed_search(
        self,
        algorithm: BaseAlgorithm,
        queries: np.ndarray,
        k: int,
        repeat: Optional[int] = None,
    ) -> Tuple[np.ndarray, np.ndarray, float, float]:
        """Batched timing loop with warm-up exclusion and single-query
        fallback (reference experiment_runner.py:420-455).

        ``repeat`` (per-algorithm override of ``config.repeat``) sets how
        many passes of the full query stream the fused program folds into
        one execution: runtimes with a fixed per-program dispatch cost
        (~27 ms on the tunnel) under-report fast rows at low repeat, while
        slow rows (covertree) cannot afford many passes — hence per-row
        control."""
        n = queries.shape[0]
        batch = self.config.query_batch_size or n
        indices = np.full((n, k), -1, dtype=np.int64)
        query_times = np.zeros(n, dtype=np.float64)

        # Warm-up on the first batch: triggers compilation, excluded from QPS.
        warmup_start = time.perf_counter()
        try:
            algorithm.batch_search(queries[: min(batch, n)], k)
            use_batch = True
        except (AttributeError, NotImplementedError, TypeError, ValueError):
            use_batch = False
            algorithm.search(queries[0], k)
        warmup_s = time.perf_counter() - warmup_start
        algorithm.reset_operations()

        total = 0.0
        fused = getattr(algorithm, "has_device_kernel", False) and use_batch
        if fused:
            # Fold the whole query stream — batches AND `repeat` passes —
            # into ONE compiled program (scan over batches, fori over
            # repeats with a data dependency so the compiler cannot hoist
            # the loop body). Timing covers dispatch through full host
            # materialisation: on runtimes with high per-execution latency,
            # "block_until_ready" can return before work completes, so the
            # only honest clock stops after the results are on the host.
            import jax
            import jax.numpy as jnp

            if repeat is None:
                repeat = getattr(self.config, "repeat", 1)
            repeats = max(1, int(repeat or 1))
            padded_n = -(-n // batch) * batch
            q_pad = np.zeros((padded_n, queries.shape[1]), dtype=np.float32)
            q_pad[:n] = queries
            nb = padded_n // batch
            q_dev = jnp.asarray(q_pad.reshape(nb, batch, queries.shape[1]))

            # The index arrays MUST enter the jitted program as runtime
            # arguments: closure-captured device arrays lower as embedded
            # HLO constants, ballooning the program (multi-minute compiles,
            # upload-size failures on GB-scale indexes).
            art = getattr(algorithm, "artifact", None)
            data_leaves, data_treedef = jax.tree_util.tree_flatten(
                art.data if art is not None else {}
            )

            def stream(qs, leaves):
                if art is not None:
                    art.data = jax.tree_util.tree_unflatten(
                        data_treedef, leaves
                    )

                # scan unroll: the XLA while-loop costs ~0.6 ms PER
                # ITERATION on this backend (scripts/exp_flagship_unroll.py:
                # 126k -> 205k QPS from unroll 1 -> 32 on the flagship).
                # Unrolling merges loop steps; per-pass compute and the
                # carry dependency are unchanged, so passes still execute
                # in order — this only removes loop bookkeeping.
                def one_pass(jitter):
                    def body(_, qb):
                        d, i = algorithm.device_kernel(qb + jitter, k)
                        return None, (d, i)

                    _, (d, i) = jax.lax.scan(
                        body, None, qs, unroll=min(4, qs.shape[0])
                    )
                    return d, i

                def rep_body(carry, _x):
                    # carry-derived jitter (always zero in value, unknown to
                    # the compiler) defeats loop-invariant hoisting
                    jitter = carry * jnp.float32(0.0)
                    d, i = one_pass(jitter)
                    return jnp.max(d[0, 0]) * jnp.float32(1e-38), (d, i)

                _, (d, i) = jax.lax.scan(
                    rep_body, jnp.float32(0.0), None, length=repeats,
                    unroll=min(8, repeats),
                )
                return d[-1], i[-1]

            try:
                compiled = jax.jit(stream)
                warm = compiled(q_dev, data_leaves)  # compile+warm (excluded)
                np.asarray(warm[1])
                t0 = time.perf_counter()
                d_dev, i_dev = compiled(q_dev, data_leaves)
                ids_all = np.asarray(i_dev)  # [nb, batch, kk]
                total = (time.perf_counter() - t0) / repeats
                ids_flat = ids_all.reshape(padded_n, -1)[:n]
                indices[:, : ids_flat.shape[1]] = ids_flat
                query_times[:] = total / max(n, 1)
                if hasattr(algorithm, "record_stream_ops"):
                    algorithm.record_stream_ops(n)
            except Exception as exc:
                # oversized fused programs can exceed backend compile
                # limits; fall back to the per-batch sync loop
                logger.warning(
                    "fused stream failed (%s); falling back to sync timing",
                    exc,
                )
                fused = False
            finally:
                if art is not None:
                    art.data = jax.tree_util.tree_unflatten(
                        data_treedef, data_leaves
                    )
        if not fused and use_batch:
            for start in range(0, n, batch):
                end = min(start + batch, n)
                t0 = time.perf_counter()
                _, ids = algorithm.batch_search(queries[start:end], k)
                elapsed = time.perf_counter() - t0
                indices[start:end] = ids
                query_times[start:end] = elapsed / (end - start)
                total += elapsed
        elif not fused:
            for i in range(n):
                t0 = time.perf_counter()
                _, ids = algorithm.search(queries[i], k)
                elapsed = time.perf_counter() - t0
                indices[i] = ids
                query_times[i] = elapsed
                total += elapsed
        return indices, query_times, warmup_s, max(total, float(query_times.sum()))

    # -- outputs ---------------------------------------------------------
    def _save_algorithm_results(self, name: str) -> None:
        path = os.path.join(self.output_dir, f"{name}_results.json")
        with open(path, "w") as f:
            json.dump(self.results[name], f, indent=2, default=str)

    def _save_combined_results(self) -> None:
        path = os.path.join(
            self.output_dir, f"{self.config.output_prefix}_all_results.json"
        )
        with open(path, "w") as f:
            json.dump(self.results, f, indent=2, default=str)
        self.config.save(os.path.join(self.output_dir, "config_used.yaml"))

    def _generate_plots(self, evaluator: Evaluator) -> None:
        try:
            evaluator.plot_recall_vs_qps(
                os.path.join(self.output_dir, "recall_vs_qps.png")
            )
            if "glove" in self.config.dataset:
                evaluator.plot_operations_vs_recall(
                    os.path.join(self.output_dir, "operations_vs_recall.png")
                )
        except Exception as exc:  # plots must never kill a run
            logger.warning("plot generation failed: %s", exc)
