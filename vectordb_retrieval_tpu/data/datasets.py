"""Dataset manager: random / glove50 / sift1m / msmarco (pre-embedded).

Capability parity with reference src/benchmark/dataset.py:26-1729, redesigned:
  * ground truth is computed **on device** with the exact MXU scan
    (replacing the reference's FAISS brute-force GT, dataset.py:858-964) —
    on TPU this turns the most expensive prep step into seconds;
  * caching is a single .npz per (name, options-hash) with a JSON sidecar
    (replacing the reference's pickle + bespoke memmap protocol,
    dataset.py:237-471) plus optional np.memmap staging for large corpora;
  * parsers: .fvecs/.ivecs (SIFT1M, dataset.py:522-574), GloVe txt
    (dataset.py:611-663), pre-embedded .npy dirs (dataset.py:966-1108).

Downloads are attempted only when files are absent and the host has egress;
all loaders work offline against local files.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import numpy as np

from vectordb_retrieval_tpu.utils.hashing import stable_hash

CACHE_KEY_VERSION = 3
# The key hashes (name, options, gt_method, version) — generator DEFAULT
# values are not in it, so default changes MUST bump the version or stale
# caches silently serve the old distribution.
# v2: msmarco_surrogate round-3 recalibration (anisotropy 0.45, zipf 0.45,
# radius_var 0.85, outlier_frac 0.03, outlier_scale 6).
# v3: glove50_surrogate round-3 recalibration (point_scale 1.7) under
# exact nprobe semantics + the reverse-edge node graph.
GROUND_TRUTH_METHOD = "tpu_exact_v2"


def compute_ground_truth(
    train: np.ndarray,
    queries: np.ndarray,
    k: int,
    metric: str = "l2",
    normalize: bool = False,
) -> np.ndarray:
    """Exact top-k ground truth via the device MXU scan (ids only).

    ``train`` may be an ndarray, ``np.memmap`` or ``BigStore`` — out-of-core
    sources run the fully streaming scan (O(chunk) host AND device memory,
    same cancellation-free rescore; data/storage.streamed_exact_search)."""
    import jax.numpy as jnp

    from vectordb_retrieval_tpu.data.storage import (
        is_out_of_core,
        streamed_exact_search,
    )
    from vectordb_retrieval_tpu.ops import distances as dops

    if is_out_of_core(train):
        k = min(k, train.shape[0])
        eff_metric = metric
        norm = normalize
        if metric == "cosine" or normalize:
            eff_metric, norm = "ip", True
        _, ids = streamed_exact_search(
            queries, train, k, metric=eff_metric, normalize=norm
        )
        return np.asarray(ids, dtype=np.int64)

    from vectordb_retrieval_tpu.data.storage import corpus_to_device

    x = corpus_to_device(train)
    q = jnp.asarray(np.ascontiguousarray(queries, dtype=np.float32))
    if metric == "cosine" or normalize:
        x = dops.normalize(x)
        q = dops.normalize(q)
        metric = "ip"
    k = min(k, x.shape[0])
    # refine: cancellation-free rescoring so GT ranking is exact to f32
    # rounding (consistent tie behaviour framework-wide)
    _, ids = dops.exact_search(q, x, k, metric=metric, refine=True)
    return np.asarray(ids, dtype=np.int64)


def read_fvecs(path: str, limit: Optional[int] = None) -> np.ndarray:
    """Parse .fvecs: per-row int32 dim header then dim float32s.

    Uses the native mmap/multithreaded parser (native/vrt_io.cpp) when the
    library is built; NumPy fallback otherwise.
    """
    from vectordb_retrieval_tpu.data import native_io

    if native_io.available():
        return native_io.read_fvecs(path, limit)
    raw = np.fromfile(path, dtype=np.int32)
    if raw.size == 0:
        return np.zeros((0, 0), dtype=np.float32)
    dim = int(raw[0])
    row = dim + 1
    n = raw.size // row
    if limit is not None:
        n = min(n, limit)
    mat = raw[: n * row].reshape(n, row)
    if not np.all(mat[:, 0] == dim):
        raise ValueError(f"inconsistent fvecs dims in {path}")
    return mat[:, 1:].view(np.float32).copy()


def read_ivecs(path: str, limit: Optional[int] = None) -> np.ndarray:
    from vectordb_retrieval_tpu.data import native_io

    if native_io.available():
        return native_io.read_ivecs(path, limit)
    raw = np.fromfile(path, dtype=np.int32)
    if raw.size == 0:
        return np.zeros((0, 0), dtype=np.int32)
    dim = int(raw[0])
    row = dim + 1
    n = raw.size // row
    if limit is not None:
        n = min(n, limit)
    return raw[: n * row].reshape(n, row)[:, 1:].copy()


def _download(url: str, dest: str) -> None:
    """Fetch ``url`` to ``dest`` atomically; partial files removed on error
    (reference dataset.py:164-211). Works for http(s) and ftp URLs."""
    import urllib.request

    os.makedirs(os.path.dirname(dest), exist_ok=True)
    tmp = dest + ".part"
    try:
        with urllib.request.urlopen(url, timeout=60) as r, open(tmp, "wb") as f:
            while True:
                chunk = r.read(1 << 20)
                if not chunk:
                    break
                f.write(chunk)
        os.replace(tmp, dest)
    except Exception:
        if os.path.exists(tmp):
            os.remove(tmp)
        raise


SIFT1M_URL = "ftp://ftp.irisa.fr/local/texmex/corpus/sift.tar.gz"
GLOVE_URL = "https://nlp.stanford.edu/data/glove.6B.zip"


def ensure_sift1m(root: str) -> None:
    """Download + extract SIFT1M if the .fvecs files are absent."""
    base = os.path.join(root, "sift_base.fvecs")
    if os.path.exists(base):
        return
    import tarfile

    archive = os.path.join(root, "sift.tar.gz")
    if not os.path.exists(archive):
        _download(SIFT1M_URL, archive)
    with tarfile.open(archive, "r:gz") as tf:
        # 'data' filter blocks path traversal from a tampered archive
        tf.extractall(root, filter="data")
    # archive extracts into sift/; move files up
    inner = os.path.join(root, "sift")
    if os.path.isdir(inner):
        for name in os.listdir(inner):
            os.replace(os.path.join(inner, name), os.path.join(root, name))


def ensure_glove50(path: str) -> None:
    """Download + extract glove.6B.50d.txt if absent."""
    if os.path.exists(path):
        return
    import zipfile

    root = os.path.dirname(path)
    archive = os.path.join(root, "glove.6B.zip")
    if not os.path.exists(archive):
        _download(GLOVE_URL, archive)
    with zipfile.ZipFile(archive) as zf:
        zf.extract("glove.6B.50d.txt", root)
    if not os.path.exists(path):
        raise FileNotFoundError(
            f"glove archive extracted to {root} but {path} still missing "
            "(custom glove_path must point at glove.6B.50d.txt)"
        )


class Dataset:
    """Loads a named dataset exposing train/test vectors + ground truth.

    API parity with reference Dataset (dataset.py:219-279): construct with
    ``(name, data_dir, options)``, call ``load()``, then read
    ``.train_vectors / .test_vectors / .ground_truth / .metric``.
    """

    CATALOG = (
        "random", "glove50", "glove50_surrogate", "sift1m", "msmarco",
        "msmarco_surrogate", "manifold",
    )

    def __init__(
        self,
        name: str,
        data_dir: str = "data",
        options: Optional[Dict[str, Any]] = None,
    ):
        self.name = name
        self.data_dir = data_dir
        self.options = dict(options or {})
        self.train_vectors: Optional[np.ndarray] = None
        self.test_vectors: Optional[np.ndarray] = None
        self.ground_truth: Optional[np.ndarray] = None
        self.metric = self.options.get("metric", "l2")
        self.metadata: Dict[str, Any] = {}

    # -- caching --------------------------------------------------------
    def _cache_key(self) -> str:
        payload = {
            "name": self.name,
            "options": self.options,
            "gt_method": GROUND_TRUTH_METHOD,
            "cache_key_version": CACHE_KEY_VERSION,
        }
        return stable_hash(payload)[:12]

    def _cache_path(self) -> str:
        return os.path.join(
            self.data_dir, "cache", f"{self.name}_{self._cache_key()}.npz"
        )

    def _store_path(self) -> str:
        return os.path.join(
            self.data_dir,
            "cache",
            f"{self.name}_{self._cache_key()}_train.bin",
        )

    @property
    def _memmap_mode(self) -> bool:
        """True when the train corpus lives in an out-of-core BigStore
        (``storage: memmap`` option — the >RAM staging path)."""
        return self.options.get("storage") == "memmap"

    def _load_cache(self) -> bool:
        from vectordb_retrieval_tpu.data.storage import BigStore

        path = self._cache_path()
        if not os.path.exists(path):
            return False
        try:
            with np.load(path, allow_pickle=False) as z:
                if "train" in z.files:
                    self.train_vectors = z["train"]
                elif BigStore.exists(self._store_path()):
                    # out-of-core train corpus: lazy read-only memmap view
                    self.train_vectors = BigStore.open(
                        self._store_path()
                    ).as_memmap()
                else:
                    return False
                self.test_vectors = z["test"]
                self.ground_truth = z["gt"]
            meta_path = path + ".json"
            if os.path.exists(meta_path):
                with open(meta_path) as f:
                    self.metadata = json.load(f)
            # loaders may override the metric (msmarco defaults to cosine
            # inside its loader); a cache hit must restore that choice or
            # consumers would pair an l2 index with cosine ground truth
            self.metric = self.metadata.get("metric", self.metric)
            return True
        except Exception:
            return False

    def _save_cache(self) -> None:
        path = self._cache_path()
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = path + ".tmp.npz"
        payload = {"test": self.test_vectors, "gt": self.ground_truth}
        if not isinstance(self.train_vectors, np.memmap):
            # memmap corpora already live in the BigStore next to the npz;
            # materialising them into the npz would defeat the RSS bound.
            payload["train"] = self.train_vectors
        np.savez(tmp, **payload)
        os.replace(tmp, path)
        with open(path + ".json", "w") as f:
            json.dump(self.metadata, f, indent=2)

    # -- loading --------------------------------------------------------
    def load(self) -> "Dataset":
        if self.name not in self.CATALOG:
            raise ValueError(
                f"unknown dataset {self.name!r}; known: {self.CATALOG}"
            )
        use_cache = bool(self.options.get("use_cache", True))
        if use_cache and self._load_cache():
            return self
        loader = getattr(self, f"_load_{self.name}")
        loader()
        self.metadata.update(
            {
                "name": self.name,
                "n_train": int(self.train_vectors.shape[0]),
                "n_test": int(self.test_vectors.shape[0]),
                "dimensions": int(self.train_vectors.shape[1]),
                "ground_truth_k": int(self.ground_truth.shape[1]),
                "metric": self.metric,
                "gt_method": GROUND_TRUTH_METHOD,
            }
        )
        if use_cache:
            self._save_cache()
        return self

    def _gt_k(self) -> int:
        return int(self.options.get("ground_truth_k", 100))

    def _load_random(self) -> None:
        """Seeded gaussian synthesis (reference dataset.py:473-504).

        With ``storage: memmap`` the train corpus is generated chunk-by-chunk
        straight into an on-disk BigStore (never fully materialised on the
        host) and exposed as a read-only memmap — the >RAM staging path
        (reference memmap protocol v2, dataset.py:281-471)."""
        dim = int(self.options.get("dimensions", 128))
        n_train = int(self.options.get("train_size", 10000))
        n_test = int(self.options.get("test_size", 1000))
        seed = int(self.options.get("seed", 42))
        rng = np.random.default_rng(seed)
        if self._memmap_mode:
            from vectordb_retrieval_tpu.data.storage import BigStore

            chunk = int(self.options.get("chunk_rows", 1 << 18))
            with BigStore.create(self._store_path(), dim) as store:
                for start in range(0, n_train, chunk):
                    rows = min(chunk, n_train - start)
                    store.append(
                        rng.standard_normal((rows, dim), dtype=np.float32)
                    )
            self.train_vectors = BigStore.open(self._store_path()).as_memmap()
            self.metadata["train_store"] = self._store_path()
        else:
            self.train_vectors = rng.standard_normal(
                (n_train, dim), dtype=np.float32
            )
        self.test_vectors = rng.standard_normal((n_test, dim), dtype=np.float32)
        self.ground_truth = compute_ground_truth(
            self.train_vectors, self.test_vectors, self._gt_k(), self.metric
        )

    def _load_sift1m(self) -> None:
        """SIFT1M from local .fvecs/.ivecs files (reference dataset.py:576-609).

        Expects ``{data_dir}/sift1m/sift_{base,query,learn}.fvecs`` and
        optionally ``sift_groundtruth.ivecs``; recomputes GT on device when
        the file is missing or when limits alter the base set.
        """
        root = os.path.join(self.data_dir, self.options.get("subdir", "sift1m"))
        if not os.path.exists(os.path.join(root, "sift_base.fvecs")):
            try:
                ensure_sift1m(root)
            except Exception as exc:
                raise FileNotFoundError(
                    f"SIFT1M files missing under {root} and download failed "
                    f"({exc}); place sift_base.fvecs / sift_query.fvecs there"
                ) from exc
        # provenance: the generated stand-in corpus (make_sift1m_surrogate)
        # must be labelled surrogate in reports — real TEXMEX files carry
        # no marker and no "synth" dir name
        marker = os.path.join(root, "PROVENANCE.json")
        if os.path.exists(marker) or "synth" in os.path.basename(root):
            self.metadata["surrogate"] = True
            self.metadata["surrogate_for"] = "SIFT1M (TEXMEX 128d)"
        base_limit = self.options.get("base_limit")
        query_limit = self.options.get("test_size", self.options.get("query_limit"))
        base = read_fvecs(os.path.join(root, "sift_base.fvecs"), base_limit)
        queries = read_fvecs(os.path.join(root, "sift_query.fvecs"), query_limit)
        self.train_vectors = base
        self.test_vectors = queries
        gt_path = os.path.join(root, "sift_groundtruth.ivecs")
        gt = None
        # the TEXMEX file is L2 ground truth with 100 columns: only trust
        # it when the metric matches and it is wide enough for gt_k
        if (
            base_limit is None
            and self.metric == "l2"
            and os.path.exists(gt_path)
        ):
            gt = read_ivecs(gt_path, query_limit).astype(np.int64)
            if gt.shape[1] < self._gt_k():
                gt = None
        if gt is not None:
            self.ground_truth = gt[:, : self._gt_k()]
        else:
            self.ground_truth = compute_ground_truth(
                base, queries, self._gt_k(), self.metric
            )

    def _load_glove50(self) -> None:
        """GloVe-50 from local txt (reference dataset.py:611-663): parse,
        optional subsample, random train/test split, device GT."""
        path = self.options.get(
            "glove_path", os.path.join(self.data_dir, "glove50", "glove.6B.50d.txt")
        )
        if not os.path.exists(path):
            try:
                ensure_glove50(path)
            except Exception as exc:
                raise FileNotFoundError(
                    f"GloVe file missing at {path} and download failed "
                    f"({exc}); place glove.6B.50d.txt there"
                ) from exc
        train_limit = self.options.get("train_limit")
        test_size = int(self.options.get("test_size", 1000))
        seed = int(self.options.get("seed", 42))
        vecs = []
        limit_rows = (train_limit + test_size) if train_limit else None
        with open(path, "r", encoding="utf-8") as f:
            for line_no, line in enumerate(f):
                if limit_rows is not None and line_no >= limit_rows:
                    break
                parts = line.rstrip().split(" ")
                vecs.append(np.asarray(parts[1:], dtype=np.float32))
        mat = np.stack(vecs)
        rng = np.random.default_rng(seed)
        perm = rng.permutation(mat.shape[0])
        test_idx, train_idx = perm[:test_size], perm[test_size:]
        if train_limit:
            train_idx = train_idx[:train_limit]
        self.train_vectors = np.ascontiguousarray(mat[train_idx])
        self.test_vectors = np.ascontiguousarray(mat[test_idx])
        self.ground_truth = compute_ground_truth(
            self.train_vectors, self.test_vectors, self._gt_k(), self.metric
        )

    def _load_glove50_surrogate(self) -> None:
        """Distribution-matched GloVe-50 stand-in (NOT real data).

        This bench host has zero egress (data/download_attempts.log records
        the failed fetches of the reference's GloVe zip,
        dataset.py:611-663), so this generator synthesises a corpus with
        glove.6B.50d's published structural statistics:

          * anisotropic spectrum: per-component scale ~ (i+1)^-alpha —
            GloVe vectors concentrate variance in a few directions (Mu &
            Viswanath 2018, "All-but-the-Top");
          * Zipf-weighted hierarchical clusters (semantic neighbourhoods;
            word-frequency skew) — parents + tight children;
          * a common mean offset (GloVe's non-centred geometry) and
            log-normal radial spread with mean norm ~4.4 (typical
            glove.6B.50d row norms).

        The knobs were calibrated so the framework's FAISS-equivalent
        algorithms, configured EXACTLY like the reference's glove50 rows,
        land near the reference's measured recalls
        (scripts/calibrate_glove_surrogate.py). The shipped defaults
        (anisotropy 0.0, point_scale 1.7, child_scale 1.2 —
        round-3 recalibration under the exact 'probe nprobe lists'
        semantics and the reverse-edge node graph) reproduce the
        reference's five glove50 recall rows within max |err| = 0.015:
        ivf_flat 0.869 (ref 0.870), ivf_pq 0.921 (0.909), ivf_sq8 0.915
        (0.911), pq 0.985 (0.982), hnsw 0.960 (0.975) — calibration chose
        the flat spectrum: difficulty match beat the anisotropy prior.
        Results on this dataset are labelled surrogate in benchmark
        metadata — they are difficulty-matched, not real-GloVe numbers.
        """
        d = 50
        n_train = int(self.options.get("train_limit", 20000))
        n_test = int(self.options.get("test_size", 256))
        seed = int(self.options.get("seed", 11))
        alpha = float(self.options.get("anisotropy", 0.0))
        n_parents = int(self.options.get("n_parents", 160))
        children_per = int(self.options.get("children_per_parent", 6))
        child_scale = float(self.options.get("child_scale", 1.2))
        point_scale = float(self.options.get("point_scale", 1.7))
        mean_norm = float(self.options.get("mean_norm", 4.4))

        rng = np.random.default_rng(seed)
        n = n_train + n_test
        spectrum = (np.arange(1, d + 1, dtype=np.float32)) ** (-alpha)
        spectrum /= np.sqrt(np.mean(spectrum**2))

        parents = rng.standard_normal((n_parents, d)).astype(np.float32)
        children = (
            parents[:, None, :]
            + child_scale
            * rng.standard_normal((n_parents, children_per, d)).astype(
                np.float32
            )
        ).reshape(n_parents * children_per, d)
        # Zipfian cluster occupancy (frequency-skewed semantic clusters)
        ranks = np.arange(1, children.shape[0] + 1, dtype=np.float64)
        probs = ranks**-0.85
        probs /= probs.sum()
        assign = rng.choice(children.shape[0], size=n, p=probs)
        pts = children[assign] + point_scale * rng.standard_normal(
            (n, d)
        ).astype(np.float32)
        # diffuse background mass (rare words scatter far from any cluster)
        bg_frac = float(self.options.get("background_frac", 0.0))
        if bg_frac > 0:
            n_bg = int(n * bg_frac)
            bg_rows = rng.choice(n, size=n_bg, replace=False)
            bg_scale = float(np.linalg.norm(pts, axis=1).mean()) / np.sqrt(d)
            pts[bg_rows] = bg_scale * rng.standard_normal(
                (n_bg, d)
            ).astype(np.float32)
        pts *= spectrum[None, :]
        # common (non-centred) offset along a fixed direction
        mu_dir = rng.standard_normal(d).astype(np.float32) * spectrum
        mu_dir /= np.linalg.norm(mu_dir)
        pts += 0.35 * np.linalg.norm(pts, axis=1).mean() * mu_dir[None, :]
        # log-normal radial spread, rescaled to the target mean norm
        radial = rng.lognormal(0.0, 0.28, size=n).astype(np.float32)
        pts *= radial[:, None]
        pts *= mean_norm / np.linalg.norm(pts, axis=1).mean()

        perm = rng.permutation(n)
        self.train_vectors = np.ascontiguousarray(pts[perm[:n_train]])
        self.test_vectors = np.ascontiguousarray(pts[perm[n_train:]])
        self.metadata["surrogate"] = True
        self.metadata["surrogate_for"] = "glove50"
        self.ground_truth = compute_ground_truth(
            self.train_vectors, self.test_vectors, self._gt_k(), self.metric
        )

    def _load_msmarco_surrogate(self) -> None:
        """Difficulty-calibrated MiniLM-384d stand-in (NOT real data).

        Real MS MARCO MiniLM embeddings need an egress-enabled host
        (data/download_attempts.log; reference embed_msmarco.py:149-172).
        This generator synthesises unit vectors with the structural
        statistics that set quantisation difficulty for sentence-encoder
        embeddings:

          * power-law anisotropic spectrum (variance ~ (i+1)^-alpha) in a
            random rotated basis — transformer embeddings concentrate
            variance in a few hundred directions (Ethayarajh 2019);
          * Zipf-occupied hierarchical topic clusters (parents + children)
            — passages cluster by topic with frequency skew;
          * queries drawn NEAR passage clusters with extra spread (real
            queries are short texts embedded into the same space).

        Knobs are calibrated (scripts/calibrate_msmarco_surrogate.py) so
        the framework's algorithms, configured EXACTLY like the
        reference's msmarco rows (IVF100,Flat np10 / IVF256,PQ64 np48 /
        IVF256,SQ8 np48 / PQ64 / hnsw M16 ef100), land near the
        reference's real-MiniLM recalls
        (benchmark_20260305_070532/benchmark_summary.md:43-50).
        Results on this dataset are labelled surrogate in benchmark
        metadata — difficulty-matched, not real-MiniLM numbers.
        """
        d = int(self.options.get("dim", 384))
        n_train = int(self.options.get("train_limit", 100_000))
        n_test = int(self.options.get("test_size", 200))
        seed = int(self.options.get("seed", 13))
        # Shipped defaults = the round-3 calibration winner (TPU grid,
        # exact nprobe semantics): identically-configured ivf_flat /
        # ivf_pq / ivf_sq8 / pq land within max|err| = 0.042 of the
        # reference's real-MiniLM recalls (0.9529 / 0.6986 / 0.9471 /
        # 0.7757 — reference benchmark_20260305_070532/
        # benchmark_summary.md:43-50; measured -0.006 / +0.040 / +0.007 /
        # -0.042). The residual +-0.04 on the PQ pair is a FAMILY limit:
        # in any energy-preserving gaussian-mixture surrogate, residual
        # coding is at least as easy as global coding, so the reference's
        # pq (0.776) > ivf_pq (0.699) inequality can only be approached,
        # not reproduced — every knob moves the pair together (grid logs:
        # scripts/calibrate_msmarco_surrogate.py).
        alpha = float(self.options.get("anisotropy", 0.45))
        n_parents = int(self.options.get("n_parents", 384))
        children_per = int(self.options.get("children_per_parent", 8))
        child_scale = float(self.options.get("child_scale", 0.9))
        point_scale = float(self.options.get("point_scale", 0.55))
        query_scale = float(self.options.get("query_scale", 0.8))
        # Topic-frequency skew: occupancy of child cluster rank r ~ r^-zipf.
        # High values over-crowd the head clusters (thousands of
        # near-duplicates -> vanishing neighbour margins -> flat-PQ recall
        # collapses far below the real-MiniLM level); the calibrated value
        # keeps the skew without the pile-up.
        zipf = float(self.options.get("zipf", 0.45))

        # Degree to which the variance spectrum stays in the NATIVE
        # coordinate basis (0 = fully random-rotated, 1 = axis-aligned).
        # Measured direction (calibration grid): alignment HURTS global
        # PQ (0.63 -> 0.58 at 0.5, -> 0.36 at 0.75) — with the spectrum
        # axis-aligned the first consecutive 6-dim PQ group carries the
        # dominant variance with only 256 centroids, while a random
        # rotation spreads variance evenly over all groups (the same
        # balancing OPQ's rotation performs). Kept at 0 for the shipped
        # calibration; the knob remains for sensitivity studies.
        align = float(self.options.get("spectrum_align", 0.0))

        # Per-cluster covariance heterogeneity: each child cluster's
        # scatter gets its own per-dimension lognormal scale vector
        # (sigma = cluster_var), rms-normalised per cluster so total
        # scatter energy — and hence coarse-quantiser / flat / graph
        # difficulty — is unchanged. What it changes is the SHAPE of the
        # residual distribution per list: IVF-PQ trains one shared
        # residual codebook over all lists (ops/pq.py), so heterogeneous
        # residual covariances make residual coding strictly harder,
        # mirroring real sentence embeddings where residual IVF-PQ
        # (ref 0.699) underperforms global PQ (ref 0.776). Without this
        # knob the surrogate had the inequality BACKWARDS (ivf_pq 0.81 >
        # pq 0.78 at the otherwise-best setting).
        cluster_var = float(self.options.get("cluster_var", 0.0))

        # Per-cluster RADIUS heterogeneity: each child cluster's scatter
        # gets one lognormal scale (sigma = radius_var), mean-energy
        # normalised so the corpus-level scatter budget is unchanged.
        # Distinct from ``cluster_var`` (per-dimension SHAPE, rms-fixed):
        # radius spread is the axis that makes residual IVF-PQ
        # specifically hard — the shared residual codebook's cell size is
        # set by the GLOBAL residual energy, so tight topics (small
        # radius, small neighbour margins) get quantised at a spacing
        # tuned for diffuse ones, scrambling their rankings. Real MiniLM
        # shows exactly this signature: residual coding (ivf_pq/ivf_sq8 =
        # 0.738) UNDERPERFORMS global coding (pq = 0.776), which no
        # energy-preserving shape knob reproduced.
        radius_var = float(self.options.get("radius_var", 0.85))

        # Heavy-tailed point scatter: student-t with ``tail_df`` degrees
        # of freedom (variance-normalised; 0 = gaussian). Quantiser-
        # SELECTIVE difficulty: exact scoring (ivf_flat lists, graph) is
        # indifferent to the coordinate value distribution, but 8-bit
        # affine SQ ranges and 256-codeword PQ cells are stretched by
        # outliers, inflating quantisation error relative to neighbour
        # margins — the axis the round-2 surrogate had uniformly too easy
        # (sq8 +0.05, pq +0.05, ivf_pq +0.11 vs the real-MiniLM targets
        # while ivf_flat sat ON target).
        tail_df = float(self.options.get("tail_df", 0.0))

        # Stray points: a fraction of passages displaced ``outlier_scale``
        # x the point scatter. Their coarse-list assignment is then weakly
        # coupled to the topic geometry, so when a stray IS a true
        # neighbour it tends to live in a list the query ranks poorly —
        # fattening the tail of the neighbour-list-rank CDF. This is the
        # coverage axis the gaussian surrogate lacks: its CDF saturates by
        # ~10% of lists probed (ivf_sq8 0.99 at nprobe 48/256 vs the
        # real-MiniLM 0.947), while real embeddings keep paying for more
        # probes. Exact search is unaffected (GT includes strays).
        outlier_frac = float(self.options.get("outlier_frac", 0.03))
        outlier_scale = float(self.options.get("outlier_scale", 6.0))

        rng = np.random.default_rng(seed)

        def scatter(*shape: int) -> np.ndarray:
            if tail_df > 2.0:
                out = rng.standard_t(tail_df, size=shape)
                out /= np.sqrt(tail_df / (tail_df - 2.0))
                return out.astype(np.float32)
            return rng.standard_normal(shape).astype(np.float32)
        spectrum = (np.arange(1, d + 1, dtype=np.float32)) ** (-alpha)
        spectrum /= np.sqrt(np.mean(spectrum**2))
        # random rotation so the spectrum is not trivially axis-aligned;
        # ``align`` interpolates back toward the identity (columns
        # renormalised so each spectrum component keeps its scale)
        basis, _ = np.linalg.qr(rng.standard_normal((d, d)))
        if align:
            basis = (1.0 - align) * basis + align * np.eye(d)
            basis /= np.maximum(
                np.linalg.norm(basis, axis=0, keepdims=True), 1e-12
            )
        basis = (basis * spectrum[None, :]).astype(np.float32)  # scaled

        parents = rng.standard_normal((n_parents, d)).astype(np.float32)
        children = (
            parents[:, None, :]
            + child_scale
            * rng.standard_normal((n_parents, children_per, d)).astype(
                np.float32
            )
        ).reshape(n_parents * children_per, d)
        ranks = np.arange(1, children.shape[0] + 1, dtype=np.float64)
        probs = ranks**-zipf
        probs /= probs.sum()
        if cluster_var:
            shapes = np.exp(
                cluster_var
                * rng.standard_normal((children.shape[0], d))
            ).astype(np.float32)
            shapes /= np.sqrt(
                np.mean(shapes**2, axis=1, keepdims=True)
            )  # per-cluster energy preserved
        else:
            shapes = np.ones((children.shape[0], d), np.float32)
        if radius_var:
            radii = np.exp(
                radius_var * rng.standard_normal(children.shape[0])
            ).astype(np.float32)
            radii /= np.sqrt(np.mean(radii**2))  # corpus energy preserved
            shapes = shapes * radii[:, None]
        assign = rng.choice(children.shape[0], size=n_train, p=probs)
        point_mult = np.ones((n_train, 1), np.float32)
        if outlier_frac > 0.0:
            stray = rng.random(n_train) < outlier_frac
            point_mult[stray] = outlier_scale
        pts = children[assign] + point_scale * point_mult * shapes[
            assign
        ] * scatter(n_train, d)
        # queries: near passage clusters, wider spread, same cluster shapes
        q_assign = rng.choice(children.shape[0], size=n_test, p=probs)
        qs = children[q_assign] + query_scale * shapes[
            q_assign
        ] * scatter(n_test, d)

        def shape(v: np.ndarray) -> np.ndarray:
            v = v @ basis.T  # impose the anisotropic spectrum
            return v / np.maximum(
                np.linalg.norm(v, axis=1, keepdims=True), 1e-12
            )

        self.train_vectors = np.ascontiguousarray(shape(pts))
        self.test_vectors = np.ascontiguousarray(shape(qs))
        self.metric = self.options.get("metric", "cosine")
        self.metadata["surrogate"] = True
        self.metadata["surrogate_for"] = "msmarco (MiniLM-L6-v2 384d)"
        self.ground_truth = compute_ground_truth(
            self.train_vectors, self.test_vectors, self._gt_k(), self.metric
        )

    def _load_manifold(self) -> None:
        """Locally low-rank 'manifold' corpus (synthetic, labelled as such).

        Evidence vehicle for per-list structure (round-3 verdict item:
        the energy-preserving gaussian-mixture surrogates provably cannot
        reproduce the reference's real-data ``pq > ivf_pq`` inequality,
        benchmark_20260305_070532/benchmark_summary.md:46,48). Points live
        on K local patches, each with its OWN random ``r``-dimensional
        oriented frame and power-law singular spectrum:

            x = c_k + U_k (s ⊙ z) + eps * n,   z ~ N(0, I_r)

        Per-patch orientation is the axis the gaussian family lacks:

          * IVF's coarse quantiser tracks patch centers, so each inverted
            list's residuals concentrate in that patch's OWN r-dim frame;
            a SHARED residual codebook (FAISS IVFPQ semantics, ops/pq.py)
            is trained on the isotropised mixture of differently-oriented
            frames and quantises every list badly — residual coding gets
            strictly harder than on any shared-frame corpus;
          * global PQ sees the raw mixture whose subvector marginals carry
            the patch-center structure it can code directly, so its recall
            can EXCEED ivf_pq's (the real-data inequality);
          * per-list rotations (ops/pq.train_per_list_rotations) re-align
            the shared codebook to each list's local frame — this corpus
            is exactly the case they were built for, and the committed A/B
            (scripts/exp_manifold_rotations.py) quantifies their value.
        """
        d = int(self.options.get("dim", 128))
        n_train = int(self.options.get("train_limit", 100_000))
        n_test = int(self.options.get("test_size", 200))
        seed = int(self.options.get("seed", 29))
        n_patches = int(self.options.get("n_patches", 256))
        r = int(self.options.get("intrinsic_dim", 12))
        alpha = float(self.options.get("spectrum_alpha", 0.7))
        patch_spread = float(self.options.get("patch_spread", 1.0))
        point_scale = float(self.options.get("point_scale", 0.35))
        ambient_noise = float(self.options.get("ambient_noise", 0.02))
        query_scale = float(self.options.get("query_scale", 0.5))
        zipf = float(self.options.get("zipf", 0.3))

        rng = np.random.default_rng(seed)
        centers = patch_spread * rng.standard_normal((n_patches, d)).astype(
            np.float32
        )
        # per-patch orthonormal r-frame with power-law singular values
        frames = np.empty((n_patches, d, r), np.float32)
        for p in range(n_patches):
            q_, _ = np.linalg.qr(rng.standard_normal((d, r)))
            frames[p] = q_.astype(np.float32)
        spec = (np.arange(1, r + 1, dtype=np.float32)) ** (-alpha)
        spec /= np.sqrt(np.mean(spec**2))
        ranks = np.arange(1, n_patches + 1, dtype=np.float64)
        probs = ranks**-zipf
        probs /= probs.sum()

        def sample(n: int, scale: float) -> "np.ndarray":
            a = rng.choice(n_patches, size=n, p=probs)
            z = rng.standard_normal((n, r)).astype(np.float32) * spec[None]
            local = np.einsum("ndr,nr->nd", frames[a], z).astype(np.float32)
            eps = rng.standard_normal((n, d)).astype(np.float32)
            return (
                centers[a] + scale * local + ambient_noise * eps
            ).astype(np.float32)

        self.train_vectors = np.ascontiguousarray(sample(n_train, point_scale))
        self.test_vectors = np.ascontiguousarray(sample(n_test, query_scale))
        self.metric = self.options.get("metric", "l2")
        self.metadata["surrogate"] = True
        self.metadata["surrogate_for"] = (
            "per-list-structured corpora (synthetic manifold evidence set)"
        )
        self.ground_truth = compute_ground_truth(
            self.train_vectors, self.test_vectors, self._gt_k(), self.metric
        )

    def _load_msmarco_tfidf(self) -> None:
        """TF-IDF text path (reference dataset.py:668-856): corpus/queries
        TSVs -> hashing tf-idf + random projection -> unit vectors + GT."""
        from vectordb_retrieval_tpu.data.dataprep.embed_msmarco import read_tsv
        from vectordb_retrieval_tpu.data.tfidf import texts_to_vectors

        corpus_tsv = self.options.get("corpus_tsv")
        queries_tsv = self.options.get("queries_tsv")
        if not corpus_tsv or not queries_tsv:
            raise ValueError(
                "msmarco tf-idf mode needs options.corpus_tsv and "
                "options.queries_tsv"
            )
        dim = int(self.options.get("dimensions", 384))
        seed = int(self.options.get("seed", 42))
        _, passages = read_tsv(corpus_tsv)
        _, queries = read_tsv(queries_tsv)
        base_limit = self.options.get("base_limit")
        query_limit = self.options.get("query_limit")
        if base_limit:
            passages = passages[: int(base_limit)]
        if query_limit:
            queries = queries[: int(query_limit)]
        train, vectorizer = texts_to_vectors(passages, dim=dim, seed=seed)
        test, _ = texts_to_vectors(
            queries, dim=dim, seed=seed, vectorizer=vectorizer
        )
        self.train_vectors = train
        self.test_vectors = test
        self.metric = self.options.get("metric", "cosine")
        self.ground_truth = compute_ground_truth(
            train, test, self._gt_k(), self.metric
        )

    def _load_msmarco(self) -> None:
        """Pre-embedded MS MARCO .npy dir (reference dataset.py:966-1108):
        ``passage_embeddings.npy`` + ``query_embeddings.npy`` with
        ``base_limit``/``query_limit`` prefix slicing and device GT. With
        ``use_tfidf`` the TSV text path is used instead
        (reference dataset.py:668-856)."""
        if self.options.get("use_tfidf"):
            self._load_msmarco_tfidf()
            return
        emb_dir = self.options.get("embedded_dataset_dir")
        if not emb_dir:
            raise ValueError(
                "msmarco requires options.embedded_dataset_dir pointing at "
                "passage_embeddings.npy / query_embeddings.npy "
                "(or use_tfidf with corpus_tsv/queries_tsv)"
            )
        mmap = "r" if self.options.get("use_memmap_cache", True) else None
        passages = np.load(
            os.path.join(emb_dir, "passage_embeddings.npy"), mmap_mode=mmap
        )
        queries = np.load(
            os.path.join(emb_dir, "query_embeddings.npy"), mmap_mode=mmap
        )
        base_limit = self.options.get("base_limit")
        query_limit = self.options.get("query_limit")
        if base_limit:
            passages = passages[: int(base_limit)]
        if query_limit:
            queries = queries[: int(query_limit)]
        # keep the memmap view when possible: np.ascontiguousarray would
        # strip the np.memmap wrapper (is_out_of_core -> False) and defeat
        # the streamed-GT / bounded-RSS path this option exists for
        if (
            isinstance(passages, np.memmap)
            and passages.dtype == np.float32
            and passages.flags["C_CONTIGUOUS"]
        ):
            self.train_vectors = passages
        else:
            self.train_vectors = np.ascontiguousarray(
                passages, dtype=np.float32
            )
        self.test_vectors = np.ascontiguousarray(queries, dtype=np.float32)
        self.metric = self.options.get("metric", "cosine")
        self.ground_truth = compute_ground_truth(
            self.train_vectors, self.test_vectors, self._gt_k(), self.metric
        )
