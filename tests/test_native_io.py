"""Native IO library vs NumPy fallback parity (skipped when not built)."""

import numpy as np
import pytest

from vectordb_retrieval_tpu.data import native_io


def _write_fvecs(path, x):
    rows = []
    for row in x:
        rows.append(np.array([x.shape[1]], dtype=np.int32).tobytes())
        rows.append(row.astype(np.float32).tobytes())
    path.write_bytes(b"".join(rows))


needs_native = pytest.mark.skipif(
    not native_io.available(), reason="native library not built (make -C native)"
)


@needs_native
def test_native_fvecs_matches(tmp_path, rng):
    x = rng.standard_normal((257, 24)).astype(np.float32)
    p = tmp_path / "a.fvecs"
    _write_fvecs(p, x)
    got = native_io.read_fvecs(str(p))
    np.testing.assert_array_equal(got, x)
    assert native_io.read_fvecs(str(p), limit=10).shape == (10, 24)
    assert native_io.vecs_shape(str(p)) == (257, 24)


@needs_native
def test_native_ivecs_matches(tmp_path, rng):
    iv = rng.integers(0, 1000, size=(64, 8)).astype(np.int32)
    rows = []
    for row in iv:
        rows.append(np.array([8], dtype=np.int32).tobytes())
        rows.append(row.tobytes())
    p = tmp_path / "a.ivecs"
    p.write_bytes(b"".join(rows))
    np.testing.assert_array_equal(native_io.read_ivecs(str(p)), iv)


@needs_native
def test_native_corrupt_header_rejected(tmp_path):
    p = tmp_path / "bad.fvecs"
    good = np.array([4], dtype=np.int32).tobytes() + np.zeros(4, np.float32).tobytes()
    bad = np.array([5], dtype=np.int32).tobytes() + np.zeros(4, np.float32).tobytes()
    p.write_bytes(good + bad)
    with pytest.raises(IOError):
        native_io.read_fvecs(str(p))


def test_stream_chunks_roundtrip(tmp_path, rng):
    data = rng.integers(0, 256, size=100_000).astype(np.uint8)
    p = tmp_path / "blob.bin"
    p.write_bytes(data.tobytes())
    got = np.concatenate(list(native_io.stream_chunks(str(p), chunk_bytes=8192)))
    np.testing.assert_array_equal(got, data)
    # offset read
    got2 = np.concatenate(
        list(native_io.stream_chunks(str(p), chunk_bytes=4096, offset=50_000))
    )
    np.testing.assert_array_equal(got2, data[50_000:])


def test_dataset_read_fvecs_uses_native_when_available(tmp_path, rng):
    from vectordb_retrieval_tpu.data.datasets import read_fvecs

    x = rng.standard_normal((20, 8)).astype(np.float32)
    p = tmp_path / "v.fvecs"
    _write_fvecs(p, x)
    np.testing.assert_allclose(read_fvecs(str(p)), x)
