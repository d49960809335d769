"""C++ threaded npy loader: build, load, parity with numpy, error paths."""
import os

import numpy as np
import pytest

from mdvit_tpu.data import native_loader


def test_batch_load_matches_numpy(tmp_path, rng):
    lib = native_loader.get_lib()
    if not lib:
        pytest.skip("g++ toolchain unavailable")
    paths = []
    want = []
    for i in range(7):
        a = rng.randint(0, 255, (9, 11, 3)).astype(np.uint8)
        p = tmp_path / f"f{i}.npy"
        np.save(p, a)
        paths.append(str(p))
        want.append(a)
    got = native_loader.batch_load_u8(paths, (9, 11, 3), n_threads=3)
    assert got is not None
    np.testing.assert_array_equal(got, np.stack(want))


def test_batch_load_rejects_wrong_dtype(tmp_path, rng):
    lib = native_loader.get_lib()
    if not lib:
        pytest.skip("g++ toolchain unavailable")
    a = rng.randn(4, 4).astype(np.float32)
    p = tmp_path / "f.npy"
    np.save(p, a)
    got = native_loader.batch_load_u8([str(p)], (4, 4))
    assert got is None  # float payload: strict u8 check fails → fallback


def test_batch_load_rejects_wrong_shape(tmp_path, rng):
    # A file whose payload is LARGER than the probe shape must fail loudly,
    # not be silently truncated into the corpus (ADVICE r1, medium).
    lib = native_loader.get_lib()
    if not lib:
        pytest.skip("g++ toolchain unavailable")
    big = rng.randint(0, 255, (8, 8)).astype(np.uint8)
    p = tmp_path / "big.npy"
    np.save(p, big)
    assert native_loader.batch_load_u8([str(p)], (4, 4)) is None


def test_batch_load_rejects_v2_float(tmp_path, rng):
    # v2/v3 headers get the same dtype check as v1 (ADVICE r1, medium).
    lib = native_loader.get_lib()
    if not lib:
        pytest.skip("g++ toolchain unavailable")
    a = rng.randn(4, 4).astype(np.float32)
    p = tmp_path / "v2.npy"
    with open(p, "wb") as f:
        np.lib.format.write_array(f, a, version=(2, 0))
    assert native_loader.batch_load_u8([str(p)], (4, 4)) is None
    # matching-shape uint8 in v2 format still loads
    b = rng.randint(0, 255, (4, 4)).astype(np.uint8)
    p2 = tmp_path / "v2u8.npy"
    with open(p2, "wb") as f:
        np.lib.format.write_array(f, b, version=(2, 0))
    got = native_loader.batch_load_u8([str(p2)], (4, 4))
    np.testing.assert_array_equal(got[0], b)


def test_batch_load_rejects_fortran_order(tmp_path, rng):
    lib = native_loader.get_lib()
    if not lib:
        pytest.skip("g++ toolchain unavailable")
    a = np.asfortranarray(rng.randint(0, 255, (4, 6)).astype(np.uint8))
    p = tmp_path / "f.npy"
    np.save(p, a)
    assert native_loader.batch_load_u8([str(p)], (4, 6)) is None


def test_batch_load_missing_file(tmp_path):
    lib = native_loader.get_lib()
    if not lib:
        pytest.skip("g++ toolchain unavailable")
    got = native_loader.batch_load_u8([str(tmp_path / "nope.npy")], (2, 2))
    assert got is None
