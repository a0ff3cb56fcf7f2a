import numpy as np

from plo_tpu import native


def write_bin(path, n, seed=0):
    rng = np.random.default_rng(seed)
    data = rng.random((n, 4)).astype(np.float32)
    data.tofile(path)
    return data


def test_native_builds():
    assert native.available(), "C++ loader failed to build (g++ is baked in)"


def test_load_bin_padded(tmp_path):
    p = str(tmp_path / "a.bin")
    data = write_bin(p, 100)
    out, n = native.load_bin_padded(p, 128)
    assert n == 100
    np.testing.assert_array_equal(out[:100], data)
    assert (out[100:] == 0).all()


def test_load_bin_truncates(tmp_path):
    p = str(tmp_path / "b.bin")
    data = write_bin(p, 200)
    out, n = native.load_bin_padded(p, 128)
    assert n == 128
    np.testing.assert_array_equal(out, data[:128])


def test_prefetcher_order_and_contents(tmp_path):
    paths, datas = [], []
    for i in range(5):
        p = str(tmp_path / f"{i:06d}.bin")
        datas.append(write_bin(p, 50 + i, seed=i))
        paths.append(p)
    pf = native.ScanPrefetcher(paths, capacity=64)
    got = list(pf)
    pf.close()
    assert len(got) == 5
    for i, (arr, n) in enumerate(got):
        assert n == 50 + i
        np.testing.assert_array_equal(arr[:n], datas[i])
        assert (arr[n:] == 0).all()


def test_quantize_pack_matches_numpy_oracle():
    if not native.available():
        import pytest
        pytest.skip("native toolchain unavailable")
    rng = np.random.default_rng(3)
    raw = rng.uniform(-160, 160, (1000, 4)).astype(np.float32)
    raw[5, 0] = np.nan
    raw[7, 1] = np.inf
    raw[9, 2] = -np.inf
    inv = 200.0  # 5 mm steps
    out = np.zeros((1200, 3), np.int16)
    n = native.quantize_pack(raw, inv, out)
    assert n == 1000
    oracle = np.clip(
        np.rint(np.nan_to_num(raw[:, :3].astype(np.float64) * inv,
                              nan=32767.0, posinf=32767.0, neginf=-32767.0)),
        -32767, 32767).astype(np.int16)
    # Native multiplies in f32 and rounds half-away; the f64 oracle rounds
    # half-to-even: products that land within one ulp of a .5 boundary may
    # differ by exactly one 5 mm LSB — far below sensor noise.
    diff = np.abs(out[:1000].astype(np.int32) - oracle.astype(np.int32))
    assert diff.max() <= 1
    assert (diff > 0).mean() < 0.01
    assert (out[1000:] == 0).all()


def test_quantize_pack_rejects_bad_layout():
    if not native.available():
        import pytest
        pytest.skip("native toolchain unavailable")
    out = np.zeros((8, 3), np.int16)
    assert native.quantize_pack(np.zeros((4, 3), np.float64), 1.0, out) is None
    assert native.quantize_pack(np.zeros((4, 3), np.float32)[:, ::-1], 1.0, out) is None
