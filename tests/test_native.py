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
