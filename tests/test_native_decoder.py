"""Native C++ tile decoder: parity with cv2 and batch decode."""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from kurosiwo_tpu.data import native


@pytest.fixture(scope="module")
def built():
    if not native.available():
        pytest.skip("native decoder not buildable in this environment")
    return True


def _write_tiffs(tmp_path):
    rs = np.random.RandomState(0)
    f32 = rs.rand(96, 128).astype(np.float32) * 0.2
    u8 = rs.randint(0, 4, (96, 128)).astype(np.uint8)
    u16 = rs.randint(0, 5000, (96, 128)).astype(np.uint16)
    paths = {}
    for name, arr in [("f32", f32), ("u8", u8), ("u16", u16)]:
        p = str(tmp_path / f"{name}.tif")
        assert cv2.imwrite(p, arr)
        paths[name] = (p, arr)
    return paths


def test_single_decode_matches_cv2(built, tmp_path):
    for name, (p, arr) in _write_tiffs(tmp_path).items():
        ours = native.decode_tile(p)
        ref = cv2.imread(p, cv2.IMREAD_ANYDEPTH)
        assert ours.shape == ref.shape, name
        np.testing.assert_allclose(ours, ref.astype(np.float32), rtol=1e-6, err_msg=name)


def test_batch_decode(built, tmp_path):
    paths = _write_tiffs(tmp_path)
    plist = [paths["f32"][0], paths["u8"][0], paths["u16"][0]] * 4
    results = native.decode_batch(plist, tile_pixels=96 * 128 * 2)
    assert len(results) == 12
    np.testing.assert_allclose(results[0], paths["f32"][1], rtol=1e-6)
    np.testing.assert_allclose(results[1], paths["u8"][1].astype(np.float32))


def test_missing_file_raises(built):
    with pytest.raises(IOError):
        native.decode_tile("/nonexistent/tile.tif")


def test_imread_roundtrip_through_pipeline(built, tmp_path):
    """tiles._imread uses the native path and agrees with cv2."""
    from kurosiwo_tpu.data import tiles

    rs = np.random.RandomState(1)
    arr = rs.rand(64, 64).astype(np.float32)
    p = str(tmp_path / "t.tif")
    cv2.imwrite(p, arr)
    out = tiles._imread(p)
    np.testing.assert_allclose(out, arr, rtol=1e-6)
