"""Native C++ loader parity tests (skipped when g++ is unavailable)."""

import numpy as np
import pytest

from vlsat_tpu import native
from vlsat_tpu.data.ply import write_ply_vertices

lib = native.load()
pytestmark = pytest.mark.skipif(lib is None, reason="native toolchain unavailable")


def test_native_ply_matches_numpy(tmp_path):
    rng = np.random.RandomState(0)
    pts = rng.randn(500, 3).astype(np.float32)
    inst = (rng.randint(0, 7, 500)).astype(np.int32)
    p = str(tmp_path / "scan.ply")
    write_ply_vertices(p, pts, instances=inst,
                       colors=rng.randint(0, 255, (500, 3)).astype(np.uint8))
    npts, ninst = lib.read_ply(p)
    np.testing.assert_array_equal(npts, pts)
    np.testing.assert_array_equal(ninst, inst)


def test_native_prepare_descriptor_semantics():
    rng = np.random.RandomState(1)
    pts = rng.randn(300, 3).astype(np.float32) * 2
    inst = np.repeat(np.arange(1, 4), 100).astype(np.int32)
    out_pts, out_desc = lib.prepare_instances(pts, inst, [1, 2, 3],
                                              num_points=64, seed=7)
    assert out_pts.shape == (3, 64, 3)
    # samples come from the right instance and are zero-meaned
    for n, iid in enumerate((1, 2, 3)):
        raw = out_pts[n] + out_desc[n, :3]  # undo zero-mean with centroid
        pool = pts[inst == iid]
        for k in range(0, 64, 13):
            d = np.abs(pool - raw[k]).sum(-1).min()
            assert d < 1e-4, (n, k, d)
        np.testing.assert_allclose(out_pts[n].mean(0), 0, atol=1e-4)
        # descriptor recomputed from raw samples matches
        np.testing.assert_allclose(out_desc[n, 0:3], raw.mean(0), atol=1e-4)
        np.testing.assert_allclose(out_desc[n, 3:6], raw.std(0, ddof=1),
                                   rtol=1e-4, atol=1e-5)
        dims = raw.max(0) - raw.min(0)
        np.testing.assert_allclose(out_desc[n, 6:9], dims, atol=1e-5)
        np.testing.assert_allclose(out_desc[n, 9], dims.prod(), rtol=1e-5)
        np.testing.assert_allclose(out_desc[n, 10], dims.max(), rtol=1e-6)

    # deterministic per seed
    out2, desc2 = lib.prepare_instances(pts, inst, [1, 2, 3], 64, seed=7)
    np.testing.assert_array_equal(out_pts, out2)
    out3, _ = lib.prepare_instances(pts, inst, [1, 2, 3], 64, seed=8)
    assert np.abs(out3 - out_pts).max() > 0

    with pytest.raises(ValueError):
        lib.prepare_instances(pts, inst, [99], 64, seed=0)
