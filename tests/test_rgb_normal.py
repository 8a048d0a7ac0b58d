"""RGB/normal point channels (USE_RGB/USE_NORMAL) + load_rgb OBJ recolor.

Reference semantics covered:
  * load_mesh appends rgb/255 and vertex normals to the point matrix
    (src/dataset/dataset_3dssg.py:38-58);
  * descriptor/zero-mean/bboxes act on the xyz slice only (:284-293);
  * union point clouds keep the extra channels and append the {1,2}
    membership mask last (:324-356);
  * util_ply.py:load_rgb (:41-113) transfers texture colors + normals from
    the textured OBJ onto the aligned label mesh by nearest raw vertex.
"""

import json
import os

import numpy as np
import pytest

from tests.mini_data import ASSETS, make_mini_dataset


# --------------------------------------------------------------------- ply IO
def test_ply_faces_and_normals_roundtrip(tmp_path):
    from vlsat_tpu.data.ply import read_ply_vertices, write_ply_vertices

    pts = np.array([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]], np.float32)
    faces = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    colors = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255], [9, 9, 9]], np.uint8)
    normals = np.tile(np.array([[0, 0, 1]], np.float32), (4, 1))
    p = str(tmp_path / "mesh.ply")
    write_ply_vertices(p, pts, colors=colors, normals=normals, faces=faces)
    out = read_ply_vertices(p, with_faces=True)
    np.testing.assert_array_equal(out.points, pts)
    np.testing.assert_array_equal(out.colors, colors)
    np.testing.assert_array_equal(out.normals, normals)
    np.testing.assert_array_equal(out.faces, faces)


def test_compute_vertex_normals_flat_quad():
    from vlsat_tpu.data.ply import compute_vertex_normals

    pts = np.array([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0], [5, 5, 5]],
                   np.float32)
    faces = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    n = compute_vertex_normals(pts, faces)
    np.testing.assert_allclose(n[:4], [[0, 0, 1]] * 4, atol=1e-6)
    np.testing.assert_array_equal(n[4], [0, 0, 0])  # unreferenced vertex


# ------------------------------------------------------------ dataset channels
def _mini_with_channels(tmp_path, seed=7):
    """Rewrite the mini dataset's PLYs with per-vertex colors + normals."""
    from vlsat_tpu.data.ply import read_ply_vertices, write_ply_vertices

    paths = make_mini_dataset(tmp_path)
    rng = np.random.RandomState(seed)
    scans_root = tmp_path / "scans"
    for scan in os.listdir(scans_root):
        p = str(scans_root / scan / "labels.instances.align.annotated.v2.ply")
        ply = read_ply_vertices(p)
        v = len(ply.points)
        colors = rng.randint(0, 256, size=(v, 3)).astype(np.uint8)
        normals = rng.randn(v, 3).astype(np.float32)
        normals /= np.linalg.norm(normals, axis=1, keepdims=True)
        write_ply_vertices(p, ply.points, instances=ply.instances,
                           colors=colors, normals=normals)
    return paths


def _scenes(tmp_path, **kw):
    from vlsat_tpu.data.dataset import SSGScenes

    return SSGScenes(
        root=str(tmp_path / "3dssg"), scans_root=str(tmp_path / "scans"),
        split="train_scans", use_native=False, **kw)


def test_dataset_rgb_normal_channels(tmp_path):
    _mini_with_channels(tmp_path)
    ds = _scenes(tmp_path, use_rgb=True, use_normal=True)
    assert ds.dim_pts == 9
    s = ds.prepare(0, np.random.RandomState(0))
    n, p, c = s["obj_points"].shape
    assert c == 9
    # xyz slice zero-meaned per instance, extra channels untouched
    np.testing.assert_allclose(s["obj_points"][:, :, :3].mean(1), 0, atol=1e-5)
    assert (s["obj_points"][:, :, 3:6] >= 0).all()
    assert (s["obj_points"][:, :, 3:6] <= 1).all()
    norms = np.linalg.norm(s["obj_points"][:, :, 6:9], axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-5)

    # descriptor identical to the xyz-only dataset under the same RNG draw
    ds3 = _scenes(tmp_path)
    s3 = ds3.prepare(0, np.random.RandomState(0))
    np.testing.assert_allclose(s["descriptor"], s3["descriptor"], rtol=1e-6)
    np.testing.assert_allclose(s["obj_points"][:, :, :3], s3["obj_points"],
                               rtol=1e-6)


def test_union_points_keep_channels(tmp_path):
    _mini_with_channels(tmp_path)
    ds = _scenes(tmp_path, use_rgb=True, with_union_points=True)
    s = ds.prepare(0, np.random.RandomState(0))
    e = len(s["edge_index"])
    assert s["rel_points"].shape == (e, ds.num_points_union, 7)
    # membership mask rides the LAST channel and stays in {0,1,2}
    assert set(np.unique(s["rel_points"][..., 6])) <= {0.0, 1.0, 2.0}
    # xyz zero-meaned
    np.testing.assert_allclose(s["rel_points"][..., :3].mean(1), 0, atol=1e-4)


def test_model_forward_9ch(tmp_path):
    import jax

    from vlsat_tpu.data.dataset import SceneLoader
    from vlsat_tpu.models import MMGNet, MMGNetConfig

    _mini_with_channels(tmp_path)
    ds = _scenes(tmp_path, use_rgb=True, use_normal=True)
    loader = SceneLoader(ds, batch_size=2, shuffle=False)
    batch = next(iter(loader))
    assert batch.obj_points.shape[-1] == 9
    model = MMGNet(cfg=MMGNetConfig())
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch, istrain=True)
    out = model.apply(variables, batch, istrain=False)
    assert out["obj_logits_3d"].shape[:2] == batch.gt_class.shape


def test_augmentation_rotates_normals(tmp_path):
    from vlsat_tpu.data.augment import random_z_rotation

    rng = np.random.RandomState(3)
    pts = np.concatenate([rng.randn(50, 3), rng.randn(50, 3)], axis=1)
    pts[:, 3:] /= np.linalg.norm(pts[:, 3:], axis=1, keepdims=True)
    out = random_z_rotation(pts.copy(), np.random.RandomState(1), normal_offset=3)
    # pairwise xyz distances and normal norms preserved; z unchanged
    d0 = np.linalg.norm(pts[None, :, :3] - pts[:, None, :3], axis=-1)
    c = pts[:, :3].mean(0)
    d1 = np.linalg.norm(out[None, :, :3] - out[:, None, :3], axis=-1)
    np.testing.assert_allclose(d0, d1, atol=1e-5)
    np.testing.assert_allclose(np.linalg.norm(out[:, 3:], axis=1), 1, atol=1e-6)
    np.testing.assert_allclose(out[:, 2], pts[:, 2] - c[2], atol=1e-6)
    # normals rotate by the same matrix as the points: recover the angle
    # from a point displacement and check a normal agrees
    assert not np.allclose(out[:, 3:], pts[:, 3:])


# ---------------------------------------------------------------- load_rgb
def _write_textured_scan(tmp_path, align_offset=(10.0, 0.0, 0.0)):
    """Fabricate a 3RScan-style scan dir: textured OBJ + raw/aligned label
    PLYs.  Returns (scan_dir, expected_colors, obj_normals)."""
    from PIL import Image

    from vlsat_tpu.data.ply import write_ply_vertices

    d = tmp_path / "scanxyz"
    d.mkdir()
    # a 2x2 texture with 4 distinct colors
    tex = np.array([[[255, 0, 0], [0, 255, 0]],
                    [[0, 0, 255], [255, 255, 0]]], np.uint8)
    Image.fromarray(tex).save(d / "mesh.refined_0.png")
    # square in the z=0 plane, one uv per corner hitting each texel center
    verts = np.array([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]], np.float32)
    uv = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32)
    with open(d / "mesh.refined.v2.obj", "w") as f:
        f.write("mtllib mesh.refined.mtl\n")
        for v in verts:
            f.write(f"v {v[0]} {v[1]} {v[2]}\n")
        for t in uv:
            f.write(f"vt {t[0]} {t[1]}\n")
        f.write("f 1/1 2/2 3/3\nf 1/1 3/3 4/4\n")
    with open(d / "mesh.refined.mtl", "w") as f:
        f.write("newmtl material_0\nmap_Kd mesh.refined_0.png\n")
    # raw label mesh: same frame as the OBJ (slightly perturbed)
    raw = verts + 1e-5
    write_ply_vertices(str(d / "labels.instances.annotated.v2.ply"), raw,
                       instances=np.arange(1, 5, dtype=np.int32))
    # aligned label mesh: translated frame
    aligned = verts + np.asarray(align_offset, np.float32)
    write_ply_vertices(str(d / "labels.instances.align.annotated.v2.ply"),
                       aligned, instances=np.arange(1, 5, dtype=np.int32))
    # expected: uv (0,0)->pixel row 1 col 0 = blue; (1,0)->yellow;
    # (1,1)->green; (0,1)->red (v axis flipped)
    expected = np.array([[0, 0, 255], [255, 255, 0], [0, 255, 0], [255, 0, 0]],
                        np.uint8)
    return d, aligned, expected


def test_load_rgb_obj_transfer(tmp_path):
    from vlsat_tpu.data.obj import load_rgb

    d, aligned, expected = _write_textured_scan(tmp_path)
    out = load_rgb(str(d))
    np.testing.assert_allclose(out.points, aligned, atol=1e-6)
    np.testing.assert_array_equal(out.colors, expected)
    np.testing.assert_array_equal(out.instances, [1, 2, 3, 4])
    # OBJ has no vn lines -> normals computed from faces: flat +z square
    np.testing.assert_allclose(out.normals, [[0, 0, 1]] * 4, atol=1e-6)


def test_load_rgb_max_dist(tmp_path):
    from vlsat_tpu.data.obj import load_rgb

    d, _, _ = _write_textured_scan(tmp_path)
    with pytest.raises(ValueError):
        load_rgb(str(d), max_dist=1e-9)
    load_rgb(str(d), max_dist=1e-3)  # 1e-5 perturbation passes


def test_load_rgb_scannet_style(tmp_path):
    from vlsat_tpu.data.obj import load_rgb
    from vlsat_tpu.data.ply import write_ply_vertices

    d = tmp_path / "scene0001_00"
    d.mkdir()
    pts = np.random.RandomState(0).randn(6, 3).astype(np.float32)
    colors = np.arange(18, dtype=np.uint8).reshape(6, 3)
    faces = np.array([[0, 1, 2], [3, 4, 5]], np.int32)
    write_ply_vertices(str(d / "scene0001_00_vh_clean_2.ply"), pts,
                       colors=colors, faces=faces)
    write_ply_vertices(str(d / "labels.instances.align.annotated.v2.ply"),
                       pts, instances=np.ones(6, np.int32))
    out = load_rgb(str(d))
    np.testing.assert_array_equal(out.colors, colors)
    assert out.normals is not None and np.isfinite(out.normals).all()


def test_uv_to_color_convention():
    from PIL import Image

    from vlsat_tpu.data.obj import uv_to_color

    img = Image.fromarray(np.array([[[10, 0, 0], [0, 20, 0]],
                                    [[0, 0, 30], [40, 40, 40]]], np.uint8))
    uv = np.array([[0.0, 1.0], [1.0, 1.0], [0.0, 0.0], [1.0, 0.0]])
    out = uv_to_color(uv, img)
    np.testing.assert_array_equal(
        out, [[10, 0, 0], [0, 20, 0], [0, 0, 30], [40, 40, 40]])
