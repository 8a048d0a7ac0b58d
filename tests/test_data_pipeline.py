"""End-to-end data pipeline test on a fabricated mini-3RScan dataset."""

import json
import os

import numpy as np
import pytest

from vlsat_tpu.data.assets import build_index, build_triplet_vocab, read_classes
from vlsat_tpu.data.dataset import SceneLoader, SSGScenes
from vlsat_tpu.data.ply import read_ply_vertices, write_ply_vertices

ASSETS = os.path.join(os.path.dirname(__file__), "..", "assets", "3dssg")


@pytest.fixture()
def mini_dataset(tmp_path):
    root = tmp_path / "3dssg"
    scans = tmp_path / "scans"
    root.mkdir()
    scans.mkdir()
    classes = read_classes(ASSETS)
    with open(os.path.join(ASSETS, "relationships.txt")) as f:
        rel_names = [l.strip() for l in f if l.strip()]

    rng = np.random.RandomState(0)
    scan_ids = [f"scan{i:04d}-aaaa-bbbb" for i in range(3)]
    scenes = []
    for si, scan in enumerate(scan_ids):
        d = scans / scan
        d.mkdir()
        # 4 instances, ids 1..4, plus background 0
        pts, inst = [], []
        for iid in range(1, 5):
            c = rng.randn(3) * 2
            pts.append(c + rng.randn(200, 3) * 0.3)
            inst.append(np.full(200, iid))
        pts.append(rng.randn(50, 3) * 5)
        inst.append(np.zeros(50))
        write_ply_vertices(
            str(d / "labels.instances.align.annotated.v2.ply"),
            np.concatenate(pts).astype(np.float32),
            instances=np.concatenate(inst).astype(np.int32),
        )
        objects = {str(i): classes[(si * 4 + i) % len(classes)] for i in range(1, 5)}
        rels = [
            [1, 2, rel_names.index("attached to"), "attached to"],
            [2, 3, rel_names.index("standing on"), "standing on"],
        ]
        if si == 2:  # one scene with no relations (train must resample it)
            rels = []
        scenes.append({"scan": scan, "split": 1, "objects": objects, "relationships": rels})

    for split, sel in (("train", scan_ids[:2] + [scan_ids[2]]), ("validation", scan_ids[2:])):
        with open(root / f"relationships_{split}.json", "w") as f:
            json.dump({"scans": scenes}, f)
    with open(root / "train_scans.txt", "w") as f:
        f.write("\n".join(scan_ids))
    with open(root / "validation_scans.txt", "w") as f:
        f.write("\n".join(scan_ids[2:]))
    for name in ("classes.txt", "relationships.txt", "relations.txt"):
        with open(os.path.join(ASSETS, name)) as src, open(root / name, "w") as dst:
            dst.write(src.read())
    return str(root), str(scans)


def test_ply_roundtrip(tmp_path):
    pts = np.random.RandomState(0).randn(100, 3).astype(np.float32)
    inst = np.arange(100).astype(np.int32) % 5
    p = str(tmp_path / "x.ply")
    write_ply_vertices(p, pts, instances=inst)
    back = read_ply_vertices(p)
    np.testing.assert_array_equal(back.points, pts)
    np.testing.assert_array_equal(back.instances, inst)


def test_dataset_end_to_end(mini_dataset, tmp_path):
    root, scans = mini_dataset
    ds = SSGScenes(root, scans, "train_scans", cache_root=str(tmp_path / "cache"))
    assert len(ds) == 3
    assert len(ds.class_names) == 160
    assert len(ds.relation_names) == 26  # 'none' dropped
    assert ds.w_cls_rel.shape == (26,)

    rng = np.random.RandomState(0)
    s = ds.prepare(0, rng)
    assert s["obj_points"].shape == (4, 128, 3)
    assert s["edge_index"].shape == (12, 2)
    assert s["gt_rels"].shape == (12, 26)
    assert s["gt_rels"].sum() == 2
    # descriptor on raw points; points zero-meaned afterwards
    np.testing.assert_allclose(s["obj_points"][0].mean(0), 0, atol=1e-5)
    assert (s["descriptor"][:, 9] > 0).all()

    # disk cache created and reused
    assert any(f.endswith(".npz") for f in os.listdir(tmp_path / "cache"))

    # a torn/partial cache file (pre-atomic-write crash, or a concurrent
    # pack worker killed mid-savez) must be re-parsed and rewritten, not
    # crash every later run (round-5 review fix: atomic tmp+os.replace)
    cache_files = [tmp_path / "cache" / f
                   for f in os.listdir(tmp_path / "cache") if f.endswith(".npz")]
    for torn in cache_files:
        with open(torn, "wb") as f:
            f.write(b"PK\x03\x04 definitely not a complete zip")
    ds2 = SSGScenes(root, scans, "train_scans", cache_root=str(tmp_path / "cache"))
    s2 = ds2.prepare(0, np.random.RandomState(0))
    np.testing.assert_array_equal(s2["gt_class"], s["gt_class"])
    for i in range(1, len(ds2)):
        ds2.prepare(i, np.random.RandomState(0))
    for torn in cache_files:
        with np.load(torn) as z:  # rewritten caches are loadable again
            assert "points" in z
    assert not any(f.endswith(".tmp.npz")
                   for f in os.listdir(tmp_path / "cache"))

    loader = SceneLoader(ds, batch_size=2, shuffle=True, for_train=True)
    batches = list(loader)
    assert len(batches) == 2
    b = batches[0]
    assert b.num_scenes == 2
    assert b.obj_mask.shape[1] == 4  # bucket for 4 nodes
    # every train scene in the batch has at least one relation (resampling)
    valid_rels = np.asarray(b.gt_rels)[np.asarray(b.edge_mask)]
    assert valid_rels.sum() > 0

    # model consumes a real data batch
    import jax
    from vlsat_tpu.models import MMGNet, MMGNetConfig

    model = MMGNet(cfg=MMGNetConfig())
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        b, istrain=True,
    )
    out = model.apply(variables, b, istrain=False)
    assert np.isfinite(np.asarray(out["obj_logits_3d"])).all()


def test_union_points(mini_dataset):
    root, scans = mini_dataset
    ds = SSGScenes(root, scans, "train_scans", with_union_points=True)
    s = ds.prepare(0, np.random.RandomState(0))
    rp = s["rel_points"]
    assert rp.shape == (12, 256, 4)
    assert set(np.unique(rp[..., 3])) <= {0.0, 1.0, 2.0, 3.0}


def test_triplet_vocab(mini_dataset):
    root, scans = mini_dataset
    from vlsat_tpu.data.assets import load_relationship_json
    data = load_relationship_json(root, "train_scans")
    classes = read_classes(root)
    with open(os.path.join(root, "relationships.txt")) as f:
        rel_names = [l.strip() for l in f if l.strip()]
    vocab = build_triplet_vocab(data, classes, rel_names)
    assert len(vocab) == 4  # 2 rels x 2 scenes with distinct class maps
