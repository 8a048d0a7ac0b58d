"""Shared helper: fabricate a miniature 3RScan/3DSSG dataset on disk."""

import json
import os

import numpy as np

ASSETS = os.path.join(os.path.dirname(__file__), "..", "assets", "3dssg")


def make_mini_dataset(tmp_path, num_scans=3, insts_per_scan=4, no_rel_scan=2):
    from vlsat_tpu.data.assets import read_classes
    from vlsat_tpu.data.ply import write_ply_vertices

    root = tmp_path / "3dssg"
    scans = tmp_path / "scans"
    root.mkdir(exist_ok=True)
    scans.mkdir(exist_ok=True)
    classes = read_classes(ASSETS)
    with open(os.path.join(ASSETS, "relationships.txt")) as f:
        rel_names = [l.strip() for l in f if l.strip()]

    rng = np.random.RandomState(0)
    scan_ids = [f"scan{i:04d}-aaaa-bbbb" for i in range(num_scans)]
    scenes = []
    for si, scan in enumerate(scan_ids):
        d = scans / scan
        d.mkdir(exist_ok=True)
        pts, inst = [], []
        for iid in range(1, insts_per_scan + 1):
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
        objects = {
            str(i): classes[(si * insts_per_scan + i) % len(classes)]
            for i in range(1, insts_per_scan + 1)
        }
        rels = [
            [1, 2, rel_names.index("attached to"), "attached to"],
            [2, 3, rel_names.index("standing on"), "standing on"],
        ]
        if si == no_rel_scan:
            rels = []
        scenes.append({"scan": scan, "split": 1, "objects": objects, "relationships": rels})

    for split in ("train", "validation"):
        with open(root / f"relationships_{split}.json", "w") as f:
            json.dump({"scans": scenes}, f)
    with open(root / "train_scans.txt", "w") as f:
        f.write("\n".join(scan_ids))
    with open(root / "validation_scans.txt", "w") as f:
        f.write("\n".join(scan_ids))  # include scenes with relations
    for name in ("classes.txt", "relationships.txt", "relations.txt"):
        with open(os.path.join(ASSETS, name)) as src, open(root / name, "w") as dst:
            dst.write(src.read())
    return str(root), str(scans)
