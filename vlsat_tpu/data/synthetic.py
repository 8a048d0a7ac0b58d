"""Synthetic scene generator for tests and benchmarks.

Produces SceneBatches with the same statistics/shape contract as the real
3DSSG pipeline (nodes with clustered point sets, fully-connected directed
edges, sparse multi-hot predicates) without needing 3RScan assets.
"""

from __future__ import annotations

import numpy as np

from vlsat_tpu.ops.descriptor import gen_descriptor
from vlsat_tpu.scene import (
    NUM_OBJ_CLASSES,
    NUM_REL_CLASSES,
    SceneBatch,
    collate,
    full_edge_index,
    pad_scene,
    pick_bucket,
)

import jax.numpy as jnp


def make_scene(
    rng: np.random.RandomState,
    num_nodes: int,
    num_points: int = 128,
    feat_dim: int = 512,
    num_obj_classes: int = NUM_OBJ_CLASSES,
    num_rel_classes: int = NUM_REL_CLASSES,
    rel_density: float = 0.08,
) -> dict:
    centers = rng.randn(num_nodes, 1, 3).astype(np.float32) * 2.0
    scales = (0.2 + rng.rand(num_nodes, 1, 3).astype(np.float32))
    pts = centers + rng.randn(num_nodes, num_points, 3).astype(np.float32) * scales
    desc = np.asarray(gen_descriptor(jnp.asarray(pts)))
    pts_centered = pts - pts.mean(axis=1, keepdims=True)
    ei = full_edge_index(num_nodes)
    gt_rels = (rng.rand(len(ei), num_rel_classes) < rel_density).astype(np.float32)
    return dict(
        obj_points=pts_centered,
        descriptor=desc,
        obj_2d_feats=rng.randn(num_nodes, feat_dim).astype(np.float32),
        gt_class=rng.randint(0, num_obj_classes, num_nodes).astype(np.int32),
        edge_index=ei,
        gt_rels=gt_rels,
    )


def validation_scene_stats(num_scans: int, seed: int = 0) -> tuple:
    """(node_counts, rel_counts) for ``num_scans`` scenes drawn JOINTLY
    from the REAL 3DSSG validation split
    (assets/3dssg/relationships_validation.json: 548 scan-splits, N in
    {5..9} — the reference pre-splits scenes into <= 9 object subgraphs,
    gen_data_gt.py generate_groups; relations/scan median 17, p95 46, max
    103).  Sampling (with replacement) real (N, #rels) pairs keeps the
    bucket mix AND the label density faithful at any split size."""
    import json
    import os

    assets = os.path.join(os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))), "assets", "3dssg")
    with open(os.path.join(assets, "relationships_validation.json")) as f:
        scans = json.load(f)["scans"]
    real = [(len(s["objects"]), len(s["relationships"])) for s in scans]
    rng = np.random.RandomState(seed)
    picks = [real[i] for i in rng.randint(0, len(real), num_scans)]
    return [n for n, _ in picks], [r for _, r in picks]


def make_synthetic_split(
    base_dir: str,
    num_scans: int = 64,
    insts_per_scan=(9, 16),
    vertices_per_inst: int = 600,
    rels_per_scan: int = 12,
    seed: int = 0,
    split: str = "validation",
    node_counts=None,
    rel_counts=None,
    write_ply: bool = False,
    background_verts: int = 0,
) -> tuple:
    """Fabricate a 3DSSG-style split on disk for end-to-end benchmarks:
    mesh tensors are written straight into the loader's npz cache format
    (the PLY parse they replace is benchmarked separately,
    PERFORMANCE.md "Host input pipeline"), plus the relationships JSON and
    class/relation lists.  Returns (root, scans_root, cache_root).

    ``node_counts`` / ``rel_counts``: explicit per-scan instance and
    relation counts (override the uniform ``insts_per_scan`` /
    ``rels_per_scan`` draws) — e.g. ``validation_scene_stats`` for a split
    whose bucket mix and label density match the real 3DSSG validation
    histogram.  ``rels_per_scan`` may be an int (fixed) or a (lo, hi)
    tuple (uniform per scan).

    ``write_ply``: write each scan as a real binary PLY under
    ``scans_root/{scan}/labels.instances.align.annotated.v2.ply`` and
    leave the npz cache EMPTY, so a loader pass exercises the true cold
    path (PLY parse included) — used by tools/bench_cold_start.py.
    ``background_verts``: extra instance-0 (unannotated) vertices per
    scan, as real 3RScan meshes carry unlabeled clutter.

    Idempotent per (base_dir, parameters): reuses an existing build.
    """
    import json
    import os

    root = os.path.join(base_dir, "3dssg")
    scans_root = os.path.join(base_dir, "scans")
    cache_root = os.path.join(base_dir, "cache")
    stamp = os.path.join(base_dir, "stamp.json")
    params = dict(num_scans=num_scans, insts=list(insts_per_scan),
                  verts=vertices_per_inst,
                  rels=list(rels_per_scan) if isinstance(
                      rels_per_scan, (tuple, list)) else rels_per_scan,
                  seed=seed, split=split,
                  nodes=(list(map(int, node_counts))
                         if node_counts is not None else None),
                  rel_counts=(list(map(int, rel_counts))
                              if rel_counts is not None else None),
                  ply=bool(write_ply), bg=int(background_verts))
    if os.path.exists(stamp):
        with open(stamp) as f:
            if json.load(f) == params:
                return root, scans_root, cache_root
    for d in (root, scans_root, cache_root):
        os.makedirs(d, exist_ok=True)

    assets = os.path.join(os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))), "assets", "3dssg")
    for name in ("classes.txt", "relationships.txt", "relations.txt"):
        with open(os.path.join(assets, name)) as src, \
                open(os.path.join(root, name), "w") as dst:
            dst.write(src.read())
    with open(os.path.join(root, "classes.txt")) as f:
        classes = [l.strip() for l in f if l.strip()]
    with open(os.path.join(root, "relationships.txt")) as f:
        rel_names = [l.strip() for l in f if l.strip()]

    rng = np.random.RandomState(seed)
    lo, hi = insts_per_scan
    for name, counts in (("node_counts", node_counts),
                         ("rel_counts", rel_counts)):
        if counts is not None and len(counts) != num_scans:
            raise ValueError(
                f"{name} has {len(counts)} entries for {num_scans} scans")
    scan_ids = [f"synth{i:04d}-scan" for i in range(num_scans)]
    scenes = []
    for si, scan in enumerate(scan_ids):
        n = (int(node_counts[si]) if node_counts is not None
             else int(rng.randint(lo, hi + 1)))
        pts, inst = [], []
        for iid in range(1, n + 1):
            c = rng.randn(3).astype(np.float32) * 2.5
            pts.append(c + rng.randn(vertices_per_inst, 3).astype(np.float32)
                       * (0.2 + rng.rand(3).astype(np.float32)))
            inst.append(np.full(vertices_per_inst, iid, np.int32))
        if background_verts:
            # dedicated stream: background clutter must not shift the main
            # rng (classes/relations stay identical across bg settings)
            bg_rng = np.random.RandomState((seed + 991 * si) % (2**31 - 1))
            pts.append(bg_rng.randn(background_verts, 3).astype(np.float32) * 5)
            inst.append(np.zeros(background_verts, np.int32))
        all_pts = np.concatenate(pts).astype(np.float32)
        all_inst = np.concatenate(inst)
        if write_ply:
            from vlsat_tpu.data.ply import write_ply_vertices

            d = os.path.join(scans_root, scan)
            os.makedirs(d, exist_ok=True)
            write_ply_vertices(
                os.path.join(d, "labels.instances.align.annotated.v2.ply"),
                all_pts, instances=all_inst.astype(np.int32))
        else:
            np.savez(os.path.join(cache_root, f"{scan}.npz"),
                     points=all_pts, instances=all_inst)
        objects = {str(i): classes[int(rng.randint(len(classes)))]
                   for i in range(1, n + 1)}
        if rel_counts is not None:
            n_rels = int(rel_counts[si])
        elif isinstance(rels_per_scan, (tuple, list)):
            r_lo, r_hi = rels_per_scan
            n_rels = int(rng.randint(r_lo, r_hi + 1))
        else:
            n_rels = int(rels_per_scan)
        rels = []
        for _ in range(n_rels):
            a, b = rng.choice(np.arange(1, n + 1), 2, replace=False)
            r = int(rng.randint(1, len(rel_names)))  # skip 'none'
            rels.append([int(a), int(b), r, rel_names[r]])
        scenes.append({"scan": scan, "split": 1, "objects": objects,
                       "relationships": rels})

    for s in ("train", "validation"):
        with open(os.path.join(root, f"relationships_{s}.json"), "w") as f:
            json.dump({"scans": scenes}, f)
        with open(os.path.join(root, f"{s}_scans.txt"), "w") as f:
            f.write("\n".join(scan_ids))
    with open(stamp, "w") as f:
        json.dump(params, f)
    return root, scans_root, cache_root


def make_batch(
    seed: int = 0,
    node_counts=(5, 9),
    num_points: int = 128,
    bucket: int | None = None,
    feat_dim: int = 512,
    with_text: bool = False,
    **kw,
) -> SceneBatch:
    rng = np.random.RandomState(seed)
    n_max = bucket or pick_bucket(max(node_counts))
    scenes = []
    for n in node_counts:
        s = make_scene(rng, n, num_points=num_points, feat_dim=feat_dim, **kw)
        if with_text:
            t = rng.randn(len(s["edge_index"]), feat_dim).astype(np.float32)
            t /= np.linalg.norm(t, axis=-1, keepdims=True)
            s["rel_text_feat"] = t
        scenes.append(
            pad_scene(
                s["obj_points"], s["descriptor"], s["obj_2d_feats"], s["gt_class"],
                s["edge_index"], s["gt_rels"], n_max=n_max,
                rel_text_feat=s.get("rel_text_feat"), feat_dim=feat_dim,
            )
        )
    return collate(scenes, with_text=with_text)
