"""Runtime BFS subgraph sampling (util_data.py port) — unit + mini-data."""

import numpy as np

from tests.mini_data import make_mini_dataset
from vlsat_tpu.data.sampling import (
    bfs_neighbor_selection, edges_from_selection, subsample_edges)


NNS = {
    1: [2, 3],
    2: [1, 4],
    3: [1],
    4: [2, 5],
    5: [4],
    6: [],  # isolated
}


def test_bfs_levels_and_candidate_restriction():
    rng = np.random.RandomState(0)

    # force seed=1 by restricting candidates to {1} is not possible (seeds
    # come from candidates); instead check level semantics with all nodes
    class FixedRng(np.random.RandomState):
        def choice(self, a, size=None, **kw):
            return np.asarray([1] if size in (None, 1) else [1] * size)

    sel1 = bfs_neighbor_selection(NNS, list(NNS), n_levels=1, n_seed=1,
                                  rng=FixedRng())
    assert sel1 == {2, 3}  # direct neighbors only; seed not auto-included
    sel2 = bfs_neighbor_selection(NNS, list(NNS), n_levels=2, n_seed=1,
                                  rng=FixedRng())
    assert sel2 == {1, 2, 3, 4}  # level 2 reaches 1 (back-edge) and 4
    # candidate restriction drops nodes outside the annotation set
    sel_r = bfs_neighbor_selection(NNS, [1, 2, 3], n_levels=2, n_seed=1,
                                   rng=FixedRng())
    assert sel_r == {1, 2, 3}


def test_edges_from_selection():
    edges = edges_from_selection([1, 2, 4], NNS)
    # only edges inside the selection, no self loops
    assert sorted(map(tuple, edges)) == [(1, 2), (2, 1), (2, 4), (4, 2)]
    # string-keyed neighbor dicts (JSON) work too
    edges_s = edges_from_selection([1, 2], {str(k): v for k, v in NNS.items()})
    assert sorted(map(tuple, edges_s)) == [(1, 2), (2, 1)]
    # per-node cap subsamples
    capped = edges_from_selection([1, 2, 3, 4, 5], NNS, max_edges_per_node=1,
                                  rng=np.random.RandomState(0))
    per_node = {}
    for a, _ in capped:
        per_node[a] = per_node.get(a, 0) + 1
    assert all(v <= 1 for v in per_node.values())


def test_subsample_edges_cap():
    edges = [[i, i + 1] for i in range(10)]
    out = subsample_edges(edges, 4, np.random.RandomState(0))
    assert len(out) == 4 and all(e in edges for e in out)
    assert subsample_edges(edges, -1) is edges


def test_dataset_runtime_sampling_mini(tmp_path):
    from vlsat_tpu.data.dataset import SceneLoader, SSGScenes

    root, scans = make_mini_dataset(tmp_path)
    scenes = SSGScenes(
        split="train_scans", root=root, scans_root=scans, num_points=16,
        cache_root=str(tmp_path / "cache"), sample_in_runtime=True,
        sample_num_nn=2, sample_num_seed=2, neighbor_radius=20.0)
    rng = np.random.RandomState(0)
    s = scenes.prepare(0, rng)
    n = len(s["gt_class"])
    e = len(s["edge_index"])
    assert n >= 1
    # edges index valid positions and are not the dense full graph contract
    if e:
        assert s["edge_index"].max() < n
        assert s["gt_rels"].shape == (e, len(scenes.relation_names))
    # mini scenes are close together -> big radius connects everything,
    # so the BFS selection should reach >1 node
    assert n > 1

    # end to end through the bucketed loader
    loader = SceneLoader(scenes, batch_size=2, shuffle=True, seed=0,
                         for_train=True, drop_last=False)
    batch = next(iter(loader))
    assert batch.obj_points.shape[0] >= 1
    assert bool(batch.edge_mask.any())


def test_dataset_uses_precomputed_neighbors(tmp_path):
    import json
    from vlsat_tpu.data.dataset import SSGScenes

    root, scans = make_mini_dataset(tmp_path)
    # inject a 'neighbors' block (the ScanNet generator layout) forcing a
    # line graph 1-2-3-4; instance 4 unreachable from 1 in one BFS level
    with open(f"{root}/relationships_train.json") as f:
        data = json.load(f)
    scan0 = data["scans"][0]["scan"]
    data["neighbors"] = {scan0: {"1": [2], "2": [1, 3], "3": [2, 4], "4": [3]}}
    with open(f"{root}/relationships_train.json", "w") as f:
        json.dump(data, f)
    # NOTE 2 BFS levels: the reference build_neighbor includes seeds only
    # when re-reached as someone's neighbor (util_data.py:39-50), so one
    # level on a line graph yields only non-adjacent neighbor sets (e.g.
    # seed 2 -> {1, 3}) and therefore zero edges
    scenes = SSGScenes(
        split="train_scans", root=root, scans_root=scans, num_points=16,
        cache_root=str(tmp_path / "cache"), sample_in_runtime=True,
        sample_num_nn=2, sample_num_seed=1)
    nns = scenes._neighbor_graph(scan0, None, None)
    assert nns == {1: {2}, 2: {1, 3}, 3: {2, 4}, 4: {3}}
    # line-graph edges only: every sampled edge connects ADJACENT instance
    # ids.  The mini data assigns instance iid the class with index iid
    # (scan 0), so gt_class recovers the instance id of each node position.
    # Some seeds legitimately select a single node (0 edges) — scan a few
    # and require the property on every edge plus at least one edgeful draw
    # (a regression to the full N*(N-1) edge set would trip the adjacency
    # check immediately: e.g. (1, 3) pairs are non-adjacent here).
    total_edges = 0
    for seed in range(6):
        s = scenes.prepare(0, np.random.RandomState(seed))
        iids = s["gt_class"]
        for a, b in s["edge_index"]:
            assert abs(int(iids[a]) - int(iids[b])) == 1, (iids[a], iids[b])
        total_edges += len(s["edge_index"])
    assert total_edges > 0
