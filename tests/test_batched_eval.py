"""Batched validation must produce identical metrics to batch-size 1."""

import numpy as np

from tests.mini_data import make_mini_dataset


def test_batched_eval_matches_batch1(tmp_path):
    root, scans = make_mini_dataset(tmp_path)
    from vlsat_tpu.config import load_config
    from vlsat_tpu.train.runner import Runner

    cfg = load_config(overrides={
        "PATH": str(tmp_path / "out"), "MAX_EPOCHES": 1, "Batch_Size": 2,
        "VALID_INTERVAL": 0, "LOG_INTERVAL": 0, "MODE": "train",
        "dataset": {"root": root, "scans_root": scans, "num_points": 8},
    })
    r = Runner(cfg)
    r.load(best=False)  # fresh init (no ckpt)
    m1 = r.validation(batch_size=1)
    m3 = r.validation(batch_size=3)
    for k in m1:
        a, b = m1[k], m3[k]
        if np.isnan(a) and np.isnan(b):
            continue
        np.testing.assert_allclose(a, b, rtol=1e-5, err_msg=k)


def test_sharded_eval_matches_single_device():
    """Data-parallel eval (SURVEY §5): masked-scene padding + mesh sharding
    must reproduce single-device metrics exactly."""
    import jax
    import numpy as np

    from vlsat_tpu.data.synthetic import make_batch
    from vlsat_tpu.eval.engine import evaluate
    from vlsat_tpu.models import MMGNet, MMGNetConfig
    from vlsat_tpu.parallel import make_mesh, replicate, shard_eval_batches
    from vlsat_tpu.train.step import make_eval_step

    model = MMGNet(cfg=MMGNetConfig(num_obj_classes=20, num_rel_classes=7))
    batches = [
        make_batch(seed=0, node_counts=(3, 4, 5), num_points=8, bucket=8,
                   num_obj_classes=20, num_rel_classes=7),   # ragged: 3 % 8
        make_batch(seed=1, node_counts=(4,) * 8, num_points=8, bucket=8,
                   num_obj_classes=20, num_rel_classes=7),   # exact multiple
    ]
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batches[0], istrain=True)
    params, bs = variables["params"], variables.get("batch_stats", {})
    ev = make_eval_step(model)

    single = evaluate(ev, params, bs, batches, num_rel_classes=7, verbose=False)

    mesh = make_mesh(jax.devices()[:8])
    params_r, bs_r = replicate(params, mesh), replicate(bs, mesh)
    sharded = evaluate(ev, params_r, bs_r,
                       shard_eval_batches(iter(batches), mesh),
                       num_rel_classes=7, verbose=False)

    assert set(single) == set(sharded)
    for k in single:
        if np.isnan(single[k]):
            assert np.isnan(sharded[k]), k
        else:
            np.testing.assert_allclose(sharded[k], single[k], rtol=1e-6,
                                       err_msg=k)
