"""Default experiment configuration.

Hyperparameters mirror the reference's shipped config (config/mmgnet.json):
LR 1e-4, cosine schedule, 100 epochs, batch 8, N_LAYERS 2, NUM_HEADS 8,
DIM_ATTEN 256, 'fat' attention, dropout 0.5, DYNAMIC edge weighting,
lambda_o 0.1, 128 points per instance, etc.  All machine-specific absolute
paths from the reference (utils/define.py, config/mmgnet.json) are replaced
by config-relative entries.
"""

DEFAULT_CONFIG = {
    "NAME": "Mmgnet",
    "_NAME": ["SGFN", "Mmgnet", "MmgnetSingle", "SGPN", "SGGpoint",
              "SGGpointBaseline", "MMteacher", "MmgnetIn21k"],
    "PATH": "./output",
    "SEED": 2020,
    # JAX PRNG implementation for the training process.  Dropout-mask
    # generation is the largest non-GEMM train-step cost with the default
    # threefry (~1.2 ms of a 4.3 ms step at B=8); XLA's RngBitGenerator
    # ("rbg") cuts the step to ~3.6 ms (+21% train throughput) and stays
    # per-seed deterministic.  Set to "threefry2x32" for cross-version
    # stable streams.
    "PRNG_IMPL": "rbg",
    "_PRNG_IMPL": ["rbg", "threefry2x32", "unsafe_rbg"],
    "MAX_EPOCHES": 100,
    "LR": 1e-4,
    "W_DECAY": 0.0,
    "LR_SCHEDULE": "Cosine",
    "_LR_SCHEDULE": ["Cosine", "BatchMultiplicative"],
    "SAVE_INTERVAL": 2000,
    "VALID_INTERVAL": 10,
    "LOG_INTERVAL": 100,
    "Batch_Size": 8,
    # K train steps per device dispatch (lax.scan over K stacked batches).
    # >1 amortizes the per-call enqueue cost — essential on remote-TPU
    # tunnels where dispatch (~4.3 ms) exceeds the device step; set 1 for
    # per-step logging granularity.  Losses/step counts are identical to
    # the sequential path (tests/test_packed_pipeline.py).
    "TRAIN_MICROSTEPS": 1,
    # Pin the packed train split's tensors in device HBM and dispatch only
    # permutation indices — zero per-step host->device payload
    # (data/resident.py).  "auto" turns it on when the pack fits
    # RESIDENT_HBM_BUDGET bytes; single-device only (a mesh shards the
    # streaming loaders instead).  Trajectory matches the streaming path
    # fed the same rows (tests/test_resident.py).
    "TRAIN_RESIDENT": "auto",
    # Same residency for validation: single-device pins the flat split and
    # gathers batches by index; a mesh stores it batch-structured sharded
    # P(None, 'data') so eval dispatches are payload-free AND data-parallel
    # (data/resident.py ResidentShardedEval; falls back to the streaming
    # shard_eval_batches path when EVAL_BATCH_SIZE % mesh size != 0).
    "EVAL_RESIDENT": "auto",
    # eval batches scanned per dispatch on the single-device resident path
    # (data/resident.py ResidentGroupedEval): one packed output fetch per
    # group instead of per batch.  1 disables grouping; 4 measured best
    # through a remote-TPU tunnel once the max_gt payload cut landed
    # (8/16 regress: the fetch burst outgrows the latency it saves —
    # PERFORMANCE.md round 3).
    "EVAL_GROUP": 4,
    "RESIDENT_HBM_BUDGET": 2 << 30,
    # int = one batch size everywhere (1 mirrors the reference protocol,
    # model.py:186 — metrics are batch-size independent either way);
    # "auto" = the measured per-bucket throughput-best table
    # (data/bucket_batch.py DEFAULT_EVAL_BATCH, from tools/bench_buckets)
    "EVAL_BATCH_SIZE": 1,
    # Persistent XLA compile cache for the CLI entry (vlsat_tpu/main.py):
    # a resumed/re-launched run re-traces the same bucketed programs, so
    # warm entries turn restart compiles into disk loads.  "" disables.
    "COMPILE_CACHE_DIR": "/tmp/vlsat_jax_cache",
    "EVAL": False,
    "VERBOSE": False,
    "exp": "default",
    "MODEL": {
        "N_LAYERS": 2,
        "USE_SPATIAL": True,
        "WITH_BN": False,
        "USE_RGB": False,
        "USE_NORMAL": False,
        "use_2d_feats": True,
        "USE_GCN_EDGE": True,
        "_GCN_TYPE": ["TRIP", "EAN"],
        "GCN_TYPE": "EAN",
        "_ATTENTION": ["fat"],
        "ATTENTION": "fat",
        "DROP_OUT_ATTEN": 0.5,
        "multi_rel_outputs": True,
        "point_feature_size": 768,
        "clip_feat_dim": 512,
        "lambda_o": 0.1,
        "DIM_ATTEN": 256,
        "_WEIGHT_EDGE": ["BG", "DYNAMIC", "OCCU", "NONE"],
        "WEIGHT_EDGE": "DYNAMIC",
        "_GCN_AGGR": ["add", "mean", "max"],
        "GCN_AGGR": "max",
        "w_bg": 1.0,
        "NONE_RATIO": 1.0,
        "NUM_HEADS": 8,
        "use_descriptor": True,
        "use_pretrain": "",
        "adapter_alpha": 0.5,
        # nn_edge node-projection placement: "edge" | "gather" | "onehot"
        # (algebraically identical; see models/gnn.py + PERFORMANCE.md)
        "nn_edge_mode": "edge",
        # CLIP assets: pre-computed text tables (see vlsat_tpu.clipsem)
        "obj_text_table": None,
        "rel_text_table": None,
        "triplet_text_cache": None,
        "adapter_weights": None,
    },
    "dataset": {
        "root": "./assets/3dssg",
        "scans_root": None,            # 3RScan directory with per-scan PLYs
        "multi_view_root": None,       # per-instance CLIP feature .npy root
        "cache_root": None,            # preprocessed tensor cache
        # packed per-bucket tensor cache (tools/pack_dataset.py): directory
        # with train/ and validation/ packs; when a pack exists the runner
        # iterates mmap slices instead of per-item prepare+pad (data/packed.py)
        "packed_root": None,
        "label_file": "labels.instances.align.annotated.v2.ply",
        "num_points": 128,
        "num_points_union": 256,
        "use_data_augmentation": False,
        "node_buckets": [4, 8, 12, 16, 24, 32, 48, 64],
        "with_union_points": False,    # only the SGPN-style configs need them
        # runtime BFS subgraph sampling (reference config/mmgnet.json:79-83,
        # consumed by the legacy util_data.py data_preparation path)
        "sample_in_runtime": False,
        "sample_num_nn": 2,
        "sample_num_seed": 4,
        "max_edges": -1,
        "neighbor_radius": 0.5,
    },
}
