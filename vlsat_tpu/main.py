"""CLI entry: python -m vlsat_tpu.main --mode {train,eval,trace,serve} --config cfg.json

Counterpart of the reference's main.py: loads the config (defaults merged
with the given JSON), seeds, archives the resolved config under the
experiment directory, builds the Runner and dispatches train / eval.
"""

from __future__ import annotations

import argparse
import os


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="vlsat_tpu: TPU-native 3D scene graph prediction")
    p.add_argument("--config", type=str, default=None, help="experiment config JSON")
    p.add_argument("--mode", type=str, choices=["train", "eval", "trace", "serve"],
                   default="train")
    p.add_argument("--exp", type=str, default="default")
    p.add_argument("--loadbest", action="store_true", help="load best (vs latest) checkpoint")
    p.add_argument("--data-parallel", action="store_true", help="shard batches over all devices")
    p.add_argument("--host", type=str, default="127.0.0.1", help="serve: bind address")
    p.add_argument("--port", type=int, default=8764, help="serve: port (0 = ephemeral)")
    p.add_argument("--max-batch", type=int, default=32, help="serve: micro-batch cap")
    p.add_argument("--deadline-ms", type=float, default=5.0,
                   help="serve: batch-formation latency budget")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    from vlsat_tpu.config import load_config
    from vlsat_tpu.utils.seeding import set_random_seed

    cfg = load_config(args.config, overrides={
        "MODE": args.mode, "exp": args.exp,
        "EVAL": args.mode == "eval", "LOADBEST": args.loadbest,
    })
    set_random_seed(cfg.SEED)

    # process-level PRNG implementation (config/defaults.py PRNG_IMPL):
    # "rbg" makes dropout-mask generation ~4x cheaper on TPU.  Applied here
    # at the CLI entry, not inside library constructors — it is global
    # process state (PERFORMANCE.md).
    import jax

    try:
        jax.config.update("jax_default_prng_impl", cfg.get("PRNG_IMPL", "rbg"))
    except Exception:
        pass

    # Persistent compilation cache (same recipe as bench.py / tools/serve.py):
    # a resumed run re-traces the same bucketed programs — warm entries turn
    # the restart's cold compiles into disk loads.  COMPILE_CACHE_DIR: ""
    # disables; entries key on HLO so the cache is safe across processes.
    cache_dir = cfg.get("COMPILE_CACHE_DIR",
                        os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                       "/tmp/vlsat_jax_cache"))
    if cache_dir:
        try:
            jax.config.update("jax_compilation_cache_dir", cache_dir)
            jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        except Exception:
            pass

    exp_dir = os.path.join(cfg.PATH, cfg.NAME, args.exp)
    os.makedirs(exp_dir, exist_ok=True)
    with open(os.path.join(exp_dir, "config.json"), "w") as f:
        f.write(cfg.to_json())

    from vlsat_tpu.train.runner import Runner

    runner = Runner(cfg, data_parallel=args.data_parallel)
    try:
        if args.mode == "eval":
            if not runner.load(best=args.loadbest):
                print("warning: no checkpoint found, evaluating fresh init")
            runner.validation(save=True, with_scores=True)
        elif args.mode == "serve":
            if not runner.load(best=args.loadbest):
                print("warning: no checkpoint found, serving fresh init")
            frontend = runner.serve(host=args.host, port=args.port,
                                    max_batch=args.max_batch,
                                    deadline_ms=args.deadline_ms)
            print(f"serving on http://{args.host}:{frontend.port} "
                  f"(POST /predict, GET /healthz)")
            frontend.serve_forever()
        elif args.mode == "trace":
            from vlsat_tpu.utils.export import trace_model
            runner.load(best=args.loadbest)
            trace_model(runner, os.path.join(exp_dir, "traced"))
        else:
            # resume tolerantly: an unrestorable checkpoint is archived and
            # training starts fresh (reference main.py:45-48 semantics)
            runner.load(best=False, allow_fallback=True)
            runner.train()
            runner.validation(save=True)
    finally:
        runner.close()


if __name__ == "__main__":
    main()
