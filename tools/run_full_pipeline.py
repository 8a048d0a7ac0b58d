"""End-to-end pipeline orchestrator (BASELINE.json config #5).

Given a 3RScan scans root + 3DSSG assets, runs every stage in order:

  1. (optional) align rescans to reference frames;
  2. multi-view projection -> per-instance CLIP image features;
  3. CLIP text tables + triplet sentence cache;
  4. model evaluation (or training) over the resulting dataset.

Each stage is skippable and resumable (stages write their artifacts next
to the data and later stages consume them from disk), mirroring the
reference's offline-scripts-then-train workflow as one command.

Usage:
  python tools/run_full_pipeline.py --root assets/3dssg --scans-root /data/3RScan \
      --out out/ --stages project,text,eval [--encoder hash]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def stage_project(args):
    import numpy as np

    from vlsat_tpu.data.assets import build_index
    from vlsat_tpu.data.ply import read_ply_vertices
    from vlsat_tpu.projection import MultiViewFeatureExtractor

    if args.encoder == "hash":
        import hashlib

        def encoder(views):
            out = np.zeros((len(views), 512), np.float32)
            for i, v in enumerate(views):
                seed = int.from_bytes(hashlib.sha256(v.tobytes()[:64]).digest()[:4], "little")
                x = np.random.RandomState(seed).randn(512).astype(np.float32)
                out[i] = x / np.linalg.norm(x)
            return out
    else:
        import torch
        from transformers import CLIPImageProcessor, CLIPVisionModelWithProjection
        from PIL import Image

        proc = CLIPImageProcessor.from_pretrained(args.model)
        vision = CLIPVisionModelWithProjection.from_pretrained(args.model).eval()

        def encoder(views):
            imgs = [Image.fromarray(v) for v in views]
            with torch.no_grad():
                return vision(**proc(images=imgs, return_tensors="pt")).image_embeds.numpy()

    ex = MultiViewFeatureExtractor(encoder)
    done = 0
    for split in ("train_scans", "validation_scans"):
        try:
            idx = build_index(args.root, split)
        except FileNotFoundError:
            continue
        for ann in idx.scenes:
            scan_dir = os.path.join(args.scans_root, ann.scan)
            frames_meta = os.path.join(scan_dir, "sequence", "frames.json")
            if not os.path.exists(frames_meta):
                continue  # RGB sequence not extracted for this scan
            with open(frames_meta) as f:
                meta = json.load(f)
            import imageio.v3 as iio  # optional dependency, gated

            images = [iio.imread(os.path.join(scan_dir, "sequence", fr["color"]))
                      for fr in meta["frames"]]
            extr = np.asarray([fr["extrinsic"] for fr in meta["frames"]], np.float32)
            intr = np.asarray(meta["intrinsic"], np.float32)
            ply = read_ply_vertices(os.path.join(scan_dir, args.label_file))
            ex.process_scene(
                ply.points, ply.instances, ann.objects, images, extr, intr,
                {}, meta["width"], meta["height"],
                save_dir=os.path.join(scan_dir, "multi_view"))
            done += 1
    print(f"[project] processed {done} scans")


def stage_text(args):
    import subprocess

    subprocess.run([sys.executable, os.path.join(os.path.dirname(__file__),
                                                 "build_text_tables.py"),
                    "--root", args.root, "--out", os.path.join(args.out, "clip_assets"),
                    "--encoder", args.encoder, "--model", args.model], check=True)


def stage_run(args, mode):
    from vlsat_tpu.config import load_config
    from vlsat_tpu.train.runner import Runner
    from vlsat_tpu.utils.seeding import set_random_seed

    clip_dir = os.path.join(args.out, "clip_assets")
    obj_table = os.path.join(clip_dir, "obj_text_table.npy")
    trip_cache = os.path.join(clip_dir, "triplet_text_cache.npz")
    cfg = load_config(args.config, overrides={
        "MODE": mode, "EVAL": mode == "eval", "PATH": args.out,
        "MODEL": {
            "obj_text_table": obj_table if os.path.exists(obj_table) else None,
            "triplet_text_cache": trip_cache if os.path.exists(trip_cache) else None,
        },
        "dataset": {"root": args.root, "scans_root": args.scans_root,
                    "multi_view_root": args.multi_view_root,
                    "cache_root": os.path.join(args.out, "cache")},
    })
    set_random_seed(cfg.SEED)
    runner = Runner(cfg)
    if mode == "eval":
        runner.load(best=True)
        runner.validation(save=True, with_scores=True)
    else:
        runner.load(best=False)
        runner.train()
        runner.validation(save=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--root", default="assets/3dssg")
    p.add_argument("--scans-root", required=True)
    p.add_argument("--multi-view-root", default=None)
    p.add_argument("--out", required=True)
    p.add_argument("--config", default=None)
    p.add_argument("--label-file", default="labels.instances.align.annotated.v2.ply")
    p.add_argument("--encoder", choices=["hf", "hash"], default="hf")
    p.add_argument("--model", default="openai/clip-vit-base-patch32")
    p.add_argument("--stages", default="text,eval",
                   help="comma list from: project,text,train,eval")
    args = p.parse_args()
    os.makedirs(args.out, exist_ok=True)

    stages = args.stages.split(",")
    if "project" in stages:
        stage_project(args)
    if "text" in stages:
        stage_text(args)
    if "train" in stages:
        stage_run(args, "train")
    if "eval" in stages:
        stage_run(args, "eval")


if __name__ == "__main__":
    main()
