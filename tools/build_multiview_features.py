"""Rebuild per-instance multi-view CLIP features from saved view images.

Counterpart of clip_adapter/data/get_data_list.py + get_data_feat.py: walk
each scan's ``multi_view`` directory of saved view JPGs
(instance_{id}_class_{name}_[croped_]view{k}_..._{tier}.jpg, written by the
projection front-end), encode the views with a CLIP image encoder, save the
mean feature per instance (croped/origin variants) and emit the
``*_all_quanlity.txt`` listing the adapter trainer consumes.

Usage:
  python tools/build_multiview_features.py --scans-root /data/3RScan \
      --scan-list assets/3dssg/train_scans.txt --out-list train_scans_all_quanlity.txt \
      [--encoder hash]
"""

import argparse
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_VIEW = re.compile(
    r"instance_(?P<iid>[^_]+)_class_(?P<name>.+?)_(?P<kind>croped_view|view)"
    r"(?P<idx>\d+).*_(?P<tier>[ABC])\.jpg$")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--scans-root", required=True)
    p.add_argument("--scan-list", required=True)
    p.add_argument("--out-list", required=True)
    p.add_argument("--encoder", choices=["hf", "hash"], default="hf")
    p.add_argument("--model", default="openai/clip-vit-base-patch32")
    p.add_argument("--dim", type=int, default=512)
    args = p.parse_args()

    import numpy as np

    from vlsat_tpu.data.assets import read_txt_lines

    if args.encoder == "hf":
        import torch
        from transformers import CLIPImageProcessor, CLIPVisionModelWithProjection

        proc = CLIPImageProcessor.from_pretrained(args.model)
        vision = CLIPVisionModelWithProjection.from_pretrained(args.model).eval()

        def encode(paths):
            from PIL import Image

            imgs = [Image.open(p).convert("RGB") for p in paths]
            with torch.no_grad():
                inp = proc(images=imgs, return_tensors="pt")
                return vision(**inp).image_embeds.float().numpy()
    else:
        import hashlib

        def encode(paths):
            out = np.zeros((len(paths), args.dim), np.float32)
            for i, pth in enumerate(paths):
                seed = int.from_bytes(
                    hashlib.sha256(pth.encode()).digest()[:4], "little")
                v = np.random.RandomState(seed).randn(args.dim).astype(np.float32)
                out[i] = v / np.linalg.norm(v)
            return out

    lines = []
    for scan in read_txt_lines(args.scan_list):
        mv = os.path.join(args.scans_root, scan, "multi_view")
        if not os.path.isdir(mv):
            continue
        groups = {}
        for fn in sorted(os.listdir(mv)):
            m = _VIEW.match(fn)
            if not m:
                continue
            key = (m["iid"], m["name"])
            mode = "croped" if m["kind"].startswith("croped") else "origin"
            groups.setdefault(key, {}).setdefault(mode, []).append(
                (os.path.join(mv, fn), m["tier"]))
        for (iid, name), modes in groups.items():
            tier = min(t for views in modes.values() for _, t in views)
            for mode, views in modes.items():
                feats = encode([p for p, _ in views])
                feats /= np.linalg.norm(feats, axis=-1, keepdims=True)
                np.save(os.path.join(
                    mv, f"instance_{iid}_class_{name}_{mode}_view_mean.npy"),
                    feats.mean(0))
            lines.append(
                f"Scene: {scan} Instance: {iid} Label: {name} Quanlity: {tier}")
        print(f"{scan}: {len(groups)} instances")

    with open(args.out_list, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {args.out_list} ({len(lines)} entries)")


if __name__ == "__main__":
    main()
