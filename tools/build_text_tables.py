"""Build the CLIP text-embedding assets the framework consumes.

Produces:
  * obj_text_table.npy / rel_text_table.npy — normalized class-prompt
    embeddings that initialize the cosine classifiers;
  * triplet_text_cache.npz — every GT-triplet / no-relation sentence
    embedding for the rel-mimic loss.

Requires a local CLIP checkpoint (zero-egress environments must download
openai/clip-vit-base-patch32 beforehand); --encoder hash gives the
deterministic stand-in for pipeline testing without CLIP assets.

Usage:
  python tools/build_text_tables.py --root assets/3dssg --out clip_assets/ \
      --encoder hf --model /path/to/clip-vit-base-patch32
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--root", default="assets/3dssg")
    p.add_argument("--out", required=True)
    p.add_argument("--encoder", choices=["hf", "hash"], default="hf")
    p.add_argument("--model", default="openai/clip-vit-base-patch32")
    p.add_argument("--dim", type=int, default=512)
    args = p.parse_args()

    import numpy as np

    from vlsat_tpu.clipsem import (HashTextEncoder, HFCLIPTextEncoder,
                                   TripletTextCache, build_label_tables)
    from vlsat_tpu.data.assets import (build_index, load_relationship_json,
                                       read_classes, read_txt_lines)

    if args.encoder == "hf":
        enc = HFCLIPTextEncoder(args.model)
    else:
        enc = HashTextEncoder(args.dim)

    classes = read_classes(args.root)
    relations = read_txt_lines(os.path.join(args.root, "relations.txt"))
    os.makedirs(args.out, exist_ok=True)
    obj_t, rel_t = build_label_tables(classes, relations, enc)
    np.save(os.path.join(args.out, "obj_text_table.npy"), obj_t)
    np.save(os.path.join(args.out, "rel_text_table.npy"), rel_t)
    print(f"label tables: {obj_t.shape}, {rel_t.shape}")

    cache = TripletTextCache(classes, relations, dim=obj_t.shape[-1])
    for split in ("train_scans", "validation_scans"):
        try:
            idx = build_index(args.root, split)
        except FileNotFoundError:
            print(f"skip {split}: relationships json missing")
            continue
        sentences = cache.sentences_for_index(idx.scenes)
        print(f"{split}: {len(sentences)} sentences")
        cache.build(sentences, enc)
    cache.save(os.path.join(args.out, "triplet_text_cache.npz"))
    print("done")


if __name__ == "__main__":
    main()
