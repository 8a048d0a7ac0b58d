"""Zero-shot triplet recall analysis over saved eval artifacts.

Counterpart of data/get_zero_shot_val.py: loads the eval dumps
(topk_triplet_list.npy + cls_matrix_list.npy from --mode eval) and splits
recall@50/100 into zero-shot vs seen triplets using the train vocabulary.

Usage:
  python tools/zero_shot_analysis.py --results out/results/Mmgnet/exp \
      --root assets/3dssg
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--results", required=True)
    p.add_argument("--root", default="assets/3dssg")
    args = p.parse_args()

    import numpy as np

    from vlsat_tpu.data.assets import (build_triplet_vocab,
                                       load_relationship_json, read_classes,
                                       read_relationships)
    from vlsat_tpu.eval.metrics import get_zero_shot_recall

    ranks = np.load(os.path.join(args.results, "topk_triplet_list.npy"))
    cls_matrix = np.load(os.path.join(args.results, "cls_matrix_list.npy"))
    classes = read_classes(args.root)
    relations = read_relationships(args.root)[1:]
    vocab = build_triplet_vocab(load_relationship_json(args.root, "train_scans"),
                                classes, relations)
    for k, v in get_zero_shot_recall(ranks, cls_matrix, vocab).items():
        print(f"{k}: {v:.2f}")


if __name__ == "__main__":
    main()
