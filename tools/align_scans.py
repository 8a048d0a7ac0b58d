"""Align 3RScan rescans to reference frames (reference transform_ply.py).

Usage:
  python tools/align_scans.py --scans-root /data/3RScan \
      --scan3r-json /data/3RScan.json --rescans rescans.txt --references refs.txt
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--scans-root", required=True)
    p.add_argument("--scan3r-json", required=True)
    p.add_argument("--rescans", default=None, help="txt of rescan ids")
    p.add_argument("--references", default=None, help="txt of reference ids")
    p.add_argument("--raw-name", default="labels.instances.annotated.v2.ply")
    p.add_argument("--out-name", default="labels.instances.align.annotated.v2.ply")
    args = p.parse_args()

    from vlsat_tpu.data.assets import read_txt_lines
    from vlsat_tpu.preprocess.transform import align_dataset, read_transform_matrices

    transforms = read_transform_matrices(args.scan3r_json)
    total = 0
    if args.rescans:
        total += align_dataset(args.scans_root, read_txt_lines(args.rescans),
                               transforms, args.raw_name, args.out_name)
    if args.references:
        total += align_dataset(args.scans_root, read_txt_lines(args.references),
                               {}, args.raw_name, args.out_name)
    print(f"aligned/copied {total} scans")


if __name__ == "__main__":
    main()
