#!/usr/bin/env python
"""COCO val -> preprocessed .bin files (reference preprocess_inputs_to_bin.py).

Writes float32 NCHW 1x3x1344x1344 per image, named {image_stem}.bin, plus
a manifest (reference get_bin_info.py).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ann", required=True)
    p.add_argument("--image-root", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--limit", type=int, default=0)
    args = p.parse_args()

    from centermask2_tpu.data import bin_io, preprocess_for_model
    from centermask2_tpu.data.coco import CocoDataset

    ds = CocoDataset(args.ann, args.image_root, filter_empty=False)
    os.makedirs(args.out, exist_ok=True)
    ids = ds.ids[: args.limit] if args.limit else ds.ids
    for img_id in ids:
        path = ds.image_path(img_id)
        pre = preprocess_for_model(path)
        stem = os.path.splitext(os.path.basename(path))[0]
        bin_io.write_input_bin(pre["input"][0], os.path.join(args.out, f"{stem}.bin"))
    with open(os.path.join(args.out, "bin_info.txt"), "w") as f:
        f.write(bin_io.bin_manifest(args.out))
    print(f"wrote {len(ids)} bins to {args.out}")


if __name__ == "__main__":
    main()
