#!/usr/bin/env python
"""Cache per-image (height, width) metadata (reference tools/prepare_kitti.py).

    python tools/prepare_kitti.py data/kitti/training train_list.txt
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("root")
    p.add_argument("list_file")
    p.add_argument("--out-prefix", default="img_metas")
    args = p.parse_args()

    from monorun_tpu.data.kitti import prepare_meta_files

    n = prepare_meta_files(args.root, args.list_file, args.out_prefix)
    print(f"wrote {n} meta files to {os.path.join(args.root, args.out_prefix)}")


if __name__ == "__main__":
    main()
