#!/usr/bin/env python
"""Image pyramid generation: images/ -> images_{2,4,8}/ (reference
scripts/downscale.py)."""
import argparse
import os

import cv2

if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("path")
    p.add_argument("--scales", type=int, nargs="*", default=[2, 4, 8])
    args = p.parse_args()
    src = os.path.join(args.path, "images")
    for s in args.scales:
        dst = os.path.join(args.path, f"images_{s}")
        os.makedirs(dst, exist_ok=True)
        for name in sorted(os.listdir(src)):
            img = cv2.imread(os.path.join(src, name), cv2.IMREAD_UNCHANGED)
            if img is None:
                continue
            out = cv2.resize(img, (img.shape[1] // s, img.shape[0] // s),
                             interpolation=cv2.INTER_AREA)
            cv2.imwrite(os.path.join(dst, name), out)
        print(f"images_{s}: done")
