#!/usr/bin/env python
"""Compute the average attention sequence length over the training crop
scales — the `train_avg_length` constant behind the entropy-invariant
softmax scale (reference cal_avg_length.py; values 12185 for 1/8-res
feature tokens and 762 for ViT tokens ship in the configs).

Usage: python tools/cal_avg_length.py [--config configs/mvsformerplusplus.json]
"""
from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def avg_lengths(scales, rescale=0.4375, patch=14):
    """(stage1_avg, vit_avg) over the multi-scale crop list."""
    stage1 = [h // 8 * (w // 8) for h, w in scales]
    vit = [
        int(h * rescale // patch) * int(w * rescale // patch)
        for h, w in scales
    ]
    return sum(stage1) / len(stage1), sum(vit) / len(vit)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="configs/mvsformerplusplus.json")
    args = p.parse_args()
    cfg = json.loads(Path(args.config).read_text())
    scales = cfg["data_loader"][0]["args"]["multi_scale_args"]["scales"]
    rescale = cfg["arch"]["args"].get("rescale", 0.4375)
    s1, vit = avg_lengths([tuple(s) for s in scales], rescale)
    print(f"stage1 (1/8-res) avg tokens: {s1:.0f}")
    print(f"ViT avg tokens:              {vit:.0f}")
    print("set FMT_config/transformer_config train_avg_length to the stage1 "
          "value and dino_cfg train_avg_length to the ViT value")


if __name__ == "__main__":
    main()
