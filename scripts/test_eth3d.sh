#!/bin/bash
# ETH3D high-res evaluation. Mirrors the reference's eth3d support in
# datasets/general_eval.py:104-106 (cam line 11 carries depth_min depth_max;
# the hypothesis range is rescaled to --numdepth). interval_scale stays 1.0
# — the range already comes from the cams. Scenes are claimed dynamically
# (--schedule queue), so launch this script once per worker.
set -e
CKPT=${1:?usage: test_eth3d.sh <ckpt_npz> <datapath> [outdir]}
DATA=${2:?usage: test_eth3d.sh <ckpt_npz> <datapath> [outdir]}
OUT=${3:-outputs/eth3d}

python test.py \
  --config configs/mvsformerplusplus.json \
  --dataset eth3d \
  --testpath "$DATA" \
  --testlist lists/eth3d/test.txt \
  --outdir "$OUT" \
  --ckpt_npz "$CKPT" \
  --num_view 7 --numdepth 192 --interval_scale 1.0 \
  --max_h 1088 --max_w 1600 \
  --schedule queue \
  --filter_method dpcd --conf 0.5 --fusion_view 10
