#!/bin/bash
# BlendedMVS fine-tune (reference config/mvsformer++_ft.json).
set -e
python train.py -c configs/mvsformerplusplus_ft.json --data_path "${1:-./MVS_data/BlendedMVS}" --resume
