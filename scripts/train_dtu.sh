#!/bin/bash
# DTU training (reference scripts in README.md:63-82): global batch 16,
# 15 epochs, bf16, data-parallel over all local devices.
set -e
python train.py -c configs/mvsformerplusplus.json --data_path "${1:-./MVS_data/DTU/mvs_training}"
