"""Photometric augmentation + normalization (numpy/cv2; no torchvision).

Re-implements the reference's deterministic-parameter ColorJitter + gamma
(datasets/color_jittor.py:53-83, datasets/dtu_dataset_ms.py:20-39): ONE set
of jitter factors is drawn per sample and applied to ALL views, preserving
cross-view photometric consistency.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def normalize_imagenet(img: np.ndarray) -> np.ndarray:
    """[H, W, 3] float32 in [0,1] -> ImageNet-normalized."""
    return (img - IMAGENET_MEAN) / IMAGENET_STD


def sample_jitter_params(rng: np.random.RandomState, brightness=0.2, contrast=0.1,
                         saturation=0.1, hue=0.05, min_gamma=0.9, max_gamma=1.1):
    """Draw one factor set (applied to every view of the sample)."""
    return {
        "order": rng.permutation(4),
        "brightness": rng.uniform(max(0, 1 - brightness), 1 + brightness),
        "contrast": rng.uniform(max(0, 1 - contrast), 1 + contrast),
        "saturation": rng.uniform(max(0, 1 - saturation), 1 + saturation),
        "hue": rng.uniform(-hue, hue),
        "gamma": rng.uniform(min_gamma, max_gamma),
    }


def _adjust_brightness(img, f):
    return np.clip(img * f, 0, 1)


def _adjust_contrast(img, f):
    # torchvision: blend with the mean of the grayscale image
    gray = img @ np.array([0.299, 0.587, 0.114], np.float32)
    mean = gray.mean()
    return np.clip(img * f + mean * (1 - f), 0, 1)


def _adjust_saturation(img, f):
    gray = (img @ np.array([0.299, 0.587, 0.114], np.float32))[..., None]
    return np.clip(img * f + gray * (1 - f), 0, 1)


def _adjust_hue(img, f):
    import cv2

    hsv = cv2.cvtColor((img * 255).astype(np.uint8), cv2.COLOR_RGB2HSV)
    # OpenCV hue is [0, 180); shift by f turns (f in [-0.5, 0.5] of a cycle)
    hsv[..., 0] = (hsv[..., 0].astype(np.int32) + int(round(f * 180))) % 180
    out = cv2.cvtColor(hsv, cv2.COLOR_HSV2RGB)
    return out.astype(np.float32) / 255.0


def apply_color_jitter(img: np.ndarray, params: dict,
                       include_gamma: bool = True) -> np.ndarray:
    """img [H, W, 3] in [0,1]; params from sample_jitter_params.

    include_gamma=False leaves the gamma step to a fused downstream pass
    (native crop_normalize)."""
    fns = [
        lambda x: _adjust_brightness(x, params["brightness"]),
        lambda x: _adjust_contrast(x, params["contrast"]),
        lambda x: _adjust_saturation(x, params["saturation"]),
        lambda x: _adjust_hue(x, params["hue"]),
    ]
    for i in params["order"]:
        img = fns[i](img)
    if include_gamma:
        # gamma (reference RandomGamma, clip_image=True)
        img = np.clip(img, 0, 1) ** params["gamma"]
    return np.clip(img, 0, 1).astype(np.float32)


def stage_pyramid(arr: np.ndarray, levels: int = 4) -> dict:
    """GT depth/mask -> {'stage1': 1/8, 'stage2': 1/4, 'stage3': 1/2,
    'stage4': 1/1} via nearest sampling (reference generate_stage_depth,
    datasets/dtu_dataset_ms.py:167-175)."""
    import cv2

    h, w = arr.shape[:2]
    out = {}
    for i in range(levels):
        f = 2 ** (levels - 1 - i)
        if f == 1:
            out[f"stage{i + 1}"] = arr
        else:
            out[f"stage{i + 1}"] = cv2.resize(
                arr, (w // f, h // f), interpolation=cv2.INTER_NEAREST
            )
    return out
