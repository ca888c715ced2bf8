"""Multi-view training samples: shared geometry/crop/aug machinery + the
DTU and BlendedMVS dataset layouts.

Re-designs reference datasets/dtu_dataset_ms.py and blended_dataset_ms.py
for a TPU input pipeline:
- pure numpy/cv2, no torch DataLoader;
- the multi-scale "barrel" trick (every sample in a batch shares one crop
  scale, datasets/dtu_dataset_ms.py:112-127) becomes an explicit
  ShapeBucketSchedule: a deterministic epoch-seeded assignment of crop
  scales to global batches, identical on every host (all data-parallel
  replicas MUST pick the same bucket per step or XLA recompiles);
- per-stage intrinsics are scaled 0.125/0.25/0.5/1 into the [V, 2, 4, 4]
  camera stacks the model consumes (dtu_dataset_ms.py:340-353).
"""
from __future__ import annotations

import os
import random
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from . import native
from .io import build_camera_stack, read_cam_file, read_pair_file, read_pfm
from .transforms import (
    apply_color_jitter,
    normalize_imagenet,
    sample_jitter_params,
    stage_pyramid,
)

STAGE_SCALES = (0.125, 0.25, 0.5, 1.0)


def stage_cameras(intrinsics: np.ndarray, extrinsics: np.ndarray) -> Dict[str, np.ndarray]:
    """Full-res (K, E) -> {'stageN': [2, 4, 4]} with K scaled per stage."""
    cams = {}
    for i, s in enumerate(STAGE_SCALES):
        k = intrinsics.copy()
        k[:2] *= s
        cams[f"stage{i + 1}"] = build_camera_stack(k, extrinsics)
    return cams


def pre_resize(img, depth, intrinsics, mask, scale: float):
    """Area-resize image (nearest for depth/mask), scale K
    (reference pre_resize, dtu_dataset_ms.py:199-214)."""
    import cv2

    if scale == 1.0:
        return img, depth, intrinsics, mask
    h, w = img.shape[:2]
    nw, nh = int(w * scale), int(h * scale)
    img = cv2.resize(img, (nw, nh), interpolation=cv2.INTER_AREA)
    k = intrinsics.copy()
    k[0] *= scale
    k[1] *= scale
    if depth is not None:
        depth = cv2.resize(depth, (nw, nh), interpolation=cv2.INTER_NEAREST)
    if mask is not None:
        mask = cv2.resize(mask, (nw, nh), interpolation=cv2.INTER_NEAREST)
    return img, depth, k, mask


def crop(img, depth, intrinsics, mask, crop_h, crop_w, offset_y, offset_x):
    """Crop + principal-point shift (reference final_crop,
    dtu_dataset_ms.py:217-243)."""
    img = img[offset_y:offset_y + crop_h, offset_x:offset_x + crop_w]
    k = intrinsics.copy()
    k[0, 2] -= offset_x
    k[1, 2] -= offset_y
    if depth is not None:
        depth = depth[offset_y:offset_y + crop_h, offset_x:offset_x + crop_w]
    if mask is not None:
        mask = mask[offset_y:offset_y + crop_h, offset_x:offset_x + crop_w]
    return img, depth, k, mask


@dataclass
class MultiScaleArgs:
    """Mirror of config multi_scale_args (config/mvsformer++.json:143-169)."""

    scales: Sequence[Tuple[int, int]] = (
        (512, 640), (512, 704), (512, 768),
        (576, 704), (576, 768), (576, 832),
        (640, 832), (640, 896), (640, 960),
        (704, 896), (704, 960), (704, 1024),
        (768, 960), (768, 1024), (768, 1088),
        (832, 1024), (832, 1088), (832, 1152),
        (896, 1152), (896, 1216), (896, 1280),
        (960, 1216), (960, 1280), (960, 1344),
        (1024, 1280),
    )
    resize_range: Tuple[float, float] = (1.0, 1.2)
    scale_batch_map: Dict[str, int] = field(default_factory=lambda: {
        "512": 4, "576": 4, "640": 4, "704": 4,
        "768": 2, "832": 2, "896": 2, "960": 2, "1024": 2,
    })


class ShapeBucketSchedule:
    """Epoch-seeded deterministic (sample order, crop scale per batch).

    Replaces reset_dataset/idx_map (reference dtu_dataset_ms.py:112-127) with
    a host-independent schedule: every data-parallel host derives the same
    permutation and per-batch scale from (seed, epoch), so all replicas run
    the same compiled shape each step.
    """

    def __init__(self, n_samples: int, scales: Sequence[Tuple[int, int]],
                 batch_size: int, seed: int = 0):
        self.n_samples = n_samples
        self.scales = list(scales)
        self.batch_size = batch_size
        self.seed = seed

    def epoch(self, epoch: int, order=None):
        """order (optional): externally supplied sample order for this epoch
        (e.g. BalancedSchedule for multi-dataset training); the per-batch
        scale draw stays identical either way so every host compiles the
        same shape bucket."""
        rng = np.random.RandomState(self.seed * 10007 + epoch)
        if order is None:
            order = rng.permutation(self.n_samples)
        else:
            order = np.asarray(order)
            rng.permutation(self.n_samples)  # keep the scale-draw stream aligned
        n_batches = len(order) // self.batch_size
        scale_idx = rng.randint(0, len(self.scales), size=n_batches)
        batches = []
        for b in range(n_batches):
            idxs = order[b * self.batch_size:(b + 1) * self.batch_size]
            batches.append((idxs, self.scales[scale_idx[b]]))
        return batches


class MVSTrainDataset:
    """Base: sample loading given (scan paths, view ids, crop scale)."""

    def __init__(self, nviews=5, ndepths=192, interval_scale=1.06,
                 random_crop=True, augment=True, aug_args=None,
                 resize_range=(1.0, 1.2), seed=0):
        self.nviews = nviews
        self.ndepths = ndepths
        self.interval_scale = interval_scale
        self.random_crop = random_crop
        self.augment = augment
        self.aug_args = aug_args or {}
        self.resize_range = resize_range
        self.metas: List = []
        self.seed = seed

    # --- per-dataset hooks -------------------------------------------------
    def load_view(self, meta, vid, want_depth: bool):
        """-> (img [H,W,3] float in [0,1], depth|None, mask|None, K, E,
        depth_min, depth_interval)."""
        raise NotImplementedError

    def full_resolution(self) -> Tuple[int, int]:
        """(H, W) of the raw images; peeked lazily from the first sample's
        reference image so synthetic/cropped datasets work unmodified."""
        if not hasattr(self, "_full_res"):
            img, *_ = self.load_view(self.metas[0], self.metas[0][2], want_depth=False)
            self._full_res = img.shape[:2]
        return self._full_res

    def shuffle_src_views(self, src_views, rng):
        srcs = list(src_views)
        rng.shuffle(srcs)
        return srcs

    # ----------------------------------------------------------------------
    def __len__(self):
        return len(self.metas)

    def get_sample(self, idx: int, crop_hw: Tuple[int, int], epoch: int = 0):
        """One training sample at the given crop scale."""
        meta = self.metas[idx]
        scan, light_idx, ref_view, src_views = meta
        rng = random.Random((self.seed * 100003 + epoch) * 1000003 + idx)
        nprng = np.random.RandomState(rng.randrange(2**31))

        srcs = self.shuffle_src_views(src_views, rng)
        view_ids = [ref_view] + srcs[: self.nviews - 1]
        crop_h, crop_w = crop_hw
        full_h, full_w = self.full_resolution()

        enlarge = self.resize_range[0] + nprng.rand() * (self.resize_range[1] - self.resize_range[0])
        resize_scale = max(
            float(np.clip(crop_h * enlarge / full_h, 0.45, 1.0)),
            float(np.clip(crop_w * enlarge / full_w, 0.45, 1.0)),
        )

        jitter = (
            sample_jitter_params(nprng, **self.aug_args) if self.augment else None
        )

        imgs, cams = [], []
        depth_ms = mask_ms = depth_values = None
        for i, vid in enumerate(view_ids):
            img, depth, mask, K, E, dmin, dint = self.load_view(meta, vid, want_depth=(i == 0))
            img, depth, K, mask = pre_resize(img, depth, K, mask, resize_scale)
            h, w = img.shape[:2]

            if i == 0:
                # retry crops until the 1/8-res mask has coverage (reference
                # dtu_dataset_ms.py:289-311). The accepted offsets are bound
                # explicitly OUTSIDE the loop so the final crop below cannot
                # silently drift from the candidate that passed the coverage
                # check (the last loop iteration's offsets ARE the accepted
                # ones, by construction of the break).
                oy = ox = 0
                for _ in range(20):
                    oy = nprng.randint(0, h - crop_h + 1) if self.random_crop else (h - crop_h) // 2
                    ox = nprng.randint(0, w - crop_w + 1) if self.random_crop else (w - crop_w) // 2
                    _, d_, _, m_ = crop(img, depth, K, mask, crop_h, crop_w, oy, ox)
                    m_s1 = stage_pyramid(m_)["stage1"] if m_ is not None else None
                    if m_s1 is None or np.any(m_s1 > 0) or not self.random_crop:
                        break
                img, depth, K, mask = crop(img, depth, K, mask, crop_h, crop_w, oy, ox)
                depth_ms = stage_pyramid(depth) if depth is not None else None
                mask_ms = stage_pyramid(mask) if mask is not None else None
                depth_values = np.arange(
                    dmin, dint * self.ndepths + dmin, dint, dtype=np.float32
                )[: self.ndepths]
            else:
                oy = nprng.randint(0, h - crop_h + 1) if self.random_crop else (h - crop_h) // 2
                ox = nprng.randint(0, w - crop_w + 1) if self.random_crop else (w - crop_w) // 2
                img, depth, K, mask = crop(img, depth, K, mask, crop_h, crop_w, oy, ox)

            if jitter is not None:
                img = apply_color_jitter(img, jitter, include_gamma=False)
                gamma = jitter["gamma"]
            else:
                gamma = 0.0
            # fused (gamma +) ImageNet-normalize — native C pass when built
            imgs.append(native.crop_normalize(
                img, 0, 0, img.shape[0], img.shape[1], gamma))
            cams.append(stage_cameras(K, E))

        sample = {
            "imgs": np.stack(imgs).astype(np.float32),  # [V, H, W, 3]
            "cams": {
                k: np.stack([c[k] for c in cams]) for k in cams[0]
            },  # {stageN: [V, 2, 4, 4]}
            "depth_values": depth_values,
            "filename": f"{scan}/{{}}/{view_ids[0]:0>8}{{}}",
        }
        if depth_ms is not None:
            sample["depth_gt"] = depth_ms
            sample["mask"] = mask_ms
        return sample


class DTUTrainDataset(MVSTrainDataset):
    """DTU multi-scale training set (reference datasets/dtu_dataset_ms.py):
    metas = scan x 49 ref views x 7 lights; Rectified_raw 1200x1600 images,
    Depths_raw GT + visibility masks."""

    def __init__(self, datapath, listfile, mode="train", **kwargs):
        super().__init__(**kwargs)
        self.datapath = datapath
        self.mode = mode
        if mode != "train":
            self.random_crop = False
            self.augment = False
        with open(listfile) as f:
            scans = [l.strip() for l in f if l.strip()]
        pairs = read_pair_file(os.path.join(datapath, "Cameras/pair.txt"))
        self.metas = [
            (scan, light, ref, srcs)
            for scan in scans
            for ref, srcs in pairs
            for light in range(7)
        ]

    def load_view(self, meta, vid, want_depth):
        scan, light_idx, _, _ = meta
        from .io import read_image

        img = read_image(os.path.join(
            self.datapath, f"Rectified_raw/{scan}/rect_{vid + 1:0>3}_{light_idx}_r5000.png"))
        K, E, dmin, dint, _ = read_cam_file(
            os.path.join(self.datapath, f"Cameras/{vid:0>8}_cam.txt"),
            self.interval_scale,
        )
        depth = mask = None
        if want_depth:
            depth = read_pfm(os.path.join(
                self.datapath, f"Depths_raw/{scan}/depth_map_{vid:0>4}.pfm"))[0].astype(np.float32)
            from PIL import Image

            m = np.asarray(Image.open(os.path.join(
                self.datapath, f"Depths_raw/{scan}/depth_visual_{vid:0>4}.png")), np.float32)
            mask = (m > 10).astype(np.float32)
        return img, depth, mask, K, E, dmin, dint


class BlendedTrainDataset(MVSTrainDataset):
    """BlendedMVS training set (reference datasets/blended_dataset_ms.py):
    pair per scan at {scan}/cams/pair.txt, mask = depth > 0, src views
    shuffled within the top-7, cam file may carry an explicit depth_num."""

    def __init__(self, datapath, listfile, mode="train", **kwargs):
        super().__init__(**kwargs)
        self.datapath = datapath
        self.mode = mode
        if mode != "train":
            self.random_crop = False
            self.augment = False
        with open(listfile) as f:
            scans = [l.strip() for l in f if l.strip()]
        self.metas = []
        for scan in scans:
            pair_path = os.path.join(datapath, scan, "cams", "pair.txt")
            if not os.path.exists(pair_path):
                pair_path = os.path.join(datapath, scan, scan, scan, "cams", "pair.txt")
            for ref, srcs in read_pair_file(pair_path):
                if len(srcs) > 0:
                    self.metas.append((scan, 0, ref, srcs))

    def shuffle_src_views(self, src_views, rng):
        srcs = list(src_views[:7])  # top-7 then shuffle (reference :259-261)
        rng.shuffle(srcs)
        return srcs

    def _scan_dir(self, scan):
        d = os.path.join(self.datapath, scan)
        nested = os.path.join(d, scan, scan)
        return nested if os.path.isdir(nested) else d

    def load_view(self, meta, vid, want_depth):
        scan = meta[0]
        base = self._scan_dir(scan)
        from .io import read_image

        img = read_image(os.path.join(base, "blended_images", f"{vid:0>8}.jpg"))
        K, E, dmin, dint, extra = read_cam_file(
            os.path.join(base, "cams", f"{vid:0>8}_cam.txt"), self.interval_scale)
        if "depth_num" in extra and extra["depth_num"] > 0:
            # re-derive the interval from the explicit range (reference
            # blended_dataset_ms.py:152-157)
            dint = (extra["depth_max"] - dmin) / self.ndepths * self.interval_scale
        depth = mask = None
        if want_depth:
            depth = read_pfm(os.path.join(base, "rendered_depth_maps", f"{vid:0>8}.pfm"))[0].astype(np.float32)
            mask = (depth > 0).astype(np.float32)
        return img, depth, mask, K, E, dmin, dint
