"""Evaluation dataset for DTU / Tanks&Temples / ETH3D / custom scans.

Re-design of reference datasets/general_eval.py: MVSNet-format scan layout
(images + cams + pair.txt), per-scene interval_scale, T&T +4px pad with cy
shift (general_eval.py:88-90,115-117), resize to max_h x max_w rounded to
multiples of 64 (so stage-1 dims stay U-Net-divisible), per-stage intrinsic
scaling, optional DTU GT depth for online depth metrics.
"""
from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from .io import build_camera_stack, read_cam_file, read_image, read_pair_file, read_pfm
from .mvs_dataset import STAGE_SCALES, stage_cameras
from .transforms import normalize_imagenet


class EvalDataset:
    def __init__(self, datapath, scan_list: Sequence[str], nviews=5, ndepths=192,
                 interval_scale=1.06, max_h=1152, max_w=1536, fix_res=False,
                 dataset_name="dtu", gt_depth_path: Optional[str] = None):
        self.datapath = datapath
        self.nviews = nviews
        self.ndepths = ndepths
        self.max_h = max_h
        self.max_w = max_w
        self.fix_res = fix_res
        self.dataset_name = dataset_name
        self.gt_depth_path = gt_depth_path
        if isinstance(interval_scale, dict):
            self.interval_scale = interval_scale
        else:
            self.interval_scale = {s: interval_scale for s in scan_list}
        self.metas: List[Tuple[str, int, List[int]]] = []
        for scan in scan_list:
            pair_file = os.path.join(datapath, scan, "pair.txt")
            for ref, srcs in read_pair_file(pair_file):
                if len(srcs) > 0:
                    self.metas.append((scan, ref, srcs))

    def __len__(self):
        return len(self.metas)

    def _read_cam(self, scan, vid):
        path = os.path.join(self.datapath, scan, "cams", f"{vid:0>8}_cam.txt")
        if not os.path.exists(path):
            path = os.path.join(self.datapath, scan, "cams_1", f"{vid:0>8}_cam.txt")
        K, E, dmin, raw_int, extra = read_cam_file(path, 1.0)
        if self.dataset_name == "eth3d":
            # eth3d cams: the 2nd field on the range line is depth_MAX, not
            # an interval (reference general_eval.py:104-106)
            dint = (raw_int - dmin) / self.ndepths
        elif "depth_num" in extra and extra["depth_num"] > 0:
            # cams carrying an explicit hypothesis count: rescale that range
            # to THIS eval's ndepths (reference general_eval.py:99-102)
            dmax = dmin + extra["depth_num"] * raw_int
            dint = (dmax - dmin) / self.ndepths
        else:
            dint = raw_int
        # interval_scale applies after range resolution (general_eval.py:108)
        dint *= self.interval_scale[scan]
        return K, E, dmin, dint

    def _scale_to_max(self, img, K):
        """Resize toward (max_h, max_w). The reference's scale_mvs_input
        (general_eval.py:120-131, called unconditionally at :188) stretches
        every image to EXACTLY max_h x max_w — that is fix_res here. The
        default path keeps aspect (scale = min of the two ratios, up OR
        down, matching the reference's resize-to-max intent) and rounds to
        /64 so the cascade's stride-8 U-Nets divide evenly."""
        import cv2

        h, w = img.shape[:2]
        if self.fix_res:
            new_h, new_w = self.max_h, self.max_w
        else:
            scale = min(self.max_h / h, self.max_w / w)
            new_h = int(h * scale) // 64 * 64
            new_w = int(w * scale) // 64 * 64
        sx, sy = new_w / w, new_h / h
        img = cv2.resize(img, (new_w, new_h), interpolation=cv2.INTER_LINEAR)
        K = K.copy()
        K[0] *= sx
        K[1] *= sy
        return img, K

    def __getitem__(self, idx):
        scan, ref_view, src_views = self.metas[idx]
        view_ids = [ref_view] + src_views[: self.nviews - 1]

        imgs, cams = [], []
        depth_values = None
        gt_depth = None
        for i, vid in enumerate(view_ids):
            img_path = os.path.join(self.datapath, scan, "images", f"{vid:0>8}.jpg")
            if not os.path.exists(img_path):
                img_path = os.path.join(self.datapath, scan, "images_post", f"{vid:0>8}.jpg")
            img = read_image(img_path)
            K, E, dmin, dint = self._read_cam(scan, vid)

            if self.dataset_name == "tt":
                # T&T: pad 4 rows top+bottom (1080 -> 1088) and shift cy
                # (reference general_eval.py:88-90,115-117)
                img = np.pad(img, ((4, 4), (0, 0), (0, 0)), mode="edge")
                K = K.copy()
                K[1, 2] += 4.0

            img, K = self._scale_to_max(img, K)
            if i == 0:
                # keep the unnormalized ref image: the eval CLI writes it to
                # images/ like the reference (test.py:287-295) so fusion and
                # downstream MVSNet tooling find the standard output layout
                ref_img = (np.clip(img, 0, 1) * 255).astype(np.uint8)
            imgs.append(normalize_imagenet(img))
            cams.append(stage_cameras(K, E))

            if i == 0:
                depth_values = np.arange(
                    dmin, dint * self.ndepths + dmin, dint, dtype=np.float32
                )[: self.ndepths]
                if self.gt_depth_path is not None:
                    gt_file = os.path.join(
                        self.gt_depth_path, scan, f"depth_map_{vid:0>4}.pfm")
                    if os.path.exists(gt_file):
                        gt_depth = read_pfm(gt_file)[0].astype(np.float32)

        sample = {
            "imgs": np.stack(imgs).astype(np.float32),
            "cams": {k: np.stack([c[k] for c in cams]) for k in cams[0]},
            "depth_values": depth_values,
            "filename": f"{scan}/{{}}/{view_ids[0]:0>8}{{}}",
            "scan": scan,
            "ref_view": ref_view,
            "ref_img": ref_img,
        }
        if gt_depth is not None:
            sample["gt_depth"] = gt_depth
        return sample
