#!/usr/bin/env python
"""DINOv2 dense matcher — the RoMa-class matcher slot for nerf2mvsnet.

The reference vendors the 4.8k-LoC RoMa package solely so nerf2mvsnet.py can
match low-texture image pairs (reference nerf2mvsnet.py:4,43; RoMa's own
coarse backbone IS frozen DINOv2 — roma/models/model_zoo/__init__.py). This
module provides the same capability class natively: coarse dense matching on
frozen DINOv2-B patch tokens (the very backbone this framework already ships
with converted weights, models/dino.py + tools/convert_dinov2.py) with
mutual-nearest-neighbour selection, a best/second-best ratio test, and
soft-argmax sub-patch refinement. Semi-dense (one candidate per 14 px patch,
refined to sub-patch precision) — not RoMa's GP decoder + ConvRefiner, but
the same frozen-foundation-feature matching principle, which is what makes
RoMa robust where ORB dies (texture-poor indoor NeRF captures).

nerf2mvsnet only consumes matches to triangulate a sparse prior for per-view
depth RANGES (1 %/99 % percentiles) and view-selection scores, so patch-level
accuracy (~3-4 px at working resolution after refinement) is ample.

Usage:
    match_fn = make_dino_matcher("dinov2_vitb14_flax.npz")
    pts_a, pts_b = match_fn(imgA_uint8_rgb, imgB_uint8_rgb)
"""
from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# ImageNet normalization — DINOv2's expected input distribution
_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
_STD = np.array([0.229, 0.224, 0.225], np.float32)


def _work_shape(h: int, w: int, long_side: int, patch: int = 14):
    """Resize target: longest side ~long_side, both sides multiples of 14."""
    s = long_side / max(h, w)
    wh = max(patch, int(round(h * s / patch)) * patch)
    ww = max(patch, int(round(w * s / patch)) * patch)
    return wh, ww


def make_dino_matcher(vit_path=None, long_side: int = 644,
                      sim_thresh: float = 0.1, ratio: float = 1.02,
                      refine_win: int = 3, params=None):
    """Build match_fn(imgA, imgB) -> (ptsA [N,2], ptsB [N,2]) in pixel units.

    Args:
      vit_path: converted DINOv2-B weights (.npz from tools/convert_dinov2.py)
        or the original torch .pth.
      long_side: working resolution of the longest image side.
      sim_thresh: minimum cosine similarity for a match.
      ratio: best/second-best similarity ratio gate (1.0 disables).
      refine_win: half-window (patches) for soft-argmax sub-patch refinement.
      params: pre-built flax param tree (tests); overrides vit_path.
    """
    import jax
    import jax.numpy as jnp

    from mvsformerplusplus_tpu.models.dino import DinoVisionTransformer

    if params is None:
        from tools.convert_dinov2 import load_vit_tree

        params = load_vit_tree(vit_path)["params"]

    vit = DinoVisionTransformer(dtype=jnp.float32)

    @jax.jit
    def feats_of(img):  # [1, H, W, 3] float -> [h0*w0, C] L2-normalized f32
        tokens = vit.apply({"params": params}, img)[-1][0]
        return tokens / (jnp.linalg.norm(tokens, axis=-1, keepdims=True) + 1e-8)

    def extract(img_u8):
        import cv2

        h, w = img_u8.shape[:2]
        wh, ww = _work_shape(h, w, long_side)
        im = cv2.resize(img_u8, (ww, wh), interpolation=cv2.INTER_AREA)
        im = (im.astype(np.float32) / 255.0 - _MEAN) / _STD
        f = np.asarray(feats_of(im[None]))
        return f, (wh // 14, ww // 14), (w / ww, h / wh)

    def match_fn(img_a, img_b):
        fa, (ha, wa), (sxa, sya) = extract(img_a)
        fb, (hb, wb), (sxb, syb) = extract(img_b)

        sim = fa @ fb.T  # [Na, Nb] cosine similarities
        best_ab = sim.argmax(1)
        best_ba = sim.argmax(0)
        ia = np.arange(len(fa))
        mutual = best_ba[best_ab] == ia

        s_sorted = np.sort(sim, axis=1)
        s1, s2 = s_sorted[:, -1], s_sorted[:, -2]
        keep = mutual & (s1 >= sim_thresh) & (s1 >= ratio * np.maximum(s2, 1e-6))
        ia = ia[keep]
        ib = best_ab[keep]
        if len(ia) == 0:
            return np.zeros((0, 2)), np.zeros((0, 2))

        # soft-argmax refinement of the B-side patch position: expected
        # (x, y) under a softmax over the local similarity window
        by = (ib // wb).astype(np.float64)
        bx = (ib % wb).astype(np.float64)
        ry, rx = np.zeros(len(ib)), np.zeros(len(ib))
        win = range(-refine_win, refine_win + 1)
        offs = [(dy, dx) for dy in win for dx in win]
        local = np.full((len(ib), len(offs)), -np.inf)
        for k, (dy, dx) in enumerate(offs):
            ny, nx = by + dy, bx + dx
            ok = (ny >= 0) & (ny < hb) & (nx >= 0) & (nx < wb)
            idx = (ny.clip(0, hb - 1) * wb + nx.clip(0, wb - 1)).astype(int)
            local[ok, k] = sim[ia[ok], idx[ok]]
        # temperature tuned so a ~0.05 sim edge over the window is decisive
        wgt = np.exp((local - local.max(1, keepdims=True)) / 0.02)
        wgt /= wgt.sum(1, keepdims=True)
        for k, (dy, dx) in enumerate(offs):
            ry += wgt[:, k] * dy
            rx += wgt[:, k] * dx

        ay = (ia // wa) + 0.5
        ax = (ia % wa) + 0.5
        pts_a = np.stack([ax * 14 * sxa, ay * 14 * sya], -1)
        pts_b = np.stack([(bx + rx + 0.5) * 14 * sxb,
                          (by + ry + 0.5) * 14 * syb], -1)
        return pts_a, pts_b

    return match_fn
