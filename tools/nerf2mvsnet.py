#!/usr/bin/env python
"""NeRF-format (transforms.json, poses only) -> MVSNet-format scan.

Same capability as the reference converter (nerf2mvsnet.py): for datasets
with camera poses but no sparse 3D points, match image pairs, triangulate
sparse correspondences, derive per-view depth ranges (1%/99% percentiles)
and view-selection scores, and write cams/ + pair.txt + images/.

Matcher: the reference vendors the 4.8k-LoC RoMa dense matcher solely for
this script (SURVEY.md #34). Here matching is pluggable; the default is
OpenCV ORB + ratio-test + epipolar filtering (dependency-free). Any denser
matcher can be passed as `match_fn(imgA, imgB) -> (ptsA [N,2], ptsB [N,2])`.

Coordinate convention: NeRF/Blender cameras look down -Z with +Y up; OpenCV
looks down +Z with -Y up — columns 1, 2 of the c2w rotation are negated
(reference nerf2mvsnet.py nerf->opencv flip).
"""
from __future__ import annotations

import argparse
import json
import shutil
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def nerf_to_opencv(c2w: np.ndarray) -> np.ndarray:
    """Flip NeRF camera axes to OpenCV convention and return w2c (extrinsic)."""
    c2w = np.asarray(c2w, np.float64).copy()
    c2w[:3, 1] *= -1
    c2w[:3, 2] *= -1
    return np.linalg.inv(c2w)


def orb_match(img_a, img_b, n_features=4000, ratio=0.8):
    """ORB + BF ratio-test matching. imgs: uint8 [H, W, 3] RGB."""
    import cv2

    orb = cv2.ORB_create(nfeatures=n_features)
    ka, da = orb.detectAndCompute(cv2.cvtColor(img_a, cv2.COLOR_RGB2GRAY), None)
    kb, db = orb.detectAndCompute(cv2.cvtColor(img_b, cv2.COLOR_RGB2GRAY), None)
    if da is None or db is None or len(ka) < 8 or len(kb) < 8:
        return np.zeros((0, 2)), np.zeros((0, 2))
    bf = cv2.BFMatcher(cv2.NORM_HAMMING)
    matches = bf.knnMatch(da, db, k=2)
    good = [m for m, n in matches if m.distance < ratio * n.distance]
    pts_a = np.array([ka[m.queryIdx].pt for m in good])
    pts_b = np.array([kb[m.trainIdx].pt for m in good])
    return pts_a, pts_b


def triangulate(pts_a, pts_b, K, ext_a, ext_b):
    """DLT triangulation -> [N, 3] world points + reprojection depth checks."""
    pa = np.asarray(K @ ext_a[:3])
    pb = np.asarray(K @ ext_b[:3])
    n = len(pts_a)
    out = np.zeros((n, 3))
    ok = np.zeros(n, bool)
    for i in range(n):
        a = np.stack([
            pts_a[i, 0] * pa[2] - pa[0],
            pts_a[i, 1] * pa[2] - pa[1],
            pts_b[i, 0] * pb[2] - pb[0],
            pts_b[i, 1] * pb[2] - pb[1],
        ])
        _, _, vt = np.linalg.svd(a)
        X = vt[-1]
        if abs(X[3]) < 1e-12:
            continue
        X = X[:3] / X[3]
        za = (ext_a[:3, :3] @ X + ext_a[:3, 3])[2]
        zb = (ext_b[:3, :3] @ X + ext_b[:3, 3])[2]
        if za > 0 and zb > 0:
            out[i] = X
            ok[i] = True
    return out[ok]


def convert(scene_dir, out_dir=None, max_d=192, interval_scale=1.06,
            theta0=5.0, sigma1=1.0, sigma2=10.0, n_pairs=10,
            pairs_per_view=4, match_fn=orb_match):
    import cv2

    scene = Path(scene_dir)
    out = Path(out_dir) if out_dir else scene
    with open(scene / "transforms.json") as f:
        meta = json.load(f)

    frames = sorted(meta["frames"], key=lambda fr: fr["file_path"])
    n = len(frames)

    def img_path(fr):
        p = scene / fr["file_path"]
        if not p.exists():
            for ext in (".png", ".jpg", ".jpeg"):
                if p.with_suffix(ext).exists():
                    return p.with_suffix(ext)
        return p

    img0 = cv2.cvtColor(cv2.imread(str(img_path(frames[0]))), cv2.COLOR_BGR2RGB)
    h, w = img0.shape[:2]

    # intrinsics: either per-dataset camera_angle_x or explicit fl_x/fl_y
    if "fl_x" in meta:
        fx, fy = meta["fl_x"], meta.get("fl_y", meta["fl_x"])
        cx, cy = meta.get("cx", w / 2), meta.get("cy", h / 2)
    else:
        fx = fy = 0.5 * w / np.tan(0.5 * meta["camera_angle_x"])
        cx, cy = w / 2, h / 2
    K = np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1]])

    exts = [nerf_to_opencv(fr["transform_matrix"]) for fr in frames]
    centers = [(-e[:3, :3].T @ e[:3, 3]) for e in exts]

    # match neighbouring views (by camera distance), triangulate
    dists = np.array([[np.linalg.norm(ci - cj) for cj in centers] for ci in centers])
    np.fill_diagonal(dists, np.inf)
    per_view_points = [[] for _ in range(n)]
    covis = np.zeros((n, n))
    imgs = {}

    def get_img(i):
        if i not in imgs:
            imgs[i] = cv2.cvtColor(cv2.imread(str(img_path(frames[i]))), cv2.COLOR_BGR2RGB)
        return imgs[i]

    for i in range(n):
        for j in np.argsort(dists[i])[:pairs_per_view]:
            j = int(j)
            if j < i and covis[j, i] > 0:
                continue
            pa, pb = match_fn(get_img(i), get_img(j))
            if len(pa) < 8:
                continue
            pts = triangulate(pa, pb, K, exts[i], exts[j])
            if len(pts) == 0:
                continue
            per_view_points[i].append(pts)
            per_view_points[j].append(pts)
            # view-selection score over triangulated points
            a = centers[i] - pts
            b = centers[j] - pts
            cos = np.sum(a * b, axis=1) / (
                np.linalg.norm(a, axis=1) * np.linalg.norm(b, axis=1) + 1e-12)
            theta = np.degrees(np.arccos(np.clip(cos, -1, 1)))
            sigma = np.where(theta <= theta0, sigma1, sigma2)
            s = float(np.sum(np.exp(-((theta - theta0) ** 2) / (2 * sigma**2))))
            covis[i, j] = covis[j, i] = s

    # depth ranges
    from mvsformerplusplus_tpu.data.io import save_cam_file, save_pair_file

    (out / "cams").mkdir(parents=True, exist_ok=True)
    (out / "images").mkdir(parents=True, exist_ok=True)
    all_depths = []
    for i in range(n):
        pts = np.concatenate(per_view_points[i]) if per_view_points[i] else np.zeros((0, 3))
        if len(pts) >= 10:
            z = (exts[i][:3, :3] @ pts.T + exts[i][:3, 3:4])[2]
            z = np.sort(z[z > 0])
            dmin = float(z[int(len(z) * 0.01)])
            dmax = float(z[int(len(z) * 0.99)])
        else:
            dmin = dmax = None  # too few points: take the scene median below
        all_depths.append((dmin, dmax))
    have = [d for d in all_depths if d[0] is not None]
    med_min = float(np.median([d[0] for d in have])) if have else 0.1
    med_max = float(np.median([d[1] for d in have])) if have else 10.0
    for i in range(n):
        dmin, dmax = all_depths[i]
        if (dmin is None or dmax <= dmin
                or dmax / max(dmin, 1e-9) > 1e3):
            dmin, dmax = med_min, med_max
        dint = (dmax - dmin) / (max_d - 1) / interval_scale
        save_cam_file(out / "cams" / f"{i:0>8}_cam.txt", K, exts[i], dmin, dint,
                      max_d, dmax)
        src = img_path(frames[i])
        dst = out / "images" / f"{i:0>8}.jpg"
        if not dst.exists():
            if src.suffix.lower() in (".jpg", ".jpeg"):
                shutil.copyfile(src, dst)
            else:
                cv2.imwrite(str(dst), cv2.imread(str(src)))

    pairs = []
    for i in range(n):
        order = np.argsort(covis[i])[::-1]
        scored = [(int(j), float(covis[i, j])) for j in order[:n_pairs] if covis[i, j] > 0]
        pairs.append((i, scored))
    save_pair_file(out / "pair.txt", pairs)
    return all_depths, covis


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--scene_dir", required=True, help="dir with transforms.json")
    p.add_argument("--out_dir", default=None)
    p.add_argument("--max_d", type=int, default=192)
    p.add_argument("--interval_scale", type=float, default=1.06)
    p.add_argument("--matcher", default="orb", choices=["orb", "dino"],
                   help="'dino': RoMa-class dense matching on frozen DINOv2-B "
                        "patch tokens (tools/dino_match.py) — use for "
                        "low-texture scenes where ORB starves; needs "
                        "--vit_path")
    p.add_argument("--vit_path", default=None,
                   help="converted DINOv2 weights (.npz) for --matcher dino")
    args = p.parse_args()
    match_fn = orb_match
    if args.matcher == "dino":
        if not args.vit_path:
            p.error("--matcher dino requires --vit_path")
        from tools.dino_match import make_dino_matcher

        match_fn = make_dino_matcher(args.vit_path)
    convert(args.scene_dir, args.out_dir, args.max_d, args.interval_scale,
            match_fn=match_fn)


if __name__ == "__main__":
    main()
