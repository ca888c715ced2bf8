"""Synthetic DTU-format scene generators (testing / input-pipeline benching).

Two families:

- `make_synthetic_dtu`: RANDOM images/depths in the exact on-disk layout the
  DTU training dataset reads (reference datasets/dtu_dataset.py wire
  formats). Exercises plumbing only; used by the train-CLI e2e test and
  tools/bench_input_pipeline.py.

- `GeometricScene` + `make_geometric_dtu` / `make_geometric_eval_scan`: an
  ANALYTIC multi-view scene — textured planar quads rendered by exact
  ray-quad intersection, so every view is photometrically consistent with
  every other and the per-pixel GT depth is closed-form. This is the
  end-to-end accuracy oracle the reference verifies empirically on real DTU
  scans (reference test.py:297-319, README.md:91-96): a composition bug
  anywhere in the pipeline (intrinsics scaling, y-flip, half-pixel offsets,
  bucket plumbing) destroys cross-view photoconsistency at the GT depth and
  shows up in the end metric. Used by tests/test_e2e_protocol.py and
  tools/e2e_protocol.py.
"""
from __future__ import annotations

from pathlib import Path

import numpy as np


def make_synthetic_dtu(root: Path, n_scans: int = 1, n_views: int = 5,
                       n_lights: int = 2, h: int = 256, w: int = 320,
                       seed: int = 0):
    """Mimic the DTU training layout: Cameras/pair.txt + per-view cam files,
    Rectified_raw images, Depths_raw GT. Returns the scan list."""
    from PIL import Image

    from .io import save_cam_file, save_pair_file, save_pfm

    root = Path(root)
    rng = np.random.RandomState(seed)
    (root / "Cameras").mkdir(parents=True)
    pairs = []
    for v in range(n_views):
        ang = 0.01 * v
        c, s = np.cos(ang), np.sin(ang)
        ext = np.eye(4, dtype=np.float32)
        ext[:3, :3] = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32)
        ext[0, 3] = 0.02 * v
        intr = np.array([[400.0, 0, w / 2], [0, 400.0, h / 2], [0, 0, 1]],
                        np.float32)
        save_cam_file(root / "Cameras" / f"{v:0>8}_cam.txt", intr, ext,
                      2.5, 0.05)
        pairs.append((v, [(s_, 10.0) for s_ in range(n_views) if s_ != v]))
    save_pair_file(root / "Cameras" / "pair.txt", pairs)

    scans = [f"scan{i + 1}" for i in range(n_scans)]
    for scan in scans:
        (root / "Rectified_raw" / scan).mkdir(parents=True)
        (root / "Depths_raw" / scan).mkdir(parents=True)
        for v in range(n_views):
            for light in range(n_lights):
                img = (rng.rand(h, w, 3) * 255).astype(np.uint8)
                Image.fromarray(img).save(
                    root / "Rectified_raw" / scan
                    / f"rect_{v + 1:0>3}_{light}_r5000.png")
            depth = rng.uniform(3.0, 7.0, (h, w)).astype(np.float32)
            save_pfm(root / "Depths_raw" / scan / f"depth_map_{v:0>4}.pfm",
                     depth)
            mask = (rng.rand(h, w) > 0.2).astype(np.uint8) * 255
            Image.fromarray(mask).save(
                root / "Depths_raw" / scan / f"depth_visual_{v:0>4}.png")
    (root / "train.txt").write_text("\n".join(scans) + "\n")
    return scans


# ---------------------------------------------------------------------------
# Analytic geometric scene (the end-to-end accuracy oracle)
# ---------------------------------------------------------------------------


def _smooth_noise(rng, res: int, octaves: int = 3) -> np.ndarray:
    """Band-limited random texture in [0, 1]: sums of bilinearly-upsampled
    noise octaves. Pure white noise would alias between views sampled at
    different rates; band-limiting keeps cross-view photoconsistency real."""
    tex = np.zeros((res, res), np.float32)
    for o in range(octaves):
        n = max(2, res >> (octaves - 1 - o + 2))
        coarse = rng.rand(n, n).astype(np.float32)
        yy = np.linspace(0, n - 1, res, dtype=np.float32)
        xx = np.linspace(0, n - 1, res, dtype=np.float32)
        y0 = np.clip(yy.astype(np.int64), 0, n - 2)
        x0 = np.clip(xx.astype(np.int64), 0, n - 2)
        fy = (yy - y0)[:, None]
        fx = (xx - x0)[None, :]
        up = (coarse[y0][:, x0] * (1 - fy) * (1 - fx)
              + coarse[y0 + 1][:, x0] * fy * (1 - fx)
              + coarse[y0][:, x0 + 1] * (1 - fy) * fx
              + coarse[y0 + 1][:, x0 + 1] * fy * fx)
        tex += up / (o + 1)
    tex -= tex.min()
    tex /= max(tex.max(), 1e-8)
    return tex


class GeometricScene:
    """A union of textured planar quads in world space (mm, DTU-like).

    Each quad is (P0, e1, e2, texture[res, res, 3]): points X = P0 + s*e1 +
    t*e2 for s, t in [0, 1]. Rays are cast as X = C + tau * R^T K^-1 [u,v,1],
    so the ray parameter tau IS the camera-frame depth (z_cam) — the depth
    convention of the plane-sweep warp (ops/geometry.py)."""

    def __init__(self, seed: int = 0, tex_res: int = 1024):
        rng = np.random.RandomState(seed)
        self.quads = []

        def add_quad(p0, e1, e2):
            tex = np.stack([_smooth_noise(rng, tex_res) for _ in range(3)], -1)
            self.quads.append((np.asarray(p0, np.float32),
                               np.asarray(e1, np.float32),
                               np.asarray(e2, np.float32),
                               tex))

        # background: a big plane ~850mm out, slightly tilted, wide enough
        # to cover every ray of every view
        add_quad([-900, -700, 820], [1800, 0, 120], [0, 1400, -60])
        # mid-ground slabs at staggered depths / tilts (depth discontinuities)
        add_quad([-350, -260, 620], [380, 0, 60], [0, 320, -40])
        add_quad([40, -60, 560], [300, 30, -50], [-30, 280, 35])
        add_quad([-260, 60, 680], [240, -20, 45], [25, 230, -30])
        # near slab (tests the fine stages' small hypothesis bands)
        add_quad([-80, -200, 505], [200, 15, 25], [-10, 170, 18])

    def render(self, K: np.ndarray, E: np.ndarray, h: int, w: int):
        """Render one view: (image float32 [h, w, 3] in [0, 1],
        depth float32 [h, w] = camera-frame z of the nearest hit).

        K: 3x3 intrinsics at (h, w); E: 4x4 world->cam extrinsic.
        Pixel (0, 0) is the CENTER of the top-left pixel (align_corners
        convention of ops/geometry.py pixel_grid)."""
        R = E[:3, :3].astype(np.float64)
        t = E[:3, 3].astype(np.float64)
        C = -R.T @ t  # camera center in world
        u, v = np.meshgrid(np.arange(w, dtype=np.float64),
                           np.arange(h, dtype=np.float64), indexing="xy")
        pix = np.stack([u, v, np.ones_like(u)], 0).reshape(3, -1)
        dirs = R.T @ (np.linalg.inv(K.astype(np.float64)) @ pix)  # [3, N]

        best_tau = np.full(h * w, np.inf)
        img = np.zeros((h * w, 3), np.float32)
        for p0, e1, e2, tex in self.quads:
            n = np.cross(e1.astype(np.float64), e2.astype(np.float64))
            denom = n @ dirs  # [N]
            with np.errstate(divide="ignore", invalid="ignore"):
                tau = (n @ (p0.astype(np.float64) - C)) / denom
            hit = C[:, None] + tau[None] * dirs  # [3, N]
            rel = hit - p0.astype(np.float64)[:, None]
            # solve [e1 e2] [s t]^T = rel (least squares via 2x2 gram)
            g11 = e1 @ e1
            g12 = e1 @ e2
            g22 = e2 @ e2
            b1 = e1 @ rel
            b2 = e2 @ rel
            det = g11 * g22 - g12 * g12
            s = (g22 * b1 - g12 * b2) / det
            tt = (g11 * b2 - g12 * b1) / det
            valid = (np.isfinite(tau) & (tau > 1e-6)
                     & (s >= 0) & (s <= 1) & (tt >= 0) & (tt <= 1)
                     & (tau < best_tau))
            if not valid.any():
                continue
            res = tex.shape[0]
            sv = np.clip(s[valid] * (res - 1), 0, res - 1 - 1e-6)
            tv = np.clip(tt[valid] * (res - 1), 0, res - 1 - 1e-6)
            s0 = sv.astype(np.int64)
            t0 = tv.astype(np.int64)
            fs = (sv - s0).astype(np.float32)[:, None]
            ft = (tv - t0).astype(np.float32)[:, None]
            col = (tex[t0, s0] * (1 - fs) * (1 - ft)
                   + tex[t0, s0 + 1] * fs * (1 - ft)
                   + tex[t0 + 1, s0] * (1 - fs) * ft
                   + tex[t0 + 1, s0 + 1] * fs * ft)
            img[valid] = col
            best_tau[valid] = tau[valid]
        depth = np.where(np.isfinite(best_tau), best_tau, 0.0)
        return (img.reshape(h, w, 3).astype(np.float32),
                depth.reshape(h, w).astype(np.float32))

    def point_to_surface_distance(self, pts: np.ndarray,
                                  samples_per_quad: int = 200_000) -> np.ndarray:
        """Distance from each point [N, 3] to the union of quads (cloud
        ACCURACY metric). Exact plane distance clamped to the quad bounds."""
        best = np.full(len(pts), np.inf)
        for p0, e1, e2, _ in self.quads:
            n = np.cross(e1, e2)
            n = n / np.linalg.norm(n)
            rel = pts - p0[None]
            g11, g12, g22 = e1 @ e1, e1 @ e2, e2 @ e2
            b1 = rel @ e1
            b2 = rel @ e2
            det = g11 * g22 - g12 * g12
            s = np.clip((g22 * b1 - g12 * b2) / det, 0, 1)
            t = np.clip((g11 * b2 - g12 * b1) / det, 0, 1)
            closest = p0[None] + s[:, None] * e1[None] + t[:, None] * e2[None]
            best = np.minimum(best, np.linalg.norm(pts - closest, axis=1))
        return best


def lookat_extrinsic(cam_pos, target, up=(0.0, -1.0, 0.0)) -> np.ndarray:
    """World->cam 4x4 with +z toward `target` (OpenCV convention: x right,
    y down — hence default up = -Y world)."""
    cam_pos = np.asarray(cam_pos, np.float64)
    z = np.asarray(target, np.float64) - cam_pos
    z = z / np.linalg.norm(z)
    x = np.cross(np.asarray(up, np.float64), z)
    x = x / np.linalg.norm(x)
    y = np.cross(z, x)
    R = np.stack([x, y, z], 0)
    E = np.eye(4, dtype=np.float32)
    E[:3, :3] = R.astype(np.float32)
    E[:3, 3] = (-R @ cam_pos).astype(np.float32)
    return E


def geometric_cameras(n_views: int, h: int, w: int, baseline: float = 55.0):
    """DTU-like convergent rig: cameras on an arc around x/y, all looking at
    the scene center. Returns [(K 3x3, E 4x4), ...] at resolution (h, w)."""
    f = 2892.33 * (w / 1600.0)  # DTU focal scaled to this width
    K = np.array([[f, 0, w / 2.0], [0, f, h / 2.0], [0, 0, 1]], np.float32)
    target = np.array([0.0, 0.0, 650.0])
    cams = []
    for i in range(n_views):
        # ref view dead-center, sources staggered around it
        dx = baseline * ((i + 1) // 2) * (1 if i % 2 else -1)
        dy = 0.35 * baseline * ((i % 3) - 1)
        cams.append((K.copy(), lookat_extrinsic([dx, dy, 0.0], target)))
    return cams


def tnt_cameras(n_views: int, h: int, w: int, arc_deg: float = 80.0,
                height_deg: float = 45.0, roll_deg: float = 10.0,
                radius: float = 650.0):
    """Tanks&Temples-like rig: many wide-baseline views on an orbit segment
    around the scene, varied heights, slight per-view roll (hand-held
    class). The reference evaluates T&T with 20 source views at 1088x1920
    (scripts/test_tt_inter.sh:3-54); this rig reproduces the geometry
    CLASS — yaw spans of tens of degrees between ref and far sources, the
    regime that stresses shared warp-window plans hardest."""
    f = 1160.0 * (w / 1920.0)  # short-focal (wide FOV) T&T class
    K = np.array([[f, 0, w / 2.0], [0, f, h / 2.0], [0, 0, 1]], np.float32)
    target = np.array([0.0, 0.0, 650.0])
    cams = []
    for i in range(n_views):
        # ref dead-center; sources staggered outward on the arc
        t = ((i + 1) // 2) * (1 if i % 2 else -1) / max(1, (n_views - 1) // 2)
        yaw = np.deg2rad(arc_deg / 2.0 * t)
        pitch = np.deg2rad(height_deg / 2.0 * np.sin(3.1 * t))
        pos = target + radius * np.array([
            np.sin(yaw) * np.cos(pitch),
            np.sin(pitch),
            -np.cos(yaw) * np.cos(pitch),
        ])
        roll = np.deg2rad(roll_deg) * np.sin(7.3 * t)
        up = np.array([np.sin(roll), -np.cos(roll), 0.0])
        cams.append((K.copy(), lookat_extrinsic(pos, target, up=up)))
    return cams


def _depth_range(depths, ndepth: int):
    """(depth_min, interval) covering the rendered GT with margin."""
    valid = depths[depths > 0]
    lo = float(valid.min()) * 0.94
    hi = float(valid.max()) * 1.04
    return lo, (hi - lo) / ndepth


def make_geometric_eval_scan(root: Path, scan: str = "scan1", n_views: int = 5,
                             h: int = 1152, w: int = 1536, ndepth: int = 192,
                             seed: int = 0, scene: "GeometricScene" = None,
                             cameras=None):
    """MVSNet eval layout (scan/images, scan/cams, scan/pair.txt) + GT depth
    PFMs under root/gt_depths/<scan>/ for test.py --gt_depth_path. Returns
    the scene (for cloud-accuracy checks). `cameras` overrides the default
    DTU-like rig with an explicit [(K, E), ...] list (e.g. tnt_cameras)."""
    from PIL import Image

    from .io import save_cam_file, save_pair_file, save_pfm

    scene = scene or GeometricScene(seed)
    root = Path(root)
    sd = root / scan
    (sd / "images").mkdir(parents=True, exist_ok=True)
    (sd / "cams").mkdir(parents=True, exist_ok=True)
    gt_dir = root / "gt_depths" / scan
    gt_dir.mkdir(parents=True, exist_ok=True)

    cams = cameras if cameras is not None else geometric_cameras(n_views, h, w)
    depths = []
    for vid, (K, E) in enumerate(cams):
        img, depth = scene.render(K, E, h, w)
        Image.fromarray((img * 255).astype(np.uint8)).save(
            sd / "images" / f"{vid:0>8}.jpg", quality=97)
        save_pfm(gt_dir / f"depth_map_{vid:0>4}.pfm", depth)
        depths.append(depth)
    dmin, dint = _depth_range(np.stack(depths), ndepth)
    for vid, (K, E) in enumerate(cams):
        save_cam_file(sd / "cams" / f"{vid:0>8}_cam.txt", K, E, dmin, dint)
    pairs = [(r, [(s, 100.0) for s in range(n_views) if s != r])
             for r in range(n_views)]
    save_pair_file(sd / "pair.txt", pairs)
    return scene


def make_geometric_dtu(root: Path, n_views: int = 5, n_lights: int = 7,
                       h: int = 512, w: int = 640, ndepth: int = 192,
                       seed: int = 0, scene: "GeometricScene" = None):
    """DTU TRAIN layout (Cameras/, Rectified_raw/, Depths_raw/) rendered from
    the analytic scene — same wire format as make_synthetic_dtu but
    geometrically consistent, so a short training run actually converges.
    All lights are identical renders (the oracle tests geometry, not
    photometric augmentation)."""
    from PIL import Image

    from .io import save_cam_file, save_pair_file, save_pfm

    scene = scene or GeometricScene(seed)
    root = Path(root)
    (root / "Cameras").mkdir(parents=True, exist_ok=True)
    cams = geometric_cameras(n_views, h, w)

    scan = "scan1"
    (root / "Rectified_raw" / scan).mkdir(parents=True, exist_ok=True)
    (root / "Depths_raw" / scan).mkdir(parents=True, exist_ok=True)
    renders = [scene.render(K, E, h, w) for K, E in cams]
    dmin, dint = _depth_range(np.stack([d for _, d in renders]), ndepth)

    pairs = []
    for vid, (K, E) in enumerate(cams):
        img, depth = renders[vid]
        img8 = (img * 255).astype(np.uint8)
        for light in range(n_lights):
            Image.fromarray(img8).save(
                root / "Rectified_raw" / scan
                / f"rect_{vid + 1:0>3}_{light}_r5000.png")
        save_pfm(root / "Depths_raw" / scan / f"depth_map_{vid:0>4}.pfm",
                 depth)
        mask = ((depth > 0) * 255).astype(np.uint8)
        Image.fromarray(mask).save(
            root / "Depths_raw" / scan / f"depth_visual_{vid:0>4}.png")
        save_cam_file(root / "Cameras" / f"{vid:0>8}_cam.txt", K, E,
                      dmin, dint)
        pairs.append((vid, [(s, 100.0) for s in range(n_views) if s != vid]))
    save_pair_file(root / "Cameras" / "pair.txt", pairs)
    (root / "train.txt").write_text(f"{scan}\n")
    return scene
