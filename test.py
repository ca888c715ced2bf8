#!/usr/bin/env python
"""Evaluation CLI — depth inference + geometric fusion to point clouds.

Mirrors the reference's `python test.py --dataset dtu --testpath ... `
surface (reference test.py:25-98, 536-570) on the TPU stack:
1. save_depth: run the model per reference view, write PFM depth, uint8
   confidence, cams, jpg (reference test.py:184-295);
2. filter: 'dpcd' (dynamic) or 'pcd' geometric-consistency fusion on TPU
   (replacing the CUDA fusibile 'gipuma' path) -> one .ply per scan.
Scans are strided across processes via --rank/--world (≡ the reference's
manual per-GPU shell sharding, scripts/test_tt_inter.sh).
"""
import argparse
import json
import logging
import os
import sys
import time
from pathlib import Path

import numpy as np


def save_depths(args, cfg):
    import jax
    import jax.numpy as jnp

    from mvsformerplusplus_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    from mvsformerplusplus_tpu.config import build_model
    from mvsformerplusplus_tpu.data.eval_dataset import EvalDataset
    from mvsformerplusplus_tpu.data.io import save_cam_file, save_pfm
    from mvsformerplusplus_tpu.data.loader import EvalLoader
    from mvsformerplusplus_tpu.train.checkpoints import CheckpointManager
    from mvsformerplusplus_tpu.train.step import TrainState
    from mvsformerplusplus_tpu.train.optim import make_optimizer

    with open(args.testlist) as f:
        all_scans = [l.strip() for l in f if l.strip()]

    if args.schedule == "queue":
        # dynamic work stealing over the shared output FS: balanced under
        # skewed per-scene work (parallel/scheduler.py), replacing the
        # reference's hand-sharded per-scene runs (scripts/test_tt_inter.sh)
        from mvsformerplusplus_tpu.parallel.scheduler import WorkQueue

        queue = WorkQueue(args.outdir, all_scans,
                          reclaim_stale_s=args.reclaim_stale or None)
        scan_iter = iter(queue)
    else:
        queue = None
        scan_iter = iter(all_scans[args.rank::args.world])

    def loaders():
        for scan in scan_iter:
            ds = EvalDataset(
                args.testpath, [scan], nviews=args.num_view,
                ndepths=args.numdepth,
                interval_scale={scan: args.interval_scale},
                max_h=args.max_h, max_w=args.max_w,
                dataset_name=args.dataset, gt_depth_path=args.gt_depth_path,
            )
            yield scan, EvalLoader(ds, num_workers=2)

    model = build_model(cfg, dtype=jnp.bfloat16)
    tmp = tuple(args.tmp)

    def make_fwd(m):
        def _forward(v, i, c, d):
            out = m.apply(v, i, c, d, tmp=tmp, train=False)
            if args.conf_choose == "stage4":
                conf = out["stage4"]["photometric_confidence"]
            else:
                conf = out["photometric_confidence"]
            return out["refined_depth"], conf

        return jax.jit(_forward)

    fwd = make_fwd(model)

    def enforce_windows(m, sample):
        """Pre-flight window check on this scan's actual cams: the banded
        warp's shared-window plans were validated on DTU geometry only —
        a new dataset's cams can make in-FOV samples escape the windows
        and silently blend to zero (the reference warp is unconditionally
        exact, models/warping.py:69-109). Offending stages fall back to
        warp_mode='folded' (exact gather) with a logged warning."""
        from mvsformerplusplus_tpu.ops.window_check import (
            fallback_warp_modes, scan_window_report)

        h, w = sample["imgs"].shape[-3:-1]
        cams_b = {k: np.asarray(v)[None] for k, v in sample["cams"].items()}
        reports = scan_window_report(
            m, cams_b, np.asarray(sample["depth_values"])[None], h, w,
            prev_depth_quantiles=(0.25, 0.75), row_group_stride=4,
            max_views=4)
        for r in reports:
            logging.info("window check %s", r)
        modes, banded_bwd, changed = fallback_warp_modes(m, reports)
        if not changed:
            return m, None
        logging.warning(
            "warp windows ESCAPE on this scan's geometry; falling back "
            "offending stages to exact warp: warp_mode=%s "
            "(tools/validate_warp_windows.py diagnoses; raise banded_ky "
            "or set model.args.warp_mode to silence)", modes)
        m2 = build_model(cfg, dtype=jnp.bfloat16, warp_mode=tuple(modes),
                         banded_bwd=banded_bwd)
        return m2, make_fwd(m2)

    variables = None
    times = []
    metric_sums = []
    done_scans = []
    pending = None

    def writeback(depth_dev, conf_dev, sample):
        """Host-side output path for one finished view (runs under the NEXT
        view's device compute — see the one-deep pipeline below)."""
        depth = np.asarray(depth_dev[0], np.float32)
        conf = np.asarray(conf_dev[0], np.float32)
        dv = np.asarray(sample["depth_values"])

        scan = sample["scan"]
        ref = sample["ref_view"]
        out_dir = Path(args.outdir) / scan
        for sub in ("depth_est", "confidence", "cams", "images"):
            (out_dir / sub).mkdir(parents=True, exist_ok=True)
        save_pfm(out_dir / "depth_est" / f"{ref:0>8}.pfm", depth)
        np.save(out_dir / "confidence" / f"{ref:0>8}.npy",
                (np.clip(conf, 0, 1) * 255).astype(np.uint8))
        cam = np.asarray(sample["cams"]["stage4"][0])  # full-res K, E
        save_cam_file(out_dir / "cams" / f"{ref:0>8}_cam.txt",
                      cam[1, :3, :3], cam[0],
                      float(dv[0]), float(dv[1] - dv[0]))
        if "ref_img" in sample:
            # standard MVSNet output layout: ref jpg next to depth/conf
            # (reference test.py:287-295); fusion colors read from here
            import cv2

            cv2.imwrite(str(out_dir / "images" / f"{ref:0>8}.jpg"),
                        sample["ref_img"][..., ::-1])
        if "gt_depth" in sample:
            import cv2

            from mvsformerplusplus_tpu.train.metrics import depth_metrics

            gt = sample["gt_depth"]
            if gt.shape != depth.shape:
                gt = cv2.resize(gt, (depth.shape[1], depth.shape[0]),
                                interpolation=cv2.INTER_NEAREST)
            m = depth_metrics(depth[None], gt[None], (gt > 0)[None])
            metric_sums.append({k: float(v) for k, v in m.items()})
        logging.info("%s view %d done (%.2fs)", scan, ref, times[-1])
        if queue is not None:
            # liveness stamp: lets --reclaim_stale sit near the per-VIEW
            # latency instead of the whole scene's runtime
            queue.heartbeat(scan)

    for cur_scan, loader in loaders():
      scan_checked = False
      for sample in loader:
        if not scan_checked:
            scan_checked = True
            if args.window_check != "off":
                model2, fwd2 = enforce_windows(model, sample)
                if fwd2 is not None:
                    model, fwd = model2, fwd2
        imgs = jnp.asarray(sample["imgs"])[None]
        cams = jax.tree.map(lambda x: jnp.asarray(x)[None], sample["cams"])
        dv = jnp.asarray(sample["depth_values"])[None]
        if variables is None:
            if args.ckpt_npz:
                # converted reference checkpoint (tools/convert_reference.py)
                # ≡ reference test.py:209-220 strict load minus pe_dict
                sys.path.insert(0, str(Path(__file__).resolve().parent))
                from tools.convert_reference import load_npz_variables

                variables = jax.jit(lambda r: model.init(
                    r, imgs, cams, dv, train=False))(jax.random.PRNGKey(0))
                variables = load_npz_variables(
                    jax.device_get(variables), args.ckpt_npz)
                variables = jax.device_put(variables)
                logging.info("loaded converted reference weights from %s",
                             args.ckpt_npz)
            elif args.ckpt:
                init_vars = jax.eval_shape(
                    lambda r: model.init(r, imgs, cams, dv, train=False),
                    jax.random.PRNGKey(0))
                mgr = CheckpointManager(args.ckpt)
                # the opt-state TEMPLATE must structurally match what
                # training used: freeze_vit picks set_to_zero vs adamw for
                # the vit group, grad_norm adds a clip link to the chain
                tx = make_optimizer(
                    freeze_vit=cfg.get_path("arch.args.freeze_vit", True),
                    grad_clip=cfg.get_path("trainer.grad_norm"))
                template = TrainState(
                    params=init_vars["params"],
                    batch_stats=init_vars.get("batch_stats", {}),
                    opt_state=jax.eval_shape(lambda: tx.init(
                        jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype),
                                     init_vars["params"]))),
                    step=jnp.zeros((), jnp.int32))
                state, _ = mgr.restore(template, epoch=mgr.best_epoch())
                variables = {"params": state.params, "batch_stats": state.batch_stats}
            else:
                logging.warning("no --ckpt given: using RANDOM weights (smoke mode)")
                variables = jax.jit(lambda r: model.init(
                    r, imgs, cams, dv, train=False))(jax.random.PRNGKey(0))
                vit_path = cfg.get_path("arch.args.vit_path")
                if vit_path and Path(vit_path).exists():
                    # at least load the pretrained frozen ViT (reference
                    # DINOv2_mvsformer_model.py:46-51)
                    sys.path.insert(0, str(Path(__file__).resolve().parent))
                    from tools.convert_dinov2 import (load_vit_tree,
                                                      merge_vit_params)

                    variables = jax.device_put(merge_vit_params(
                        jax.device_get(variables), load_vit_tree(vit_path)))
                    logging.info("loaded pretrained ViT from %s", vit_path)

        t0 = time.time()
        depth_dev, conf_dev = fwd(variables, imgs, cams, dv)
        # one-deep output pipeline: write back the PREVIOUS view while the
        # device computes this one (jax dispatch is async; the blocking
        # np.asarray + PFM/jpg/metric host work runs under the current
        # view's compute instead of serializing with it)
        if pending is not None:
            writeback(*pending)
        pending = (depth_dev, conf_dev, sample)
        times.append(time.time() - t0)
      # flush the scan's last view BEFORE marking it done (work-stealing
      # peers must only see .done after every output file landed)
      if pending is not None:
          writeback(*pending)
          pending = None
      done_scans.append(cur_scan)
      if queue is not None:
          queue.mark_done(cur_scan)
    if times:
        logging.info("average time: %.3fs over %d views",
                     float(np.mean(times[1:] or times)), len(times))
    if metric_sums:
        avg = {k: float(np.mean([m[k] for m in metric_sums])) for k in metric_sums[0]}
        # multi-worker runs write per-worker files (a shared-name overwrite
        # would report whichever worker finished last as the full result);
        # each carries its view count so the files merge by weighted mean
        if args.world > 1:
            name = f"depth_metric.rank{args.rank}.txt"
        elif args.schedule == "queue":
            name = f"depth_metric.pid{os.getpid()}.txt"
        else:
            name = "depth_metric.txt"
        out_path = Path(args.outdir) / name
        with open(out_path, "w") as f:
            f.write(f"n_views: {len(metric_sums)}\n")
            for k, v in sorted(avg.items()):
                f.write(f"{k}: {v:.6f}\n")
        logging.info("depth metrics -> %s: %s", out_path,
                     {k: round(v, 4) for k, v in avg.items()})
        if name != "depth_metric.txt":
            _merge_depth_metrics(Path(args.outdir))
    return done_scans


def _merge_depth_metrics(outdir: Path):
    """Weighted-mean merge of the per-worker depth_metric.*.txt files into
    depth_metric.txt. Every finishing worker re-merges whatever partials
    exist, so the last one to finish leaves the complete result."""
    parts = sorted(outdir.glob("depth_metric.*.txt"))
    sums: dict = {}
    n_total = 0
    for p in parts:
        kv = dict(line.split(": ") for line in
                  p.read_text().strip().splitlines())
        n = int(float(kv.pop("n_views", 1)))
        n_total += n
        for k, v in kv.items():
            sums[k] = sums.get(k, 0.0) + float(v) * n
    if not n_total:
        return
    with open(outdir / "depth_metric.txt", "w") as f:
        f.write(f"n_views: {n_total}\n")
        for k in sorted(sums):
            f.write(f"{k}: {sums[k] / n_total:.6f}\n")


def fuse_scan(args, scan):
    import jax
    import jax.numpy as jnp

    from mvsformerplusplus_tpu.data.io import read_cam_file, read_pair_file, read_pfm
    from mvsformerplusplus_tpu.data.io import build_camera_stack
    from mvsformerplusplus_tpu.fusion.fusion import dpcd_fuse, gipuma_fuse, pcd_fuse
    from mvsformerplusplus_tpu.fusion.ply import write_ply

    scan_dir = Path(args.outdir) / scan
    pair = read_pair_file(Path(args.testpath) / scan / "pair.txt")

    import functools

    @functools.lru_cache(maxsize=None)
    def load_view(vid):
        # cached: each view is read once per scan instead of once per pair
        # it appears in (~fusion_view+1 redundant PFM/npy/cam reads)
        depth = read_pfm(scan_dir / "depth_est" / f"{vid:0>8}.pfm")[0].astype(np.float32)
        conf = np.load(scan_dir / "confidence" / f"{vid:0>8}.npy")
        if conf.dtype == np.uint8 or conf.max() > 1.5:
            # dtype test must precede the float cast (uint8 maps with all
            # values in {0, 1} would otherwise skip the /255)
            conf = conf.astype(np.float32) / 255.0
        conf = conf.astype(np.float32)
        K, E, _, _, _ = read_cam_file(scan_dir / "cams" / f"{vid:0>8}_cam.txt")
        return depth, conf, build_camera_stack(K, E)

    all_pts, all_cols = [], []
    # fusibile-style duplicate suppression (gipuma mode): once a pixel has
    # contributed to a fused point — as the ref or as a consistent source —
    # it is consumed and emits no further points
    used: dict = {}
    for ref, srcs in pair:
        srcs = srcs[: args.fusion_view]
        if not srcs:
            continue
        try:
            ref_depth, ref_conf, ref_cam = load_view(ref)
            views = [load_view(s) for s in srcs]
        except FileNotFoundError:
            continue
        src_depths = np.stack([v[0] for v in views])
        src_confs = np.stack([v[1] for v in views])
        src_cams = np.stack([v[2] for v in views])

        if args.filter_method == "gipuma":
            # fusibile-semantics consistency fusion (misc/gipuma.py:184-205
            # protocol: prob filter -> |z_proj - d_src| < disp_threshold
            # count -> averaged supporting points; fusion.gipuma_fuse)
            pts, mask, consistent, src_px = gipuma_fuse(
                jnp.asarray(ref_depth), jnp.asarray(ref_conf),
                jnp.asarray(src_depths), jnp.asarray(src_confs),
                jnp.asarray(ref_cam), jnp.asarray(src_cams),
                prob_threshold=args.prob_threshold,
                disp_threshold=args.disp_threshold,
                num_consistent=args.num_consistent)
            mask = np.array(mask)  # writable copy (device arrays are RO)
            if ref in used:
                mask &= ~used[ref]
            used.setdefault(ref, np.zeros_like(mask))
            used[ref] |= mask
            consistent = np.asarray(consistent)
            src_px = np.asarray(src_px)
            for j, s in enumerate(srcs):
                sel = consistent[j] & mask
                px = src_px[j][sel]
                used.setdefault(s, np.zeros_like(mask))
                used[s][px[:, 1], px[:, 0]] = True
        elif args.filter_method == "dpcd":
            pts, mask = dpcd_fuse(
                jnp.asarray(ref_depth), jnp.asarray(ref_conf),
                jnp.asarray(src_depths), jnp.asarray(ref_cam),
                jnp.asarray(src_cams), conf_thresh=args.conf,
                dist_base=args.dist_base, rel_diff_base=args.rel_diff_base)
        else:
            pts, mask = pcd_fuse(
                jnp.asarray(ref_depth), jnp.asarray(ref_conf),
                jnp.asarray(src_depths), jnp.asarray(src_confs),
                jnp.asarray(ref_cam), jnp.asarray(src_cams),
                conf_thresh=args.conf, img_dist_thresh=args.thres_disp,
                depth_thresh=0.01, vthresh=args.thres_view)
        mask = np.asarray(mask)
        pts = np.asarray(pts)[mask]
        all_pts.append(pts)
        # colors from the saved (resized) ref image; fall back to the
        # original testpath image, then gray
        img_path = scan_dir / "images" / f"{ref:0>8}.jpg"
        if not img_path.exists():
            img_path = Path(args.testpath) / scan / "images" / f"{ref:0>8}.jpg"
        if img_path.exists():
            from mvsformerplusplus_tpu.data.io import read_image
            import cv2
            img = read_image(img_path)
            img = cv2.resize(img, (mask.shape[1], mask.shape[0]))
            all_cols.append((img[mask] * 255).astype(np.uint8))
        else:
            all_cols.append(np.full((len(pts), 3), 128, np.uint8))
        logging.info("%s ref %d: %d pts (%.1f%% kept)", scan, ref, len(pts),
                     100 * mask.mean())

    if all_pts:
        pts = np.concatenate(all_pts)
        cols = np.concatenate(all_cols)
        out = Path(args.outdir) / f"{scan}.ply"
        write_ply(out, pts, cols)
        logging.info("wrote %s (%d points)", out, len(pts))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config", required=True)
    p.add_argument("--dataset", default="dtu", choices=["dtu", "tt", "eth3d", "custom"])
    p.add_argument("--testpath", required=True)
    p.add_argument("--testlist", required=True)
    p.add_argument("--outdir", default="outputs")
    p.add_argument("--ckpt", default=None, help="checkpoint dir (CheckpointManager)")
    p.add_argument("--ckpt_npz", default=None,
                   help="converted reference checkpoint (tools/convert_reference.py)")
    p.add_argument("--num_view", type=int, default=5)
    p.add_argument("--numdepth", type=int, default=192)
    p.add_argument("--max_h", type=int, default=1152)
    p.add_argument("--max_w", type=int, default=1536)
    p.add_argument("--interval_scale", type=float, default=1.06)
    p.add_argument("--tmp", type=float, nargs=4, default=[5.0, 5.0, 5.0, 1.0])
    p.add_argument("--conf_choose", default="mean", choices=["mean", "stage4"],
                   help="confidence source (reference test_tt.py conf_choose)")
    p.add_argument("--filter_method", default="dpcd",
                   choices=["dpcd", "pcd", "gipuma", "none"])
    p.add_argument("--disp_threshold", type=float, default=0.1,
                   help="gipuma mode: reprojection pixel-distance threshold")
    p.add_argument("--num_consistent", type=int, default=2,
                   help="gipuma mode: min consistent source views")
    p.add_argument("--conf", type=float, default=0.5)
    p.add_argument("--prob_threshold", type=float, default=0.5,
                   help="gipuma probability filter (reference test.py:71)")
    p.add_argument("--thres_view", type=int, default=4)
    p.add_argument("--thres_disp", type=float, default=1.0)
    p.add_argument("--dist_base", type=float, default=4.0)
    p.add_argument("--rel_diff_base", type=float, default=1300.0)
    p.add_argument("--fusion_view", type=int, default=10)
    p.add_argument("--rank", type=int, default=0)
    p.add_argument("--world", type=int, default=1)
    p.add_argument("--schedule", default="static", choices=["static", "queue"],
                   help="static: stride scans by --rank/--world; queue: "
                        "dynamic work stealing via atomic claim files in "
                        "--outdir (balanced under skewed per-scene work)")
    p.add_argument("--reclaim_stale", type=float, default=0.0,
                   help="queue mode: steal claims older than this many "
                        "seconds with no .done (crashed-worker recovery)")
    p.add_argument("--window_check", default="auto", choices=["auto", "off"],
                   help="per-scan warp-window pre-flight: auto-fallback of "
                        "stages whose banded/folded window plans escape on "
                        "this geometry to the exact warp (ops/window_check)")
    p.add_argument("--gt_depth_path", default=None,
                   help="DTU GT depth dir -> writes depth_metric.txt (reference test.py:297-319)")
    p.add_argument("--skip_depth", action="store_true", help="fusion only")
    args = p.parse_args()

    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(message)s")

    from mvsformerplusplus_tpu.config import load_config
    cfg = load_config(args.config)

    if not args.skip_depth:
        scans = save_depths(args, cfg)
    else:
        with open(args.testlist) as f:
            scans = [l.strip() for l in f if l.strip()][args.rank::args.world]

    if args.filter_method != "none":
        for scan in scans:
            fuse_scan(args, scan)


if __name__ == "__main__":
    main()
