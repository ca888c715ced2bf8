"""Depth-folded warp window soundness at DTU-protocol geometry.

The fold path (ops/grid_sample.py fold_depth) shares one [fold_ky, fold_wx]
patch across a pixel group's WHOLE hypothesis band; corners that miss the
window blend to zero. This pins the guarantee the defaults were chosen by:
at the DTU eval protocol (bench cams, cascade-scheduled re-centered bands),
folding introduces NO additional window escapes over the shipped unfolded
path — the residual ~0.1% escapes are the same epipolar-degenerate pixels
both paths zero out (see docs/warp_kernel_design.md).
"""
import sys
from pathlib import Path

import numpy as np
import pytest

import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from mvsformerplusplus_tpu.ops.geometry import (compose_projection,
                                                plane_sweep_coords)
from mvsformerplusplus_tpu.ops.grid_sample import fold_escape_fraction
from mvsformerplusplus_tpu.ops.sampling import (init_inverse_range,
                                                schedule_inverse_range)


def _escape_fraction(proj_stage, hypo, h, w, gy, ky, wx, fold):
    """Per-source-view escape fractions via the shipped diagnostic."""
    ref_p = proj_stage[:, 0]
    out = []
    for vi in range(1, proj_stage.shape[1]):
        coords, _ = plane_sweep_coords(proj_stage[:, vi], ref_p, hypo, h, w)
        out.append(fold_escape_fraction(coords, h, w, gy=gy, ky=ky, wx=wx,
                                        fold=fold))
    return out


@pytest.mark.slow
def test_fold_window_adds_no_escapes_at_dtu_geometry():
    from bench import make_dtu_eval_batch

    H, W = 1152, 1536
    _, cams, dvals = make_dtu_eval_batch()
    dv = jnp.asarray(dvals)

    # emulate the cascade's band scheduling (mid hypothesis as prev depth)
    hypo = init_inverse_range(dv, 32, H // 8, W // 8)
    for nd, ratio, sc in ((16, 2.67, 4), (8, 1.5, 2), (4, 1.0, 1)):
        hypo = schedule_inverse_range(
            hypo[:, hypo.shape[1] // 2], hypo, nd, ratio, H // sc, W // sc)
        proj = compose_projection(jnp.asarray(cams[
            {4: "stage2", 2: "stage3", 1: "stage4"}[sc]]))
        if nd > 8:
            continue  # fold only activates for ndepth <= 8
        base = _escape_fraction(proj, hypo, H // sc, W // sc,
                                gy=8, ky=16, wx=6, fold=False)
        fold = _escape_fraction(proj, hypo, H // sc, W // sc,
                                gy=8, ky=24, wx=12, fold=True)
        for b, f in zip(base, fold):
            assert f <= b + 1e-6, (sc, base, fold)
        assert max(fold) < 0.003, (sc, fold)


@pytest.mark.slow
def test_banded_window_escapes_at_dtu_geometry():
    """The banded warp's y-window (anchor = min over a whole output
    row-group ACROSS W) at the DTU eval protocol, every stage including the
    full-range first sweep: escapes stay in the same ~0.1% epipolar-
    degenerate class as the per-pixel-group paths."""
    from bench import make_dtu_eval_batch

    from mvsformerplusplus_tpu.ops.grid_sample import banded_escape_fraction

    H, W = 1152, 1536
    _, cams, dvals = make_dtu_eval_batch()
    dv = jnp.asarray(dvals)

    def banded_esc(proj_stage, hypo, h, w, block_w, ky):
        ref_p = proj_stage[:, 0]
        out = []
        for vi in range(1, proj_stage.shape[1]):
            coords, _ = plane_sweep_coords(
                proj_stage[:, vi], ref_p, hypo, h, w)
            out.append(banded_escape_fraction(coords, h, w, gy=8, ky=ky,
                                              block_w=block_w))
        return out

    hypo = init_inverse_range(dv, 32, H // 8, W // 8)
    # stage1 (W=192, not 128-divisible) takes the whole-row path with the
    # production ky
    esc = banded_esc(compose_projection(jnp.asarray(cams["stage1"])),
                     hypo, H // 8, W // 8, block_w=0, ky=24)
    assert max(esc) < 0.003, ("stage1", esc)
    for nd, ratio, sc in ((16, 2.67, 4), (8, 1.5, 2), (4, 1.0, 1)):
        hypo = schedule_inverse_range(
            hypo[:, hypo.shape[1] // 2], hypo, nd, ratio, H // sc, W // sc)
        proj = compose_projection(jnp.asarray(cams[
            {4: "stage2", 2: "stage3", 1: "stage4"}[sc]]))
        # ky=16 is the production blocked-path default (StageNet.banded_ky):
        # ZERO escapes at every blocked stage of this geometry, and it keeps
        # the one-hot matmuls' ky*C rows at <= 1 MXU tile for C=8
        for ky in (16, 24):
            esc = banded_esc(proj, hypo, H // sc, W // sc, block_w=128,
                             ky=ky)
            assert max(esc) < (1e-9 if ky == 16 else 0.003), (sc, ky, esc)

    # the C=16 auto plan (StageNet: gy=2 row groups, ky=8 bands) at the
    # stage it serves (stage3): zero escapes
    def banded_esc_gy(proj_stage, hypo, h, w, gy, ky):
        ref_p = proj_stage[:, 0]
        return [banded_escape_fraction(
            np.asarray(plane_sweep_coords(
                proj_stage[:, vi], ref_p, hypo, h, w)[0]),
            h, w, gy=gy, ky=ky, block_w=128)
            for vi in range(1, proj_stage.shape[1])]

    # the gy=2/ky=8 auto plan runs every blocked C=16/32 stage in
    # production (stage2 and stage3): zero escapes at each
    hypo3 = init_inverse_range(dv, 32, H // 8, W // 8)
    for nd, ratio, sc in ((16, 2.67, 4), (8, 1.5, 2)):
        hypo3 = schedule_inverse_range(
            hypo3[:, hypo3.shape[1] // 2], hypo3, nd, ratio,
            H // sc, W // sc)
        proj3 = compose_projection(
            jnp.asarray(cams[{4: "stage2", 2: "stage3"}[sc]]))
        esc = banded_esc_gy(proj3, hypo3, H // sc, W // sc, gy=2, ky=8)
        assert max(esc) < 1e-9, (f"stage sc={sc} gy2ky8", esc)


def test_bwd_window_escapes_at_train_geometry():
    """The backward's window plans at the DTU TRAIN-crop geometry
    (512x640, bench.make_train_batch cams): whole-row ky=24 (narrow
    stages; banded_image_grad's minimum) and per-128-px-block ky=16 (the
    blocked route, w >= 384) must be escape-free — an escape is a
    silently-zeroed gradient."""
    import numpy as np
    from bench import make_dtu_eval_batch
    from mvsformerplusplus_tpu.ops.geometry import (compose_projection,
                                                    plane_sweep_coords)
    from mvsformerplusplus_tpu.ops.grid_sample import banded_escape_fraction
    from mvsformerplusplus_tpu.ops.sampling import (init_inverse_range,
                                                    schedule_inverse_range)

    H, W = 512, 640
    _, cams, dv = make_dtu_eval_batch(b=2, v=5, h=H, w=W, seed=1)
    dv = jnp.asarray(dv)
    hypo = init_inverse_range(dv, 32, H // 8, W // 8)

    def esc(stage, hy, h, w, ky, block_w):
        proj = compose_projection(jnp.asarray(cams[stage]))
        return max(banded_escape_fraction(
            np.asarray(plane_sweep_coords(proj[:, vi], proj[:, 0],
                                          hy, h, w)[0]),
            h, w, gy=8, ky=min(ky, h), block_w=block_w)
            for vi in range(1, 5))

    # stage1 full-range + narrow stages: whole-row ky=24
    assert esc("stage1", hypo, H // 8, W // 8, 24, 0) < 1e-9
    hy = hypo
    for nd, ratio, sc in ((16, 2.67, 4), (8, 1.5, 2), (4, 1.0, 1)):
        hy = schedule_inverse_range(hy[:, hy.shape[1] // 2], hy, nd, ratio,
                                    H // sc, W // sc)
        stage = {4: "stage2", 2: "stage3", 1: "stage4"}[sc]
        if sc == 1:
            # w=640: the blocked backward route, per-block ky=16
            assert esc(stage, hy, H, W, 16, 128) < 1e-9
        else:
            assert esc(stage, hy, H // sc, W // sc, 24, 0) < 1e-9


def test_banded_wpad_window_escapes_at_train_geometry():
    """The W-PADDED blocked plans (StageNet.banded_wpad) at the DTU TRAIN
    crop (512x640): stage2 (128x160 -> grid 256) and stage3 (256x320 ->
    grid 384) under the gy=2/ky=8 auto plan. The padded grid's dummy
    columns are out-of-image (never counted); real samples must keep the
    zero-escape guarantee of the unpadded blocked plans."""
    from bench import make_dtu_eval_batch

    from mvsformerplusplus_tpu.ops.grid_sample import banded_escape_fraction

    H, W = 512, 640
    _, cams, dvals = make_dtu_eval_batch(b=1, h=H, w=W, seed=1)
    dv = jnp.asarray(dvals)

    hypo = init_inverse_range(dv, 32, H // 8, W // 8)
    for nd, ratio, sc, stage in ((16, 2.67, 4, "stage2"),
                                 (8, 1.5, 2, "stage3")):
        h, w = H // sc, W // sc
        hypo = schedule_inverse_range(
            hypo[:, hypo.shape[1] // 2], hypo, nd, ratio, h, w)
        proj = compose_projection(jnp.asarray(cams[stage]))
        wg = ((w + 127) // 128) * 128
        for vi in range(1, proj.shape[1]):
            coords, _ = plane_sweep_coords(proj[:, vi], proj[:, 0],
                                           hypo, h, w)
            cp = np.pad(np.asarray(coords),
                        ((0, 0), (0, 0), (0, 0), (0, wg - w), (0, 0)),
                        constant_values=-1e4)
            esc = banded_escape_fraction(cp, h, wg, gy=2, ky=8,
                                         block_w=128)
            # a handful of epipolar-degenerate samples (measured 7.4e-6 at
            # stage2 view 4) — far inside the ~0.1% class the unpadded
            # plans also carry at eval geometry; not the zero of the
            # unpadded TRAIN pins because the padded grid can shift a
            # block's robust anchor
            assert esc < 1e-4, (stage, vi, esc)
