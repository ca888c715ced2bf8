"""End-to-round benchmark: flagship DINOv2MVSNet inference throughput at the
DTU eval protocol (5 views, 1152x1536, 192 depth hypotheses, bf16) on one
TPU chip. Prints ONE JSON line.

Baseline note (BASELINE.md): the reference commits no inference latency
number ("average time" is printed at runtime only, test.py:239-262,313).
We anchor vs_baseline to 1.0 depth-map/s — the order of magnitude of
published MVSFormer++ per-view DTU timings on a single consumer GPU — so
vs_baseline == our maps/s. Revisit when a measured reference number exists.
"""
import json
import sys
import time

import numpy as np

BASELINE_MAPS_PER_SEC = 1.0


def make_dtu_eval_batch(b=1, v=5, h=1152, w=1536, dfull=192):
    rng = np.random.RandomState(0)
    imgs = rng.rand(b, v, h, w, 3).astype(np.float32)
    cams = {}
    for s in range(4):
        scale = 0.125 * 2**s
        cam = np.zeros((b, v, 2, 4, 4), np.float32)
        for vi in range(v):
            ang = 0.06 * vi
            c, sn = np.cos(ang), np.sin(ang)
            ext = np.eye(4, dtype=np.float32)
            ext[:3, :3] = np.array([[c, 0, sn], [0, 1, 0], [-sn, 0, c]], np.float32)
            ext[0, 3] = 40.0 * vi  # DTU-scale baselines (mm)
            cam[:, vi, 0] = ext
            f = 2892.33 * scale  # DTU-like focal at full res
            cam[:, vi, 1, :3, :3] = np.array(
                [[f, 0, w * scale / 2], [0, f, h * scale / 2], [0, 0, 1]], np.float32)
        cams[f"stage{s + 1}"] = cam
    # DTU depth range: 425mm + 192 * 2.5mm * 1.06
    depth_values = (425.0 + np.arange(dfull, dtype=np.float32) * 2.5 * 1.06)[None].repeat(b, 0)
    return imgs, cams, depth_values


def main():
    import jax
    import jax.numpy as jnp

    from mvsformerplusplus_tpu.models.mvsformer import DINOv2MVSNet
    from mvsformerplusplus_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    imgs, cams, dv = make_dtu_eval_batch()
    model = DINOv2MVSNet(dtype=jnp.bfloat16, remat_stages=False)

    imgs = jnp.asarray(imgs)
    cams = jax.tree.map(jnp.asarray, cams)
    dv = jnp.asarray(dv)

    t0 = time.time()
    variables = jax.jit(
        lambda r: model.init(r, imgs, cams, dv, train=False)
    )(jax.random.PRNGKey(0))
    init_s = time.time() - t0

    fwd = jax.jit(lambda v, i: model.apply(v, i, cams, dv, train=False)["refined_depth"])
    t0 = time.time()
    out = jax.block_until_ready(fwd(variables, imgs))
    compile_s = time.time() - t0

    # steady state
    iters = 5
    t0 = time.time()
    for _ in range(iters):
        out = fwd(variables, imgs)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / iters

    maps_per_sec = imgs.shape[0] / dt
    d = np.asarray(out, np.float32)
    ok = bool(np.isfinite(d).all())

    print(json.dumps({
        "metric": "dtu_eval_depth_maps_per_sec_per_chip",
        "value": round(maps_per_sec, 4),
        "unit": "depth-maps/s (1152x1536, 5 views, 192 depths, bf16, 1 chip)",
        "vs_baseline": round(maps_per_sec / BASELINE_MAPS_PER_SEC, 4),
        "extra": {
            "ms_per_map": round(dt * 1000, 2),
            "init_s": round(init_s, 1),
            "compile_s": round(compile_s, 1),
            "finite": ok,
            "backend": jax.default_backend(),
        },
    }))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
