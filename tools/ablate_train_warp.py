"""Train-crop build_volume variant timings (the train analogue of
tools/profile_eval.py --components). DTU MS train protocol shapes
(B=2 512x640, V=5): per-stage forward AND forward+backward timings for
the production plan vs banded candidates — the train step's warp cluster
is ~60% of device time (docs/profiles/r4_train_arc.txt)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import flax.linen as nn
    import jax
    import jax.numpy as jnp

    from bench import make_dtu_eval_batch
    from mvsformerplusplus_tpu.models.stagenet import StageNet
    from mvsformerplusplus_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    rng = np.random.RandomState(0)
    DT = jnp.bfloat16
    B, V, H, W = 2, 5, 512, 640
    imgs, cams, dv = make_dtu_eval_batch(b=B, v=V, h=H, w=W, seed=1)
    cams = {k: jnp.asarray(v) for k, v in cams.items()}
    feat_chs = {"stage1": 64, "stage2": 32, "stage3": 16, "stage4": 8}
    ndepths = {"stage1": 32, "stage2": 16, "stage3": 8, "stage4": 4}
    scales = {"stage1": 8, "stage2": 4, "stage3": 2, "stage4": 1}
    itv = float(dv[0, 1] - dv[0, 0])

    def bench(name, fn, *args, iters=5):
        f = jax.jit(fn)
        jax.block_until_ready(f(*args))
        t0 = time.time()
        for _ in range(iters):
            out = f(*args)
        jax.block_until_ready(out)
        print(f"{name:56s} {(time.time()-t0)/iters*1000:8.1f} ms",
              flush=True)

    def vol_module(d, mode, gy, bky, max_c, full_range, wpad=False):
        class VolOnly(nn.Module):
            @nn.compact
            def __call__(self, f, cam, dvv):
                st = StageNet(
                    ndepth=d, groups=8, cost_reg_type="Normal",
                    depth_type="ce", warp_mode=mode, fold_depth=False,
                    xgrouped_gx=gy, banded_ky=bky,
                    banded_max_c=max_c, banded_blocked_max_c=max(max_c, 32),
                    grouped_warp_th=8, dtype=DT, full_range=full_range,
                    banded_wpad=wpad,
                )
                vol, _fd = st._build_volume_impl(f, cam, dvv, False)
                return vol

        return VolOnly()

    for s in ("stage1", "stage2", "stage3", "stage4"):
        c, d, sc = feat_chs[s], ndepths[s], scales[s]
        h, w = H // sc, W // sc
        feats = jnp.asarray(
            rng.rand(B, V, h, w, c).astype(np.float32)).astype(DT)
        if s == "stage1":
            dvals = jnp.asarray(dv[:, :d])
        else:
            ctr = jnp.asarray(
                rng.uniform(500, 800, (B, h, w)).astype(np.float32))
            offs = (jnp.arange(d, dtype=jnp.float32) - d / 2) * (itv * sc)
            dvals = ctr[:, None] + offs[None, :, None, None]

        variants = [
            ("production", "auto_prod", 8, 16, 16, False),
            ("banded gy8", "banded", 8, 16, 64, False),
            ("banded gy2ky16", "banded", 2, 16, 64, False),
            # W-padded BLOCKED path for the narrow train crops (pads grid
            # to 128-multiple + src to 384; StageNet auto resolves the
            # gy2/ky8 plan for C in (16, 32))
            ("banded wpad/auto", "banded", 8, 16, 64, True),
        ]
        for label, mode, gy, bky, max_c, wpad in variants:
            # every variant routes through warp_mode="banded"; "production"
            # only differs in the C cap (StageNet default banded_max_c=16,
            # under which wide-C stages demote to the folded gather)
            m = vol_module(d, "banded", gy, bky,
                           max_c if mode != "auto_prod" else 16,
                           s == "stage1", wpad=wpad)
            try:
                vars_ = jax.jit(m.init)(
                    jax.random.PRNGKey(0), feats, cams[s], dvals)

                def fwd(f_, m=m, v=vars_):
                    return m.apply(v, f_, cams[s], dvals)

                def fwdbwd(f_, m=m, v=vars_):
                    return jax.grad(
                        lambda ff: jnp.sum(m.apply(v, ff, cams[s], dvals)
                                           .astype(jnp.float32)))(f_)

                bench(f"{s} [{label}] fwd", fwd, feats)
                bench(f"{s} [{label}] fwd+bwd", fwdbwd, feats)
            except Exception as e:
                print(f"{s} [{label}]: skipped "
                      f"({str(e).splitlines()[0][:90]})", flush=True)

    print("DONE", flush=True)


if __name__ == "__main__":
    main()
