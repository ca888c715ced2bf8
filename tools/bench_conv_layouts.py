"""Microbenchmark: 3D cost-reg conv layout alternatives on TPU.

The r3 profiles attribute 210 ms (eval) / 316 ms (train) to convolutions,
mostly the NDHWC 3D U-Nets whose C=8-64 minor dim tile-pads up to 16x
(docs/profiles/r3_compile_cache.md OOM dump shows the same padding in the
backward). This tool times candidate formulations at stage-4 DTU eval scale
to pick a direction before rewriting cost_reg.py:

  python tools/bench_conv_layouts.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from mvsformerplusplus_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    rng = np.random.RandomState(0)
    DT = jnp.bfloat16

    def bench(name, fn, *args, iters=5):
        f = jax.jit(fn)
        jax.block_until_ready(f(*args))
        t0 = time.time()
        out = None
        for _ in range(iters):
            out = f(*args)
        jax.block_until_ready(out)
        print(f"{name:58s} {(time.time()-t0)/iters*1000:8.2f} ms", flush=True)

    b, d, h, w, c = 1, 4, 1152, 1536, 8
    x_ndhwc = jnp.asarray(rng.rand(b, d, h, w, c).astype(np.float32), DT)
    k3 = jnp.asarray(rng.rand(3, 3, 3, c, 2 * c).astype(np.float32), DT)

    # (a) plain NDHWC conv3d (the current cost_reg building block)
    def conv3d(x, k):
        return jax.lax.conv_general_dilated(
            x, k, (1, 2, 2), "SAME",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))

    bench("conv3d NDHWC C8->16 s(1,2,2)", conv3d, x_ndhwc, k3)

    # (b) D folded into batch, three 2D convs + shifted adds (exact same op)
    k2s = [jnp.asarray(rng.rand(3, 3, c, 2 * c).astype(np.float32), DT)
           for _ in range(3)]

    def conv2d_dshift(x, ks):
        xb = x.reshape(b * d, h, w, c)
        ys = [jax.lax.conv_general_dilated(
            xb, k, (2, 2), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC")) for k in ks]
        ys = [y.reshape(b, d, h // 2, w // 2, 2 * c) for y in ys]
        z = ys[1]
        z = z.at[:, 1:].add(ys[0][:, :-1]) if False else (
            z + jnp.pad(ys[0][:, :-1], ((0, 0), (1, 0), (0, 0), (0, 0), (0, 0)))
            + jnp.pad(ys[2][:, 1:], ((0, 0), (0, 1), (0, 0), (0, 0), (0, 0))))
        return z

    bench("3x conv2d (D in batch) + D-shift adds", conv2d_dshift, x_ndhwc, k2s)

    # (c) D folded into channels, dense 2D conv (D*C in/out; 4x the FLOPs but
    # 32-channel minor dims)
    x_dc = jnp.asarray(rng.rand(b, h, w, d * c).astype(np.float32), DT)
    kdc = jnp.asarray(rng.rand(3, 3, d * c, d * 2 * c).astype(np.float32), DT)

    def conv2d_dc(x, k):
        return jax.lax.conv_general_dilated(
            x, k, (2, 2), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))

    bench("conv2d dense D-in-C 32->64", conv2d_dc, x_dc, kdc)

    # (d) reference point: same data volume at C=128 (what good tiling buys)
    x128 = jnp.asarray(rng.rand(b, h // 2, w // 2, 128).astype(np.float32), DT)
    k128 = jnp.asarray(rng.rand(3, 3, 128, 128).astype(np.float32), DT)
    bench("conv2d C128->128 (half res, same bytes)", conv2d_dc, x128, k128)

    # (e) the actual CostRegNet3D at stage-4 scale fwd (for a total anchor)
    import flax.linen as nn

    from mvsformerplusplus_tpu.models.cost_reg import CostRegNet3D

    m = CostRegNet3D(base_channels=8, dtype=DT)
    v = jax.jit(m.init)(jax.random.PRNGKey(0), x_ndhwc)
    bench("CostRegNet3D fwd [1,4,1152,1536,8]",
          lambda xx, vv=v: m.apply(vv, xx), x_ndhwc)

    # (f) its fwd+bwd
    def loss(vv, xx):
        return jnp.sum(m.apply(vv, xx).astype(jnp.float32))

    bench("CostRegNet3D fwd+bwd", lambda vv, xx: jax.grad(loss)(vv, xx),
          v, x_ndhwc, iters=3)

    # ---- the r3b eval-profile 2D offenders, standalone with clean layouts
    # (in-context they measured 30/26 ms at 25-48 GB/s) ----
    def conv2d(x, k, s=1):
        return jax.lax.conv_general_dilated(
            x, k, (s, s), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))

    x64 = jnp.asarray(rng.rand(5, 1152, 1536, 64).astype(np.float32), DT)
    k648 = jnp.asarray(rng.rand(3, 3, 64, 8).astype(np.float32), DT)
    bench("decoder Conv_6 standalone [5,1152,1536,64]->8", conv2d, x64, k648)

    x8 = jnp.asarray(rng.rand(5, 1152, 1536, 8).astype(np.float32), DT)
    k88 = jnp.asarray(rng.rand(3, 3, 8, 8).astype(np.float32), DT)
    bench("fmt smooth_3 standalone [5,1152,1536,8]->8", conv2d, x8, k88)

    # W-folded equivalent shapes (16 pixels into channels, 3-tap kernel)
    x8f = jnp.asarray(rng.rand(5, 1152, 96, 128).astype(np.float32), DT)
    k8f = jnp.asarray(rng.rand(3, 3, 128, 128).astype(np.float32), DT)
    bench("fmt smooth_3 W-folded shape [5,1152,96,128]->128",
          conv2d, x8f, k8f)
    x64f = jnp.asarray(rng.rand(5, 1152, 384, 256).astype(np.float32), DT)
    k64f = jnp.asarray(rng.rand(3, 3, 256, 32).astype(np.float32), DT)
    bench("decoder Conv_6 W-folded(4) shape [5,1152,384,256]->32",
          conv2d, x64f, k64f)
    print("DONE", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
