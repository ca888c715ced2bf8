"""Conv/norm building blocks and the FPN feature pyramid (flax.linen, NHWC).

Re-designs of the reference's conv stacks (models/module.py:47-270) for TPU:
channel-last layouts (XLA TPU native), bf16 compute with fp32 params, and
fp32 islands where the reference pins them (FPN decoder upsample
models/module.py:261-267).

BatchNorm note: under pjit with a batch-sharded mesh, the batch-axis mean in
BatchNorm is computed over the *global* batch (XLA inserts the collective),
so the reference's explicit SyncBatchNorm conversion (train.py:199) is
subsumed by sharding — no extra machinery needed.
"""
from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.resize import resize2d

Array = jax.Array
Dtype = Any


def leaky_relu01(x):
    return nn.leaky_relu(x, negative_slope=0.1)


def sym_pad(ks) -> tuple:
    """torch-style symmetric conv padding ((k-1)//2 per side, per axis).

    For stride-1 odd kernels this equals XLA 'SAME'; for STRIDED convs the
    two differ (SAME pads asymmetrically, e.g. k=5 s=2: (1, 2) vs torch's
    (2, 2)), shifting the output half a pixel. The reference always uses
    padding=(k-1)//2, so every strided conv here must pad explicitly to stay
    numerically importable from reference checkpoints."""
    return tuple(((k - 1) // 2, (k - 1) // 2) for k in ks)


def deconv_pad(ks, strides, padding=None, output_padding=None) -> tuple:
    """Explicit flax ConvTranspose padding equivalent to torch
    ConvTranspose{2,3}d(padding=p, output_padding=op): per axis
    (k-1-p, k-1-p+op). With spatially-flipped weights this reproduces torch
    transposed-conv semantics exactly (verified vs torch in
    tests/test_reference_parity.py).

    Defaults follow the reference 3D U-Nets' convention p=(k-1)//2,
    op=s-1 (models/module.py:129-165); the SVA upsamplers use k=4, p=1,
    op=0 (models/module.py:319-322)."""
    out = []
    for i, (k, s) in enumerate(zip(ks, strides)):
        p = padding[i] if padding is not None else (k - 1) // 2
        op = output_padding[i] if output_padding is not None else s - 1
        out.append((k - 1 - p, k - 1 - p + op))
    return tuple(out)


class ConvBlock(nn.Module):
    """Conv2d + (Instance|Batch)Norm + LeakyReLU(0.1).

    Reference models/module.py:47-86 (Conv2d wrapper). NHWC.
    """

    features: int
    kernel_size: int = 3
    stride: int = 1
    norm: str = "IN"  # 'IN' | 'BN' | 'none'
    act: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        use_bias = self.norm == "none"
        ks = (self.kernel_size, self.kernel_size)
        if self.stride == 1:
            # MMConv routes to the Pallas fused conv / shifted matmuls on
            # TPU (the encoder's full-res 7x7/5x5/3x3 stride-1 stack is in
            # XLA-conv's worst narrow-channel regime); named to keep
            # nn.Conv's auto checkpoint path
            x = MMConv(self.features, ks, use_bias=use_bias,
                       dtype=self.dtype, name="Conv_0")(x)
        else:
            x = nn.Conv(
                self.features,
                ks,
                strides=(self.stride, self.stride),
                padding=sym_pad(ks),
                use_bias=use_bias,
                dtype=self.dtype,
            )(x)
        if self.norm == "BN":
            x = nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                dtype=jnp.float32,
            )(x)
        elif self.norm == "IN":
            # InstanceNorm == GroupNorm with one group per channel, no batch
            # statistics — fully data-parallel-safe.
            x = nn.GroupNorm(group_size=1, epsilon=1e-5, dtype=jnp.float32)(x)
        if self.act:
            x = leaky_relu01(x)
        return x.astype(self.dtype)


class ConvBnReLU(nn.Module):
    """Conv2d + BN + ReLU (reference models/module.py:168-197); used by the
    entropy->visibility head in StageNet."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        ks = (self.kernel_size, self.kernel_size)
        if self.stride == 1:
            # shifted-matmul conv (see conv2d_mm): the visibility head runs
            # at full volume resolution where XLA's conv lowering crawls
            x = MMConv(self.features, ks, use_bias=False, dtype=self.dtype,
                       name="Conv_0")(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=jnp.float32)(x)
            return nn.relu(x).astype(self.dtype)
        x = nn.Conv(
            self.features,
            ks,
            strides=(self.stride, self.stride),
            padding=sym_pad(ks),
            use_bias=False,
            dtype=self.dtype,
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=jnp.float32,
        )(x)
        return nn.relu(x).astype(self.dtype)


class Conv3dBlock(nn.Module):
    """Conv3d + BN + ReLU over NDHWC volumes (reference models/module.py:89-126)."""

    features: int
    kernel_size: Union[int, Tuple[int, int, int]] = 3
    stride: Union[int, Tuple[int, int, int]] = 1
    act: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False,
                 d_fold: Optional[int] = None) -> Array:
        ks = self.kernel_size if isinstance(self.kernel_size, tuple) else (self.kernel_size,) * 3
        st = self.stride if isinstance(self.stride, tuple) else (self.stride,) * 3
        if d_fold is not None:
            # depth-folded layout: x [B, H, W, d_fold*Ci] -> [B, H', W',
            # d_out*features]; exactly the 3D conv (fold_conv3d_kernel)
            b, h, w, dc = x.shape
            ci = dc // d_fold
            w3, _ = _ConvKernel((*ks, ci, self.features),
                                name="Conv_0")()
            w2, d_out = fold_conv3d_kernel(
                w3.astype(self.dtype), d_fold, st[0])
            y = jax.lax.conv_general_dilated(
                x, w2, (st[1], st[2]), sym_pad(ks[1:]),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            return _bn_relu_folded(y, d_out, self.features, self.act,
                                   train, self.dtype)
        x = nn.Conv(
            self.features, ks, strides=st, padding=sym_pad(ks), use_bias=False,
            dtype=self.dtype,
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=jnp.float32,
        )(x)
        if self.act:
            x = nn.relu(x)
        return x.astype(self.dtype)


def conv2d_mm(x: Array, kernel: Array, bias: Optional[Array] = None,
              padding: str = "torch") -> Array:
    """k x k stride-1 'same' conv as ky*kx shifted matmuls (fp32 accumulate).

    XLA's TPU conv lowering moves ~6x the necessary bytes on narrow-channel
    high-resolution shapes (xprof-verified probe at [5,1152,1536]: 64->8
    conv_general_dilated 24.8 ms @307 GB/s vs 17 ms @685 GB/s for this
    formulation; for C_in=8 the 9 re-reads total ~2.5 GB -> ~3.6 ms vs 26).
    Each tap is a dense [N, Ci]@[Ci, Co] dot the MXU executes at line rate;
    the shifted operands are static slices XLA fuses into the dot reads.

    kernel: [ky, kx, ci, co]; x: [B, H, W, ci]. Stride 1, symmetric torch
    padding ((k-1)//2) — the only convention the swapped call sites use.
    """
    ky, kx, ci, co = kernel.shape
    if ky == kx == 1:
        out = jnp.einsum("bhwc,co->bhwo", x, kernel[0, 0],
                         preferred_element_type=jnp.float32)
        if bias is not None:
            out = out + bias
        return out.astype(x.dtype)
    py, px = (ky - 1) // 2, (kx - 1) // 2
    xp = jnp.pad(x, ((0, 0), (py, py), (px, px), (0, 0)))
    b, h, w, _ = x.shape
    out = None
    for dy in range(ky):
        for dx in range(kx):
            t = jax.lax.slice(
                xp, (0, dy, dx, 0), (b, dy + h, dx + w, ci))
            y = jnp.einsum("bhwc,co->bhwo", t, kernel[dy, dx],
                           preferred_element_type=jnp.float32)
            out = y if out is None else out + y
    if bias is not None:
        out = out + bias
    return out.astype(x.dtype)


class MMConv(nn.Module):
    """nn.Conv-compatible module (same param tree) routed through conv2d_mm.
    Stride-1 'same' convs only; name it explicitly to preserve checkpoint
    paths when swapping an nn.Conv call site."""

    features: int
    kernel_size: Tuple[int, int]
    use_bias: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        ci = x.shape[-1]
        ks = self.kernel_size
        k = self.param("kernel", nn.initializers.lecun_normal(),
                       (*ks, ci, self.features))
        b = (self.param("bias", nn.initializers.zeros, (self.features,))
             if self.use_bias else None)
        on_tpu = jax.default_backend() in ("tpu", "axon")
        if ks[0] == ks[1] and ks[0] in (3, 5, 7) and on_tpu:
            from ..ops.pallas.conv2d import conv2d_p, conv2d_viable

            # Pallas fused conv: ONE input read + ky*3 shifted MXU dots
            # (ops/pallas/conv2d.py) — XLA's conv moves ~6x the bytes and
            # the XLA shifted-matmul form re-reads the input k*k times (the
            # shifted operands materialize; 47.6 ms on the 64-ch head).
            # Wide-channel full-width inputs exceed the kernel's VMEM
            # budget whole; CHANNEL-SPLITTING them is exact (conv is linear
            # in input-channel groups) and keeps total bytes unchanged.
            for cc in (ci, ci // 2, ci // 4, ci // 8):
                if ((cc >= 8 or cc == ci) and cc >= 1
                        and ci % max(cc, 1) == 0
                        and conv2d_viable(x.shape[1], x.shape[2], cc,
                                          self.features, ks[0], ks[1])):
                    xd = x.astype(self.dtype)
                    kd = k.astype(self.dtype)
                    # fp32 partial-sum accumulation (each kernel call
                    # accumulates fp32 internally; the cross-chunk sum
                    # must not round per-chunk in bf16)
                    y = conv2d_p(xd[..., :cc],
                                 kd[:, :, :cc]).astype(jnp.float32)
                    for s in range(cc, ci, cc):
                        y = y + conv2d_p(xd[..., s:s + cc],
                                         kd[:, :, s:s + cc]
                                         ).astype(jnp.float32)
                    if b is not None:
                        y = y + b
                    return y.astype(self.dtype)
        if ci > 32 and max(ks) > 1:
            # no viable split (extreme shapes): XLA's conv is the lesser
            # evil — the shifted operands would materialize as 9 full copies
            return jax.lax.conv_general_dilated(
                x.astype(self.dtype), k.astype(self.dtype), (1, 1),
                sym_pad(ks),
                dimension_numbers=("NHWC", "HWIO", "NHWC")) + (
                0 if b is None else b.astype(self.dtype))
        return conv2d_mm(x.astype(self.dtype), k.astype(self.dtype),
                         None if b is None else b.astype(self.dtype))


class _ConvKernel(nn.Module):
    """Parameter holder replicating nn.Conv's param tree ({kernel[, bias]})
    so the D-folded conv paths below register the EXACT same checkpoint
    structure (and init statistics) as the plain nn.Conv/nn.ConvTranspose
    paths — the two layouts are interchangeable on a saved model."""

    shape: Tuple[int, ...]
    use_bias: bool = False

    @nn.compact
    def __call__(self):
        k = self.param("kernel", nn.initializers.lecun_normal(), self.shape)
        b = (self.param("bias", nn.initializers.zeros, (self.shape[-1],))
             if self.use_bias else None)
        return k, b


def fold_d_indicator(kz: int, d_in: int, d_out: int, stride_d: int,
                     offset: int, transposed: bool) -> Array:
    """[kz, d_in, d_out] 0/1 selector relating depth taps to depth channels.

    Folding the depth axis of an NDHWC volume into channels turns a 3D conv
    into an exactly-equivalent 2D conv whose weight is BLOCK-BANDED in depth
    (out depth-block d sees in depth-blocks {d*s + dz - offset}); a
    transposed conv (fractionally strided) uses di*s == do + dz - offset —
    the zero-insertion upsampling baked into the band structure. The dense
    2D conv spends d_in/kz more MACs than the true 3D op (free next to the
    MXU) but its channel dim grows from C (8-64: lane-padded up to 16x by
    the (8,128)/(16,128) tile) to D*C — the r3 profiles attribute 210-316 ms
    and an 8-64x padded-HBM OOM class to exactly those narrow-C 3D convs
    (docs/profiles/r3_compile_cache.md)."""
    dz = jnp.arange(kz)[:, None, None]
    di = jnp.arange(d_in)[None, :, None]
    do = jnp.arange(d_out)[None, None, :]
    if transposed:
        cond = di * stride_d == do + dz - offset
    else:
        cond = di == do * stride_d + dz - offset
    return cond.astype(jnp.float32)


def fold_conv3d_kernel(w3: Array, d_in: int, stride_d: int,
                       transposed: bool = False) -> Tuple[Array, int]:
    """3D kernel [kz, ky, kx, ci, co] -> equivalent 2D kernel
    [ky, kx, d_in*ci, d_out*co] for the depth-folded layout. Padding
    conventions match the repo's blocks: conv pads (k-1)//2 per side
    (sym_pad), transposed convs use deconv_pad's p=(k-1)//2, op=s-1."""
    kz, ky, kx, ci, co = w3.shape
    p = (kz - 1) // 2
    if transposed:
        d_out = d_in * stride_d  # (d-1)*s - 2p + k + (s-1) with k=2p+1
        offset = kz - 1 - p
    else:
        d_out = (d_in + 2 * p - kz) // stride_d + 1
        offset = p
    m = fold_d_indicator(kz, d_in, d_out, stride_d, offset, transposed)
    w2 = jnp.einsum("zyxio,zad->yxaido", w3.astype(jnp.float32), m,
                    precision=jax.lax.Precision.HIGHEST)
    return w2.reshape(ky, kx, d_in * ci, d_out * co).astype(w3.dtype), d_out


def _bn_relu_folded(y: Array, d_out: int, features: int, act: bool,
                    train: bool, dtype) -> Array:
    """BatchNorm with per-C stats (grouping the folded D copies) + ReLU.
    Param/stat shapes stay [C] — identical tree to the plain path."""
    b, h, w, _ = y.shape
    y = y.reshape(b, h, w, d_out, features)  # free minor split
    y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                     epsilon=1e-5, dtype=jnp.float32)(y)
    if act:
        y = nn.relu(y)
    return y.astype(dtype).reshape(b, h, w, d_out * features)


class Deconv3dBlock(nn.Module):
    """ConvTranspose3d + BN + ReLU, ×2 upsampling along selected axes.

    Padding reproduces torch's (kernel 3, stride s, padding 1,
    output_padding s-1) transposed conv exactly (see deconv_pad); with the
    spatially-flipped weight layout this is bit-compatible with the
    reference's Deconv3d (models/module.py:129-165, 466-479).
    """

    features: int
    kernel_size: Union[int, Tuple[int, int, int]] = 3
    stride: Union[int, Tuple[int, int, int]] = (1, 2, 2)
    act: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False,
                 d_fold: Optional[int] = None) -> Array:
        ks = self.kernel_size if isinstance(self.kernel_size, tuple) else (self.kernel_size,) * 3
        st = self.stride if isinstance(self.stride, tuple) else (self.stride,) * 3
        if d_fold is not None:
            b, h, w, dc = x.shape
            ci = dc // d_fold
            w3, _ = _ConvKernel((*ks, ci, self.features),
                                name="ConvTranspose_0")()
            w2, d_out = fold_conv3d_kernel(
                w3.astype(self.dtype), d_fold, st[0], transposed=True)
            # fractionally-strided conv over (H, W); the D upsampling lives
            # in the folded kernel's band structure
            y = jax.lax.conv_general_dilated(
                x, w2, (1, 1), deconv_pad(ks[1:], st[1:]),
                lhs_dilation=(st[1], st[2]),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            return _bn_relu_folded(y, d_out, self.features, self.act,
                                   train, self.dtype)
        x = nn.ConvTranspose(
            self.features, ks, strides=st, padding=deconv_pad(ks, st),
            use_bias=False, dtype=self.dtype,
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=jnp.float32,
        )(x)
        if self.act:
            x = nn.relu(x)
        return x.astype(self.dtype)


class FPNEncoder(nn.Module):
    """4-level conv pyramid 1/1 -> 1/8 (reference models/module.py:208-239)."""

    feat_chs: Sequence[int] = (8, 16, 32, 64)
    norm: str = "BN"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False):
        c0, c1, c2, c3 = self.feat_chs
        conv = lambda f, k, s=1: ConvBlock(f, k, s, norm=self.norm, dtype=self.dtype)
        x = conv(c0, 7)(x, train)
        conv01 = conv(c0, 5)(x, train)
        x = conv(c1, 5, 2)(conv01, train)
        x = conv(c1, 3)(x, train)
        conv11 = conv(c1, 3)(x, train)
        x = conv(c2, 5, 2)(conv11, train)
        x = conv(c2, 3)(x, train)
        conv21 = conv(c2, 3)(x, train)
        x = conv(c3, 3, 2)(conv21, train)
        x = conv(c3, 3)(x, train)
        conv31 = conv(c3, 3)(x, train)
        return conv01, conv11, conv21, conv31


class FPNDecoder(nn.Module):
    """Top-down pyramid with Swish + BN; outputs stage1..4 features
    (64ch@1/8, 32@1/4, 16@1/2, 8@1/1). Reference models/module.py:242-270.

    Upsampling is bilinear align_corners=True in fp32 (matmul resize)."""

    feat_chs: Sequence[int] = (8, 16, 32, 64)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, conv01, conv11, conv21, conv31, train: bool = False):
        c0, c1, c2, c3 = self.feat_chs
        final_ch = c3

        # MMConv everywhere (named to keep nn.Conv's auto checkpoint paths
        # Conv_0..Conv_6, heads and laterals interleaved): XLA's conv moves
        # ~6x the bytes on these narrow-channel full-res shapes
        conv_idx = [0]

        def mmconv(x, features, kernel):
            m = MMConv(features, (kernel, kernel), dtype=self.dtype,
                       name=f"Conv_{conv_idx[0]}")
            conv_idx[0] += 1
            return m(x)

        def head(x, features, kernel):
            x = mmconv(x, features, kernel)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=jnp.float32)(x)
            return (x * nn.sigmoid(x)).astype(self.dtype)  # Swish

        intra = conv31
        out0 = head(intra, c3, 1)

        def up_add(x, lateral, ch):
            h, w = lateral.shape[-3], lateral.shape[-2]
            # The reference casts to fp32 before interpolate
            # (models/module.py:261) as an fp16-overflow guard; bf16 has
            # fp32's exponent range, so the bf16 path resizes AND adds in
            # model dtype (resize2d dispatches to bf16 matmuls with fp32
            # accumulation — the fp32-HIGHEST resize cost 65 ms/map, and an
            # fp32 add materialized ~14 GB of converts on the full-res
            # 64-channel intermediate, ~25 ms/map).
            up = resize2d(x, h, w, method="linear", align_corners=True)
            lat = mmconv(lateral, final_ch, 1)
            return up.astype(self.dtype) + lat.astype(self.dtype)

        intra = up_add(intra, conv21, c2)
        out1 = head(intra, c2, 3)
        intra = up_add(intra, conv11, c1)
        out2 = head(intra, c1, 3)
        intra = up_add(intra, conv01, c0)
        out3 = head(intra, c0, 3)
        return out0, out1, out2, out3


class LayerNorm3D(nn.Module):
    """Channel LayerNorm over NDHWC volumes (normalizes the C axis only).

    Reference models/module.py:586-599 normalizes dim 1 of NCDHW — i.e. the
    channel axis — which in channel-last is just LayerNorm over the last axis
    without centering stats over space. fp32 statistics.
    """

    epsilon: float = 1e-6
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        c = x.shape[-1]
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean((xf - mean) ** 2, axis=-1, keepdims=True)
        y = (xf - mean) * jax.lax.rsqrt(var + self.epsilon)
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        return (y * scale + bias).astype(self.dtype)
