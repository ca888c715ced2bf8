#!/usr/bin/env python
"""Convert a full MVSFormer++ reference checkpoint (.pth) into flax variables
for mvsformerplusplus_tpu.models.mvsformer.DINOv2MVSNet.

Covers every trainable submodule of the reference model
(/root/reference/models/networks/DINOv2_mvsformer_model.py): FPN
encoder/decoder, the frozen DINOv2 ViT (via tools/convert_dinov2), the SVA
CrossVITDecoder, FMT + pathway, and all four StageNet heads (vis CNNs +
CostRegNet / CostRegNet3D / PureTransformerCostReg regularizers).

Weight-layout rules (verified numerically vs torch in
tests/test_reference_parity.py):
- Linear:            kernel = W.T
- Conv2d/Conv3d:     kernel = W.transpose(spatial..., in, out); our conv
                     blocks pad torch-symmetrically (models/layers.sym_pad)
- ConvTranspose:     kernel = W.transpose(spatial..., in, out) with every
                     spatial axis FLIPPED (torch convT == flax ConvTranspose
                     with flipped kernels and matching explicit padding,
                     models/layers.deconv_pad)
- BatchNorm:         weight/bias -> scale/bias; running stats -> batch_stats
- LayerNorm (incl. the reference's LayerNorm3D): weight/bias -> scale/bias

Usage:
  python tools/convert_reference.py model_best.pth out.npz
  # then: test.py --ckpt_npz out.npz ... (or load_reference_variables)

The checkpoint may be a bare state_dict or the reference trainer's
{'state_dict': ...} wrapper (reference base/base_trainer.py:149-178); DDP
'module.' prefixes and the pe_dict PE caches are stripped like the reference
loader does (reference test.py:214-220, utils.py:370-397).
"""
from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tools.convert_dinov2 import convert_state_dict as convert_vit_sd  # noqa: E402
from tools.convert_dinov2 import unflatten  # noqa: E402


def _lin(w):
    return np.ascontiguousarray(w.T)


def _conv2d(w):  # [O, I, kh, kw] -> [kh, kw, I, O]
    return np.ascontiguousarray(w.transpose(2, 3, 1, 0))


def _conv3d(w):  # [O, I, kd, kh, kw] -> [kd, kh, kw, I, O]
    return np.ascontiguousarray(w.transpose(2, 3, 4, 1, 0))


def _deconv2d(w):  # [I, O, kh, kw] -> flipped [kh, kw, I, O]
    return np.ascontiguousarray(w.transpose(2, 3, 0, 1)[::-1, ::-1])


def _deconv3d(w):  # [I, O, kd, kh, kw] -> flipped [kd, kh, kw, I, O]
    return np.ascontiguousarray(w.transpose(2, 3, 4, 0, 1)[::-1, ::-1, ::-1])


class _Mapper:
    def __init__(self, sd: dict):
        self.sd = {k: np.asarray(v) for k, v in sd.items()}
        self.params: dict = {}
        self.stats: dict = {}
        self.used: set = set()

    def take(self, key):
        self.used.add(key)
        return self.sd[key]

    def put(self, path, arr):
        self.params[path] = np.asarray(arr)

    def put_stat(self, path, arr):
        self.stats[path] = np.asarray(arr)

    # -- composite converters ------------------------------------------------
    def bn(self, our, ref):
        self.put(f"{our}/scale", self.take(f"{ref}.weight"))
        self.put(f"{our}/bias", self.take(f"{ref}.bias"))
        self.put_stat(f"{our}/mean", self.take(f"{ref}.running_mean"))
        self.put_stat(f"{our}/var", self.take(f"{ref}.running_var"))
        self.used.add(f"{ref}.num_batches_tracked")

    def ln(self, our, ref):
        self.put(f"{our}/scale", self.take(f"{ref}.weight"))
        self.put(f"{our}/bias", self.take(f"{ref}.bias"))

    def conv2d(self, our, ref, bias=True):
        self.put(f"{our}/kernel", _conv2d(self.take(f"{ref}.weight")))
        if bias:
            self.put(f"{our}/bias", self.take(f"{ref}.bias"))

    def conv3d(self, our, ref, bias=True):
        self.put(f"{our}/kernel", _conv3d(self.take(f"{ref}.weight")))
        if bias:
            self.put(f"{our}/bias", self.take(f"{ref}.bias"))

    def deconv2d(self, our, ref, bias=True):
        self.put(f"{our}/kernel", _deconv2d(self.take(f"{ref}.weight")))
        if bias:
            self.put(f"{our}/bias", self.take(f"{ref}.bias"))

    def deconv3d(self, our, ref, bias=True):
        self.put(f"{our}/kernel", _deconv3d(self.take(f"{ref}.weight")))
        if bias:
            self.put(f"{our}/bias", self.take(f"{ref}.bias"))

    def dense(self, our, ref, bias=True):
        self.put(f"{our}/kernel", _lin(self.take(f"{ref}.weight")))
        if bias:
            self.put(f"{our}/bias", self.take(f"{ref}.bias"))

    def conv_bn_block(self, our, ref):
        """reference Conv2d/Conv3d wrapper (conv + bn, models/module.py:47-126)
        -> our ConvBlock / ConvBnReLU / Conv3dBlock."""
        w = self.take(f"{ref}.conv.weight")
        conv = _conv3d(w) if w.ndim == 5 else _conv2d(w)
        self.put(f"{our}/Conv_0/kernel", conv)
        self.bn(f"{our}/BatchNorm_0", f"{ref}.bn")

    def deconv_bn_block(self, our, ref):
        """reference Deconv3d wrapper -> our Deconv3dBlock."""
        self.put(f"{our}/ConvTranspose_0/kernel",
                 _deconv3d(self.take(f"{ref}.conv.weight")))
        self.bn(f"{our}/BatchNorm_0", f"{ref}.bn")

    def cross_block(self, our, ref):
        """reference CrossBlock (block.py:272-346) / FMT layer -> our
        CrossBlock."""
        self.ln(f"{our}/norm1", f"{ref}.norm1")
        self.ln(f"{our}/norm2", f"{ref}.norm2")
        self.attention(f"{our}/attn", f"{ref}.attn")
        self.put(f"{our}/ls1/gamma", self.take(f"{ref}.ls1.gamma"))
        self.put(f"{our}/ls2/gamma", self.take(f"{ref}.ls2.gamma"))
        self.dense(f"{our}/mlp/Dense_0", f"{ref}.mlp.fc1")
        self.dense(f"{our}/mlp/Dense_1", f"{ref}.mlp.fc2")

    def attention(self, our, ref):
        """reference attention projs -> our MultiHeadAttention.

        FLASH2/XFormers/SDPA variants pack qkv into one Linear
        (attention.py:68, 3*dim x dim) — split into our separate q/k/v;
        Cross* variants already carry q_proj/k_proj/v_proj."""
        if f"{ref}.qkv.weight" in self.sd:
            w = self.take(f"{ref}.qkv.weight")
            d = w.shape[0] // 3
            for i, p in enumerate(("q_proj", "k_proj", "v_proj")):
                self.put(f"{our}/{p}/kernel", _lin(w[i * d:(i + 1) * d]))
            if f"{ref}.qkv.bias" in self.sd:
                bvec = self.take(f"{ref}.qkv.bias")
                for i, p in enumerate(("q_proj", "k_proj", "v_proj")):
                    self.put(f"{our}/{p}/bias", bvec[i * d:(i + 1) * d])
        else:
            has_bias = f"{ref}.q_proj.bias" in self.sd
            for p in ("q_proj", "k_proj", "v_proj"):
                self.dense(f"{our}/{p}", f"{ref}.{p}", bias=has_bias)
        self.dense(f"{our}/proj", f"{ref}.proj")

    def flash_block(self, our, ref):
        """reference FlashAttnBlock (module.py:534-583) -> ours."""
        self.put(f"{our}/gamma1", self.take(f"{ref}.gamma1"))
        self.put(f"{our}/gamma2", self.take(f"{ref}.gamma2"))
        self.attention(f"{our}/attn", f"{ref}.attn")
        self.ln(f"{our}/norm1", f"{ref}.norm1")
        self.ln(f"{our}/norm2", f"{ref}.norm2")
        self.dense(f"{our}/ffn/Dense_0", f"{ref}.ffn.linear1")
        self.dense(f"{our}/ffn/Dense_1", f"{ref}.ffn.linear2")


ENC_ORDER = ["conv00", "conv01", "downsample1", "conv10", "conv11",
             "downsample2", "conv20", "conv21", "downsample3", "conv30", "conv31"]
DEC_PAIRS = [("Conv_0", "out0.0"), ("BatchNorm_0", "out0.1"),
             ("Conv_1", "inner1"), ("Conv_2", "out1.0"), ("BatchNorm_1", "out1.1"),
             ("Conv_3", "inner2"), ("Conv_4", "out2.0"), ("BatchNorm_2", "out2.1"),
             ("Conv_5", "inner3"), ("Conv_6", "out3.0"), ("BatchNorm_3", "out3.1")]


def convert_full_state_dict(sd: dict, strict: bool = True):
    """Reference DINOv2MVSNet state dict -> (params tree, batch_stats tree).

    Mirrors /root/reference state_dict naming exactly; submodule presence is
    detected from the keys (so CasMVSNet-style partial checkpoints convert
    too). Returns nested flax trees.
    """
    # strip DDP prefix + PE caches (reference test.py:214-220)
    sd = {k[len("module."):] if k.startswith("module.") else k: v
          for k, v in sd.items() if "pe_dict" not in k}

    m = _Mapper(sd)

    # --- FPN encoder (models/module.py:208-239) -----------------------------
    for i, name in enumerate(ENC_ORDER):
        if f"encoder.{name}.conv.weight" in sd:
            m.conv_bn_block(f"encoder/ConvBlock_{i}", f"encoder.{name}")

    # --- FPN decoder (models/module.py:242-270) -----------------------------
    for our, ref in DEC_PAIRS:
        key = f"decoder.{ref}"
        if f"{key}.weight" not in sd:
            continue
        if our.startswith("Conv"):
            m.conv2d(f"decoder/{our}", key)
        else:
            m.bn(f"decoder/{our}", key)

    # --- DINOv2 ViT (tools/convert_dinov2) ----------------------------------
    vit_sd = {k[len("vit."):]: v for k, v in sd.items() if k.startswith("vit.")}
    vit_params = {}
    if vit_sd:
        depth = 1 + max(int(k.split(".")[1]) for k in vit_sd if k.startswith("blocks."))
        vit_params = unflatten(convert_vit_sd(vit_sd, depth=depth))
        m.used.update("vit." + k for k in vit_sd)

    # --- SVA CrossVITDecoder (models/module.py:273-364) ---------------------
    i = 0
    while f"decoder_vit.self_attn_blocks.{i}.norm1.weight" in sd:
        m.cross_block(f"decoder_vit/self_attn_{i}", f"decoder_vit.self_attn_blocks.{i}")
        i += 1
    i = 0
    while f"decoder_vit.cross_attn_blocks.{i}.norm1.weight" in sd:
        m.cross_block(f"decoder_vit/cross_attn_{i}", f"decoder_vit.cross_attn_blocks.{i}")
        i += 1
    i = 0
    while f"decoder_vit.norm_layers.{i}.weight" in sd:
        m.ln(f"decoder_vit/combine_norm_{i}", f"decoder_vit.norm_layers.{i}")
        i += 1
    i = 0
    while f"decoder_vit.prev_values.{i}" in sd:
        m.put(f"decoder_vit/prev_value_{i}", m.take(f"decoder_vit.prev_values.{i}"))
        i += 1
    if "decoder_vit.proj.0.weight" in sd:
        m.conv2d("decoder_vit/proj", "decoder_vit.proj.0")
        m.bn("decoder_vit/proj_bn", "decoder_vit.proj.1")
        m.deconv2d("decoder_vit/up0", "decoder_vit.upsampler0.0")
        m.bn("decoder_vit/up0_bn", "decoder_vit.upsampler0.1")
        m.deconv2d("decoder_vit/up1", "decoder_vit.upsampler1.0")
        m.bn("decoder_vit/up1_bn", "decoder_vit.upsampler1.1")

    # --- FMT + pathway (models/FMT.py) --------------------------------------
    i = 0
    while f"FMT_module.FMT.layers.{i}.norm1.weight" in sd:
        m.cross_block(f"fmt/fmt/layer{i}", f"FMT_module.FMT.layers.{i}")
        i += 1
    for n in (1, 2, 3):
        if f"FMT_module.dim_reduction_{n}.weight" in sd:
            m.conv2d(f"fmt/dim_reduction_{n}", f"FMT_module.dim_reduction_{n}", bias=False)
            m.conv2d(f"fmt/smooth_{n}", f"FMT_module.smooth_{n}", bias=False)

    # --- StageNets (models/cost_volume.py) ----------------------------------
    s = 0
    while f"fusions.{s}.vis.0.conv.weight" in sd:
        stage = f"cascade/stage{s + 1}"
        for j in range(3):
            m.conv_bn_block(f"{stage}/vis/ConvBnReLU_{j}", f"fusions.{s}.vis.{j}")
        m.conv2d(f"{stage}/vis/Conv_0", f"fusions.{s}.vis.3")

        reg = f"fusions.{s}.cost_reg"
        our = f"{stage}/cost_reg"
        if f"{reg}.attention_layers.0.gamma1" in sd:
            # PureTransformerCostReg (module.py:602-646)
            if f"{reg}.pe_proj.weight" in sd:
                m.conv3d(f"{our}/pe_proj", f"{reg}.pe_proj", bias=False)
            m.conv3d(f"{our}/down", f"{reg}.down.0")
            m.ln(f"{our}/down_norm", f"{reg}.down.1")
            j = 0
            while f"{reg}.attention_layers.{j}.gamma1" in sd:
                m.flash_block(f"{our}/block{j}", f"{reg}.attention_layers.{j}")
                j += 1
            m.deconv3d(f"{our}/up", f"{reg}.up.0")
            m.ln(f"{our}/up_norm", f"{reg}.up.1")
            m.conv3d(f"{our}/prob", f"{reg}.prob")
        elif f"{reg}.conv7.conv.weight" in sd:
            # CostRegNet: full-stride U-Net, Deconv3d wrappers, 3x3x3 prob
            # without bias (module.py:367-408)
            for our_i, ref_name in [(0, "conv2"), (1, "conv1"), (2, "conv4"),
                                    (3, "conv3"), (4, "conv6"), (5, "conv5")]:
                m.conv_bn_block(f"{our}/Conv3dBlock_{our_i}", f"{reg}.{ref_name}")
            for our_i, ref_name in [(0, "conv7"), (1, "conv9"), (2, "conv11")]:
                m.deconv_bn_block(f"{our}/Deconv3dBlock_{our_i}", f"{reg}.{ref_name}")
            if f"{reg}.inner.weight" in sd:
                m.conv3d(f"{our}/Conv_0", f"{reg}.inner")
                m.conv3d(f"{our}/Conv_1", f"{reg}.prob", bias=False)
            else:
                m.conv3d(f"{our}/Conv_0", f"{reg}.prob", bias=False)
        elif f"{reg}.conv7.0.weight" in sd:
            # CostRegNet3D: (H, W)-stride U-Net, Sequential deconvs, 1x1x1
            # prob with bias (module.py:453-504)
            for our_i, ref_name in [(0, "conv2"), (1, "conv1"), (2, "conv4"),
                                    (3, "conv3"), (4, "conv6"), (5, "conv5")]:
                m.conv_bn_block(f"{our}/Conv3dBlock_{our_i}", f"{reg}.{ref_name}")
            for our_i, ref_name in [(0, "conv7"), (1, "conv9"), (2, "conv11")]:
                m.put(f"{our}/Deconv3dBlock_{our_i}/ConvTranspose_0/kernel",
                      _deconv3d(m.take(f"{reg}.{ref_name}.0.weight")))
                m.bn(f"{our}/Deconv3dBlock_{our_i}/BatchNorm_0", f"{reg}.{ref_name}.1")
            if f"{reg}.inner.weight" in sd:
                m.conv3d(f"{our}/Conv_0", f"{reg}.inner")
                m.conv3d(f"{our}/Conv_1", f"{reg}.prob")
            else:
                m.conv3d(f"{our}/Conv_0", f"{reg}.prob")
        s += 1

    unused = sorted(set(sd) - m.used)
    if unused:
        msg = f"[convert_reference] {len(unused)} unmapped keys: {unused[:10]}"
        if strict:
            raise KeyError(msg)
        print(msg)

    params = unflatten(m.params)
    if vit_params:
        params["vit"] = vit_params
    stats = unflatten(m.stats)
    return params, stats


def merge_variables(variables: dict, params: dict, stats: dict,
                    strict: bool = True) -> dict:
    """Merge converted trees into model variables with shape checks."""

    def merge(dst, src, path=""):
        out = dict(dst)
        for k, v in src.items():
            if k not in dst:
                msg = f"[convert_reference] target missing {path}/{k}"
                if strict:
                    raise KeyError(msg)
                print(msg)
                continue
            if isinstance(v, dict):
                out[k] = merge(dst[k], v, f"{path}/{k}")
            else:
                if tuple(np.shape(dst[k])) != tuple(v.shape):
                    raise ValueError(
                        f"shape mismatch at {path}/{k}: "
                        f"{np.shape(dst[k])} vs {v.shape}")
                out[k] = v.astype(np.asarray(dst[k]).dtype)
        return out

    new = dict(variables)
    new["params"] = merge(variables["params"], params, "params")
    if stats:
        new["batch_stats"] = merge(variables.get("batch_stats", {}), stats,
                                   "batch_stats")
    return new


def load_reference_variables(variables: dict, pth_path, strict: bool = True) -> dict:
    """Load a reference .pth checkpoint into model variables."""
    import torch

    ckpt = torch.load(pth_path, map_location="cpu", weights_only=False)
    sd = ckpt.get("state_dict", ckpt) if isinstance(ckpt, dict) else ckpt
    sd = {k: v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)
          for k, v in sd.items()}
    params, stats = convert_full_state_dict(sd, strict=strict)
    return merge_variables(variables, params, stats, strict=strict)


def save_npz(params: dict, stats: dict, out_path):
    """Flatten converted trees into one npz (collection prefix in the key)."""
    flat = {}

    def walk(node, prefix, coll):
        for k, v in node.items():
            if isinstance(v, dict):
                walk(v, f"{prefix}/{k}", coll)
            else:
                flat[f"{coll}:{prefix}/{k}".replace(":/", ":")] = v

    walk(params, "", "params")
    walk(stats, "", "batch_stats")
    np.savez(out_path, **flat)


def load_npz_variables(variables: dict, npz_path, strict: bool = True) -> dict:
    data = np.load(npz_path)
    params_flat, stats_flat = {}, {}
    for k in data.files:
        coll, path = k.split(":", 1)
        (params_flat if coll == "params" else stats_flat)[path] = data[k]
    return merge_variables(variables, unflatten(params_flat),
                           unflatten(stats_flat), strict=strict)


def main():
    import torch

    src, dst = sys.argv[1], sys.argv[2]
    ckpt = torch.load(src, map_location="cpu", weights_only=False)
    sd = ckpt.get("state_dict", ckpt) if isinstance(ckpt, dict) else ckpt
    sd = {k: v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)
          for k, v in sd.items()}
    params, stats = convert_full_state_dict(sd)
    save_npz(params, stats, dst)
    n = sum(1 for _ in np.load(dst).files)
    print(f"wrote {n} arrays to {dst}")


if __name__ == "__main__":
    main()
