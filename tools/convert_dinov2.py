#!/usr/bin/env python
"""Convert DINOv2 torch pretrained weights -> flax params for
models/dino.DinoVisionTransformer.

Usage: python tools/convert_dinov2.py dinov2_vitb14_pretrain.pth out.npz
The .npz stores flat params under 'path/to/param' keys; load with
`load_dino_params` and merge into the model's variables.
"""
from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def convert_state_dict(sd: dict, depth: int = 12) -> dict:
    """torch DINOv2 state dict (possibly {'model': ...}-wrapped) -> flat
    flax param dict {'vit_path/param': np.ndarray}."""
    if "model" in sd and isinstance(sd["model"], dict):
        sd = sd["model"]
    sd = {k: np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)
          for k, v in sd.items()}

    out = {}

    def put(path, arr):
        out[path] = np.asarray(arr)

    put("patch_embed/kernel", sd["patch_embed.proj.weight"].transpose(2, 3, 1, 0))
    put("patch_embed/bias", sd["patch_embed.proj.bias"])
    put("cls_token", sd["cls_token"])
    put("pos_embed", sd["pos_embed"])
    put("norm/scale", sd["norm.weight"])
    put("norm/bias", sd["norm.bias"])

    for i in range(depth):
        p = f"blocks.{i}."
        q = f"blocks_{i}/"
        put(q + "norm1/scale", sd[p + "norm1.weight"])
        put(q + "norm1/bias", sd[p + "norm1.bias"])
        put(q + "norm2/scale", sd[p + "norm2.weight"])
        put(q + "norm2/bias", sd[p + "norm2.bias"])
        put(q + "attn/qkv/kernel", sd[p + "attn.qkv.weight"].T)
        put(q + "attn/qkv/bias", sd[p + "attn.qkv.bias"])
        put(q + "attn/proj/kernel", sd[p + "attn.proj.weight"].T)
        put(q + "attn/proj/bias", sd[p + "attn.proj.bias"])
        put(q + "ls1_gamma", sd[p + "ls1.gamma"])
        put(q + "ls2_gamma", sd[p + "ls2.gamma"])
        put(q + "mlp_fc1/kernel", sd[p + "mlp.fc1.weight"].T)
        put(q + "mlp_fc1/bias", sd[p + "mlp.fc1.bias"])
        put(q + "mlp_fc2/kernel", sd[p + "mlp.fc2.weight"].T)
        put(q + "mlp_fc2/bias", sd[p + "mlp.fc2.bias"])
    return out


def unflatten(flat: dict) -> dict:
    tree: dict = {}
    for k, v in flat.items():
        node = tree
        parts = k.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return tree


def load_dino_params(npz_path) -> dict:
    """.npz -> nested flax param tree for the 'vit' submodule."""
    data = np.load(npz_path)
    return unflatten({k: data[k] for k in data.files})


def load_vit_tree(path) -> dict:
    """Pretrained DINOv2 weights -> nested flax tree, whatever the format:
    the converted flax .npz (this tool's output) or the original torch .pth
    (converted on the fly). The ONE loader every production call site uses
    (train.py, test.py, tools/dino_match.py)."""
    if str(path).endswith(".npz"):
        return load_dino_params(path)
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    return unflatten(convert_state_dict(sd))


def merge_vit_params(variables: dict, vit_tree: dict, prefix: str = "vit") -> dict:
    """Replace variables['params'][prefix] with converted weights (shape-
    checked). Non-strict like the reference loader (utils.py:370-397)."""
    import jax

    params = dict(variables["params"])
    target = params.get(prefix, {})

    def merge(dst, src, path=""):
        out = dict(dst)
        for k, v in src.items():
            if k not in dst:
                print(f"[convert_dinov2] skipping missing key {path}/{k}")
                continue
            if isinstance(v, dict):
                out[k] = merge(dst[k], v, f"{path}/{k}")
            else:
                if tuple(dst[k].shape) != tuple(v.shape):
                    raise ValueError(
                        f"shape mismatch at {path}/{k}: {dst[k].shape} vs {v.shape}")
                out[k] = v.astype(np.asarray(dst[k]).dtype)
        return out

    params[prefix] = merge(target, vit_tree)
    return {**variables, "params": params}


def main():
    import torch

    src, dst = sys.argv[1], sys.argv[2]
    sd = torch.load(src, map_location="cpu")
    flat = convert_state_dict(sd)
    np.savez(dst, **flat)
    print(f"wrote {len(flat)} arrays to {dst}")


if __name__ == "__main__":
    main()
