"""Position-encoding goldens vs the reference formulas in torch."""
import math

import numpy as np
import torch

from mvsformerplusplus_tpu.ops.pe import position_encoding_3d, sine_pe_2d


def torch_sine_pe_norm(d_model, H, W, max_shape=(128, 128)):
    """Reference PositionEncodingSineNorm.reset_pe (position_encoding.py:61-74)."""
    pe = torch.zeros((d_model, H, W))
    y_position = torch.ones((H, W)).cumsum(0).float().unsqueeze(0) * max_shape[0] / H
    x_position = torch.ones((H, W)).cumsum(1).float().unsqueeze(0) * max_shape[1] / W
    div_term = torch.exp(
        torch.arange(0, d_model // 2, 2).float() * (-math.log(10000.0) / (d_model // 2)))
    div_term = div_term[:, None, None]
    pe[0::4] = torch.sin(x_position * div_term)
    pe[1::4] = torch.cos(x_position * div_term)
    pe[2::4] = torch.sin(y_position * div_term)
    pe[3::4] = torch.cos(y_position * div_term)
    return pe.numpy()


def torch_pe3d(position3d, C, rescale=4.0):
    """Reference PositionEncoding3D (position_encoding.py:164-189)."""
    p = torch.from_numpy(position3d)
    B, _, D, H, W = p.shape
    div = torch.exp(torch.arange(0, C, 2).float() * (-math.log(10000.0) / C))
    div = div[None, :, None]
    pes = []
    for axis in range(3):
        pe = torch.zeros((B, C, D * H * W))
        pos = p[:, axis].reshape(B, 1, D * H * W)
        pe[:, 0::2] = torch.sin(pos * rescale * div).reshape(B, -1, D * H * W)
        pe[:, 1::2] = torch.cos(pos * rescale * div).reshape(B, -1, D * H * W)
        pes.append(pe)
    return torch.cat(pes, dim=1).reshape(B, C * 3, D, H, W).numpy()


def test_sine_pe_2d_matches():
    got = np.asarray(sine_pe_2d(64, 12, 18))  # [H, W, C]
    ref = torch_sine_pe_norm(64, 12, 18)  # [C, H, W]
    np.testing.assert_allclose(got, np.moveaxis(ref, 0, -1), rtol=1e-5, atol=1e-5)


def test_position_encoding_3d_matches():
    rng = np.random.RandomState(0)
    pos = rng.rand(1, 3, 4, 5, 6).astype(np.float32)
    got = np.asarray(position_encoding_3d(pos, 8))  # [B, D, H, W, 3C]
    ref = torch_pe3d(pos, 8)  # [B, 3C, D, H, W]
    np.testing.assert_allclose(got, np.moveaxis(ref, 1, -1), rtol=1e-4, atol=1e-5)
