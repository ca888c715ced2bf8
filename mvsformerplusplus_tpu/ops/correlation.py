"""Group-wise correlation + entropy-based view weighting for cost volumes.

The per-source-view pipeline (reference models/cost_volume.py:64-101):
  warp src features over D hypotheses -> group-wise correlation with ref ->
  per-view visibility weight from the correlation entropy -> weighted sum
  over views, normalized by the weight sum.

TPU-first notes:
- channel-last [B, D, H, W, C]; the grouped inner product is a reshape +
  mean over the C//G sub-axis — XLA fuses it with the warp gather's output.
- the accumulate-over-views sum is the distribution point for source-view
  partitioning: under shard_map with views on the `cv` mesh axis the two
  running sums (volume_sum, vis_sum) become psum's over ICI
  (parallel/cost_volume.py).
- everything fp32 (reference autocast(enabled=False) island).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def groupwise_correlation(warped: Array, ref_feat: Array, groups: int) -> Array:
    """Grouped inner product between warped src and ref features.

    Args:
      warped: [B, D, H, W, C] fp32 warped source features.
      ref_feat: [B, H, W, C] reference features.
      groups: number of correlation groups G (G == C -> elementwise product,
        reference models/cost_volume.py:79-87).

    Returns: [B, D, H, W, G] fp32.
    """
    b, d, h, w, c = warped.shape
    assert c % groups == 0, f"C={c} not divisible by G={groups}"
    ref = ref_feat.astype(jnp.float32)
    warped = warped.astype(jnp.float32)
    if groups == c:
        return warped * ref[:, None]
    sub = c // groups
    wg = warped.reshape(b, d, h, w, groups, sub)
    rg = ref.reshape(b, 1, h, w, groups, sub)
    return jnp.mean(wg * rg, axis=-1)


def correlation_entropy(corr: Array) -> Array:
    """Per-pixel entropy of the depth-softmax of the summed correlation.

    corr: [B, D, H, W, G] -> entropy [B, H, W, 1], gradients stopped
    (reference models/cost_volume.py:89-93 detaches the softmax input).
    """
    sim = jnp.sum(corr, axis=-1)  # [B, D, H, W]
    sim = jax.lax.stop_gradient(sim)
    p = jax.nn.softmax(sim, axis=1)
    ent = -jnp.sum(p * jnp.log(p + 1e-7), axis=1)  # [B, H, W]
    return ent[..., None]


def accumulate_weighted_volume(volumes_and_weights):
    """Reduce [(corr [B,D,H,W,G], vis [B,H,W,1]), ...] over views.

    Returns volume_mean [B, D, H, W, G] = Σ corr·vis / (Σ vis + 1e-6)
    (reference models/cost_volume.py:97-101).
    """
    volume_sum = 0.0
    vis_sum = 0.0
    for corr, vis in volumes_and_weights:
        volume_sum = volume_sum + corr * vis[:, None]
        vis_sum = vis_sum + vis
    return volume_sum / (vis_sum[:, None] + 1e-6)
