"""DINOv2 dense matcher (tools/dino_match.py) — machinery tests.

A randomly initialized ViT still maps identical image patches to identical
tokens, so matching an image against a shifted copy of itself must recover
the shift — this validates the MNN selection, ratio gate, soft-argmax
refinement, and pixel-coordinate scaling without pretrained weights (the
feature QUALITY on real scenes comes from the converted DINOv2 weights,
proven separately in tests/test_dino_parity.py).
"""
import numpy as np
import pytest

jax = pytest.importorskip("jax")
cv2 = pytest.importorskip("cv2")

from tools.dino_match import make_dino_matcher  # noqa: E402


@pytest.fixture(scope="module")
def matcher():
    import jax.numpy as jnp

    from mvsformerplusplus_tpu.models.dino import DinoVisionTransformer

    h, w = 154, 210  # 11 x 15 patches — tiny working res for CPU speed
    vit = DinoVisionTransformer(dtype=jnp.float32)
    params = vit.init(jax.random.PRNGKey(0),
                      jnp.zeros((1, h, w, 3)))["params"]
    return make_dino_matcher(long_side=max(h, w), params=params), (h, w)


def _textured(rng, h, w):
    """Blocky random texture: piecewise-constant 14-px cells so each patch
    is distinctive and shift-invariant content-wise."""
    cells = rng.randint(0, 255, (h // 14, w // 14, 3), np.uint8)
    return np.kron(cells, np.ones((14, 14, 1), np.uint8))


def test_self_matching_identity(matcher):
    # patch-level accuracy: ViT attention mixes neighbouring patches, so the
    # soft-argmax refinement jitters within a patch (±14/2 px) — ample for
    # nerf2mvsnet's depth-range triangulation; the mutual+ratio gate drops
    # ambiguous tokens, so coverage is partial by design
    match_fn, (h, w) = matcher
    img = _textured(np.random.RandomState(0), h, w)
    pa, pb = match_fn(img, img)
    assert len(pa) >= 0.25 * (h // 14) * (w // 14)
    dev = np.abs(pa - pb).max(1)
    assert np.mean(dev < 7.5) > 0.8, f"median dev {np.median(dev):.1f}px"


def test_shift_recovered(matcher):
    match_fn, (h, w) = matcher
    img = _textured(np.random.RandomState(1), h, w)
    shifted = np.roll(img, 28, axis=1)  # 2 patches right, wraps at the edge
    pa, pb = match_fn(img, shifted)
    assert len(pa) >= 20
    dx = pb[:, 0] - pa[:, 0]
    # the wrapped column pairs mismatch; the bulk must see dx == +28
    frac = np.mean(np.abs(dx - 28) < 7.5)
    assert frac > 0.7, f"only {frac:.0%} of matches recover the shift"
    dy = pb[:, 1] - pa[:, 1]
    assert np.mean(np.abs(dy) < 7.5) > 0.7
