"""Tests for the space-to-depth stem re-lowering (models/fused_stem).

Oracle: the real InitHeadS4 module (models/layers.py:232, ref
model/segment.py:19-31) at inference with the same params and
randomized BN running stats — the fold must reproduce it to f32
rounding, and the full Segment with ``skip_stem=True`` fed the folded
stem output must match the end-to-end unfused forward.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from instancesegmentation_tpu.models.fused_stem import (
    fold_stem,
    space_to_depth,
    stem_apply,
)
from instancesegmentation_tpu.models.layers import InitHeadS4
from instancesegmentation_tpu.models.segment import Segment


class _StemOnly(nn.Module):
    dtype: object = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        return InitHeadS4(planes=16, name="init_conv", dtype=self.dtype)(x, train)


def _setup(c, h=64, w=96, seed=0):
    rng = np.random.default_rng(seed)
    model = _StemOnly()
    x = jnp.asarray(rng.normal(0, 1, (2, h, w, c)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(seed), x)
    # randomize BN running stats so the BN fold is actually exercised
    stats = jax.tree_util.tree_map(
        lambda a: a + jnp.asarray(rng.normal(0, 0.1, a.shape), a.dtype) + 0.2,
        variables["batch_stats"],
    )
    return model, {"params": variables["params"], "batch_stats": stats}, x


def test_space_to_depth_layout():
    x = jnp.arange(2 * 4 * 6 * 3, dtype=jnp.float32).reshape(2, 4, 6, 3)
    y = space_to_depth(x)
    assert y.shape == (2, 2, 3, 12)
    # channel = (ry*2 + rx)*C + c
    np.testing.assert_array_equal(y[0, 1, 2, 3 * 3 + 1], x[0, 2 * 1 + 1, 2 * 2 + 1, 1])
    np.testing.assert_array_equal(y[1, 0, 1, 0 * 3 + 2], x[1, 0, 2, 2])


@pytest.mark.parametrize("c", [3, 20])
def test_stem_fold_matches_init_head(c):
    model, variables, x = _setup(c)
    want = model.apply(variables, x, train=False)
    got = stem_apply(x, fold_stem(variables), dtype=jnp.float32)
    assert got.shape == want.shape == (2, 16, 24, c + 16)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_stem_fold_edge_padding_exact():
    """Edge blocks see the same zero padding as the original p=2 conv
    (impulse at the corner exercises the padded taps)."""
    model, variables, x = _setup(3, h=16, w=16)
    x = jnp.zeros_like(x).at[:, 0, 0, :].set(5.0).at[:, -1, -1, :].set(-3.0)
    want = model.apply(variables, x, train=False)
    got = stem_apply(x, fold_stem(variables), dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


@pytest.mark.parametrize("in_channels", [3, 20])
def test_segment_skip_stem_end_to_end(in_channels):
    rng = np.random.default_rng(1)
    model = Segment(in_channels=in_channels, dtype=jnp.float32)
    imgs = jnp.asarray(rng.normal(0, 1, (2, 64, 64, 3)), jnp.float32)
    hm = (
        jnp.asarray(rng.uniform(0, 1, (2, 64, 64, in_channels - 3)), jnp.float32)
        if in_channels > 3
        else None
    )
    variables = model.init(jax.random.PRNGKey(0), imgs, hm, train=False)
    want = model.apply(variables, imgs, hm, train=False)

    x = imgs if hm is None else jnp.concatenate([imgs, hm], axis=-1)
    init_down = stem_apply(x, fold_stem(variables), dtype=jnp.float32)
    got = model.apply(variables, init_down, train=False, skip_stem=True)
    assert got.shape == want.shape
    # ~3e-6 stem rounding amplifies through 30+ BN'd layers; logits are
    # O(30) here, so compare with a relative tolerance
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-3
    )


def test_skip_stem_channel_guard():
    model = Segment(in_channels=3, dtype=jnp.float32)
    imgs = jnp.zeros((1, 32, 32, 3))
    variables = model.init(jax.random.PRNGKey(0), imgs, train=False)
    with pytest.raises(AssertionError):
        model.apply(variables, jnp.zeros((1, 8, 8, 7)), train=False, skip_stem=True)
