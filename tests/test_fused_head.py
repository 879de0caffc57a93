"""Tests for the algebraically folded output head (models/fused_head).

Oracle: the real bottle6_1/bottle6_2 modules (ConvTranspose + RawConv,
models/segment.py:122-124) with the same params.  The fold claims
f32 exactness INCLUDING the border ring — asserted bit-tight here.
"""
import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from instancesegmentation_tpu.models.fused_head import fold_head, head_apply
from instancesegmentation_tpu.models.layers import ConvTranspose, RawConv


class _Head(nn.Module):
    """Section 6 of Segment verbatim (models/segment.py:122-124)."""

    @nn.compact
    def __call__(self, x):
        y = ConvTranspose(4, 8, stride=4, padding=2, name="bottle6_1")(x)
        return RawConv(1, 3, padding=1, name="bottle6_2")(y)


def _setup(h, w, seed=0):
    rng = np.random.default_rng(seed)
    model = _Head()
    x = jnp.asarray(rng.normal(0, 1, (2, h, w, 16)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(seed), x)
    return model, variables, x


def test_head_fold_exact_f32():
    model, variables, x = _setup(16, 16)
    want = model.apply(variables, x)
    folded = fold_head(variables["params"])
    got = head_apply(x, folded)
    assert got.shape == want.shape == (2, 64, 64, 1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


def test_head_fold_border_ring_exact():
    """The 1-px output ring is where zero-pad semantics diverge — check
    it specifically, against a rectangular (non-square) input."""
    model, variables, x = _setup(12, 20, seed=1)
    want = np.asarray(model.apply(variables, x))
    got = np.asarray(head_apply(x, fold_head(variables["params"])))
    for region in (
        (slice(None), slice(0, 1)), (slice(None), slice(-1, None)),
        (slice(None), slice(None), slice(0, 1)),
        (slice(None), slice(None), slice(-1, None)),
    ):
        np.testing.assert_allclose(got[region], want[region], atol=1e-4)


def test_fused_apply_matches_full_segment():
    """End-to-end: Segment with truncate_head + folded head == the
    standard full forward (f32)."""
    from instancesegmentation_tpu.models.fused_head import fused_apply
    from instancesegmentation_tpu.models.segment import Segment

    rng = np.random.default_rng(5)
    model = Segment(in_channels=3, dtype=jnp.float32)
    x = jnp.asarray(rng.normal(0, 0.5, (2, 64, 64, 3)), jnp.float32)
    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(5), x, train=False
    )
    want = model.apply(variables, x, train=False)
    head = fold_head(variables["params"])
    got = fused_apply(model, variables, head, x)
    assert got.shape == want.shape and got.dtype == want.dtype
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4)


def test_head_fold_bf16_serving():
    model, variables, x = _setup(16, 16, seed=2)
    want = model.apply(
        {"params": jax.tree_util.tree_map(lambda v: v, variables["params"])}, x
    )
    folded = fold_head(variables["params"])
    got = head_apply(x.astype(jnp.bfloat16), folded, dtype=jnp.bfloat16)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want), atol=0.15, rtol=0.1
    )
