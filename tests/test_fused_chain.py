"""Equivalence tests for the fused bottleneck-chain Pallas kernel.

Oracle: the actual flax layer modules (the same code the standard
inference path runs), applied span-wise with the same (unfolded)
variables.  The kernel consumes BN-folded weights, so agreement also
re-validates models/export.fold_batchnorm end-to-end.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from instancesegmentation_tpu.models.export import fold_batchnorm
from instancesegmentation_tpu.models.layers import (
    Bottleneck3x3,
    Bottleneck5x5,
    BottleneckDimRes,
)
from instancesegmentation_tpu.ops.fused_chain import (
    ChainSpec,
    extract_bottleneck3x3,
    extract_s1_chain,
    extract_s23_chain,
    fused_chain,
)


class _S23Span(nn.Module):
    """Sections 2+3 of Segment after bottle2_1 (models/segment.py:91-106)."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = Bottleneck3x3(48, name="bottle2_x_0")(x, train)
        y = Bottleneck3x3(48, dilation=2, name="bottle2_x_1")(y, train)
        y = Bottleneck3x3(48, name="bottle2_x_2")(y, train)
        y = Bottleneck3x3(48, dilation=4, name="bottle2_x_3")(y, train)
        b2_8 = Bottleneck5x5(48, name="bottle2_x_4")(y, train)
        cat2 = jnp.concatenate([b2_8, x], axis=-1)
        y = BottleneckDimRes(48, 128, use_prelu=True, name="bottle3_1")(cat2, train)
        y = Bottleneck3x3(48, name="bottle3_x_0")(y, train)
        y = Bottleneck3x3(48, dilation=2, name="bottle3_x_1")(y, train)
        y = Bottleneck3x3(48, name="bottle3_x_2")(y, train)
        y = Bottleneck3x3(48, dilation=4, name="bottle3_x_3")(y, train)
        return Bottleneck5x5(48, name="bottle3_x_4")(y, train)


class _S1Span(nn.Module):
    """Section 1 body after bottle1_1 (models/segment.py:85-87)."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i in range(4):
            x = Bottleneck3x3(16, name=f"bottle1_x_{i}")(x, train)
        return x


def _randomize_stats(variables, rng):
    """Give BNs non-trivial running stats so folding is load-bearing."""

    def f(path, v):
        name = "/".join(str(p.key) for p in path)
        if name.endswith("mean"):
            return jnp.asarray(rng.normal(0, 0.3, v.shape), jnp.float32)
        if name.endswith("var"):
            return jnp.asarray(rng.uniform(0.5, 2.0, v.shape), jnp.float32)
        return v

    return jax.tree_util.tree_map_with_path(f, variables)


@pytest.mark.parametrize("n,h,w,block_batch", [(2, 8, 8, 1), (3, 8, 8, 2)])
def test_s23_chain_matches_flax_span(n, h, w, block_batch):
    rng = np.random.default_rng(0)
    model = _S23Span()
    x = jnp.asarray(rng.normal(0, 1, (n, h, w, 128)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    variables = _randomize_stats(variables, rng)

    want = model.apply(variables, x, train=False)
    folded = fold_batchnorm(variables)
    spec = extract_s23_chain(folded["params"], h, w)
    got = fused_chain(x, spec, block_batch=block_batch, interpret=True)

    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4)


def test_s1_chain_matches_flax_span():
    rng = np.random.default_rng(1)
    model = _S1Span()
    x = jnp.asarray(rng.normal(0, 1, (2, 8, 8, 48)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(1), x)
    variables = _randomize_stats(variables, rng)

    want = model.apply(variables, x, train=False)
    folded = fold_batchnorm(variables)
    spec = extract_s1_chain(folded["params"], 8, 8)
    got = fused_chain(x, spec, block_batch=2, interpret=True)

    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4)


def test_single_block_dilation_edge_masks():
    """Dilation-4 taps at an 8x8 tile reach across the whole image —
    every tap is edge-clipped somewhere; catches mask/shift sign errors."""
    rng = np.random.default_rng(2)
    model = Bottleneck3x3(16, dilation=4)
    x = jnp.asarray(rng.normal(0, 1, (2, 8, 8, 48)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(2), x)
    variables = _randomize_stats(variables, rng)

    want = model.apply(variables, x, train=False)
    folded = fold_batchnorm(variables)
    ops = extract_bottleneck3x3(folded["params"], dilation=4)
    spec = ChainSpec(h=8, w=8, c_in=48, c_out=48, ops=ops)
    # block_batch=2 also exercises cross-image contamination masking
    got = fused_chain(x, spec, block_batch=2, interpret=True)

    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4)


def test_bf16_io_roundtrip():
    """Serving dtype: bf16 in/out, f32 inside the kernel."""
    rng = np.random.default_rng(3)
    model = _S1Span()
    x32 = jnp.asarray(rng.normal(0, 1, (1, 8, 8, 48)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(3), x32)

    want = model.apply(variables, x32, train=False)
    folded = fold_batchnorm(variables)
    spec = extract_s1_chain(folded["params"], 8, 8)
    got = fused_chain(x32.astype(jnp.bfloat16), spec, interpret=True)

    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want), atol=0.1, rtol=0.1
    )
