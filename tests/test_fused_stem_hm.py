"""models/fused_stem_hm: heatmap conditioning folded through the stem.

Exactness contract (module docstring): the dense heatmap stack implied
by the patches is BIT-exact vs ops/heatmap.render_heatmaps; the folded
stem output matches InitHeadS4 up to conv/BN reduction-order rounding
(f32-tight), and the end-to-end conditioned forward built on it matches
the unfused model.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from instancesegmentation_tpu.models.fused_stem_hm import (
    fold_stem_hm,
    render_heatmap_patches,
    stem_hm_apply,
)
from instancesegmentation_tpu.ops.heatmap import render_heatmaps


def _random_keypoints(rng, k=17, h=96, w=96):
    """Keypoints covering interior, border-clamped, off-image and
    invisible cases."""
    pts = rng.uniform(-30, max(h, w) + 30, size=(k, 2)).astype(np.float32)
    pts[0] = (2.0, 3.0)            # window clamps at 0
    pts[1] = (w - 2.0, h - 3.0)    # window clamps at w-1/h-1
    pts[2] = (w / 2, h / 2)        # clean interior
    pts[3] = (-40.0, 10.0)         # fully off-image (empty window)
    vis = rng.uniform(size=k) > 0.3
    vis[2] = True
    vis[4] = False                 # invisible with in-image coords
    return jnp.asarray(pts), jnp.asarray(vis)


def _patches_to_dense(patches, x0, y0, out_hw):
    h, w = out_hw
    p = patches.shape[0]
    dense = np.zeros((h, w, patches.shape[-1]), np.float32)
    patches = np.asarray(patches)
    for k in range(patches.shape[-1]):
        ox, oy = int(x0[k]), int(y0[k])
        dense[oy:oy + p, ox:ox + p, k] = patches[:, :, k]
    return dense


@pytest.mark.parametrize("hw", [(96, 96), (64, 128), (48, 48)])
def test_patches_reconstruct_dense_bit_exact(hw):
    rng = np.random.default_rng(0)
    pts, vis = _random_keypoints(rng, h=hw[0], w=hw[1])
    dense = np.asarray(jax.jit(
        lambda p, v: render_heatmaps(p, v, hw)
    )(pts, vis))
    patches, x0, y0 = jax.jit(
        lambda p, v: render_heatmap_patches(p, v, hw)
    )(pts, vis)
    rebuilt = _patches_to_dense(patches, np.asarray(x0), np.asarray(y0), hw)
    np.testing.assert_array_equal(rebuilt, dense)


def test_mm_placement_matches_dus_oracle():
    """The MXU one-hot placement (production path) equals the naive
    vmapped dynamic_update_slice scatter on both planes."""
    from instancesegmentation_tpu.models.fused_stem_hm import (
        _accumulate_conv_patches,
        _pooled_hm_planes,
    )

    rng = np.random.default_rng(0)
    out, b, k, p = 96, 3, 17, 48
    op = p // 2 + 2
    deltas = jnp.asarray(rng.normal(size=(b, k, op, op, 16)).astype(np.float32))
    patches = jnp.asarray(rng.uniform(0, 1, size=(b, p, p, k)).astype(np.float32))
    offs = (rng.integers(0, (out - p) // 4 + 1, size=(b, k, 2)) * 4).astype(np.int32)
    x0, y0 = jnp.asarray(offs[..., 0]), jnp.asarray(offs[..., 1])

    acc_dus = _accumulate_conv_patches(deltas, x0, y0, (out, out), jnp.float32, impl="dus")
    acc_mm = _accumulate_conv_patches(deltas, x0, y0, (out, out), jnp.float32, impl="mm")
    np.testing.assert_allclose(np.asarray(acc_dus), np.asarray(acc_mm), atol=1e-4)

    pl_dus = _pooled_hm_planes(patches, x0, y0, (out, out), jnp.float32, impl="dus")
    pl_mm = _pooled_hm_planes(patches, x0, y0, (out, out), jnp.float32, impl="mm")
    np.testing.assert_array_equal(np.asarray(pl_dus), np.asarray(pl_mm))


def _conditioned_model_and_batch(dtype, h=96, w=96, n=3, seed=0):
    from instancesegmentation_tpu.models.segment import Segment

    rng = np.random.default_rng(seed)
    model = Segment(in_channels=20, dtype=dtype)
    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0),
        jnp.zeros((1, h, w, 3)),
        jnp.zeros((1, h, w, 17)),
        train=False,
    )
    variables = jax.tree_util.tree_map(np.asarray, variables)
    # non-trivial BN running stats so the fold is actually exercised
    stats = variables["batch_stats"]
    leaves, treedef = jax.tree_util.tree_flatten(stats)
    stats = jax.tree_util.tree_unflatten(
        treedef,
        [
            l + rng.normal(0, 0.2, l.shape).astype(np.float32) ** 2
            for l in leaves
        ],
    )
    variables = {"params": variables["params"], "batch_stats": stats}

    images = jnp.asarray(
        rng.uniform(-1, 1, size=(n, h, w, 3)).astype(np.float32)
    )
    pts = jnp.stack(
        [_random_keypoints(rng, h=h, w=w)[0] for _ in range(n)]
    )
    vis = jnp.stack(
        [_random_keypoints(rng, h=h, w=w, k=17)[1] for _ in range(n)]
    )
    hm = jax.vmap(lambda p, v: render_heatmaps(p, v, (h, w)))(pts, vis)
    return model, variables, images, pts, vis, hm


@pytest.mark.parametrize("conv_impl", ["gconv", "dot"])
def test_folded_stem_matches_init_head_f32(conv_impl):
    from instancesegmentation_tpu.models.layers import InitHeadS4

    model, variables, images, pts, vis, hm = _conditioned_model_and_batch(
        jnp.float32
    )
    ref = InitHeadS4(planes=16, dtype=jnp.float32).apply(
        {
            "params": variables["params"]["init_conv"],
            "batch_stats": variables["batch_stats"]["init_conv"],
        },
        jnp.concatenate([images, hm], axis=-1),
        False,
    )
    stem = fold_stem_hm(variables)
    got = jax.jit(
        lambda im, p, v: stem_hm_apply(
            im, p, v, stem, dtype=jnp.float32, conv_impl=conv_impl
        )
    )(images, pts, vis)
    assert got.shape == ref.shape
    # pooled RGB + pooled heatmap channels are bit-exact (no arithmetic
    # reassociation); conv channels differ only by reduction order
    np.testing.assert_array_equal(np.asarray(got[..., :20]), np.asarray(ref[..., :20]))
    np.testing.assert_allclose(
        np.asarray(got[..., 20:]), np.asarray(ref[..., 20:]), atol=2e-5
    )


def test_end_to_end_conditioned_forward_f32():
    model, variables, images, pts, vis, hm = _conditioned_model_and_batch(
        jnp.float32
    )
    ref = model.apply(variables, images, hm, train=False)
    stem = fold_stem_hm(variables)

    @jax.jit
    def folded(im, p, v):
        feats = stem_hm_apply(im, p, v, stem, dtype=jnp.float32)
        return model.apply(variables, feats, train=False, skip_stem=True)

    got = folded(images, pts, vis)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-4)


def test_end_to_end_conditioned_forward_bf16():
    """In bf16 the folded and unfused paths are two different rounding
    walks; the correctness criterion is that the folded path is no
    further from the f32 oracle than the unfused bf16 path (measured:
    mean |err| 0.0995 vs 0.0916 on this fixture), and thresholded masks
    agree at serving level."""
    from instancesegmentation_tpu.models.segment import Segment

    model, variables, images, pts, vis, hm = _conditioned_model_and_batch(
        jnp.bfloat16
    )
    oracle = np.asarray(
        Segment(in_channels=20, dtype=jnp.float32).apply(
            variables, images, hm, train=False
        )
    )
    ref_bf = np.asarray(
        model.apply(
            variables,
            images.astype(jnp.bfloat16),
            hm.astype(jnp.bfloat16),
            train=False,
        )
    )
    stem = fold_stem_hm(variables)

    @jax.jit
    def folded(im, p, v):
        feats = stem_hm_apply(im, p, v, stem, dtype=jnp.bfloat16)
        return model.apply(variables, feats, train=False, skip_stem=True)

    got = np.asarray(folded(images, pts, vis))
    err_folded = np.abs(got - oracle).mean()
    err_unfused = np.abs(ref_bf - oracle).mean()
    assert err_folded <= 1.25 * err_unfused + 1e-3, (
        f"folded bf16 drift {err_folded} vs unfused {err_unfused}"
    )
    agree = ((got > 0.0) == (ref_bf > 0.0)).mean()
    assert agree > 0.98
