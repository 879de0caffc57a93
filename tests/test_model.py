"""Model shape/param-count/export tests (SURVEY.md §4 strategy)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from instancesegmentation_tpu.models import Segment, fold_batchnorm
from instancesegmentation_tpu.models.segment import count_params


@pytest.fixture(scope="module")
def model3_vars():
    model = Segment(in_channels=3)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    return model, variables


def test_param_count_matches_reference(model3_vars):
    # 257,145 params at in_channels=3; 266,121 at 20 (SURVEY.md §2.6,
    # measured from the torch reference).
    _, variables = model3_vars
    assert count_params(variables["params"]) == 257_145

    model20 = Segment(in_channels=20)
    v20 = model20.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), jnp.zeros((1, 64, 64, 17))
    )
    assert count_params(v20["params"]) == 266_121


def test_output_shape_fully_convolutional(model3_vars):
    model, variables = model3_vars
    for size in (64, 96):
        x = jnp.zeros((2, size, size, 3))
        y = model.apply(variables, x, train=False)
        assert y.shape == (2, size, size, 1)
        assert y.dtype == jnp.float32


def test_train_mode_updates_batch_stats(model3_vars):
    model, variables = model3_vars
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 64, 3))
    y, updates = model.apply(
        variables, x, train=True, mutable=["batch_stats"]
    )
    assert y.shape == (2, 64, 64, 1)
    old = jax.tree_util.tree_leaves(variables["batch_stats"])
    new = jax.tree_util.tree_leaves(updates["batch_stats"])
    assert any(not np.allclose(a, b) for a, b in zip(old, new))


def test_heatmap_conditioning_changes_output():
    model = Segment(in_channels=20)
    img = jax.random.normal(jax.random.PRNGKey(2), (1, 64, 64, 3))
    hm0 = jnp.zeros((1, 64, 64, 17))
    hm1 = jnp.ones((1, 64, 64, 17))
    variables = model.init(jax.random.PRNGKey(0), img, hm0)
    y0 = model.apply(variables, img, hm0, train=False)
    y1 = model.apply(variables, img, hm1, train=False)
    assert not np.allclose(y0, y1)


def test_bfloat16_compute():
    model = Segment(in_channels=3, dtype=jnp.bfloat16)
    x = jnp.zeros((1, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    y = model.apply(variables, x, train=False)
    assert y.shape == (1, 64, 64, 1)
    assert y.dtype == jnp.float32  # logits are cast back to f32
    # params stay float32
    assert all(
        p.dtype == jnp.float32
        for p in jax.tree_util.tree_leaves(variables["params"])
    )


def test_fold_batchnorm_is_identity_at_inference(model3_vars):
    model, variables = model3_vars
    # give batch stats non-trivial values first
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 64, 64, 3))
    _, updates = model.apply(variables, x, train=True, mutable=["batch_stats"])
    variables = {"params": variables["params"], "batch_stats": updates["batch_stats"]}

    folded = fold_batchnorm(variables)
    y_ref = model.apply(variables, x, train=False)
    y_fold = model.apply(folded, x, train=False)
    np.testing.assert_allclose(
        np.asarray(y_ref), np.asarray(y_fold), atol=2e-3, rtol=1e-4
    )
    # folding actually rewrote conv kernels
    k0 = variables["params"]["bottle1_1"]["convs_0"]["conv"]["kernel"]
    k1 = folded["params"]["bottle1_1"]["convs_0"]["conv"]["kernel"]
    assert not np.allclose(k0, k1)


def test_gradients_flow(model3_vars):
    model, variables = model3_vars
    x = jax.random.normal(jax.random.PRNGKey(4), (1, 64, 64, 3))
    target = jnp.ones((1, 64, 64, 1))

    def loss_fn(params):
        logits, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            x, train=True, mutable=["batch_stats"],
        )
        import optax
        return optax.sigmoid_binary_cross_entropy(logits, target).mean()

    grads = jax.grad(loss_fn)(variables["params"])
    norms = [float(jnp.abs(g).max()) for g in jax.tree_util.tree_leaves(grads)]
    assert all(np.isfinite(n) for n in norms)
    assert max(norms) > 0
