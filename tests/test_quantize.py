"""PTQ int8 serving path (models/quantize.py + layers._Int8Conv).

Contract: float checkpoints stay canonical (identical param tree);
calibrate mode is numerically the float path plus scale recording; the
int8 forward tracks the float forward closely enough that thresholded
masks agree.
"""
import jax
import jax.numpy as jnp
import numpy as np

from instancesegmentation_tpu.models.quantize import calibrate
from instancesegmentation_tpu.models.segment import Segment


def _tree_shapes(t):
    return jax.tree_util.tree_map(lambda a: tuple(a.shape), t)


def _model_and_inputs(quant_mode, in_channels=3, n=2, hw=64, seed=0):
    rng = np.random.default_rng(seed)
    model = Segment(
        in_channels=in_channels, dtype=jnp.float32, quant_mode=quant_mode
    )
    images = jnp.asarray(
        rng.uniform(-1, 1, size=(n, hw, hw, 3)).astype(np.float32)
    )
    hm = (
        jnp.asarray(
            rng.uniform(0, 1, size=(n, hw, hw, in_channels - 3)).astype(
                np.float32
            )
        )
        if in_channels > 3
        else None
    )
    return model, images, hm


def test_param_tree_bijection_with_float():
    """quant_mode='int8' allocates the SAME params/batch_stats as the
    float model (plus only the separate 'quant' collection), so float
    checkpoints load unchanged."""
    mf, images, _ = _model_and_inputs("off")
    mq, _, _ = _model_and_inputs("int8")
    vf = mf.init(jax.random.PRNGKey(0), images)
    vq = mq.init(jax.random.PRNGKey(0), images)
    assert _tree_shapes(vf["params"]) == _tree_shapes(vq["params"])
    assert _tree_shapes(vf["batch_stats"]) == _tree_shapes(vq["batch_stats"])
    assert "quant" in vq and "quant" not in vf
    # every quantized conv records exactly one scalar amax
    for leaf in jax.tree_util.tree_leaves(vq["quant"]):
        assert leaf.shape == ()


def test_calibrate_mode_is_float_math():
    mf, images, _ = _model_and_inputs("off")
    mc, _, _ = _model_and_inputs("calibrate")
    variables = mf.init(jax.random.PRNGKey(0), images)
    ref = mf.apply(variables, images, train=False)
    got, mut = mc.apply(variables, images, train=False, mutable=["quant"])
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=1e-6, atol=1e-6
    )
    # scales were recorded and are positive
    amaxes = jax.tree_util.tree_leaves(mut["quant"])
    assert len(amaxes) > 20
    assert all(float(a) > 0 for a in amaxes)


def test_calibrate_running_max_across_batches():
    mf, images, _ = _model_and_inputs("off")
    mc, _, _ = _model_and_inputs("calibrate")
    variables = mf.init(jax.random.PRNGKey(0), images)
    small = images * 0.1
    q_small_then_big = calibrate(mc, variables, [small, images])
    q_big_only = calibrate(mc, variables, [images])
    a = jax.tree_util.tree_leaves(q_small_then_big)
    b = jax.tree_util.tree_leaves(q_big_only)
    for x, y in zip(a, b):
        np.testing.assert_allclose(x, y)  # max dominated by the big batch


def test_quantized_engine_serves_agreeing_masks():
    """InferenceEngine(quant=...) runs the int8 backbone + float folded
    head and serves masks that agree with the float engine."""
    from instancesegmentation_tpu.infer.pipeline import InferenceEngine

    rng = np.random.default_rng(1)
    size = 64
    mf = Segment(in_channels=3, dtype=jnp.float32)
    variables = mf.init(jax.random.PRNGKey(0), jnp.zeros((1, size, size, 3)))
    images = [
        rng.integers(0, 255, size=(80, 96, 3), dtype=np.uint8)
        for _ in range(2)
    ]
    mc = Segment(in_channels=3, dtype=jnp.float32, quant_mode="calibrate")
    cal = jnp.asarray(
        np.stack([i[:64, :64] for i in images]).astype(np.float32)
    ) / 127.5 - 1.0
    qvars = calibrate(mc, variables, [cal])

    ef = InferenceEngine(variables, in_channels=3, size=size, dtype=jnp.float32)
    eq = InferenceEngine(
        variables, in_channels=3, size=size, dtype=jnp.float32, quant=qvars
    )
    mf_masks = ef.predict_images(images)
    mq_masks = eq.predict_images(images)
    for a, b in zip(mf_masks, mq_masks):
        assert a.shape == b.shape
        assert (a == b).mean() > 0.9, (a == b).mean()


def test_int8_forward_tracks_float(in_channels=20):
    mf, images, hm = _model_and_inputs("off", in_channels=in_channels)
    mc, _, _ = _model_and_inputs("calibrate", in_channels=in_channels)
    mq, _, _ = _model_and_inputs("int8", in_channels=in_channels)
    variables = mf.init(jax.random.PRNGKey(0), images, hm)
    qvars = calibrate(mc, variables, [(images, hm)] if hm is not None else [images])

    ref = np.asarray(mf.apply(variables, images, hm, train=False))
    got = np.asarray(
        mq.apply({**variables, "quant": qvars}, images, hm, train=False)
    )
    # int8 is a lossy approximation: require tight tracking relative to
    # the logit spread, and near-perfect mask agreement on CONFIDENT
    # pixels (a random-init model's logits pile up at 0, where sign
    # agreement is dominated by sub-quantization-step noise; serving
    # quality on a trained checkpoint is measured by
    # tools/quant_experiment.py instead)
    err = np.abs(got - ref).mean()
    spread = ref.std() + 1e-6
    assert err / spread < 0.12, (err, spread)
    confident = np.abs(ref) > 0.2 * spread
    assert confident.mean() > 0.3  # the metric must not be vacuous
    agree = ((got > 0) == (ref > 0))[confident].mean()
    assert agree > 0.99, agree


def test_int8_mxu_selective_mode(in_channels=20):
    """int8_mxu quantizes only the spatial non-grouped convs (the chip
    probe's winners); the shared calibration serves it (extra amax
    entries for the float-kept convs are ignored), and it tracks the
    float model at least as tightly as full int8."""
    mf, images, hm = _model_and_inputs("off", in_channels=in_channels)
    mc, _, _ = _model_and_inputs("calibrate", in_channels=in_channels)
    mq, _, _ = _model_and_inputs("int8", in_channels=in_channels)
    mx, _, _ = _model_and_inputs("int8_mxu", in_channels=in_channels)
    variables = mf.init(jax.random.PRNGKey(0), images, hm)
    qvars = calibrate(mc, variables, [(images, hm)])

    # selective mode allocates strictly fewer quant variables than full
    # int8 (the 1x1/depthwise convs stay float)
    vx = mx.init(jax.random.PRNGKey(0), images, hm)
    vq = mq.init(jax.random.PRNGKey(0), images, hm)
    n_x = len(jax.tree_util.tree_leaves(vx["quant"]))
    n_q = len(jax.tree_util.tree_leaves(vq["quant"]))
    assert 0 < n_x < n_q, (n_x, n_q)
    # param tree still bijective with the float checkpoint
    assert _tree_shapes(variables["params"]) == _tree_shapes(vx["params"])

    ref = np.asarray(mf.apply(variables, images, hm, train=False))
    full = np.asarray(
        mq.apply({**variables, "quant": qvars}, images, hm, train=False)
    )
    sel = np.asarray(
        mx.apply({**variables, "quant": qvars}, images, hm, train=False)
    )
    spread = ref.std() + 1e-6
    err_full = np.abs(full - ref).mean() / spread
    err_sel = np.abs(sel - ref).mean() / spread
    # fewer quantized convs => no more error than the full path (small
    # slack for noise)
    assert err_sel < err_full * 1.1 + 1e-3, (err_sel, err_full)
    assert err_sel < 0.12, err_sel


def test_engine_quant_mode_mxu():
    """InferenceEngine(quant=..., quant_mode='int8_mxu') builds and
    serves masks agreeing with float (default quant_mode path)."""
    from instancesegmentation_tpu.infer.pipeline import InferenceEngine

    rng = np.random.default_rng(3)
    size = 64
    mf = Segment(in_channels=3, dtype=jnp.float32)
    variables = mf.init(jax.random.PRNGKey(0), jnp.zeros((1, size, size, 3)))
    images = [
        rng.integers(0, 255, size=(72, 88, 3), dtype=np.uint8)
        for _ in range(2)
    ]
    mc = Segment(in_channels=3, dtype=jnp.float32, quant_mode="calibrate")
    cal = jnp.asarray(
        np.stack([i[:64, :64] for i in images]).astype(np.float32)
    ) / 127.5 - 1.0
    qvars = calibrate(mc, variables, [cal])

    ef = InferenceEngine(variables, in_channels=3, size=size, dtype=jnp.float32)
    ex = InferenceEngine(
        variables, in_channels=3, size=size, dtype=jnp.float32,
        quant=qvars, quant_mode="int8_mxu",
    )
    for a, b in zip(ef.predict_images(images), ex.predict_images(images)):
        assert a.shape == b.shape
        assert (a == b).mean() > 0.9, (a == b).mean()
