"""Forward-parity against the PyTorch reference with copied weights.

The torch reference (read-only at /root/reference) is used as a test
oracle only — torch-CPU is installed precisely for this (SURVEY.md §4).
Skipped if the reference checkout or torch is unavailable.
"""
import os
import sys

import numpy as np
import pytest

REFERENCE = "/root/reference"

torch = pytest.importorskip("torch")
if not os.path.isdir(os.path.join(REFERENCE, "model")):
    pytest.skip("reference checkout unavailable", allow_module_level=True)

sys.path.insert(0, REFERENCE)
from model.segment import Segment as TorchSegment  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from instancesegmentation_tpu.models import Segment  # noqa: E402
from instancesegmentation_tpu.utils.torch_import import (  # noqa: E402
    import_torch_state_dict,
)


def _parity(in_channels: int, size: int, atol: float = 2e-3):
    # untrained kaiming weights with unit BN stats produce logits of
    # magnitude ~1e2; 2e-3 absolute is float32 accumulation-order noise
    torch.manual_seed(0)
    tmodel = TorchSegment(in_channels).eval()

    model = Segment(in_channels=in_channels)
    if in_channels == 3:
        args = (jnp.zeros((1, size, size, 3)),)
    else:
        args = (jnp.zeros((1, size, size, 3)), jnp.zeros((1, size, size, in_channels - 3)))
    variables = model.init(jax.random.PRNGKey(0), *args)
    variables = import_torch_state_dict(tmodel.state_dict(), variables)

    rng = np.random.default_rng(42)
    x = rng.normal(size=(2, in_channels, size, size)).astype(np.float32)

    with torch.no_grad():
        t_out = tmodel(torch.from_numpy(x)).numpy()  # [N,1,H,W]

    x_nhwc = jnp.asarray(x.transpose(0, 2, 3, 1))
    if in_channels == 3:
        f_out = model.apply(variables, x_nhwc, train=False)
    else:
        f_out = model.apply(
            variables, x_nhwc[..., :3], x_nhwc[..., 3:], train=False
        )
    f_out = np.asarray(f_out).transpose(0, 3, 1, 2)

    np.testing.assert_allclose(f_out, t_out, atol=atol, rtol=5e-3)


def test_forward_parity_rgb_64():
    _parity(3, 64)


def test_forward_parity_conditioned_20ch_64():
    _parity(20, 64)


def test_forward_parity_rgb_96():
    # second size: checks the fully-convolutional path & paddings again
    _parity(3, 96)


def test_train_batch_parity_sigmoid():
    """The repaired train_batch semantics: sigmoid(forward(cat(x, hm)))."""
    torch.manual_seed(1)
    tmodel = TorchSegment(20).eval()
    model = Segment(in_channels=20)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), jnp.zeros((1, 64, 64, 17))
    )
    variables = import_torch_state_dict(tmodel.state_dict(), variables)

    rng = np.random.default_rng(7)
    img = rng.normal(size=(1, 3, 64, 64)).astype(np.float32)
    hm = rng.random(size=(1, 17, 64, 64)).astype(np.float32)
    with torch.no_grad():
        t_out = tmodel.train_batch(
            torch.from_numpy(img), torch.from_numpy(hm)
        ).numpy()

    f_out = model.predict(
        variables,
        jnp.asarray(img.transpose(0, 2, 3, 1)),
        jnp.asarray(hm.transpose(0, 2, 3, 1)),
    )
    np.testing.assert_allclose(
        np.asarray(f_out).transpose(0, 3, 1, 2), t_out, atol=1e-5, rtol=1e-3
    )


def test_full_pipeline_logit_parity():
    """Pipeline-level parity (VERDICT r1 next#1): the SAME preprocessed
    crop — produced by the framework's fused warp + heatmap program from
    a real common-format sample — fed to both models with copied weights
    must give matching logits.  This covers the full preprocess->forward
    handoff (channel order, [-1,1] normalize, heatmap layout), not just
    the bare model."""
    import tempfile

    from instancesegmentation_tpu.data.dataset import InstanceCommonDataset
    from instancesegmentation_tpu.data.pipeline import (
        AugmentConfig,
        host_batch,
        preprocess_batch,
    )
    from instancesegmentation_tpu.data.synthetic import make_synthetic_dataset
    from instancesegmentation_tpu.utils.torch_import import import_torch_state_dict

    with tempfile.TemporaryDirectory() as d:
        make_synthetic_dataset(d, num_images=2, objects_per_image=1, seed=13)
        ds = InstanceCommonDataset(d, canvas=192)
        batch = host_batch([ds.fetch(i) for i in range(len(ds))])

    images, heatmaps, masks = preprocess_batch(
        batch, jax.random.PRNGKey(0), AugmentConfig(out_size=(64, 64))
    )
    images, heatmaps = np.asarray(images), np.asarray(heatmaps)
    assert masks.max() > 0.5  # a real target came through the warp

    torch.manual_seed(2)
    tmodel = TorchSegment(20).eval()
    model = Segment(in_channels=20)
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 64, 64, 3)),
        jnp.zeros((1, 64, 64, 17)),
    )
    variables = import_torch_state_dict(tmodel.state_dict(), variables)

    f_logits = np.asarray(
        model.apply(variables, jnp.asarray(images), jnp.asarray(heatmaps), train=False)
    ).transpose(0, 3, 1, 2)
    xin = np.concatenate([images, heatmaps], axis=-1).transpose(0, 3, 1, 2)
    with torch.no_grad():
        t_logits = tmodel(torch.from_numpy(xin)).numpy()
    np.testing.assert_allclose(f_logits, t_logits, atol=2e-3, rtol=5e-3)
