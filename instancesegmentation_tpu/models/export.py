"""Inference-export transforms: BatchNorm folding.

TPU equivalent of the reference's ``fuseforward`` path (ref
model/segment.py:47-48: skip BN at inference after folding it into the
conv).  Measured r5 (FOLD_BN_PROBE.json): serving the folded weights is
**+4.2%** on the 512² batch-128 program at a bit-identical checksum —
XLA does NOT fully absorb a runtime-parameter BN affine into the conv
epilogue; the fold pays when the identity leftovers are closed over the
jit as constants (they inline as literals and constant-fold away:
229→96 HLO multiplies).  `infer.pipeline.InferenceEngine` serves the
folded form by default (`fold_bn=True`); bench.py matches.

Folding: ``w' = w * g / sqrt(v + eps)``, ``b' = beta + (b - m) * g /
sqrt(v + eps)`` applied to every conv followed by a BN; the BN is then
reset to identity (scale=1, bias=0, mean=0, var=1-eps) so the module
graph is unchanged.
"""
from __future__ import annotations

import jax.numpy as jnp

EPS = 1e-5


def _fold_one(conv: dict, bn_params: dict, bn_stats: dict) -> None:
    scale = bn_params["scale"] / jnp.sqrt(bn_stats["var"] + EPS)
    conv["kernel"] = conv["kernel"] * scale  # kernel [..., out], scale [out]
    conv["bias"] = bn_params["bias"] + (conv["bias"] - bn_stats["mean"]) * scale
    bn_params["scale"] = jnp.ones_like(bn_params["scale"])
    bn_params["bias"] = jnp.zeros_like(bn_params["bias"])
    bn_stats["mean"] = jnp.zeros_like(bn_stats["mean"])
    bn_stats["var"] = jnp.ones_like(bn_stats["var"]) - EPS


def _walk(params: dict, stats: dict) -> None:
    # ConvBN: {'conv': {...}, 'bn': {...}} siblings
    if "conv" in params and "bn" in params and "bn" in stats:
        _fold_one(params["conv"], params["bn"], stats["bn"])
    # BottleneckUpRes: ConvTranspose 'convs_1' followed by 'convs_bn'
    if "convs_1" in params and "convs_bn" in params and "convs_bn" in stats:
        if "kernel" in params["convs_1"]:
            _fold_one(params["convs_1"], params["convs_bn"], stats["convs_bn"])
    for key, value in params.items():
        if isinstance(value, dict) and isinstance(stats.get(key), dict):
            _walk(value, stats[key])


def fold_batchnorm(variables: dict) -> dict:
    """Return a new variables dict with every BN folded into its conv.

    ``apply(folded_vars, x, train=False)`` is numerically equal to
    ``apply(vars, x, train=False)`` (up to float rounding).
    """
    import jax

    variables = jax.tree_util.tree_map(lambda x: x, variables)  # deep copy
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    _walk(params, stats)
    return variables
