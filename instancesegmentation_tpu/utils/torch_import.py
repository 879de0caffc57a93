"""Import torch Segment checkpoints into the flax model.

Converts a state_dict saved by the PyTorch reference
(/root/reference/model/segment.py — checkpoint schema at
train_instance.py:497-503) into this framework's flax variables, so
users can migrate trained ``{branch}_best.pth`` checkpoints and so the
test suite can assert forward-parity against the reference with copied
weights (SURVEY.md §4).

Layout conversions:
- Conv2d            [out, in/g, kh, kw]  -> HWIO [kh, kw, in/g, out]
- ConvTranspose2d   [in, out, kh, kw]    -> conv-ready HWIO
  [kh, kw, in, out] spatially flipped (our ConvTranspose computes an
  input-dilated *conv*, which equals torch's transposed conv with the
  kernel flipped).
- BatchNorm weight/bias/running_mean/running_var -> bn scale/bias +
  batch_stats mean/var.
- PReLU weight [C] -> alpha.
"""
from __future__ import annotations

import re
from typing import Any, Mapping

import numpy as np


def _conv_w(w) -> np.ndarray:
    return np.asarray(w).transpose(2, 3, 1, 0)


def _convT_w(w) -> np.ndarray:
    # [in, out, kh, kw] -> [kh, kw, in, out], then flip spatial dims
    k = np.asarray(w).transpose(2, 3, 0, 1)
    return k[::-1, ::-1].copy()


def flax_to_torch_key(path: tuple, collection: str) -> tuple[str, str | None]:
    """Map a flax variable path to (torch state_dict key, transform name).

    ``path`` is the tuple of name components under the collection, e.g.
    ``('bottle4_1up', 'convs_1', 'kernel')``.
    """
    parts = list(path)
    top = parts[0]
    m = re.fullmatch(r"(bottle\d_x)_(\d+)", top)
    tparts = [f"{m.group(1)}.{m.group(2)}"] if m else [top]
    in_up = top.endswith("up")

    leaf = parts[-1]
    mids = parts[1:-1]

    # leaf directly under the top module: bottle6_1 ConvTranspose
    if not mids:
        if top == "bottle6_1":
            return (
                f"{tparts[0]}.{'weight' if leaf == 'kernel' else 'bias'}",
                "convT" if leaf == "kernel" else None,
            )
        raise KeyError(f"unexpected flax path {path}")

    for i, mid in enumerate(mids):
        is_module_leaf = i == len(mids) - 1
        if mid in ("layer1", "layer2"):
            tparts.append(mid)
        elif mid == "convm":
            tparts.append("convm.0")
        elif mid == "resconv":
            tparts.append("resconv.0")
        elif mid == "conv2":
            tparts.append("conv2.0")
        elif mid == "uppool_conv":
            tparts.append("uppool.1")
        elif mid == "convs_bn":
            tparts.append("convs.2")  # raw BN inside Up convs Sequential
        elif mid.startswith("convs_"):
            idx = int(mid.split("_")[1])
            if in_up and idx == 1:
                # ConvTranspose2d at Sequential index 1
                tparts.append("convs.1")
            elif in_up and idx == 2:
                # final 1x1 Conv sits at Sequential index 4 (after BN+ReLU)
                tparts.append("convs.4")
            else:
                tparts.append(f"convs.{idx}")
        elif mid == "conv":
            # inner nn.Conv of ConvBN / RawConv; torch 'Conv' wrapper
            # nests it as '.conv', but raw Conv2d modules (uppool.1,
            # bottle6_2, Bottleneck5x5 convs.1) have weights directly.
            prev = tparts[-1]
            is_raw = (
                prev == "uppool.1"
                or tparts[0] == "bottle6_2"
                or (prev == "convs.1" and _is_5x5_block(tparts[0]))
            )
            if not is_raw:
                tparts.append("conv")
        elif mid in ("bn", "act", "prelu"):
            tparts.append({"bn": "bn", "act": "act", "prelu": "prelu"}[mid])
        else:
            raise KeyError(f"unknown module component {mid!r} in {path}")

    base = ".".join(tparts)
    if leaf == "kernel":
        transform = "convT" if (in_up and "convs.1" in tparts) else "conv"
        return f"{base}.weight", transform
    if leaf == "bias" and collection == "params":
        # BN bias and conv bias both map to '.bias'
        return f"{base}.bias", None
    if leaf == "scale":
        return f"{base}.weight", None
    if leaf == "alpha":
        return f"{base}.weight", None
    if leaf == "mean":
        return f"{base}.running_mean", None
    if leaf == "var":
        return f"{base}.running_var", None
    raise KeyError(f"unknown leaf {leaf!r} in {path}")


def _is_5x5_block(torch_top: str) -> bool:
    """True if this top module is a Bottleneck5x5 (its convs.1 is a raw
    torch Conv2d with no BN/act wrapper, ref model/segment.py:91-92).

    Topology-specific: in the Segment net the 5x5 blocks are exactly the
    last entries of the section-2/3 Sequentials (ref :394, :415).
    """
    return torch_top in ("bottle2_x.4", "bottle3_x.4")


def import_torch_state_dict(state_dict: Mapping[str, Any], flax_variables: dict) -> dict:
    """Return flax variables with values copied from a torch state_dict.

    Asserts a perfect bijection: every flax leaf is assigned exactly one
    torch tensor of matching shape, and every torch tensor (except
    ``num_batches_tracked`` counters) is consumed.
    """
    import jax

    sd = {
        k: np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)
        for k, v in state_dict.items()
        if not k.endswith("num_batches_tracked")
    }
    used = set()

    def convert(collection: str, tree: dict) -> dict:
        flat = jax.tree_util.tree_flatten_with_path(tree)[0]
        out: dict = jax.tree_util.tree_map(lambda x: x, tree)
        for keypath, leaf in flat:
            path = tuple(k.key for k in keypath)
            tkey, transform = flax_to_torch_key(path, collection)
            if tkey not in sd:
                raise KeyError(f"torch key {tkey} (for flax {path}) missing")
            val = sd[tkey]
            if transform == "conv":
                val = _conv_w(val)
            elif transform == "convT":
                val = _convT_w(val)
            if val.shape != leaf.shape:
                raise ValueError(
                    f"shape mismatch {path}: torch {val.shape} vs flax {leaf.shape}"
                )
            used.add(tkey)
            node = out
            for k in path[:-1]:
                node = node[k]
            node[path[-1]] = val.astype(np.float32)
        return out

    result = {"params": convert("params", flax_variables["params"])}
    if "batch_stats" in flax_variables:
        result["batch_stats"] = convert("batch_stats", flax_variables["batch_stats"])

    unused = set(sd) - used
    if unused:
        raise ValueError(f"unconsumed torch keys: {sorted(unused)[:8]}...")
    return result


def load_torch_checkpoint(path: str, flax_variables: dict) -> tuple[dict, dict]:
    """Load a reference ``*_best.pth`` file.

    Returns ``(variables, meta)`` where meta carries the reference's
    checkpoint schema fields {branch_name, best, epoch} (reference
    train_instance.py:497-503).  Optimizer state is not imported (Adam
    moments do not transfer meaningfully across frameworks).
    """
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    state_dict = ckpt.get("state_dict", ckpt)
    variables = import_torch_state_dict(state_dict, flax_variables)
    meta = {
        "branch_name": ckpt.get("branch_name"),
        "best": ckpt.get("best"),
        "epoch": ckpt.get("epoch"),
    }
    return variables, meta
