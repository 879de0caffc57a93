"""Debug helpers: model summaries and array stats.

The ``modshow`` / ``check`` surface of the reference's debug library
(reference model/segment.py:551-553 call sites, SURVEY.md §2.8), rebuilt
for flax pytrees.
"""
from __future__ import annotations

from typing import Any

import numpy as np


def check(x: Any, name: str = "array") -> str:
    """One-line stats of an array (the reference's ``check``)."""
    arr = np.asarray(x)
    finite = np.isfinite(arr)
    line = (
        f"{name}: shape={tuple(arr.shape)} dtype={arr.dtype} "
        f"min={arr.min():+.5g} max={arr.max():+.5g} "
        f"mean={arr.mean():+.5g} std={arr.std():.5g} "
        f"nonfinite={int((~finite).sum())}"
    )
    print(line)
    return line


def model_summary(params: dict, max_depth: int = 1) -> str:
    """Per-module parameter table (the reference's ``modshow`` role).

    Groups leaves by their first ``max_depth`` path components.
    """
    import jax

    groups: dict[str, int] = {}
    for keypath, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        path = tuple(k.key for k in keypath)
        group = "/".join(path[:max_depth])
        groups[group] = groups.get(group, 0) + int(np.prod(leaf.shape))
    total = sum(groups.values())
    width = max(len(g) for g in groups) if groups else 10
    lines = [f"{'module':<{width}}  params"]
    for g in sorted(groups):
        lines.append(f"{g:<{width}}  {groups[g]:,}")
    lines.append(f"{'TOTAL':<{width}}  {total:,}")
    table = "\n".join(lines)
    print(table)
    return table
