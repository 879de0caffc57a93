"""Orbax-backed branch-best checkpointing (optional backend).

Same contract as ``checkpoint.BranchBestCheckpoint`` (resume /
regression-reload / syn_train adoption, SURVEY.md §2.4) but stored as an
orbax checkpoint directory: useful when training multi-host (orbax
coordinates distributed array saves) or when async saves matter.  Meta
{branch_name, best, epoch} lives in a sidecar JSON written atomically
AFTER the checkpoint commits, so a concurrent reader never adopts a
half-written checkpoint (the syn_train race the reference had,
SURVEY.md §5).

The default single-file backend (train/checkpoint.py) remains the
recommended one for the single-host syn_train workflow — one file, one
rename, trivially pollable.
"""
from __future__ import annotations

import json
import os
import shutil
import tempfile
from typing import Any, Optional

from instancesegmentation_tpu.train.checkpoint import get_git_branch_name


class OrbaxBranchBestCheckpoint:
    def __init__(self, checkpoint_dir: str, branch_name: Optional[str] = None):
        self.branch_name = branch_name or get_git_branch_name()
        self.path = os.path.join(checkpoint_dir, f"{self.branch_name}_best.orbax")
        self._meta_path = self.path + ".meta.json"

    def exists(self) -> bool:
        return os.path.exists(self._meta_path) and os.path.exists(self.path)

    def best(self) -> Optional[float]:
        try:
            with open(self._meta_path) as f:
                return json.load(f).get("best")
        except (OSError, ValueError):
            return None

    def save(self, tree: Any, best: float, epoch: int) -> None:
        import orbax.checkpoint as ocp
        import flax.serialization

        os.makedirs(os.path.dirname(os.path.abspath(self.path)), exist_ok=True)
        state = flax.serialization.to_state_dict(tree)
        ckptr = ocp.StandardCheckpointer()
        tmp = self.path + ".new"
        if os.path.exists(tmp):
            shutil.rmtree(tmp)
        ckptr.save(tmp, state)
        ckptr.wait_until_finished()
        if os.path.exists(self.path):
            shutil.rmtree(self.path)
        os.replace(tmp, self.path)

        meta = {
            "branch_name": self.branch_name,
            "best": float(best),
            "epoch": int(epoch),
        }
        fd, tmp_meta = tempfile.mkstemp(
            dir=os.path.dirname(os.path.abspath(self._meta_path))
        )
        with os.fdopen(fd, "w") as f:
            json.dump(meta, f)
        os.replace(tmp_meta, self._meta_path)

    def load(self, template: Any) -> tuple[Any, dict]:
        import orbax.checkpoint as ocp
        import flax.serialization

        ckptr = ocp.StandardCheckpointer()
        state = ckptr.restore(
            self.path, flax.serialization.to_state_dict(template)
        )
        tree = flax.serialization.from_state_dict(template, state)
        with open(self._meta_path) as f:
            meta = json.load(f)
        return tree, meta
