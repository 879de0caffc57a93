"""Atomic single-file checkpointing with the reference's branch-best
contract.

Checkpoint logical schema preserved from the reference (reference
train_instance.py:497-503): ``{branch_name, best (float IoU), epoch,
model state, optimizer state}``, written to
``<checkpoint_dir>/<git-branch>_best.ckpt`` (ref :313-314).  Three
consumers, identical contract (SURVEY.md §2.4): resume, regression
guard, and syn_train cross-process adoption.

Unlike the reference's bare ``torch.save`` (racy when multiple
processes share the file, SURVEY.md §5 'race detection'), writes go to a
temp file in the same directory followed by ``os.replace`` — readers
always see a complete checkpoint.

File format: ``ISEG`` magic + u32 header length + JSON meta + flax
msgpack payload of the state pytree.
"""
from __future__ import annotations

import json
import os
import struct
import subprocess
import tempfile
from typing import Any, Optional

import flax.serialization

MAGIC = b"ISEG"


def get_git_branch_name(cwd: str = ".") -> str:
    """Current git branch (reference keys checkpoints by it, ref :306)."""
    try:
        out = subprocess.run(
            ["git", "rev-parse", "--abbrev-ref", "HEAD"],
            capture_output=True, text=True, cwd=cwd, timeout=10,
        )
        name = out.stdout.strip()
        return name if out.returncode == 0 and name else "main"
    except Exception:
        return "main"


def save_checkpoint(path: str, tree: Any, meta: dict) -> None:
    """Atomically write ``tree`` (a pytree) + JSON-able ``meta``."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    header = json.dumps(meta).encode("utf-8")
    payload = flax.serialization.to_bytes(tree)
    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(os.path.abspath(path)))
    try:
        with os.fdopen(fd, "wb") as f:
            f.write(MAGIC)
            f.write(struct.pack("<I", len(header)))
            f.write(header)
            f.write(payload)
        os.replace(tmp, path)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise


def read_meta(path: str) -> Optional[dict]:
    """Read only the JSON meta header (cheap syn_train poll)."""
    try:
        with open(path, "rb") as f:
            if f.read(4) != MAGIC:
                return None
            (n,) = struct.unpack("<I", f.read(4))
            return json.loads(f.read(n).decode("utf-8"))
    except (OSError, ValueError, struct.error):
        return None


def load_checkpoint(path: str, template: Any) -> tuple[Any, dict]:
    """Load a checkpoint into the structure of ``template``."""
    with open(path, "rb") as f:
        blob = f.read()
    if blob[:4] != MAGIC:
        raise ValueError(f"{path}: not an ISEG checkpoint")
    (n,) = struct.unpack("<I", blob[4:8])
    meta = json.loads(blob[8 : 8 + n].decode("utf-8"))
    tree = flax.serialization.from_bytes(template, blob[8 + n :])
    return tree, meta


class BranchBestCheckpoint:
    """The reference's branch-best checkpoint file + contract."""

    def __init__(self, checkpoint_dir: str, branch_name: Optional[str] = None,
                 explicit_path: Optional[str] = None):
        self.branch_name = branch_name or get_git_branch_name()
        self.path = explicit_path or os.path.join(
            checkpoint_dir, f"{self.branch_name}_best.ckpt"
        )

    def exists(self) -> bool:
        return os.path.exists(self.path)

    def best(self) -> Optional[float]:
        meta = read_meta(self.path)
        return None if meta is None else meta.get("best")

    def save(self, tree: Any, best: float, epoch: int) -> None:
        save_checkpoint(
            self.path,
            tree,
            {"branch_name": self.branch_name, "best": float(best), "epoch": int(epoch)},
        )

    def load(self, template: Any) -> tuple[Any, dict]:
        return load_checkpoint(self.path, template)
