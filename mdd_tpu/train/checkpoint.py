"""Checkpoint save/restore (orbax), improving on the reference's
end-of-training-only torch.save (train_ctc.py:283-291, model_ctc.py:251-271):
we save the best state AND a resumable latest state, with model/config
metadata bundled so consumers can rebuild the model from the checkpoint
alone (the reference's save_package contract)."""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


def _to_host(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


def save_checkpoint(
    directory: str,
    name: str,
    params,
    batch_stats,
    meta: Dict[str, Any],
    opt_state=None,
) -> str:
    """Save a checkpoint bundle under directory/name.

    Crash-safe: the bundle is written to a temporary sibling directory
    and swapped in afterwards, so an interrupted save never destroys
    the previous checkpoint (the old scheme rmtree'd the existing
    checkpoint before writing the new one)."""
    import shutil

    path = os.path.abspath(os.path.join(directory, name))
    tmp = f"{path}.tmp-{os.getpid()}"
    old = f"{path}.old-{os.getpid()}"
    for p in (tmp, old):
        if os.path.exists(p):
            shutil.rmtree(p)
    ckptr = ocp.StandardCheckpointer()
    state = {"params": _to_host(params), "batch_stats": _to_host(batch_stats)}
    if opt_state is not None:
        state["opt_state"] = _to_host(opt_state)
    ckptr.save(tmp, state)
    ckptr.wait_until_finished()
    with open(tmp + ".meta.json", "w", encoding="utf-8") as f:
        json.dump(meta, f, indent=2, default=str)
    # swap: retire the old bundle only after the new one is complete
    if os.path.exists(path):
        os.rename(path, old)
    os.rename(tmp, path)
    os.replace(tmp + ".meta.json", path + ".meta.json")
    if os.path.exists(old):
        shutil.rmtree(old)
    return path


def load_checkpoint(directory: str, name: str, target=None):
    """-> (state dict with params/batch_stats, meta dict)."""
    path = os.path.abspath(os.path.join(directory, name))
    ckptr = ocp.StandardCheckpointer()
    state = ckptr.restore(path, target=target)
    meta = {}
    meta_path = path + ".meta.json"
    if os.path.exists(meta_path):
        with open(meta_path, "r", encoding="utf-8") as f:
            meta = json.load(f)
    return state, meta
