"""Checkpointing with the reference's directory contract.

The reference writes ``last.pth`` every epoch and ``best.pth`` on validation
improvement after epoch 6, as ``{"model": state_dict, "epoch": ep, "hist": hist}``
(reference: Training/compare_dacvsproposal_3.py:442-448); sweep runs add
``meta.json`` (Training/compare_dacvsproposal_5.py:446-455). Here the same contract
with msgpack pytrees: ``last.msgpack`` / ``best.msgpack`` + ``meta.json`` +
``hist.json``. Restoration is template-based (pytree structure from a freshly
initialized model), which doubles as a strictness check; ``strict=False``-style
tolerant loading keeps whatever intersects, mirroring the reference's tolerant
state-dict loads (Evaluation/compare_dacvsproposal_3.5_eval.py:487-489).
"""

from __future__ import annotations

import json
import os
from typing import Any, Optional

import jax
import numpy as np
from flax import serialization


def save_checkpoint(path: str, tree: Any, epoch: int, hist: Optional[dict] = None
                    ) -> None:
    payload = {
        "model": jax.tree.map(np.asarray, tree),
        "epoch": np.int64(epoch),
        "hist_json": json.dumps(hist or {}),
    }
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    blob = serialization.to_bytes(payload)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(blob)
    os.replace(tmp, path)


def load_checkpoint(path: str, template: Any) -> tuple[Any, int, dict]:
    """Restore (tree, epoch, hist) using ``template``'s pytree structure."""
    with open(path, "rb") as f:
        blob = f.read()
    payload = serialization.from_bytes(
        {"model": template, "epoch": np.int64(0), "hist_json": ""}, blob)
    hist = json.loads(payload["hist_json"]) if payload["hist_json"] else {}
    return payload["model"], int(payload["epoch"]), hist


def load_checkpoint_tolerant(path: str, template: Any) -> tuple[Any, int, dict]:
    """strict=False analogue: keep template leaves whose stored shape mismatches."""
    with open(path, "rb") as f:
        blob = f.read()
    raw = serialization.msgpack_restore(blob)
    state = raw.get("model", {})
    # walk the template structure, taking stored values where compatible

    def merge(tmpl, stored):
        if isinstance(tmpl, dict):
            return {k: merge(v, (stored or {}).get(k)) if isinstance(stored, dict)
                    else v for k, v in tmpl.items()}
        if hasattr(tmpl, "_fields"):  # NamedTuple
            d = {k: getattr(tmpl, k) for k in tmpl._fields}
            merged = merge(d, stored)
            return type(tmpl)(**merged)
        if isinstance(tmpl, (list, tuple)):
            if isinstance(stored, (list, tuple)) and len(stored) == len(tmpl):
                return type(tmpl)(merge(t, s) for t, s in zip(tmpl, stored))
            return tmpl
        if stored is None:
            return tmpl
        arr = np.asarray(stored)
        if hasattr(tmpl, "shape") and tuple(arr.shape) != tuple(np.shape(tmpl)):
            return tmpl
        return arr

    tree = merge(template, state)
    hist = json.loads(raw.get("hist_json") or "{}")
    return tree, int(raw.get("epoch", 0)), hist
