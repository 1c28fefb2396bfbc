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
import queue
import threading
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import serialization


def fused_to_host(tree: Any) -> Any:
    """Pull a device pytree to host numpy in ONE transfer per dtype group.

    ``jax.tree.map(np.asarray, tree)`` issues one device->host roundtrip per
    leaf; on this machine's tunneled runtime each pull in the degraded
    post-first-pull state costs seconds of setup, which turned a ~300 MB
    backbone save into tens of minutes. Raveling and concatenating leaves on
    device (cheap HBM copies) collapses the pull into <= one transfer per
    dtype.
    """
    leaves, treedef = jax.tree.flatten(tree)
    out: list = [None] * len(leaves)
    groups: dict = {}
    for i, l in enumerate(leaves):
        if isinstance(l, jax.Array):              # only device leaves fused;
            groups.setdefault(l.dtype, []).append(i)
        else:                                     # host leaves pass through
            out[i] = np.asarray(l)                # (no upload round-trip)
    for dt, idxs in groups.items():
        flat = jnp.concatenate([jnp.ravel(leaves[i]) for i in idxs]) \
            if len(idxs) > 1 else jnp.ravel(leaves[idxs[0]])
        host = np.asarray(flat)                   # the single pull
        off = 0
        for i in idxs:
            shape = np.shape(leaves[i])
            n = int(np.prod(shape)) if shape else 1
            out[i] = host[off: off + n].reshape(shape)
            off += n
    return jax.tree.unflatten(treedef, out)


def save_checkpoint(path: str, tree: Any, epoch: int, hist: Optional[dict] = None
                    ) -> None:
    payload = {
        "model": fused_to_host(tree),
        "epoch": np.int64(epoch),
        "hist_json": json.dumps(hist or {}),
    }
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    blob = serialization.to_bytes(payload)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(blob)
    os.replace(tmp, path)


class AsyncCheckpointer:
    """Background checkpoint writer for slow device->host links.

    Over the tunneled TPU here, device->host runs at ~5 MB/s: synchronously
    pulling a ~35 MB head (or a ~300 MB backbone) every epoch adds seconds to
    minutes of dead time per epoch — measured as the residual 5-10 s/epoch
    overhead in the round-1 training runs. ``save()`` instead snapshots the
    pytree ON DEVICE (HBM copy, microseconds — required anyway because the
    donated train-state buffers are invalidated by the next step) and hands it
    to a single writer thread that overlaps the host pull + file write with
    the next epoch's compute. Writes are ordered; ``wait()`` drains the queue
    (call before reading the files or exiting).
    """

    def __init__(self):
        self._q: "queue.Queue" = queue.Queue()
        self._err: Optional[BaseException] = None
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def _run(self) -> None:
        while True:
            item = self._q.get()
            if item is None:
                return
            path, tree, epoch, hist = item
            try:
                save_checkpoint(path, tree, epoch, hist)
            except BaseException as e:  # surfaced on the next save()/wait()
                self._err = e
            finally:
                self._q.task_done()

    def save(self, path: str, tree: Any, epoch: int,
             hist: Optional[dict] = None) -> None:
        if self._err is not None:
            err, self._err = self._err, None
            raise err
        snapshot = jax.tree.map(jnp.array, tree)  # device-side copy
        # hist is mutated by the train loop: freeze it now
        hist_copy = json.loads(json.dumps(hist)) if hist else None
        self._q.put((path, snapshot, epoch, hist_copy))

    def wait(self) -> None:
        self._q.join()
        if self._err is not None:
            err, self._err = self._err, None
            raise err

    def close(self) -> None:
        self.wait()
        self._q.put(None)
        self._thread.join()


def load_checkpoint(path: str, template: Any) -> tuple[Any, int, dict]:
    """Restore (tree, epoch, hist) using ``template``'s pytree structure.

    The restored tree is committed to device: numpy leaves passed into jitted
    functions are re-uploaded on EVERY call (and, through this machine's
    tunneled TPU runtime, each upload also leaks its size in host RSS — a
    300 MB backbone passed per-step OOM-killed a training run at 130 GB).
    """
    with open(path, "rb") as f:
        blob = f.read()
    payload = serialization.from_bytes(
        {"model": template, "epoch": np.int64(0), "hist_json": ""}, blob)
    hist = json.loads(payload["hist_json"]) if payload["hist_json"] else {}
    return jax.device_put(payload["model"]), int(payload["epoch"]), hist


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
            # flax to_state_dict encodes lists as {"0": ..., "1": ...} dicts
            # (msgpack_restore returns that form). Round 1 silently kept the
            # TEMPLATE for every list subtree — i.e. random encoder/decoder
            # conv blocks on every tolerant backbone load — capping all eval
            # quality at the random-blocks floor. Regression-tested:
            # tolerant == strict on a tree with list subtrees.
            if isinstance(stored, dict):
                stored = [stored.get(str(i)) for i in range(len(tmpl))]
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
    # committed to device for the same reason as load_checkpoint
    return jax.device_put(tree), int(raw.get("epoch", 0)), hist
