"""Checkpoint save/load with the reference's filename convention.

The reference delegates checkpointing to pytorch-lightning, producing files
named ``model={name}-epoch={E}-step={S}.ckpt`` whose ``epoch=`` substring
``render.py:15-16`` parses back out. This module keeps that convention.

Format: a single ``.ckpt`` file = numpy ``.npz`` of the flattened state leaves
plus an embedded JSON header (model/train configs, step, name). Restoring
rebuilds the pytree structure from freshly initialized templates and fills in
the saved leaves — robust to optax's namedtuple-heavy opt_state structure and
framework-version drift.
"""

from __future__ import annotations

import io
import json
import re
import threading
from concurrent.futures import Future, ThreadPoolExecutor
from pathlib import Path
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np


def device_fetch_batched(tree):
    """Fetch a whole pytree in ONE host transfer per dtype group.

    Over the axon-tunneled TPU each array fetch pays a full roundtrip
    (~tens of ms); fetching a ~60-leaf train state leaf-by-leaf costs
    seconds — measured as the dominant cost of a checkpoint boundary
    (round 3). Concatenating the raveled leaves on-device first turns 60
    roundtrips into one-per-dtype. Non-array leaves pass through.

    Memory note: the per-dtype concatenation materializes a transient
    on-device copy of every same-dtype leaf — at checkpoint boundaries
    that is briefly ~2x the params+opt_state footprint in HBM. For this
    model family that is a few MB and irrelevant; callers with very large
    states should chunk the tree before calling.
    """
    import jax.numpy as jnp

    leaves, treedef = jax.tree_util.tree_flatten(tree)
    idx_by_dtype: Dict[Any, list] = {}
    for i, leaf in enumerate(leaves):
        if hasattr(leaf, "dtype") and hasattr(leaf, "shape"):
            idx_by_dtype.setdefault(np.dtype(leaf.dtype), []).append(i)
    packed = {
        str(d): jnp.concatenate([jnp.ravel(leaves[i]) for i in idx])
        if len(idx) > 1
        else jnp.ravel(leaves[idx[0]])
        for d, idx in idx_by_dtype.items()
    }
    host = jax.device_get(packed)
    out = list(leaves)
    for d, idx in idx_by_dtype.items():
        buf = host[str(d)]
        off = 0
        for i in idx:
            n = int(np.prod(leaves[i].shape, dtype=np.int64))
            out[i] = buf[off:off + n].reshape(leaves[i].shape)
            off += n
    return jax.tree_util.tree_unflatten(treedef, out)


def save_checkpoint(
    path,
    params,
    opt_state,
    step: int,
    nerf_config_dict: Dict[str, Any],
    train_config_dict: Dict[str, Any],
    extra: Optional[Dict[str, Any]] = None,
) -> Path:
    """Serialize training state to ``path`` (atomic via temp file)."""
    path = Path(path)
    state = {"params": params, "opt_state": opt_state}
    leaves, treedef = jax.tree_util.tree_flatten(state)
    header = {
        "step": int(step),
        "nerf_config": nerf_config_dict,
        "train_config": train_config_dict,
        "num_leaves": len(leaves),
        "extra": extra or {},
    }
    buf = io.BytesIO()
    np.savez(
        buf,
        __header__=np.frombuffer(json.dumps(header).encode(), dtype=np.uint8),
        **{f"leaf_{i}": np.asarray(leaf) for i, leaf in enumerate(leaves)},
    )
    tmp = path.with_suffix(path.suffix + ".tmp")
    tmp.write_bytes(buf.getvalue())
    tmp.replace(path)
    return path


def _ckpt_file(path) -> Path:
    """Validate a checkpoint path up front: an empty or missing path
    otherwise surfaces as np.load's confusing ``IsADirectoryError: '.'``
    (hit in practice by ``score.py -c ""`` from a shell var that an
    earlier failed step left unset)."""
    p = Path(path)
    if not p.is_file():
        raise FileNotFoundError(f"checkpoint not found: {str(path)!r}")
    return p


def read_header(path) -> Dict[str, Any]:
    """Read only a checkpoint's JSON header (step, configs) — ``np.load``
    is lazy per-array, so this never touches the weight leaves."""
    with np.load(_ckpt_file(path), allow_pickle=False) as z:
        return json.loads(bytes(z["__header__"]).decode())


def load_checkpoint(path) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Load raw checkpoint contents.

    Returns:
        ``(header, leaves_by_index)`` — use ``restore_state`` to rebuild
        pytrees against templates.
    """
    with np.load(_ckpt_file(path), allow_pickle=False) as z:
        header = json.loads(bytes(z["__header__"]).decode())
        leaves = {
            int(k.split("_", 1)[1]): z[k] for k in z.files if k.startswith("leaf_")
        }
    return header, leaves


def restore_state(header, leaves, params_template, opt_state_template):
    """Rebuild ``(params, opt_state)`` pytrees from saved leaves.

    Args:
        params_template/opt_state_template: freshly initialized pytrees with
            the target structure (shape/dtype are validated against the saved
            leaves).
    """
    state_template = {"params": params_template, "opt_state": opt_state_template}
    t_leaves, treedef = jax.tree_util.tree_flatten(state_template)
    if len(t_leaves) != header["num_leaves"]:
        raise ValueError(
            f"checkpoint has {header['num_leaves']} leaves; "
            f"template has {len(t_leaves)} — config mismatch?"
        )
    new_leaves = []
    for i, t in enumerate(t_leaves):
        leaf = leaves[i]
        t_arr = np.asarray(t)
        if tuple(leaf.shape) != tuple(t_arr.shape):
            raise ValueError(
                f"leaf {i}: saved shape {leaf.shape} != template {t_arr.shape}"
            )
        new_leaves.append(jax.numpy.asarray(leaf, dtype=t_arr.dtype))
    state = jax.tree_util.tree_unflatten(treedef, new_leaves)
    return state["params"], state["opt_state"]


_SAVE_POOL: Optional[ThreadPoolExecutor] = None
_SAVE_POOL_LOCK = threading.Lock()


def save_checkpoint_async(
    path,
    params,
    opt_state,
    step: int,
    nerf_config_dict: Dict[str, Any],
    train_config_dict: Dict[str, Any],
    extra: Optional[Dict[str, Any]] = None,
) -> "Future[Path]":
    """Non-blocking checkpoint save.

    Device arrays are fetched to host synchronously (cheap relative to a
    training epoch; required so training can donate/overwrite the buffers),
    then serialization + disk IO run on a background thread — the TPU never
    idles on file writes. Call ``.result()`` on the returned future to join.
    """
    global _SAVE_POOL
    with _SAVE_POOL_LOCK:
        if _SAVE_POOL is None:
            _SAVE_POOL = ThreadPoolExecutor(max_workers=1, thread_name_prefix="ckpt")
    # one batched transfer, not one roundtrip per leaf (device_fetch_batched
    # docstring: leaf-by-leaf fetches cost seconds over the axon tunnel)
    host_state = device_fetch_batched(
        {"params": params, "opt_state": opt_state}
    )
    return _SAVE_POOL.submit(
        save_checkpoint,
        path,
        host_state["params"],
        host_state["opt_state"],
        step,
        nerf_config_dict,
        train_config_dict,
        extra,
    )


def checkpoint_name(name: str, epoch: int, step: int) -> str:
    """Reference-convention filename (``.MISSING_LARGE_BLOBS:4-6``)."""
    return f"model={name}-epoch={epoch}-step={step}.ckpt"


_CKPT_RE = re.compile(r"epoch=(\d+)-step=(\d+)\.ckpt$")


def parse_epoch_step(filename: str) -> Optional[Tuple[int, int]]:
    """Extract ``(epoch, step)`` from a checkpoint filename, else None."""
    m = _CKPT_RE.search(str(filename))
    return (int(m.group(1)), int(m.group(2))) if m else None


def latest_checkpoint(ckpt_dir) -> Optional[Path]:
    """Highest-step ``*.ckpt`` in ``ckpt_dir`` (auto-resume support)."""
    ckpt_dir = Path(ckpt_dir)
    if not ckpt_dir.is_dir():
        return None
    best, best_step = None, -1
    for p in ckpt_dir.glob("*.ckpt"):
        parsed = parse_epoch_step(p.name)
        if parsed and parsed[1] > best_step:
            best, best_step = p, parsed[1]
    return best
