"""Checkpoint save/restore (orbax), mirroring the reference's resume logic.

Reference behavior (/root/reference/mvs/mvs_cas/train_whu.py:138-153,185,
214-219): per-epoch checkpoint holding model + optimizer + epoch; resume
picks the newest; eval error is encoded in the checkpoint name.
"""

from __future__ import annotations

import os
import re
from typing import Any, Optional

import numpy as np


def _ocp():
    import orbax.checkpoint as ocp

    return ocp


def save_checkpoint(
    ckpt_dir: str,
    epoch: int,
    params: Any,
    opt_state: Any = None,
    abs_error: Optional[float] = None,
) -> str:
    ocp = _ocp()
    name = f"model_{epoch:06d}"
    if abs_error is not None:
        name += f"_{abs_error:.4f}"
    path = os.path.abspath(os.path.join(ckpt_dir, name))
    ckptr = ocp.PyTreeCheckpointer()
    payload = {"params": params, "epoch": np.asarray(epoch)}
    if opt_state is not None:
        payload["opt_state"] = opt_state
    ckptr.save(path, payload, force=True)
    return path


def latest_checkpoint(ckpt_dir: str) -> Optional[str]:
    if not os.path.isdir(ckpt_dir):
        return None
    entries = []
    for name in os.listdir(ckpt_dir):
        m = re.match(r"model_(\d+)", name)
        if m:
            entries.append((int(m.group(1)), name))
    if not entries:
        return None
    entries.sort()
    return os.path.join(ckpt_dir, entries[-1][1])


def best_checkpoint(ckpt_dir: str) -> Optional[str]:
    """Checkpoint with the LOWEST val error encoded in its name (the
    reference encodes eval error in the name for exactly this selection,
    train_whu.py:214-219); falls back to the newest when no name carries
    an error (ties broken by newest epoch)."""
    if not os.path.isdir(ckpt_dir):
        return None
    entries = []
    for name in os.listdir(ckpt_dir):
        m = re.match(r"model_(\d+)_([0-9.]+)$", name)
        if m:
            entries.append((float(m.group(2)), -int(m.group(1)), name))
    if not entries:
        return latest_checkpoint(ckpt_dir)
    entries.sort()
    return os.path.join(ckpt_dir, entries[0][2])


def restore_checkpoint(path: str) -> dict:
    ocp = _ocp()
    ckptr = ocp.PyTreeCheckpointer()
    path = os.path.abspath(path)
    try:
        return ckptr.restore(path)
    except ValueError:
        # CPU-forced processes (multihost workers, ablation evals): orbax
        # refuses device-array deserialization without concrete shardings —
        # restore every leaf as a plain host numpy array instead
        import jax

        meta = ckptr.metadata(path)
        tree = meta.item_metadata
        tree = tree.tree if hasattr(tree, "tree") else tree
        restore_args = jax.tree.map(
            lambda _: ocp.RestoreArgs(restore_type=np.ndarray), tree)
        return ckptr.restore(path, restore_args=restore_args)


def export_params_npz(params: Any, path: str) -> str:
    """Compact params-only artifact: flattened pytree -> one .npz file
    (orbax dirs carry optimizer state and are bulky to ship)."""
    import jax

    flat = {}
    for kpath, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        flat[jax.tree_util.keystr(kpath)] = np.asarray(leaf)
    np.savez_compressed(path, **flat)
    return path


def restore_params_npz(path: str, like: Any = None) -> Any:
    """Rebuild a params pytree from export_params_npz output. Without a
    `like` template, rebuilds the nested dict from the key paths."""
    data = np.load(path)
    if like is not None:
        import jax

        leaves = [
            data[jax.tree_util.keystr(kpath)]
            for kpath, _ in jax.tree_util.tree_flatten_with_path(like)[0]
        ]
        return jax.tree_util.tree_unflatten(
            jax.tree_util.tree_structure(like), leaves)
    import re as _re

    out: dict = {}
    for key in data.files:
        parts = _re.findall(r"\['([^']+)'\]", key)
        node = out
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = data[key]
    return out


def merge_matching_params(init: Any, warm: Any) -> tuple:
    """Partial warm start: copy every leaf from `warm` whose key path
    exists in `init` with the same shape; keep `init` elsewhere.

    The reference's --loadckpt (train_whu.py:148-153) requires identical
    architectures; here checkpoints port across operating points that
    change a few shapes (e.g. the per-view 2D regularizer's first conv is
    ndepths-dependent, so a 16/8/8 toy checkpoint warm-starts a 48/32/8
    run everywhere except that conv). Returns (merged, n_ported,
    n_skipped, skipped_paths)."""
    import jax

    import jax.numpy as jnp

    warm_flat = dict(jax.tree_util.tree_flatten_with_path(warm)[0])
    ported, skipped = [0], []

    def _kind(x):
        # ml_dtypes.bfloat16 has numpy kind 'V'; classify through jnp so
        # bf16<->f32 ports are treated as float-to-float (and cast below)
        # instead of silently skipped.
        dt = jnp.asarray(x).dtype
        if jnp.issubdtype(dt, jnp.floating):
            return "f"
        if jnp.issubdtype(dt, jnp.integer):
            return "i"
        return np.asarray(x).dtype.kind

    def pick(kpath, leaf):
        w = warm_flat.get(kpath)
        if w is not None and np.shape(w) == np.shape(leaf) and (
                _kind(w) == _kind(leaf)):
            ported[0] += 1
            # cast to the init leaf's dtype so a width mismatch (f16/bf16
            # vs f32) can't change the param tree's dtype from init.
            return jnp.asarray(w, jnp.asarray(leaf).dtype)
        if w is not None:
            skipped.append(jax.tree_util.keystr(kpath))
        return leaf

    merged = jax.tree_util.tree_map_with_path(pick, init)
    return merged, ported[0], len(skipped), skipped


def restore_params(path: str) -> Any:
    if str(path).endswith(".npz"):
        return restore_params_npz(path)
    payload = restore_checkpoint(path)
    return payload["params"] if "params" in payload else payload
