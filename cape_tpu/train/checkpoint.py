"""Single-pytree checkpointing (params + optimizer state + step).

Replaces the reference's tf.train.Saver flow (lib/models.py:351,869,924:
save every epoch, keep 5, restore-latest). Format: one .npz per
checkpoint keyed by jax keypath strings — dependency-free, works for any
pytree (dicts, tuples, flax struct dataclasses like TrainState), and
doubles as the interchange format for the TF-checkpoint converter
(tools/tf_ckpt_converter.py).
"""

from __future__ import annotations

import os
import re
import warnings

import jax
import numpy as np


class CheckpointMismatchError(ValueError):
    """The checkpoint file is intact but does not fit the model: a key is
    missing or a leaf has the wrong number of elements. This is a config
    error (restoring ckpt A into model B) and must fail loudly — it is
    never treated as file corruption, so `restore_latest` will NOT fall
    back past it to an older checkpoint."""


def flatten_tree(tree) -> dict[str, np.ndarray]:
    """pytree -> {keypath string: ndarray}.

    bfloat16 leaves (e.g. opt_state_dtype=bfloat16 momentum buffers) are
    stored as float32: np.savez writes the ml_dtypes bfloat16 as a raw
    void dtype ('|V2') that cannot be astype-restored, while bf16->f32
    is exact and unflatten_tree casts back to the template dtype."""
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    out = {}
    for path, leaf in flat:
        arr = np.asarray(jax.device_get(leaf))
        if arr.dtype.kind == "V" or str(arr.dtype) == "bfloat16":
            arr = arr.astype(np.float32)
        out[jax.tree_util.keystr(path)] = arr
    return out


def unflatten_tree(flat: dict[str, np.ndarray], template):
    """Restore a {keypath: ndarray} dict into the structure of `template`.

    Leaves are cast to the template dtype and reshaped when the element
    count matches (the TF converter writes e.g. (1,1,F) biases where the
    pytree holds (F,)); a count mismatch means the checkpoint was written
    by a differently-configured model and raises CheckpointMismatchError
    naming the offending key and both shapes."""
    paths_leaves, treedef = jax.tree_util.tree_flatten_with_path(template)
    leaves = []
    for path, leaf in paths_leaves:
        key = jax.tree_util.keystr(path)
        if key not in flat:
            raise CheckpointMismatchError(
                f"checkpoint missing key {key!r} — it was written by a "
                "different model/optimizer configuration "
                f"({len(flat)} keys present)"
            )
        ref = np.asarray(leaf)
        got = np.asarray(flat[key])
        if got.size != ref.size:
            raise CheckpointMismatchError(
                f"checkpoint leaf {key!r} has shape {got.shape} but the "
                f"model expects {ref.shape} — wrong config for this "
                "checkpoint (e.g. different nz/nf/reduce_dim)"
            )
        leaves.append(got.astype(ref.dtype).reshape(ref.shape))
    return jax.tree_util.tree_unflatten(treedef, leaves)


def save_checkpoint(ckpt_dir: str, tree, step: int, keep: int = 5) -> str:
    """Write state at `step`, pruning to the newest `keep` checkpoints.

    The write is atomic (tmp + rename): latest_checkpoint never sees a
    half-written file, even if the writer (possibly the Trainer's async
    checkpoint worker) dies mid-save."""
    os.makedirs(ckpt_dir, exist_ok=True)
    # sweep tmp orphans from writers that died between savez and replace —
    # the keep-pruning below only matches final names, so without this,
    # multi-hundred-MB .tmp files would accumulate across crashed runs
    for stale in os.listdir(ckpt_dir):
        if re.fullmatch(r"\.tmp_ckpt_\d+\.npz", stale):
            try:
                os.remove(os.path.join(ckpt_dir, stale))
            except OSError:
                pass
    path = os.path.join(ckpt_dir, f"ckpt_{step:010d}.npz")
    tmp = os.path.join(ckpt_dir, f".tmp_ckpt_{step:010d}.npz")
    np.savez(tmp, **flatten_tree(tree))
    os.replace(tmp, path)
    if keep > 0:
        existing = sorted(
            f for f in os.listdir(ckpt_dir) if re.fullmatch(r"ckpt_\d+\.npz", f)
        )
        for old in existing[:-keep]:
            os.remove(os.path.join(ckpt_dir, old))
    return path


def latest_checkpoint(ckpt_dir: str) -> str | None:
    if not os.path.isdir(ckpt_dir):
        return None
    existing = sorted(
        f for f in os.listdir(ckpt_dir) if re.fullmatch(r"ckpt_\d+\.npz", f)
    )
    return os.path.join(ckpt_dir, existing[-1]) if existing else None


def restore_checkpoint(path: str, template):
    with np.load(path, allow_pickle=False) as data:
        return unflatten_tree(dict(data), template)


def restore_latest(ckpt_dir: str, template):
    """Restore the newest readable checkpoint, falling back past corrupt
    or truncated files (a crash can leave the newest .npz half-written on
    filesystems without atomic rename, or torn by the filesystem itself).

    Returns (state, path); (None, None) when no readable checkpoint
    exists. Corruption (unreadable zip/npz) logs a RuntimeWarning and
    falls back to the next-newest file; a CheckpointMismatchError (intact
    file, wrong model config) propagates — silently skipping to an older
    checkpoint of the same wrong run would hide a config error."""
    if not os.path.isdir(ckpt_dir):
        return None, None
    existing = sorted(
        (f for f in os.listdir(ckpt_dir) if re.fullmatch(r"ckpt_\d+\.npz", f)),
        reverse=True,
    )
    for fname in existing:
        path = os.path.join(ckpt_dir, fname)
        try:
            return restore_checkpoint(path, template), path
        except CheckpointMismatchError:
            raise
        except Exception as exc:  # zipfile.BadZipFile, EOFError, OSError, ...
            warnings.warn(
                f"checkpoint {path} is unreadable ({type(exc).__name__}: "
                f"{exc}) — falling back to the previous checkpoint",
                RuntimeWarning,
                stacklevel=2,
            )
    return None, None


def checkpoint_step(path: str) -> int:
    m = re.search(r"ckpt_(\d+)\.npz$", path)
    return int(m.group(1)) if m else 0
