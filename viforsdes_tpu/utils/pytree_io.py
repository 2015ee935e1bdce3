"""Checkpoint serialization: params pytrees <-> flat npz archives.

Replaces the reference's ``torch.save``/``weights_only=True`` checkpoint
(``posterior/variational_posterior.py:150-192``) with a pickle-free format:
a single ``.npz`` holding every leaf under its tree path plus a JSON metadata
blob. Loading validates structure against a template pytree (the analog of the
reference's pydantic checkpoint model).
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any

import jax
import numpy as np

_META_KEY = "__viforsdes_meta__"
_SEP = "/"

# Bumped whenever the on-disk tree structure of a SAVED state changes in a
# way templates cannot absorb. History:
#   1 — initial format (implicit; checkpoints carry no version field)
#   2 — optimizer state wrapped in optax.apply_if_finite (ApplyIfFiniteState
#       around the chain state) + optional params["obs"] log-variance
CHECKPOINT_FORMAT_VERSION = 2


def flatten_pytree(tree: Any, prefix: str = "") -> dict[str, np.ndarray]:
    flat = {}
    leaves_with_paths = jax.tree_util.tree_flatten_with_path(tree)[0]
    for path, leaf in leaves_with_paths:
        key = prefix + _SEP.join(_path_element(p) for p in path)
        flat[key] = np.asarray(leaf)
    return flat


def _path_element(p) -> str:
    if hasattr(p, "key"):
        return str(p.key)
    if hasattr(p, "idx"):
        return str(p.idx)
    if hasattr(p, "name"):  # GetAttrKey (NamedTuple fields, e.g. optax states)
        return str(p.name)
    return str(p)


def unflatten_like(template: Any, flat: dict[str, np.ndarray], prefix: str = "") -> Any:
    """Rebuild a pytree with ``template``'s structure from a flat mapping."""
    paths_and_leaves, treedef = jax.tree_util.tree_flatten_with_path(template)
    leaves = []
    for path, leaf in paths_and_leaves:
        key = prefix + _SEP.join(_path_element(p) for p in path)
        if key not in flat:
            raise KeyError(f"checkpoint missing array for {key!r}")
        arr = flat[key]
        if tuple(arr.shape) != tuple(np.shape(leaf)):
            raise ValueError(
                f"checkpoint shape mismatch at {key!r}: "
                f"{arr.shape} vs expected {np.shape(leaf)}"
            )
        leaves.append(jax.numpy.asarray(arr))
    return jax.tree_util.tree_unflatten(treedef, leaves)


def save_checkpoint(path: str | Path, trees: dict[str, Any], metadata: dict) -> None:
    """Save named pytrees + JSON metadata into one ``.npz``."""
    flat: dict[str, np.ndarray] = {}
    for name, tree in trees.items():
        flat.update(flatten_pytree(tree, prefix=name + _SEP))
    flat[_META_KEY] = np.frombuffer(
        json.dumps(
            {"format_version": CHECKPOINT_FORMAT_VERSION, **metadata}
        ).encode("utf-8"),
        dtype=np.uint8,
    )
    np.savez(Path(path), **flat)


def load_checkpoint(
    path: str | Path,
    templates: dict[str, Any],
    *,
    required_metadata: tuple[str, ...] = (),
    kind: str = "viforsdes",
) -> tuple[dict[str, Any], dict]:
    """Load named pytrees (validated against templates) + metadata.

    ``required_metadata`` is the metadata schema: missing keys raise a clear
    "not a <kind> checkpoint" error instead of a downstream KeyError (the
    analog of the reference's pydantic checkpoint validation,
    ``variational_posterior.py:57-65``).
    """
    with np.load(Path(path)) as archive:
        flat = {k: archive[k] for k in archive.files}
    if _META_KEY not in flat:
        raise ValueError("not a viforsdes checkpoint: missing metadata blob")
    metadata = json.loads(bytes(flat.pop(_META_KEY)).decode("utf-8"))
    missing = [k for k in required_metadata if k not in metadata]
    if missing:
        raise ValueError(
            f"not a {kind} checkpoint (or an incompatible version): "
            f"metadata is missing keys {missing}; found {sorted(metadata)}"
        )
    version = metadata.get("format_version", 1)
    try:
        trees = {
            name: unflatten_like(template, flat, prefix=name + _SEP)
            for name, template in templates.items()
        }
    except KeyError as exc:
        # Structure drift between versions (advisor round-3 finding): e.g. a
        # version-1 opt_state predates the optax.apply_if_finite wrapper, so
        # its tree paths no longer match the current template.
        raise ValueError(
            f"checkpoint structure mismatch while restoring a {kind} "
            f"checkpoint (saved format_version={version}, current="
            f"{CHECKPOINT_FORMAT_VERSION}): {exc}. If the checkpoint predates "
            "version 2, the optimizer state cannot be migrated — restart "
            "training, or restore only the params/EMA trees."
        ) from exc
    return trees, metadata
