"""Parameter checkpointing: flat-npz save/load (chainer-snapshot-style
schema) and pytree flattening helpers.

The on-disk format is a flat npz keyed by slash-joined tree paths
(``extractor/res2/a/conv1/W``) — deliberately the same *shape* of contract as
the reference's ``snapshot_model.npz`` (SURVEY.md §5 checkpoint notes) so
weight conversion tooling is a mechanical rename. Values are stored in this
framework's native layouts (HWIO convs, (in, out) linears, NHWC activations).
"""

from __future__ import annotations

from typing import Dict

import jax
import numpy as np


def flatten_params(params, prefix="") -> Dict[str, np.ndarray]:
    out = {}
    for k, v in params.items():
        path = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            out.update(flatten_params(v, path))
        else:
            out[path] = np.asarray(v)
    return out


def unflatten_params(flat: Dict[str, np.ndarray]):
    tree: dict = {}
    for path, v in flat.items():
        keys = path.split("/")
        node = tree
        for k in keys[:-1]:
            node = node.setdefault(k, {})
        node[keys[-1]] = v
    return tree


def save_params(path: str, params) -> None:
    np.savez(path, **flatten_params(params))


def save_train_state(directory: str, state) -> None:
    """Full training-state checkpoint (params + optimizer + step) for
    resume — a capability the reference lacks entirely (SURVEY.md §5:
    'no optimizer/trainer-state snapshot and no resume path').

    Deliberately collective-free (one flat npz of tree leaves): the train
    loop calls this on process 0 only, and a checkpointer that runs internal
    cross-process barriers (orbax does) would deadlock/crash the other
    ranks' next collective — the exact failure the 2-process full-flow test
    caught (tests/test_multihost.py::test_two_process_full_train_flow)."""
    import os
    import os.path as osp

    leaves = jax.tree.leaves(jax.tree.map(np.asarray, state))
    os.makedirs(directory, exist_ok=True)
    tmp = osp.join(directory, "state.tmp.npz")  # savez appends .npz itself
    np.savez(tmp, **{f"leaf_{i}": leaf for i, leaf in enumerate(leaves)})
    os.replace(tmp, osp.join(directory, "state.npz"))


def restore_train_state(directory: str, like):
    """Restore a TrainState saved by save_train_state; ``like`` provides
    the tree structure/dtypes. Falls back to orbax layout for checkpoints
    written by earlier versions."""
    import os.path as osp

    path = osp.join(directory, "state.npz")
    structure = jax.tree_util.tree_structure(like)
    if osp.exists(path):
        with np.load(path) as data:
            leaves = [data[f"leaf_{i}"] for i in range(len(data.files))]
        return jax.tree_util.tree_unflatten(structure, leaves)

    import orbax.checkpoint as ocp

    with ocp.PyTreeCheckpointer() as ckptr:
        restored = ckptr.restore(
            osp.abspath(directory),
            item=jax.tree.map(np.asarray, like),
        )
    return jax.tree_util.tree_unflatten(
        structure, jax.tree.leaves(restored)
    )


def conform_params(tree, like):
    """Validate that ``tree`` has exactly ``like``'s paths/shapes and cast
    leaves to ``like``'s dtypes. Shared by every param-loading path."""
    flat = flatten_params(tree)
    want = flatten_params(like)
    missing = set(want) - set(flat)
    extra = set(flat) - set(want)
    if missing or extra:
        raise ValueError(
            f"param tree mismatch: missing={sorted(missing)[:5]} "
            f"extra={sorted(extra)[:5]}"
        )
    for k, v in want.items():
        if flat[k].shape != v.shape:
            raise ValueError(
                f"shape mismatch at {k}: {flat[k].shape} vs {v.shape}"
            )
    return jax.tree.map(
        lambda loaded, ref: np.asarray(loaded, ref.dtype),
        tree,
        jax.tree.map(np.asarray, like),
    )


def load_params(path: str, like=None):
    """Load params from npz. If ``like`` is given, validate that the loaded
    tree has exactly the same paths/shapes and cast to its dtypes."""
    try:
        with np.load(path) as data:
            flat = {k: data[k] for k in data.files}
    except Exception as e:
        raise ValueError(
            f"could not read '{path}' as a parameter npz: {e}. Accepted "
            "pretrained_model forms: a snapshot npz saved by this "
            "framework, a reference chainer snapshot_model.npz (or "
            "'chainer:<path>'), a Detectron '<model>.pkl', or "
            "'auto'/'imagenet:<npz>' for ImageNet backbone weights."
        ) from e
    tree = unflatten_params(flat)
    if like is not None:
        tree = conform_params(tree, like)
    return tree
