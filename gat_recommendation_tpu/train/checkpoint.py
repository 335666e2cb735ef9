"""Orbax-backed checkpointing with JSON meta sidecar.

Replaces the reference's torch.save checkpoints (trainer.py:175-198). Arrays
are saved as a flat leaf list (robust to optax NamedTuple states); structure
is rebuilt from templates on restore. epoch/history/model_config live in
meta.json so architecture is recoverable without shape inference (though the
serving layer also keeps the reference's infer-from-shapes property).

A leaf-path manifest (meta.json "leaf_paths") records the key path of every
saved leaf; restore verifies the template produces the same paths, so a
renamed/reordered top-level key fails loudly instead of silently misaligning
every array. Note on shapes: tables are padded to TABLE_PAD_MULTIPLE rows
(models/base.py) — checkpoints saved under a different pad multiple (it was
64 before 512) have different table shapes and will fail restore by design;
re-export rather than silently pad/slice optimizer moments.
"""

from __future__ import annotations

import json
from pathlib import Path

import jax


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


def _restore_arrays(arrays_path, n_leaves: int, template_by_key: dict):
    """Restore the flat {str(i): array} dict, placement driven by TEMPLATES.

    Without explicit restore args Orbax re-reads the sharding recorded at
    save time — which cannot be materialized on a different topology (e.g. a
    CPU serving host restoring a TPU-written checkpoint fails with a
    sharding-deserialization error). Leaves with a jax.Array template
    restore onto that template's sharding (mesh-sharded on resume,
    single-device on serving hosts); leaves without a template restore as
    host numpy, which needs no device at all.
    """
    import numpy as np
    import orbax.checkpoint as ocp

    args = {}
    for i in range(n_leaves):
        leaf = template_by_key.get(str(i))
        if isinstance(leaf, jax.Array):
            args[str(i)] = ocp.ArrayRestoreArgs(
                sharding=leaf.sharding, global_shape=leaf.shape, dtype=leaf.dtype
            )
        else:
            args[str(i)] = ocp.RestoreArgs(restore_type=np.ndarray)
    return _checkpointer().restore(arrays_path, restore_args=args)


def _leaf_paths(tree) -> list[str]:
    flat, _ = jax.tree_util.tree_flatten_with_path(tree)
    return [jax.tree_util.keystr(path) for path, _ in flat]


def save(path: str | Path, params, state, opt_state, meta: dict) -> None:
    """Save arrays + meta sidecar.

    Multi-host safe: the Orbax array save is a COLLECTIVE — every process
    must call save() (each writes its addressable shards of sharded arrays);
    the meta.json sidecar is written by process 0 only (the checkpoint
    directory is shared storage in multi-host deployments).
    """
    path = Path(path).absolute()
    if jax.process_index() == 0:
        path.parent.mkdir(parents=True, exist_ok=True)
    tree = {"params": params, "state": state, "opt_state": opt_state}
    leaves, treedef = jax.tree.flatten(tree)
    _checkpointer().save(path / "arrays", {str(i): leaf for i, leaf in enumerate(leaves)}, force=True)
    if jax.process_index() == 0:
        meta = dict(meta)
        meta["leaf_paths"] = _leaf_paths(tree)
        with open(path / "meta.json", "w") as f:
            json.dump(meta, f, indent=2)


def _verify_manifest(meta: dict, tree) -> None:
    saved = meta.get("leaf_paths")
    if saved is None:
        return  # pre-manifest checkpoint: keep restoring (legacy behavior)
    now = _leaf_paths(tree)
    if saved != now:
        missing = [p for p in saved if p not in now]
        extra = [p for p in now if p not in saved]
        raise ValueError(
            "Checkpoint leaf-path manifest mismatch (renamed/reordered keys "
            f"would silently misalign arrays). In checkpoint only: {missing[:5]}; "
            f"in template only: {extra[:5]}"
        )


def restore(path: str | Path, params_template, state_template, opt_state_template):
    """Restore into the template's structure. Returns (params, state, opt_state, meta)."""
    path = Path(path).absolute()
    tree = {
        "params": params_template,
        "state": state_template,
        "opt_state": opt_state_template,
    }
    with open(path / "meta.json") as f:
        meta = json.load(f)
    _verify_manifest(meta, tree)
    leaves, treedef = jax.tree.flatten(tree)
    restored = _restore_arrays(
        path / "arrays", len(leaves), {str(i): leaf for i, leaf in enumerate(leaves)}
    )
    new_leaves = [restored[str(i)] for i in range(len(leaves))]
    rebuilt = jax.tree.unflatten(treedef, new_leaves)
    return rebuilt["params"], rebuilt["state"], rebuilt["opt_state"], meta


def load_meta(path: str | Path) -> dict:
    with open(Path(path) / "meta.json") as f:
        return json.load(f)


def restore_params_state(path: str | Path, params_template, state_template):
    """Restore only (params, state) for eval/serving consumers.

    With a manifest, the params/state leaf indices are located by key-path
    prefix — immune to key renames (which now fail loudly in restore()).
    Pre-manifest checkpoints fall back to the dict-sort-order rule
    (opt_state < params < state => params/state occupy the flat suffix).
    """
    path = Path(path).absolute()
    p_leaves, p_def = jax.tree.flatten(params_template)
    s_leaves, s_def = jax.tree.flatten(state_template)
    meta = load_meta(path)
    saved = meta.get("leaf_paths")
    if saved is not None:
        p_idx = [i for i, p in enumerate(saved) if p.startswith("['params']")]
        s_idx = [i for i, p in enumerate(saved) if p.startswith("['state']")]
        if len(p_idx) != len(p_leaves) or len(s_idx) != len(s_leaves):
            raise ValueError(
                f"Checkpoint has {len(p_idx)} params / {len(s_idx)} state leaves; "
                f"templates expect {len(p_leaves)} / {len(s_leaves)}"
            )
        # Verify the sub-manifests match the templates' own paths.
        want_p = [f"['params']{p}" for p in _leaf_paths(params_template)]
        want_s = [f"['state']{p}" for p in _leaf_paths(state_template)]
        if [saved[i] for i in p_idx] != want_p or [saved[i] for i in s_idx] != want_s:
            raise ValueError("Checkpoint params/state leaf paths do not match templates")
        templates = {
            **{str(i): leaf for i, leaf in zip(p_idx, p_leaves)},
            **{str(i): leaf for i, leaf in zip(s_idx, s_leaves)},
        }
        # opt_state leaves have no template here: they restore as host numpy
        # (sharding-free), so serving hosts never touch the saved topology.
        restored = _restore_arrays(path / "arrays", len(saved), templates)
    else:
        restored = _checkpointer().restore(path / "arrays")
        n_total = len(restored)
        n_p, n_s = len(p_leaves), len(s_leaves)
        n_o = n_total - n_p - n_s
        p_idx = list(range(n_o, n_o + n_p))
        s_idx = list(range(n_o + n_p, n_total))
    params = jax.tree.unflatten(p_def, [restored[str(i)] for i in p_idx])
    state = jax.tree.unflatten(s_def, [restored[str(i)] for i in s_idx])
    return params, state
