"""Orbax-backed checkpointing with JSON meta sidecar.

Replaces the reference's torch.save checkpoints (trainer.py:175-198). Arrays
are saved as a flat leaf list (robust to optax NamedTuple states); structure
is rebuilt from templates on restore. epoch/history/model_config live in
meta.json so architecture is recoverable without shape inference (though the
serving layer also keeps the reference's infer-from-shapes property).
"""

from __future__ import annotations

import json
from pathlib import Path

import jax


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


def save(path: str | Path, params, state, opt_state, meta: dict) -> None:
    path = Path(path).absolute()
    path.parent.mkdir(parents=True, exist_ok=True)
    tree = {"params": params, "state": state, "opt_state": opt_state}
    leaves, treedef = jax.tree.flatten(tree)
    _checkpointer().save(path / "arrays", {str(i): leaf for i, leaf in enumerate(leaves)}, force=True)
    with open(path / "meta.json", "w") as f:
        json.dump(meta, f, indent=2)


def restore(path: str | Path, params_template, state_template, opt_state_template):
    """Restore into the template's structure. Returns (params, state, opt_state, meta)."""
    path = Path(path).absolute()
    tree = {
        "params": params_template,
        "state": state_template,
        "opt_state": opt_state_template,
    }
    leaves, treedef = jax.tree.flatten(tree)
    restored = _checkpointer().restore(path / "arrays")
    new_leaves = [restored[str(i)] for i in range(len(leaves))]
    rebuilt = jax.tree.unflatten(treedef, new_leaves)
    with open(path / "meta.json") as f:
        meta = json.load(f)
    return rebuilt["params"], rebuilt["state"], rebuilt["opt_state"], meta


def load_meta(path: str | Path) -> dict:
    with open(Path(path) / "meta.json") as f:
        return json.load(f)


def restore_params_state(path: str | Path, params_template, state_template):
    """Restore only (params, state) for eval/serving consumers.

    Dict flatten order is sorted by key (opt_state < params < state), so the
    params/state leaves occupy a deterministic suffix of the flat list; the
    opt_state prefix is discarded without needing its template.
    """
    restored = _checkpointer().restore(Path(path).absolute() / "arrays")
    p_leaves, p_def = jax.tree.flatten(params_template)
    s_leaves, s_def = jax.tree.flatten(state_template)
    # dict flatten order is sorted by key: opt_state < params < state.
    n_total = len(restored)
    n_p, n_s = len(p_leaves), len(s_leaves)
    n_o = n_total - n_p - n_s
    params = jax.tree.unflatten(p_def, [restored[str(i)] for i in range(n_o, n_o + n_p)])
    state = jax.tree.unflatten(s_def, [restored[str(i)] for i in range(n_o + n_p, n_total)])
    return params, state
