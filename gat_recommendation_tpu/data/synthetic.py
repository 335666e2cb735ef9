"""Synthetic RetailRocket-like event generator.

Behavior parity with reference scripts/data/00_generate_synthetic_data.py:
Zipf(1.5) item popularity over a permuted catalog, exponential inter-event
gaps (mean 5 min, capped below the 30-min session gap), state-dependent
view/addtocart/transaction events. Deterministic under a seed; timestamps
globally monotonic (sessions are laid out sequentially in time).
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
) -> pd.DataFrame:
    rng = np.random.default_rng(seed)

    # Zipf(1.5) popularity over a permuted catalog.
    ranks = np.arange(1, num_items + 1, dtype=np.float64)
    probs = ranks**-1.5
    probs /= probs.sum()
    perm = rng.permutation(num_items)

    num_visitors = max(1, num_sessions // 2)
    rows = []
    t = int(start_ts)
    for _ in range(num_sessions):
        visitor = f"visitor_{rng.integers(0, num_visitors)}"
        length = int(2 + rng.poisson(mean_session_length - 2))
        last_view = None
        cart: list[int] = []
        for _ in range(length):
            r = rng.random()
            if last_view is not None and r < 0.12:
                event, item = "addtocart", last_view
                cart.append(item)
            elif cart and r < 0.17:
                event, item = "transaction", cart.pop()
            else:
                event = "view"
                item = int(perm[rng.choice(num_items, p=probs)])
                last_view = item
            tx = int(rng.integers(10_000, 99_999)) if event == "transaction" else None
            rows.append((t, visitor, event, item, tx))
            # Gap capped at 29 min: never splits a session (30-min rule).
            t += min(int(rng.exponential(5 * 60_000)), 29 * 60_000)
        # Inter-session gap always exceeds the 30-min sessionization rule.
        t += 35 * 60_000 + int(rng.exponential(90 * 60_000))

    return pd.DataFrame(rows, columns=COLUMNS)
