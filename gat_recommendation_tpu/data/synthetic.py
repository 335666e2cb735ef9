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


def generate_structured_events(
    num_sessions: int = 20_000,
    num_items: int = 5_000,
    seed: int = 42,
    num_active: int | None = None,
    num_clusters: int | None = None,
    successors_per_item: int = 8,
    cross_cluster_successors: int = 2,
    dirichlet_alpha: float = 0.4,
    noise_prob: float = 0.15,
    repeat_prob: float = 0.25,
    pop_exponent: float = 1.05,
    mean_session_length: int = 8,
    start_ts: int = 1_430_000_000_000,
) -> pd.DataFrame:
    """Events whose sessions are random walks on a hidden item-transition graph.

    The latent structure (none of it observable in the event stream):

    * Only ``num_active`` of the ``num_items`` ids ever occur (RetailRocket
      shape: 82k live items in a 466,865-id space — reference
      DATA_PIPELINE.md), partitioned into ``num_clusters`` interest clusters.
    * Every active item has ``successors_per_item`` successors — most inside
      its own cluster, ``cross_cluster_successors`` into the two *linked*
      clusters (a ring + skip over clusters), with Dirichlet(α)-skewed
      transition weights. This is the Markov chain sessions walk on.
    * A session starts at an item drawn from a NEAR-FLAT Zipf
      (``pop_exponent``≈1.05 over 82k items ⇒ the global popularity
      baseline is weak by construction) and then follows the chain. With
      probability ``noise_prob`` a step emits a popularity-drawn distractor
      instead and the walk state does not advance; with probability
      ``repeat_prob`` a walk step REVISITS an earlier walk item (backtracking
      the state there — real shoppers bounce between product pages, and
      since evaluation never masks seen items, repeat-finals are genuinely
      scoreable targets); the final event is always a true walk step, so the
      training target (last item — the dataset contract) is predictable from
      the context.

    Why this discriminates between the model families where the independent-
    draws generator cannot: the target is a 1-hop successor of the walk
    frontier, so scoring it requires localizing the session inside the
    transition graph from the *set* of context items (order is not observable
    to the models). Multi-hop message passing over the session's induced
    co-occurrence subgraph — whose edges ARE realized walk transitions —
    performs exactly that localization; attention is what separates true walk
    context from distractor hubs; and the cluster partition puts genuine
    community structure into the Laplacian eigenvectors the Graph
    Transformer's PE consumes. Popularity alone resolves none of it.

    All draws are vectorized across sessions (lockstep walk simulation), so
    reference scale (~1.4M events) generates in seconds. Deterministic under
    ``seed``; timestamps globally monotonic, intra-session gaps < 30 min and
    inter-session gaps > 30 min (sessionize-stable, like the parity
    generator).
    """
    rng = np.random.default_rng(seed)
    if num_active is None:
        num_active = max(min(num_items - 1, 50), num_items // 6)
    if num_clusters is None:
        num_clusters = max(2, num_active // 100)
    k_total = successors_per_item
    k_cross = min(cross_cluster_successors, k_total - 1)

    # --- latent structure ------------------------------------------------
    # Active ids (never 0: the padding row), shuffled then chunked into
    # contiguous-by-shuffle clusters of near-equal size.
    active = rng.choice(np.arange(1, num_items, dtype=np.int64), size=num_active, replace=False)
    order = rng.permutation(num_active)
    cluster_of = np.empty(num_active, dtype=np.int64)
    bounds = np.linspace(0, num_active, num_clusters + 1).astype(np.int64)
    members: list[np.ndarray] = []
    for c in range(num_clusters):
        idx = order[bounds[c] : bounds[c + 1]]
        cluster_of[idx] = c
        members.append(idx)

    # Successor table [num_active, K] in active-index space: in-cluster draws
    # plus k_cross draws into the two linked clusters (ring + skip ⇒
    # long-range co-occurrence between linked communities).
    succ = np.empty((num_active, k_total), dtype=np.int64)
    link_a = np.arange(num_clusters)
    link_b = (link_a + 1) % num_clusters
    link_c = (link_a + max(2, num_clusters // 3)) % num_clusters
    for c in range(num_clusters):
        mem = members[c]
        n_mem = len(mem)
        k_in = k_total - k_cross
        pick = rng.integers(0, max(n_mem - 1, 1), size=(n_mem, k_in))
        own = np.arange(n_mem)[:, None]
        pick = pick + (pick >= own)  # skip self without rejection
        succ[mem, :k_in] = mem[np.minimum(pick, n_mem - 1)]
        for j in range(k_cross):
            tgt = members[int((link_b if j % 2 == 0 else link_c)[c])]
            succ[mem, k_in + j] = tgt[rng.integers(0, len(tgt), size=n_mem)]

    # Dirichlet(α)-skewed transition weights, as per-row cumulative sums.
    gam = rng.gamma(dirichlet_alpha, size=(num_active, k_total))
    cum_tr = np.cumsum(gam / gam.sum(axis=1, keepdims=True), axis=1)

    # Near-flat popularity over actives (session starts + distractors).
    ranks = np.arange(1, num_active + 1, dtype=np.float64)
    pw = ranks**-pop_exponent
    pop_cum = np.cumsum(pw / pw.sum())
    pop_perm = rng.permutation(num_active)

    def draw_pop(n: int) -> np.ndarray:
        """n active-indices drawn from the near-flat popularity."""
        return pop_perm[np.minimum(np.searchsorted(pop_cum, rng.random(n)), num_active - 1)]

    # --- lockstep walk simulation ----------------------------------------
    lengths = np.clip(3 + rng.poisson(max(mean_session_length - 3, 1), size=num_sessions), 3, 50)
    max_len = int(lengths.max())
    state = draw_pop(num_sessions)  # walk state, active-index space
    emitted = np.zeros((num_sessions, max_len), dtype=np.int64)
    emitted[:, 0] = state
    # Distinct walk items visited so far (repeats resample from here;
    # distractors never enter it).
    walk_hist = np.zeros((num_sessions, max_len), dtype=np.int64)
    walk_hist[:, 0] = state
    walk_count = np.ones(num_sessions, dtype=np.int64)
    for t in range(1, max_len):
        alive = t < lengths
        is_last = t == lengths - 1
        # Distractors never land on the final event: the target stays
        # walk-predictable.
        noisy = alive & ~is_last & (rng.random(num_sessions) < noise_prob)
        walk = alive & ~noisy
        rep = walk & (rng.random(num_sessions) < repeat_prob) & (walk_count >= 2)
        r = np.flatnonzero(rep)
        if len(r):
            pick = (rng.random(len(r)) * walk_count[r]).astype(np.int64)
            back = walk_hist[r, pick]
            emitted[r, t] = back
            state[r] = back  # the walk backtracks and continues from there
        w = np.flatnonzero(walk & ~rep)
        if len(w):
            u = rng.random(len(w))
            choice = (u[:, None] > cum_tr[state[w]]).sum(axis=1)
            nxt = succ[state[w], np.minimum(choice, k_total - 1)]
            emitted[w, t] = nxt
            state[w] = nxt
            walk_hist[w, walk_count[w]] = nxt
            walk_count[w] += 1
        d = np.flatnonzero(noisy)
        if len(d):
            emitted[d, t] = draw_pop(len(d))

    # --- flatten to the event schema --------------------------------------
    total = int(lengths.sum())
    valid = np.arange(max_len)[None, :] < lengths[:, None]
    item_col = active[emitted[valid]]  # session-major flatten = time order
    sid = np.repeat(np.arange(num_sessions), lengths)

    # Event-type realism (items unchanged): ~10% of non-final events flagged
    # addtocart, a third of those followed by a transaction-style row later
    # is overkill — a flat relabel keeps the RetailRocket event mix shape.
    event_col = np.full(total, "view", dtype=object)
    roll = rng.random(total)
    is_final = np.zeros(total, dtype=bool)
    is_final[np.cumsum(lengths) - 1] = True
    event_col[(roll < 0.08) & ~is_final] = "addtocart"
    event_col[(roll > 0.97) & ~is_final] = "transaction"
    tx_col = np.full(total, np.nan, dtype=object)
    tx_mask = event_col == "transaction"
    tx_col[tx_mask] = rng.integers(10_000, 99_999, size=int(tx_mask.sum())).astype(object)

    # Timestamps: same sessionize-stable scheme as the parity generator.
    # gaps[i] is the interval AFTER event i (ts[i] = start + Σ_{j<i} gaps[j]),
    # so the >30-min session boundary lives on each session's FINAL event.
    intra = np.minimum(rng.exponential(5 * 60_000, size=total), 29 * 60_000 - 1).astype(np.int64)
    inter = (35 * 60_000 + rng.exponential(90 * 60_000, size=num_sessions)).astype(np.int64)
    gaps = intra.copy()
    final_idx = np.cumsum(lengths) - 1
    gaps[final_idx[:-1]] = inter[:-1]
    ts_col = start_ts + np.concatenate([[0], np.cumsum(gaps)[:-1]])

    visitors = rng.integers(0, max(1, num_sessions // 2), size=num_sessions)
    return pd.DataFrame(
        {
            "timestamp": ts_col,
            "visitorid": np.char.add("visitor_", visitors[sid].astype(np.str_)),
            "event": event_col,
            "itemid": item_col,
            "transactionid": tx_col,
        },
        columns=COLUMNS,
    )
