"""Benchmark: END-TO-END training throughput (sessions/sec/chip), flagship model.

Default mode measures the REAL training pipeline — host batch assembly
(C++ engine on a thread pool) -> GradIndex -> host->device transfer ->
sparse-grad train step — over full epochs of a reference-scale corpus
(120,436 sessions, 466,865-item catalog, co-occurrence graph built with the
production builder). `--device` runs the older device-only step benchmark
(pre-staged batches; the number VERDICT r1 flagged as overstating epoch
throughput).

Reference baseline: the optimized Graph Transformer trains one epoch of
120,436 RetailRocket sessions in ~27 min on an NVIDIA L4 (BASELINE.md)
= 74.3 sessions/sec. vs_baseline = ours / 74.3.

Timing method: epoch-granularity slope — wall-clock of 1 epoch vs 1+N epochs
with a single readback fence at each end, (t_long - t_short)/N. Per-step
fences cost ~1s each through remote-TPU relays (docs/PERFORMANCE.md).
Prints ONE JSON line.
"""

import argparse
import json
import time

import numpy as np

BASELINE_SESSIONS_PER_SEC = 120_436 / (27 * 60)  # reference: 27 min/epoch on L4
NUM_ITEMS = 466_865  # reference catalog size
BATCH_SIZE = 512


def make_corpus(num_sessions: int, num_items: int = NUM_ITEMS, seed: int = 0):
    """RetailRocket-shaped session corpus + co-occurrence graph.

    Session lengths follow the reference's heavy small-session skew (mean ~8
    events); item popularity is Zipf over a permuted catalog. The graph is
    built by the production builder (data/graph.build_co_event_graph,
    window 5) so assembly cost (CSR degrees) is realistic.
    """
    import pandas as pd

    from gat_recommendation_tpu.data.batching import SessionDataset
    from gat_recommendation_tpu.data.graph import build_co_event_graph

    rng = np.random.default_rng(seed)
    lengths = np.clip(rng.geometric(0.25, num_sessions) + 2, 3, 50)
    total = int(lengths.sum())
    ranks = np.arange(1, num_items, dtype=np.float64)
    probs = ranks**-1.2
    cum = np.cumsum(probs / probs.sum())
    perm = rng.permutation(num_items - 1)
    items = perm[np.minimum(np.searchsorted(cum, rng.random(total)), num_items - 2)] + 1
    sid = np.repeat(np.arange(num_sessions), lengths)
    df = pd.DataFrame(
        {
            "session_id": sid,
            "timestamp": np.arange(total, dtype=np.int64),
            "itemid": items,
            "event": "view",
        }
    )
    edges_df, stats = build_co_event_graph(df)
    edges = (
        edges_df["item_i"].to_numpy(np.int64),
        edges_df["item_j"].to_numpy(np.int64),
    )
    ds = SessionDataset(df, edges, num_negatives=5, num_items=num_items)
    return ds, stats


def make_training(num_items: int = NUM_ITEMS, mesh=None, bf16_moments: bool = False,
                  lazy: bool = False):
    import jax
    import jax.numpy as jnp

    from gat_recommendation_tpu.models import create_model
    from gat_recommendation_tpu.train.losses import dual_loss
    from gat_recommendation_tpu.train.optimizers import FusedEmbeddingAdamW
    from gat_recommendation_tpu.train.trainer import (
        make_chained_sparse_train_step,
        make_sparse_train_step,
    )

    model = create_model(
        "graph_transformer_optimized",
        num_items=num_items,
        embedding_dim=256,
        hidden_dim=256,
    )
    params, state = model.init_params(jax.random.key(0))
    state = {
        **state,
        "cached_pe": jnp.zeros(
            (params["item_embedding"].shape[0], model.config.laplacian_k)
        ),
    }
    # Measured fastest configuration: sparse embedding gradients (the dense
    # step's [V, D] backward scatter costs ~8 ms alone) + scatter-first AdamW
    # with host-precomputed duplicate grouping — see docs/PERFORMANCE.md.
    moment_dtype = {  # SR default-on for any bf16 buffer
        False: None, None: None, "both": jnp.bfloat16, True: jnp.bfloat16,
        "mu": (jnp.bfloat16, None), "nu": (None, jnp.bfloat16),
    }[bf16_moments]
    optimizer = FusedEmbeddingAdamW(
        1e-3, weight_decay=1e-5,  # auto: Pallas on TPU
        moment_dtype=moment_dtype,
        lazy=lazy,  # O(touched rows)/step — ops/lazy_adamw.py
    )
    opt_state = optimizer.init(params)
    if mesh is not None:
        # --mesh mode: the same math through the mesh-sharded dispatch
        # wrappers (parallel/steps.py). On a 1x1 mesh this measures the
        # sharding machinery's pure overhead vs the unsharded step
        # (docs/PARALLELISM.md "Measured per-step collective traffic").
        from gat_recommendation_tpu.parallel.steps import (
            make_chained_sharded_sparse_train_step,
            make_sharded_sparse_train_step,
            shard_params,
        )

        params, state, opt_state = shard_params(params, state, opt_state, mesh)
        step = make_sharded_sparse_train_step(model, dual_loss, optimizer, mesh, donate=True)
        chained = make_chained_sharded_sparse_train_step(
            model, dual_loss, optimizer, mesh, donate=True
        )
        return model, params, state, opt_state, step, chained
    step = make_sparse_train_step(model, dual_loss, optimizer, donate=True)
    chained = make_chained_sparse_train_step(model, dual_loss, optimizer, donate=True)
    return model, params, state, opt_state, step, chained


def main_e2e(
    num_sessions: int, workers: int, epochs_long: int, chain: int = 1, mesh_shape=None,
    bf16_moments: bool = False, lazy: bool = False, transfer_workers: int = 2,
) -> dict:
    import jax

    from gat_recommendation_tpu.data.batching import (
        chain_iterator,
        iterate_batches,
        make_grad_index,
        prefetch_to_device,
        stack_batches,
        stack_grad_indices,
        to_device,
    )

    t0 = time.perf_counter()
    ds, stats = make_corpus(num_sessions)
    setup_s = time.perf_counter() - t0

    mesh = None
    if mesh_shape is not None:
        from gat_recommendation_tpu.parallel.mesh import make_mesh
        from gat_recommendation_tpu.parallel.steps import shard_batch, shard_chained_batch

        mesh = make_mesh(*mesh_shape)
    model, params, state, opt_state, step, chained_step = make_training(
        mesh=mesh, bf16_moments=bf16_moments, lazy=lazy
    )
    rng = jax.random.key(0)

    if mesh is not None:
        transfer = lambda hb: (shard_batch(hb, mesh), make_grad_index(hb))  # noqa: E731
    else:
        transfer = lambda hb: (to_device(hb), make_grad_index(hb))  # noqa: E731

    def stack_group(items):
        gidxs = [make_grad_index(b) for b in items]
        stacked = stack_batches(items)
        staged = shard_chained_batch(stacked, mesh) if mesh is not None else to_device(stacked)
        return ("chained", staged, stack_grad_indices(gidxs))

    SUBCHAIN = 8  # partial groups sub-chain before falling back to singles

    def transfer_group(items):
        if len(items) == chain:
            return [stack_group(items)]
        out, i = [], 0
        while len(items) - i >= SUBCHAIN and chain > SUBCHAIN:
            out.append(stack_group(items[i:i + SUBCHAIN]))
            i += SUBCHAIN
        out.extend(transfer(b) for b in items[i:])
        return out

    def run_epochs(n_epochs, seed0):
        nonlocal params, state, opt_state
        t0 = time.perf_counter()
        nsteps = 0
        loss = None
        for e in range(n_epochs):
            raw = iterate_batches(
                ds, BATCH_SIZE, shuffle=True, seed=seed0 + e,
                engine="native", workers=workers,
            )
            if chain > 1:
                # C steps per dispatch/transfer (lax.scan) — the relay
                # round-trip amortization that closes the e2e gap
                # (docs/PERFORMANCE.md 'Step chaining').
                for entries in prefetch_to_device(
                    chain_iterator(raw, chain), size=4, transfer=transfer_group,
                    transfer_workers=transfer_workers,
                ):
                    for e in entries:
                        if isinstance(e, tuple) and len(e) == 3 and e[0] == "chained":
                            _, sb, sg = e
                            params, state, opt_state, lv = chained_step(
                                params, state, opt_state, sb, sg, rng, nsteps
                            )
                            loss = lv[-1]
                            nsteps += int(sg.uid.shape[0])
                        else:
                            params, state, opt_state, loss = step(
                                params, state, opt_state, e, jax.random.fold_in(rng, nsteps)
                            )
                            nsteps += 1
            else:
                for db in prefetch_to_device(
                    raw, size=4, transfer=transfer,
                    transfer_workers=transfer_workers,
                ):
                    params, state, opt_state, loss = step(
                        params, state, opt_state, db, jax.random.fold_in(rng, nsteps)
                    )
                    nsteps += 1
        _ = float(loss)  # single fence: forces the whole chain to execute
        return time.perf_counter() - t0

    # Warmup over the SAME seed schedule the timed windows use, so every
    # (bucket, unique-bucket) jit shape the timed runs will see is compiled
    # (a single stray compile costs 20-40s through the remote-TPU relay and
    # would swamp the slope).
    t_warm = run_epochs(1 + epochs_long, seed0=0)
    t_short = run_epochs(1, seed0=0)
    t_long = run_epochs(1 + epochs_long, seed0=0)
    per_epoch = (t_long - t_short) / epochs_long
    sessions_per_sec = len(ds) / per_epoch
    return {
        "metric": "train_sessions_per_sec_per_chip_e2e"
        + (f"_mesh{mesh_shape[0]}x{mesh_shape[1]}" if mesh_shape else "")
        + (f"_bf16mom_{bf16_moments}" if bf16_moments else "")
        + ("" if lazy else "_eager"),  # lazy = the default (exact semantics)
        "value": round(sessions_per_sec, 1),
        "unit": "sessions/s",
        "vs_baseline": round(sessions_per_sec / BASELINE_SESSIONS_PER_SEC, 2),
        "_detail": {
            "sessions": len(ds),
            "graph_edges": int(stats["num_edges"]),
            "epoch_s": round(per_epoch, 3),
            "t_warm": round(t_warm, 2),
            "t_short": round(t_short, 2),
            "t_long": round(t_long, 2),
            "workers": workers,
            "chain": chain,
            "lazy": lazy,
            "transfer_workers": transfer_workers,
            "corpus_setup_s": round(setup_s, 1),
        },
    }


def make_batches(num_items: int, batch_size: int, num_batches: int, seed: int = 0):
    """Synthetic bucketed batches with a RetailRocket-like session-size mix
    (device-only mode)."""
    from gat_recommendation_tpu.data.batching import collate

    rng = np.random.default_rng(seed)
    batches = []
    bucket_probs = {8: 0.70, 16: 0.20, 32: 0.08, 56: 0.02}
    buckets = rng.choice(
        list(bucket_probs), size=num_batches, p=list(bucket_probs.values())
    )
    for b in range(num_batches):
        bucket_n = int(buckets[b])
        samples = []
        for _ in range(batch_size):
            n = int(np.clip(rng.geometric(0.25) + 1, 2, bucket_n))
            nodes = np.sort(
                rng.choice(np.arange(1, num_items), size=n, replace=False)
            ).astype(np.int32)
            m = int(rng.integers(n, 6 * n))  # avg degree ~18 in the real graph
            samples.append(
                {
                    "nodes": nodes,
                    "edge_src": rng.integers(0, n, m).astype(np.int32),
                    "edge_dst": rng.integers(0, n, m).astype(np.int32),
                    "target": int(rng.integers(1, num_items)),
                    "negatives": rng.integers(1, num_items, 5).astype(np.int32),
                }
            )
        batches.append(collate(samples, bucket_n, 5))
    return batches


def main_device(lazy: bool = False) -> dict:
    """Device-only step rate: pre-staged batches, no host pipeline."""
    import jax

    from gat_recommendation_tpu.data.batching import make_grad_index, to_device

    model, params, state, opt_state, step, _chained = make_training(lazy=lazy)
    dev_batches = [
        (to_device(hb), make_grad_index(hb))
        for hb in make_batches(NUM_ITEMS, BATCH_SIZE, 12)
    ]
    rng = jax.random.key(0)

    for db in dev_batches:  # warmup: compile every bucket shape, then fence
        params, state, opt_state, loss = step(params, state, opt_state, db, rng)
    _ = float(loss)

    def run(nsteps):
        nonlocal params, state, opt_state
        t0 = time.perf_counter()
        n = 0
        while n < nsteps:
            for db in dev_batches:
                params, state, opt_state, loss = step(
                    params, state, opt_state, db, jax.random.fold_in(rng, n)
                )
                n += 1
                if n >= nsteps:
                    break
        _ = float(loss)  # hard fence
        return time.perf_counter() - t0

    deltas = []
    for _ in range(2):
        t_short = run(20)
        t_long = run(320)
        deltas.append((t_long - t_short) / 300)
    per_step = sum(deltas) / len(deltas)
    sessions_per_sec = BATCH_SIZE / per_step
    return {
        "metric": "train_sessions_per_sec_per_chip" + ("" if lazy else "_eager"),
        "value": round(sessions_per_sec, 1),
        "unit": "sessions/s",
        "vs_baseline": round(sessions_per_sec / BASELINE_SESSIONS_PER_SEC, 2),
    }


def main():
    # Persistent XLA cache: the bucket-ladder jit variants cost ~15 min of
    # compiles cold through the remote relay; warm starts reload from disk.
    from gat_recommendation_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()

    p = argparse.ArgumentParser()
    p.add_argument("--device", action="store_true", help="device-only step rate")
    p.add_argument("--sessions", type=int, default=120_436)
    p.add_argument("--workers", type=int, default=3)
    # 6-epoch slope window: with the lazy step an epoch is ~0.55 s, so a
    # 3-epoch window left only ~1.6 s of signal against ~0.2 s of relay
    # timing noise; 6 epochs doubles the signal for ~2 s of extra runtime.
    p.add_argument("--epochs", type=int, default=6, help="slope window (e2e)")
    p.add_argument("--chain", type=int, default=32,
                   help="optimizer steps per dispatch (lax.scan; 1 = unchained)")
    p.add_argument("--bf16-moments", nargs="?", const="both", default=None,
                   choices=["both", "mu", "nu"],
                   help="bf16 moment storage + stochastic rounding (halved "
                        "moment HBM traffic; quality measured in "
                        "docs/EXPERIMENTS.md). Optional value narrows one "
                        "buffer: 'nu' is the quality-parity sweet spot")
    p.add_argument("--mesh", default=None,
                   help="DATAxMODEL (e.g. 1x1, 4x2): run e2e through the "
                        "mesh-sharded steps; 1x1 measures sharding overhead "
                        "on one real chip")
    p.add_argument("--lazy", action=argparse.BooleanOptionalAction, default=True,
                   help="lazy catch-up AdamW: O(touched rows) per step "
                        "instead of the eager dense [V, D] optimizer sweep "
                        "(ops/lazy_adamw.py; ~exact dense-AdamW semantics — "
                        "equivalence + reference-scale quality in "
                        "docs/EXPERIMENTS.md). --no-lazy restores the eager "
                        "sweep (the r1-r4 official config)")
    p.add_argument("--transfer-workers", type=int, default=3,
                   help="parallel host->device transfer threads (relay "
                        "device_put round trips serialize on one thread)")
    args = p.parse_args()
    mesh_shape = tuple(int(x) for x in args.mesh.split("x")) if args.mesh else None
    result = (
        main_device(args.lazy)
        if args.device
        else main_e2e(args.sessions, args.workers, args.epochs, args.chain, mesh_shape,
                      args.bf16_moments, args.lazy, args.transfer_workers)
    )
    detail = result.pop("_detail", None)
    if detail is not None:
        import sys

        print(f"[bench detail] {detail}", file=sys.stderr)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
