"""Trainer: jitted train/eval steps, epoch loop, Orbax checkpoints, early stop.

Re-design of reference etpgt/train/trainer.py:17-252 with the same training
policy (AdamW, eval every N epochs on recall/ndcg@{10,20}, best/latest
checkpoints, early stopping on recall@k_values[0] with patience) plus what the
reference lacks: true resume from checkpoint (SURVEY.md §5).

The hot path is a single jitted `train_step` per (batch_size, bucket) shape:
forward -> loss -> grads -> AdamW update, with the embedding padding row's
gradient zeroed (torch padding_idx parity, reference base.py:36).
"""

from __future__ import annotations

import functools
import json
import time
from dataclasses import asdict
from pathlib import Path
from typing import Callable, Iterable

import jax
import jax.numpy as jnp
import numpy as np
import optax

from gat_recommendation_tpu.train.metrics import compute_ndcg_at_k, compute_recall_at_k
from gat_recommendation_tpu.utils.logging import get_logger

logger = get_logger(__name__)


def make_train_step(model, loss_fn, optimizer, donate: bool = False) -> Callable:
    """Build the jitted training step.

    (params, state, opt_state, batch, rng) -> (params, state, opt_state, loss)

    donate=True aliases params/state/opt_state in place on TPU so long async
    step chains don't accumulate live copies of the optimizer tree (observed
    RESOURCE_EXHAUSTED without it); callers must then never reuse the inputs.
    """

    def loss_and_state(params, state, batch, rng):
        sess, new_state = model.apply(
            params, state, batch, model.config, train=True, rng=rng
        )
        loss, aux = loss_fn(
            sess, batch.targets, batch.negatives, params["item_embedding"], batch.sample_mask
        )
        return loss, (new_state, aux)

    fused = hasattr(optimizer, "update_full")

    @functools.partial(jax.jit, donate_argnums=(0, 1, 2) if donate else ())
    def train_step(params, state, opt_state, batch, rng):
        (loss, (new_state, _aux)), grads = jax.value_and_grad(loss_and_state, has_aux=True)(
            params, state, batch, rng
        )
        # padding_idx parity: row 0 of the embedding table never updates.
        grads["item_embedding"] = grads["item_embedding"].at[0].set(0.0)
        if fused:
            new_params, new_opt_state = optimizer.update_full(grads, opt_state, params)
        else:
            updates, new_opt_state = optimizer.update(grads, opt_state, params)
            new_params = optax.apply_updates(params, updates)
        return new_params, new_state, new_opt_state, loss

    return train_step


def make_sparse_train_step(model, loss_fn, optimizer, donate: bool = False) -> Callable:
    """Training step with sparse embedding gradients.

    All embedding rows the step touches (session nodes + targets + negatives)
    are gathered ONCE up front; the loss is differentiated w.r.t. those rows,
    so the dense [V, D] table gradient never materializes (its backward
    scatter is ~8 ms/step at the reference table on TPU v5e — the single
    largest cost in the dense step). Duplicate-row grouping uses the
    host-precomputed GradIndex (data/batching.make_grad_index): sorting the
    ids costs ~1.6 ms on-device (bitonic) but ~50 us on the host.

    Requires an optimizer with `update_sparse` (FusedEmbeddingAdamW) and a
    loss with `.from_embeddings` (all built-in losses). The returned step
    accepts either a SessionBatch (index built on the fly, convenient for
    tests) or a (SessionBatch, GradIndex) tuple (the Trainer hot path).
    """
    assert hasattr(optimizer, "update_sparse"), "optimizer must support update_sparse"
    body = _sparse_step_body(model, loss_fn, optimizer)

    @functools.partial(jax.jit, donate_argnums=(0, 1, 2) if donate else ())
    def step(params, state, opt_state, batch, gidx, rng):
        return body(params, state, opt_state, batch, gidx, rng)

    def wrapper(params, state, opt_state, batch, rng):
        from gat_recommendation_tpu.data.batching import make_grad_index

        if isinstance(batch, tuple):
            batch, gidx = batch
        else:
            gidx = make_grad_index(batch)
        return step(params, state, opt_state, batch, gidx, rng)

    return wrapper


def _sparse_step_body(model, loss_fn, optimizer, mesh=None) -> Callable:
    """The traceable sparse-grad update shared by the single-step jit, the
    chained lax.scan variant, and (with mesh) the sharded equivalents in
    parallel/steps.py — one body, four dispatch wrappers."""

    lazy = getattr(optimizer, "lazy", False)

    def body(params, state, opt_state, batch, gidx, rng):
        B, N = batch.node_ids.shape
        K = batch.negatives.shape[1]
        table = jax.lax.stop_gradient(params["item_embedding"])
        if lazy:
            # O(U) gather + pending-update catch-up (ops/lazy_adamw.py):
            # the forward reads exactly the dense-trajectory weights at
            # count-1, gathered once per unique row and remapped to the R
            # duplicate slots (inverse of the host-sorted permutation).
            w_c, mu_c, nu_c = jax.lax.stop_gradient(
                optimizer.gather_catch_up(params, opt_state, gidx.uid)
            )
            u_of_r = (
                jnp.zeros(gidx.ids.shape, jnp.int32).at[gidx.perm].set(gidx.seg)
            )
            rows0 = w_c[u_of_r]
        else:
            rows0 = table[gidx.ids]
        other = {k_: v for k_, v in params.items() if k_ != "item_embedding"}

        def loss_inner(other_params, rows):
            node_emb = rows[: B * N].reshape(B, N, -1)
            target_emb = rows[B * N : B * N + B]
            neg_emb = rows[B * N + B :].reshape(B, K, -1)
            full = {**other_params, "item_embedding": table}
            sess, new_state = model.apply(
                full, state, batch, model.config, train=True, rng=rng,
                node_embeddings=node_emb,
            )
            loss, _aux = loss_fn.from_embeddings(
                sess, target_emb, neg_emb, batch.sample_mask
            )
            return loss, new_state

        (loss, new_state), (g_other, g_rows) = jax.value_and_grad(
            loss_inner, argnums=(0, 1), has_aux=True
        )(other, rows0)
        # Reduce duplicates (AdamW's second moment needs (sum g)^2, not
        # sum g^2) with the host-sorted permutation; zero the padding row
        # (padding_idx parity: row 0 never updates). Sentinel tail slots
        # receive zero from segment_sum (their segments don't exist).
        summed = jax.ops.segment_sum(
            g_rows[gidx.perm], gidx.seg,
            num_segments=gidx.uid.shape[0], indices_are_sorted=True,
        )
        summed = jnp.where((gidx.uid == 0)[:, None], 0.0, summed)
        if lazy:
            new_params, new_opt_state = optimizer.update_sparse_lazy(
                g_other, gidx.uid, summed, w_c, mu_c, nu_c, opt_state, params
            )
        else:
            new_params, new_opt_state = optimizer.update_sparse(
                g_other, gidx.uid, summed, opt_state, params, mesh=mesh
            )
        return new_params, new_state, new_opt_state, loss

    return body


def make_chained_sparse_train_step(model, loss_fn, optimizer, donate: bool = False) -> Callable:
    """Sparse train step that runs C optimizer steps in ONE dispatch.

    (params, state, opt_state, (stacked_batch, stacked_gidx), epoch_rng,
    step0) -> (params, state, opt_state, losses[C])

    The stacked batch/GradIndex carry a leading chain axis [C, ...]
    (data/batching.stack_batches / stack_grad_indices); a lax.scan threads
    (params, state, opt_state) through the C updates on-device. Through a
    remote-TPU relay every dispatch costs ~ms-scale latency, so folding C
    steps into one executable is what closes the e2e/device-rate gap
    (docs/PERFORMANCE.md 'Step chaining'); the per-step RNG stream is
    fold_in(epoch_rng, step0 + i) — IDENTICAL to the unchained Trainer
    loop, so chained and unchained training are the same program.
    """
    assert hasattr(optimizer, "update_sparse"), "optimizer must support update_sparse"
    body = _sparse_step_body(model, loss_fn, optimizer)

    @functools.partial(jax.jit, donate_argnums=(0, 1, 2) if donate else (), static_argnums=())
    def chained(params, state, opt_state, batches, gidxs, epoch_rng, step0):
        def scan_body(carry, x):
            p, s, o = carry
            b, g, i = x
            p, s, o, loss = body(p, s, o, b, g, jax.random.fold_in(epoch_rng, step0 + i))
            return (p, s, o), loss

        C = gidxs.uid.shape[0]
        (params, state, opt_state), losses = jax.lax.scan(
            scan_body, (params, state, opt_state), (batches, gidxs, jnp.arange(C))
        )
        return params, state, opt_state, losses

    return chained


def make_eval_step(model, k: int, topk_method: str = "auto") -> Callable:
    """(params, state, batch) -> top-k item ids [B, k] (full-catalog scoring).

    topk_method: 'auto' uses the exact two-level selector (4x faster than
    lax.top_k at the reference catalog size on TPU — ops/scoring.py);
    'dense' is the lax.top_k oracle; 'approx' trades exactness for ~17x.
    """

    from gat_recommendation_tpu.ops.scoring import full_catalog_topk

    @jax.jit
    def eval_step(params, state, batch):
        sess, _ = model.apply(params, state, batch, model.config, train=False)
        _, top_idx = full_catalog_topk(
            sess, params["item_embedding"], k, model.config.num_items, method=topk_method
        )
        return top_idx

    return eval_step


def make_chained_eval_step(model, k: int, topk_method: str = "auto") -> Callable:
    """C eval steps in ONE dispatch: lax.scan of forward + full-catalog
    top-k over a stacked [C, B, ...] batch (data/batching.stack_batches).

    Same selector and outputs as make_eval_step, C batches per relay round
    trip: through a remote-TPU relay the per-dispatch latency made eval
    ~30% of a reference-scale study epoch at chain=1, the same gap step
    chaining closed for training (docs/PERFORMANCE.md 'Step chaining')."""

    from gat_recommendation_tpu.ops.scoring import full_catalog_topk

    @jax.jit
    def chained_eval(params, state, batches):
        def body(carry, b):
            sess, _ = model.apply(params, state, b, model.config, train=False)
            _, idx = full_catalog_topk(
                sess, params["item_embedding"], k, model.config.num_items,
                method=topk_method,
            )
            return carry, idx

        _, tops = jax.lax.scan(body, 0, batches)
        return tops  # [C, B, k]

    return chained_eval


def _device_copy(tree):
    """Copy every device array in a pytree (device-to-device, no host pull).

    Needed because the donated train steps invalidate old buffers: a best-
    epoch snapshot must own its arrays, not alias the live training state.
    Non-array leaves (python ints in optax state, etc.) pass through.
    """
    return jax.tree.map(lambda a: a.copy() if isinstance(a, jax.Array) else a, tree)


class Trainer:
    """Epoch-loop trainer over bucketed SessionBatch streams."""

    def __init__(
        self,
        model,
        train_batches: Callable[[int], Iterable],  # epoch -> iterator of SessionBatch
        val_batches: Callable[[], Iterable],
        optimizer=None,
        output_dir: str | Path = "outputs",
        max_epochs: int = 100,
        patience: int = 10,
        eval_every: int = 1,
        checkpoint_every: int = 1,
        k_values: list[int] | None = None,
        loss_fn=None,
        seed: int = 42,
        mesh=None,
        sparse_embedding_grads: bool = False,
        chain: int = 1,
        defer_best: bool = True,
        record_hits: bool = False,
        transfer_workers: int = 1,
    ):
        from gat_recommendation_tpu.train.losses import bpr_loss

        self.model = model
        self.train_batches = train_batches
        self.val_batches = val_batches
        self.sparse_embedding_grads = sparse_embedding_grads
        if optimizer is None and self.sparse_embedding_grads:
            from gat_recommendation_tpu.train.optimizers import FusedEmbeddingAdamW

            # auto: single-pass Pallas AdamW on TPU (shard_mapped over
            # 'model' row shards under a mesh), XLA sparse path elsewhere.
            optimizer = FusedEmbeddingAdamW(1e-3, weight_decay=1e-5)
        self.optimizer = optimizer or optax.adamw(1e-3, weight_decay=1e-5)
        self.output_dir = Path(output_dir)
        self.output_dir.mkdir(parents=True, exist_ok=True)
        self.max_epochs = max_epochs
        self.patience = patience
        self.eval_every = eval_every
        # checkpoint_every throttles only the checkpoint_latest resume
        # snapshot (the best model is tracked separately — see defer_best).
        # At reference scale a latest save is 1.2 GB — ~60 s through a
        # remote-TPU relay vs a ~5 s epoch (docs/PERFORMANCE.md).
        # 1 = reference parity.
        self.checkpoint_every = checkpoint_every
        self.k_values = k_values if k_values is not None else [10, 20]
        self.loss_fn = loss_fn or bpr_loss  # model default loss is BPR (base.py:80-113)
        self.seed = seed
        self.record_hits = record_hits
        # >1 overlaps consecutive host->device transfers (each device_put
        # blocks its thread on a relay RPC — data/batching.prefetch_to_device)
        self.transfer_workers = transfer_workers
        self.mesh = mesh
        self.chain = 1  # raised below (sparse paths; multi-host excluded)

        self.current_epoch = 0
        self.best_val_metric = 0.0
        self.patience_counter = 0
        self.history: dict = {"train_loss": [], "val_metrics": []}
        # Per-eval hit vectors (record_hits) live OUTSIDE history: row i of
        # self.hits aligns with history["val_metrics"][i] and persists as
        # packed bits (hits_io.py), not as JSON int lists inside
        # history.json/checkpoint meta (VERDICT r4 weak #4: 14 MB/run).
        self.hits: list = []
        # Diagnostics: how many chained (multi-step) dispatches ran. Lets
        # tests assert the chained path actually fired (a bucket layout that
        # never completes a group would silently run single steps).
        self.chained_dispatches = 0
        self.chained_eval_dispatches = 0
        # Cadence bookkeeping: checkpoint_every counts EVAL OCCURRENCES (save
        # on every Nth eval), so eval_every and checkpoint_every compose
        # predictably; _latest_saved_epoch lets train() backstop-save the
        # final epoch even when the cadence (or eval_every) never lands on it.
        self._n_evals = 0
        self._latest_saved_epoch: int | None = None
        # defer_best: on improvement, snapshot params/state/opt_state on
        # DEVICE (an HBM copy, microseconds) and persist checkpoint_best once
        # when training ends. Writing it eagerly per improvement — the
        # reference's policy (trainer.py:175-198) — costs a full
        # device->host pull + 1.2 GB Orbax write PER IMPROVING EPOCH, which
        # at reference scale through a remote-TPU relay is ~60 s against a
        # ~5 s epoch. The on-disk result is identical; a mid-run crash falls
        # back to checkpoint_latest (which resume uses anyway).
        self.defer_best = defer_best
        self._best_snapshot = None

        if mesh is not None:
            from gat_recommendation_tpu.parallel.steps import (
                make_sharded_sparse_train_step,
                make_sharded_train_step,
            )
            from gat_recommendation_tpu.parallel.topk import make_sharded_eval_step_v2

            if self.sparse_embedding_grads:
                # donate=True as on the single-device path: without aliasing
                # the ~1.9 GB params/moments in place, every dispatch copies
                # the optimizer tree — measured 19% e2e on a 1x1 mesh
                # (docs/PERFORMANCE.md "Sharding overhead").
                self._train_step = make_sharded_sparse_train_step(
                    self.model, self.loss_fn, self.optimizer, mesh, donate=True
                )
                if chain > 1:
                    from gat_recommendation_tpu.parallel.steps import (
                        make_chained_sharded_sparse_train_step,
                    )

                    # Multi-host included: chain groups are identical on all
                    # processes (deterministic iteration), local rows bind to
                    # the global chained batch via make_global_chained_batch,
                    # and the global GradIndexes rebuild from the metas' ids.
                    self.chain = chain
                    self._chained_step = make_chained_sharded_sparse_train_step(
                        self.model, self.loss_fn, self.optimizer, mesh, donate=True
                    )
            else:
                self._train_step = make_sharded_train_step(
                    self.model, self.loss_fn, self.optimizer, mesh, donate=True
                )
            # Explicit two-phase distributed top-k, NOT the GSPMD-partitioned
            # dense top_k: letting GSPMD choose all-gathers the full [B, V]
            # score matrix (1.2 GB/step at reference scale on a 4x2 mesh) vs
            # ~1 MB for k-candidates-per-shard + one session-emb all-reduce
            # — scripts/pipeline/collective_accounting.py, docs/PARALLELISM.md.
            self._eval_step = make_sharded_eval_step_v2(
                self.model, max(self.k_values), mesh
            )
        elif self.sparse_embedding_grads:
            self._train_step = make_sparse_train_step(
                self.model, self.loss_fn, self.optimizer, donate=True
            )
            self._eval_step = make_eval_step(self.model, max(self.k_values))
            if chain > 1:
                # C optimizer steps per dispatch (lax.scan): same RNG stream
                # and math as the unchained loop, ~C x fewer relay round
                # trips — see make_chained_sparse_train_step.
                self.chain = chain
                self._chained_step = make_chained_sparse_train_step(
                    self.model, self.loss_fn, self.optimizer, donate=True
                )
                self._chained_eval = make_chained_eval_step(
                    self.model, max(self.k_values)
                )
        else:
            self._train_step = make_train_step(
                self.model, self.loss_fn, self.optimizer, donate=True
            )
            self._eval_step = make_eval_step(self.model, max(self.k_values))

    # -- initialization / resume ------------------------------------------

    def init_state(self, rng=None):
        rng = rng if rng is not None else jax.random.key(self.seed)
        params, state = self.model.init_params(rng)
        opt_state = self.optimizer.init(params)
        if self.mesh is not None:
            from gat_recommendation_tpu.parallel.steps import shard_params

            params, state, opt_state = shard_params(params, state, opt_state, self.mesh)
        return params, state, opt_state

    def _to_device(self, batch):
        from gat_recommendation_tpu.data.batching import to_device

        if self.mesh is not None:
            from gat_recommendation_tpu.parallel.distributed import make_global_batch

            # Multi-host: `batch` holds only this process's rows; the global
            # sharded array is bound per process (single-process: shard_batch).
            return make_global_batch(batch, self.mesh)
        return to_device(batch)

    def _transfer(self, item):
        """Move one epoch item to the device/mesh.

        Items are either a SessionBatch or a (SessionBatch, GlobalBatchMeta)
        pair (multi-host iteration, data/batching.iterate_batches). For the
        sparse-grad path the GradIndex comes from meta.ids when present (it
        must index the GLOBAL batch) and from the local batch otherwise.
        """
        from gat_recommendation_tpu.data.batching import (
            make_grad_index,
            make_grad_index_from_ids,
        )

        batch, meta = item if isinstance(item, tuple) else (item, None)
        dbatch = self._to_device(batch)
        if not self.sparse_embedding_grads:
            return dbatch
        if meta is not None and meta.ids is not None:
            gidx = make_grad_index_from_ids(meta.ids)
        else:
            gidx = make_grad_index(batch)
        return (dbatch, gidx)

    # Partial chain groups at bucket boundaries sub-chain at this size
    # before falling back to singles: a 236-batch reference epoch leaves
    # ~44 unchained steps across the 4 buckets at chain=32 (~0.2 s of
    # per-dispatch relay latency); sub-chaining cuts that to ~20. One
    # extra compiled variant per bucket (chain-8), nothing else.
    SUBCHAIN = 8

    def _transfer_chain(self, items: list):
        """Transfer one chain_iterator group. Returns a list of entries,
        each ("chained", batches, gidxs) or a single transferred item: full
        groups are one chained dispatch; partial groups split into SUBCHAIN
        runs + singles (single-process paths; multi-host partial groups
        stay singles)."""
        # Multi-host items carry a GlobalBatchMeta whose ids (covering the
        # GLOBAL batch, identical on every process) drive the GradIndex; the
        # local rows bind into the global chained batch. Single-process mesh
        # and single-device groups stack the local batches directly.
        metas = [it[1] if isinstance(it, tuple) else None for it in items]
        with_ids = [m is not None and m.ids is not None for m in metas]
        multihost = all(with_ids)
        # A group mixing (batch, meta) items with plain batches must fail
        # loudly: treating it as single-process would build GradIndexes from
        # LOCAL batches and silently train with wrong global sparse updates
        # in a multi-host run (ADVICE r4).
        assert multihost or not any(with_ids), (
            "chain group mixes multi-host (batch, meta) items with plain "
            "batches — the iterator must yield homogeneous groups"
        )
        if len(items) == self.chain:
            return [self._stack_group(items, multihost)]
        if multihost:  # partial multi-host group: singles (scope bound)
            return [self._transfer(it) for it in items]
        out, i = [], 0
        while len(items) - i >= self.SUBCHAIN and self.chain > self.SUBCHAIN:
            out.append(self._stack_group(items[i:i + self.SUBCHAIN], False))
            i += self.SUBCHAIN
        out.extend(self._transfer(it) for it in items[i:])
        return out

    def _stack_group(self, items: list, multihost: bool):
        """Stack one homogeneous group into a ("chained", batches, gidxs)."""
        from gat_recommendation_tpu.data.batching import (
            make_grad_index,
            stack_batches,
            stack_grad_indices,
            to_device,
        )

        batches = [it[0] if isinstance(it, tuple) else it for it in items]
        if multihost:
            from gat_recommendation_tpu.data.batching import make_grad_index_from_ids
            from gat_recommendation_tpu.parallel.distributed import (
                make_global_chained_batch,
            )

            gidxs = stack_grad_indices(
                [make_grad_index_from_ids(it[1].ids) for it in items]
            )
            return (
                "chained",
                make_global_chained_batch(stack_batches(batches), self.mesh),
                gidxs,
            )
        gidxs = stack_grad_indices([make_grad_index(b) for b in batches])
        stacked = stack_batches(batches)
        if self.mesh is not None:
            from gat_recommendation_tpu.parallel.steps import shard_chained_batch

            return ("chained", shard_chained_batch(stacked, self.mesh), gidxs)
        return ("chained", to_device(stacked), gidxs)

    # -- epoch work --------------------------------------------------------

    def train_epoch(self, params, state, opt_state) -> tuple:
        """One epoch. Losses stay on device until the end of the epoch —
        per-step host readbacks would serialize the pipeline (and cost ~1s
        each through remote-TPU relays)."""
        from gat_recommendation_tpu.data.batching import prefetch_to_device

        losses = []
        root = jax.random.key(self.seed)
        epoch_rng = jax.random.fold_in(root, self.current_epoch)
        import jax.numpy as jnp

        # _transfer builds the sparse-gradient index on the host (numpy
        # argsort is ~us-scale) before the device transfer, alongside the
        # batch, and handles multi-host (batch, meta) items.
        if self.chain > 1:
            from gat_recommendation_tpu.data.batching import chain_iterator

            groups = prefetch_to_device(
                chain_iterator(self.train_batches(self.current_epoch), self.chain),
                size=2,
                transfer=self._transfer_chain,
                transfer_workers=self.transfer_workers,
            )
            step = 0
            for entries in groups:
                for e in entries:
                    if isinstance(e, tuple) and len(e) == 3 and e[0] == "chained":
                        _, sb, sg = e
                        params, state, opt_state, loss_vec = self._chained_step(
                            params, state, opt_state, sb, sg, epoch_rng, step
                        )
                        losses.append(loss_vec)
                        self.chained_dispatches += 1
                        step += int(sg.uid.shape[0])
                    else:  # single item (partial-group remainder)
                        rng = jax.random.fold_in(epoch_rng, step)
                        params, state, opt_state, loss = self._train_step(
                            params, state, opt_state, e, rng
                        )
                        losses.append(loss)
                        step += 1
        else:
            batches = prefetch_to_device(
                self.train_batches(self.current_epoch), size=2, transfer=self._transfer,
                transfer_workers=self.transfer_workers,
            )
            for step, dbatch in enumerate(batches):
                rng = jax.random.fold_in(epoch_rng, step)
                params, state, opt_state, loss = self._train_step(
                    params, state, opt_state, dbatch, rng
                )
                losses.append(loss)
        if not losses:
            return params, state, opt_state, 0.0

        # single device->host readback
        avg = float(jnp.mean(jnp.concatenate([jnp.atleast_1d(l) for l in losses])))
        return params, state, opt_state, avg

    def _replicate_output(self, x):
        """Make a 'data'-sharded eval output fully addressable on every host
        (device all-gather; identity in single-process runs) so all processes
        compute identical metrics and agree on early stopping."""
        if self.mesh is None or jax.process_count() == 1:
            return x
        if not hasattr(self, "_replicate_jit"):
            from gat_recommendation_tpu.parallel.mesh import replicated

            self._replicate_jit = jax.jit(
                lambda a: a, out_shardings=replicated(self.mesh)
            )
        return self._replicate_jit(x)

    def _eval_one(self, params, state, item, device_tops, masks, targets):
        batch, meta = item if isinstance(item, tuple) else (item, None)
        top = self._eval_step(params, state, self._to_device(batch))
        device_tops.append(self._replicate_output(top))
        # Multi-host: metrics need GLOBAL targets/masks (the local batch
        # holds only this process's rows) — GlobalBatchMeta carries them.
        masks.append(np.asarray(meta.sample_mask if meta is not None else batch.sample_mask))
        targets.append(np.asarray(meta.targets if meta is not None else batch.targets))

    def _materialize(self, params, opt_state):
        """Flush the lazy optimizer's pending per-row updates (no-op
        otherwise) — see FusedEmbeddingAdamW.materialize."""
        if getattr(self.optimizer, "lazy", False):
            params, opt_state = self.optimizer.materialize(params, opt_state)
        return params, opt_state

    def evaluate(self, params, state) -> dict:
        # Keep per-batch top-k on device; one concatenated readback at the
        # end (per-batch readbacks serialize the pipeline).
        device_tops, masks, targets = [], [], []
        if self.chain > 1 and self.mesh is None and hasattr(self, "_chained_eval"):
            # C batches per dispatch (make_chained_eval_step); partial
            # groups at bucket boundaries fall back to single eval steps,
            # exactly like train_epoch's chain groups. chain_iterator
            # preserves order, so predictions stay aligned with targets.
            from gat_recommendation_tpu.data.batching import (
                chain_iterator,
                stack_batches,
                to_device,
            )

            for group in chain_iterator(self.val_batches(), self.chain):
                if len(group) < self.chain or any(isinstance(it, tuple) for it in group):
                    for item in group:
                        self._eval_one(params, state, item, device_tops, masks, targets)
                    continue
                tops = self._chained_eval(
                    params, state, to_device(stack_batches(group))
                )  # [C, B, k]
                device_tops.append(tops.reshape(-1, tops.shape[-1]))
                self.chained_eval_dispatches += 1
                for b in group:
                    masks.append(np.asarray(b.sample_mask))
                    targets.append(np.asarray(b.targets))
        else:
            for item in self.val_batches():
                self._eval_one(params, state, item, device_tops, masks, targets)
        if not device_tops:
            predictions = np.zeros((0, max(self.k_values)), int)
            targets_arr = np.zeros((0,), int)
        else:
            all_tops = np.asarray(jnp.concatenate(device_tops, axis=0))
            mask = np.concatenate(masks)
            predictions = all_tops[mask]
            targets_arr = np.concatenate(targets)[mask]

        metrics = {}
        for k in self.k_values:
            metrics[f"recall@{k}"] = compute_recall_at_k(predictions, targets_arr, k)
            metrics[f"ndcg@{k}"] = compute_ndcg_at_k(predictions, targets_arr, k)
        if self.record_hits:
            # Per-session hit vector at k_values[0], aligned with the (fixed,
            # unshuffled) val iteration order — lets callers compute PAIRED
            # bootstrap CIs on recall margins between models trained on the
            # same split (ordering claims from point estimates alone are
            # unfalsifiable at probe scale; see VERDICT r3 weak #5).
            k0 = self.k_values[0]
            hits = (predictions[:, :k0] == targets_arr[:, None]).any(axis=1)
            self.hits.append(hits.astype(np.int8))
        return metrics

    def _save_hits(self) -> None:
        """Persist self.hits as packed bits, padded to val_metrics length so
        row i always aligns with history['val_metrics'][i] (ADVICE r4: a
        resume from a pre-record_hits checkpoint must not desync indices)."""
        from gat_recommendation_tpu.train.hits_io import save_hits

        if jax.process_index() != 0:  # shared storage in multi-host runs
            return

        n = len(self.history["val_metrics"])
        rows = [None] * (n - len(self.hits)) + list(self.hits)
        save_hits(self.output_dir / f"hits_k{self.k_values[0]}.npz", rows)

    # -- checkpointing -----------------------------------------------------

    def save_checkpoint(
        self, params, state, opt_state, is_best: bool = False, save_latest: bool = True
    ) -> None:
        from gat_recommendation_tpu.train import checkpoint as ckpt

        meta = {
            "epoch": self.current_epoch,
            "best_val_metric": self.best_val_metric,
            "history": self.history,
            "model_name": self.model.name,
            "model_config": asdict(self.model.config),
        }
        if save_latest:
            ckpt.save(self.output_dir / "checkpoint_latest", params, state, opt_state, meta)
            if self.record_hits and self.hits:
                self._save_hits()  # sidecar keeps resume in sync (tiny: packed bits)
        if is_best:
            ckpt.save(self.output_dir / "checkpoint_best", params, state, opt_state, meta)

    def load_checkpoint(self, which: str = "latest"):
        """Resume support (absent in the reference). Returns (params, state, opt_state)."""
        from gat_recommendation_tpu.train import checkpoint as ckpt

        template = self.init_state()
        params, state, opt_state, meta = ckpt.restore(
            self.output_dir / f"checkpoint_{which}", *template
        )
        self.current_epoch = meta["epoch"] + 1
        self.best_val_metric = meta["best_val_metric"]
        self.history = meta["history"]
        # Legacy (round-4) checkpoints carried hit vectors inside history as
        # JSON int lists; current runs persist them as a packed-bit sidecar.
        # Converting is unconditional: history.json is rewritten at the end
        # of train(), so stripping the legacy key without writing the
        # sidecar would destroy the vectors on any resume that didn't pass
        # record_hits (code-review r5).
        legacy = self.history.pop(f"val_hits@{self.k_values[0]}", None)
        sidecar = self.output_dir / f"hits_k{self.k_values[0]}.npz"
        if legacy is not None and not sidecar.exists() and jax.process_index() == 0:
            from gat_recommendation_tpu.train.hits_io import save_hits

            save_hits(sidecar, [np.asarray(r, dtype=np.int8) for r in legacy])
        if self.record_hits:
            from gat_recommendation_tpu.train.hits_io import load_hits

            if sidecar.exists():
                self.hits = load_hits(sidecar)
            else:
                self.hits = [None] * len(self.history["val_metrics"])
            # Align strictly with the restored val_metrics (the sidecar may
            # trail it if the last save predates the last evals).
            n = len(self.history["val_metrics"])
            self.hits = (self.hits + [None] * n)[:n]
        return params, state, opt_state

    # -- main loop ---------------------------------------------------------

    def train(self, params=None, state=None, opt_state=None, resume: bool = False) -> dict:
        if resume:
            params, state, opt_state = self.load_checkpoint("latest")
        if params is None:
            params, state, opt_state = self.init_state()

        start_epoch = self.current_epoch
        logger.info(f"Training {self.model.name} for up to {self.max_epochs} epochs")

        trained_this_call = False
        for epoch in range(start_epoch, self.max_epochs):
            self.current_epoch = epoch
            trained_this_call = True
            t0 = time.perf_counter()
            params, state, opt_state, train_loss = self.train_epoch(params, state, opt_state)
            self.history["train_loss"].append(train_loss)
            logger.info(
                f"Epoch {epoch}: train_loss={train_loss:.4f} "
                f"({time.perf_counter() - t0:.1f}s)"
            )

            if (epoch + 1) % self.eval_every == 0:
                # Lazy AdamW defers untouched rows' decay/momentum-tail to
                # their next touch; flush all pending updates so eval,
                # best-snapshot, and checkpoints see the dense-trajectory
                # table (no-op for eager optimizers).
                params, opt_state = self._materialize(params, opt_state)
                val_metrics = self.evaluate(params, state)
                self.history["val_metrics"].append(val_metrics)
                logger.info(
                    "Epoch %d: %s"
                    % (epoch, ", ".join(f"{k}={v:.4f}" for k, v in val_metrics.items()))
                )

                val_metric = val_metrics[f"recall@{self.k_values[0]}"]
                is_best = val_metric > self.best_val_metric
                if is_best:
                    self.best_val_metric = val_metric
                    self.patience_counter = 0
                else:
                    self.patience_counter += 1

                stopping = self.patience_counter >= self.patience
                self._n_evals += 1
                save_latest = (
                    stopping
                    or epoch == self.max_epochs - 1
                    or self._n_evals % self.checkpoint_every == 0
                )
                if save_latest:
                    self._latest_saved_epoch = epoch
                if is_best and self.defer_best:
                    self._best_snapshot = (
                        _device_copy(params),
                        _device_copy(state),
                        _device_copy(opt_state),
                        epoch,
                    )
                self.save_checkpoint(
                    params,
                    state,
                    opt_state,
                    is_best=is_best and not self.defer_best,
                    save_latest=save_latest,
                )

                if stopping:
                    logger.info(f"Early stopping at epoch {epoch}")
                    break

        # Backstop: guarantee checkpoint_latest reflects the last trained
        # epoch no matter how eval_every / checkpoint_every / max_epochs
        # interact (e.g. eval_every=2, max_epochs=9 never evals epoch 8).
        if trained_this_call and self._latest_saved_epoch != self.current_epoch:
            params, opt_state = self._materialize(params, opt_state)
            self.save_checkpoint(params, state, opt_state, is_best=False, save_latest=True)
            self._latest_saved_epoch = self.current_epoch

        if self._best_snapshot is not None:
            b_params, b_state, b_opt, b_epoch = self._best_snapshot
            epoch_now = self.current_epoch
            self.current_epoch = b_epoch  # meta["epoch"] = the best epoch
            self.save_checkpoint(b_params, b_state, b_opt, is_best=True, save_latest=False)
            self.current_epoch = epoch_now
            self._best_snapshot = None

        if jax.process_index() == 0:  # shared storage in multi-host runs
            with open(self.output_dir / "history.json", "w") as f:
                json.dump(self.history, f, indent=2)
            if self.record_hits and self.hits:
                self._save_hits()
        self._final = (params, state, opt_state)
        return self.history
