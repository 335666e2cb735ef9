"""Hybrid optimizer: fused Pallas AdamW for the embedding table, optax for the rest.

The embedding table dominates optimizer cost (466,865 x 256 fp32; XLA runs the
optax AdamW chain as many separate HBM passes). This optimizer routes the
table's update through the single-pass fused kernel
(ops/pallas/embedding_adamw.py) and everything else through plain optax.adamw
— the math is identical to optax.adamw over the whole tree.

API shape: ``init(params) -> state`` like optax, plus ``update_full(grads,
state, params) -> (new_params, new_state)`` which applies updates directly
(the fused kernel computes new weights, not deltas). make_train_step detects
``update_full`` and uses it.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

EMBEDDING_KEY = "item_embedding"


class FusedEmbeddingAdamW:
    """AdamW with the embedding-table update fused into one Pallas pass."""

    def __init__(
        self,
        learning_rate: float,
        b1: float = 0.9,
        b2: float = 0.999,
        eps: float = 1e-8,
        weight_decay: float = 0.0,
        use_pallas: bool | None = None,
        moment_dtype=None,
        stochastic_rounding: bool | None = None,
        lazy: bool = False,
        lazy_tail_terms: int = 64,
    ):
        """moment_dtype: storage dtype for the table's mu/nu buffers.
        Default None keeps the table dtype (f32, exact reference-AdamW
        semantics). jnp.bfloat16 halves the moment HBM traffic in the
        update tail (compute stays f32, storage rounds to bf16). A
        (mu_dtype, nu_dtype) tuple sets the two buffers independently —
        the attribution study for the residual SR gap
        (docs/EXPERIMENTS.md) trains with each moment narrowed alone.

        stochastic_rounding: how bf16 moments are stored. Default (None)
        resolves to True whenever moment_dtype is narrower than f32:
        round-to-nearest silently stalls the second moment (its per-step
        increment is 0.1% of the running value — below a bf16 ulp) and
        collapsed quality by 17 points at reference scale
        (docs/EXPERIMENTS.md); unbiased stochastic rounding recovers it.
        Pass False only to reproduce the collapse for ablation.

        lazy: update only the TOUCHED embedding rows each step and apply
        untouched rows' decay + momentum tail lazily at their next touch
        (ops/lazy_adamw.py) — O(U·D) per step instead of the eager dense
        [V, D] sweep (~2.9 GB of HBM traffic at the reference table).
        Numerically ≈ exact dense AdamW (momentum-tail series truncated at
        lazy_tail_terms; ~1e-5 weight error — tests/test_lazy_adamw.py).
        Requires calling `materialize(params, opt_state)` before reading
        the table outside training (eval / checkpoint) — the Trainer does
        this automatically. Works under a mesh too: GSPMD partitions the
        same body (table/moments row-sharded, last_step replicated;
        equivalence pinned by tests/test_parallel.py)."""
        self.lr = learning_rate
        self.b1, self.b2, self.eps = b1, b2, eps
        self.weight_decay = weight_decay
        if use_pallas is None:
            use_pallas = jax.default_backend() == "tpu"
        self.use_pallas = use_pallas
        self.moment_dtype = moment_dtype
        if isinstance(moment_dtype, tuple):
            self.mu_dtype, self.nu_dtype = moment_dtype
        else:
            self.mu_dtype = self.nu_dtype = moment_dtype
        if stochastic_rounding is None:
            stochastic_rounding = any(
                d is not None and d != jnp.float32
                for d in (self.mu_dtype, self.nu_dtype)
            )
        self.stochastic_rounding = stochastic_rounding
        self.lazy = lazy
        self.lazy_tail_terms = lazy_tail_terms
        self._mat_jit = None
        self._rest = optax.adamw(learning_rate, b1=b1, b2=b2, eps=eps,
                                 weight_decay=weight_decay)

    @property
    def _hparams(self) -> dict:
        return dict(lr=self.lr, b1=self.b1, b2=self.b2, eps=self.eps,
                    weight_decay=self.weight_decay)

    def _split(self, tree: dict):
        rest = {k: v for k, v in tree.items() if k != EMBEDDING_KEY}
        return tree[EMBEDDING_KEY], rest

    def init(self, params: dict) -> dict:
        table, rest = self._split(params)
        state = {
            "emb_mu": jnp.zeros(table.shape, self.mu_dtype or table.dtype),
            "emb_nu": jnp.zeros(table.shape, self.nu_dtype or table.dtype),
            "count": jnp.zeros((), jnp.int32),
            "rest": self._rest.init(rest),
        }
        if self.lazy:
            # Global step index at which each row was last updated; rows
            # start "touched at step 0" (zero moments, nothing pending).
            state["last_step"] = jnp.zeros((table.shape[0],), jnp.int32)
        return state

    def update_full(self, grads: dict, state: dict, params: dict):
        """Apply the update directly: returns (new_params, new_state)."""
        g_table, g_rest = self._split(grads)
        table, p_rest = self._split(params)
        count = state["count"] + 1

        if self.use_pallas:
            from gat_recommendation_tpu.ops.pallas.embedding_adamw import (
                fused_embedding_adamw,
            )

            new_table, mu, nu = fused_embedding_adamw(
                table, state["emb_mu"], state["emb_nu"], g_table, count,
                lr=self.lr, b1=self.b1, b2=self.b2, eps=self.eps,
                weight_decay=self.weight_decay,
                stochastic_rounding=self.stochastic_rounding,
            )
        else:
            from gat_recommendation_tpu.ops.pallas.embedding_adamw import (
                adamw_update_reference,
            )
            from gat_recommendation_tpu.ops.rounding import stochastic_round_bf16

            new_table, mu, nu = adamw_update_reference(
                table,
                state["emb_mu"].astype(jnp.float32),  # compute in f32
                state["emb_nu"].astype(jnp.float32),
                g_table, count,
                lr=self.lr, b1=self.b1, b2=self.b2, eps=self.eps,
                weight_decay=self.weight_decay,
            )
            key = jax.random.fold_in(jax.random.key(20240817), count)
            for name, val, dt in (("mu", mu, self.mu_dtype), ("nu", nu, self.nu_dtype)):
                dt = dt or table.dtype
                if self.stochastic_rounding and dt == jnp.bfloat16:
                    val = stochastic_round_bf16(
                        val, jax.random.fold_in(key, 0 if name == "mu" else 1)
                    )
                else:
                    val = val.astype(dt)
                mu, nu = (val, nu) if name == "mu" else (mu, val)

        upd, new_rest_state = self._rest.update(g_rest, state["rest"], p_rest)
        new_rest = optax.apply_updates(p_rest, upd)

        new_params = {**new_rest, EMBEDDING_KEY: new_table}
        new_state = {"emb_mu": mu, "emb_nu": nu, "count": count, "rest": new_rest_state}
        return new_params, new_state

    def update_sparse(self, g_rest: dict, uid: jax.Array, summed: jax.Array,
                      state: dict, params: dict, mesh=None):
        """Sparse embedding update: the table gradient arrives pre-reduced as
        (uid, summed) — unique row ids plus their summed gradient rows, built
        by make_sparse_train_step from the host-computed GradIndex — instead
        of a dense [V, D] array that XLA would materialize via scatter.

        Math is exactly AdamW, restructured scatter-FIRST so the dense tail
        (decay + bias correction + weight update) stays one fused HBM pass:
        contributions are pre-divided by the decay factor and added into the
        (donated, updated-in-place) moments; the decay multiply then yields
        b*m + (1-b)*g for touched rows and b*m for the rest. Measured on TPU
        v5e at the reference table (466,880x256): 5.6 ms vs 6.9 ms for
        decay-then-scatter (the remaining gap to the 4.4 ms scatter-free
        floor is one scatter-forced buffer copy).
        """
        table, p_rest = self._split(params)
        count = state["count"] + 1

        from gat_recommendation_tpu.ops.pallas import sparse_adamw as sk

        n_shards = int(mesh.shape["model"]) if mesh is not None else 1
        if self.use_pallas and sk.supports(
            table.shape[0], uid.shape[0], table.shape[1], n_shards
        ):
            # Single-pass Pallas kernel: one HBM round-trip over
            # table/mu/nu (the traffic floor) instead of the XLA path's two.
            sr = self.stochastic_rounding and jnp.bfloat16 in (
                state["emb_mu"].dtype, state["emb_nu"].dtype
            )
            if mesh is not None:
                # shard_map over 'model' row shards: each shard locates its
                # own rows in the ascending (global-id) uid — no collectives.
                new_table, mu, nu = sk.sharded_fused_sparse_adamw(
                    table, state["emb_mu"], state["emb_nu"], uid, summed, count,
                    mesh, lr=self.lr, b1=self.b1, b2=self.b2, eps=self.eps,
                    weight_decay=self.weight_decay, stochastic_rounding=sr,
                )
            else:
                new_table, mu, nu = sk.fused_sparse_adamw(
                    table, state["emb_mu"], state["emb_nu"], uid, summed, count,
                    lr=self.lr, b1=self.b1, b2=self.b2, eps=self.eps,
                    weight_decay=self.weight_decay, stochastic_rounding=sr,
                )
        else:
            # mode="drop": sentinel-padded tail slots (UID_SENTINEL, out of
            # range) fall away instead of clamping onto the last row.
            # Compute in f32; storage rounds to moment_dtype (no-op for f32).
            mdt_mu = state["emb_mu"].dtype
            mdt_nu = state["emb_nu"].dtype
            mu = state["emb_mu"].astype(jnp.float32).at[uid].add(
                (1.0 - self.b1) / self.b1 * summed, mode="drop"
            )
            nu = state["emb_nu"].astype(jnp.float32).at[uid].add(
                (1.0 - self.b2) / self.b2 * jnp.square(summed), mode="drop"
            )
            mu = self.b1 * mu
            nu = self.b2 * nu

            c = count.astype(jnp.float32)
            mu_hat = mu / (1.0 - jnp.power(self.b1, c))
            nu_hat = nu / (1.0 - jnp.power(self.b2, c))
            new_table = table - self.lr * (
                mu_hat / (jnp.sqrt(nu_hat) + self.eps) + self.weight_decay * table
            )
            # Unbiased low-precision store (see ops/rounding.py): RNE stalls
            # nu's 0.1%-relative increments below the bf16 ulp. Per-buffer:
            # a mixed f32/bf16 pair SRs just the bf16 one.
            from gat_recommendation_tpu.ops.rounding import stochastic_round_bf16

            key = jax.random.fold_in(jax.random.key(20240817), count)
            if self.stochastic_rounding and mdt_mu == jnp.bfloat16:
                mu = stochastic_round_bf16(mu, jax.random.fold_in(key, 0))
            else:
                mu = mu.astype(mdt_mu)
            if self.stochastic_rounding and mdt_nu == jnp.bfloat16:
                nu = stochastic_round_bf16(nu, jax.random.fold_in(key, 1))
            else:
                nu = nu.astype(mdt_nu)

        upd, new_rest_state = self._rest.update(g_rest, state["rest"], p_rest)
        new_rest = optax.apply_updates(p_rest, upd)
        new_params = {**new_rest, EMBEDDING_KEY: new_table}
        new_state = {"emb_mu": mu, "emb_nu": nu, "count": count, "rest": new_rest_state}
        return new_params, new_state

    # ---- lazy mode (O(touched rows) per step — ops/lazy_adamw.py) ----

    def _store_moment(self, val, stored_dtype, count, salt: int):
        """f32 -> storage dtype; unbiased SR when storing bf16."""
        from gat_recommendation_tpu.ops.rounding import stochastic_round_bf16

        if self.stochastic_rounding and stored_dtype == jnp.bfloat16:
            key = jax.random.fold_in(jax.random.key(20240817), count)
            return stochastic_round_bf16(val, jax.random.fold_in(key, salt))
        return val.astype(stored_dtype)

    def gather_catch_up(self, params: dict, state: dict, uid: jax.Array):
        """Gather the touched rows and apply their pending lazy updates.

        Returns (w_c, mu_c, nu_c) [U, D] f32 — the values dense AdamW would
        hold at step `count - 1` (i.e. BEFORE this step's gradient), so the
        forward pass sees exactly the dense-trajectory weights. Sentinel
        uid slots clamp-gather garbage rows; their scatters are dropped in
        update_sparse_lazy, so they only waste lanes, never correctness.
        """
        from gat_recommendation_tpu.ops import lazy_adamw as la

        count = state["count"] + 1
        ls = state["last_step"][uid]
        m = jnp.maximum(count - 1 - ls, 0)
        return la.catch_up(
            params[EMBEDDING_KEY][uid],
            state["emb_mu"][uid].astype(jnp.float32),
            state["emb_nu"][uid].astype(jnp.float32),
            ls, m, tail_terms=self.lazy_tail_terms, **self._hparams,
        )

    def update_sparse_lazy(self, g_rest: dict, uid: jax.Array, summed: jax.Array,
                           w_c, mu_c, nu_c, state: dict, params: dict):
        """Scatter this step's update back for the touched rows only.

        (w_c, mu_c, nu_c) come from gather_catch_up on the SAME uid; summed
        is the per-unique-row gradient (sentinel slots zero). Only the uid
        rows of table/moments are written (mode="drop" ignores sentinels);
        last_step[uid] advances to `count`.
        """
        from gat_recommendation_tpu.ops import lazy_adamw as la

        table, p_rest = self._split(params)
        count = state["count"] + 1
        w, mu, nu = la.touched_update(
            w_c, mu_c, nu_c, summed, count, **self._hparams
        )
        new_table = table.at[uid].set(w, mode="drop")
        new_mu = state["emb_mu"].at[uid].set(
            self._store_moment(mu, state["emb_mu"].dtype, count, 0), mode="drop"
        )
        new_nu = state["emb_nu"].at[uid].set(
            self._store_moment(nu, state["emb_nu"].dtype, count, 1), mode="drop"
        )
        new_last = state["last_step"].at[uid].set(count, mode="drop")

        upd, new_rest_state = self._rest.update(g_rest, state["rest"], p_rest)
        new_rest = optax.apply_updates(p_rest, upd)
        new_params = {**new_rest, EMBEDDING_KEY: new_table}
        new_state = {"emb_mu": new_mu, "emb_nu": new_nu, "count": count,
                     "rest": new_rest_state, "last_step": new_last}
        return new_params, new_state

    def materialize(self, params: dict, state: dict):
        """Catch EVERY row up to the current step (one dense pass).

        Must run before the table is read outside training — eval,
        checkpoint, best-snapshot — so stored weights equal the dense-AdamW
        trajectory. Idempotent; no-op for non-lazy optimizers. The Trainer
        calls this automatically at its eval/save points.
        """
        if not self.lazy:
            return params, state
        if self._mat_jit is None:
            from gat_recommendation_tpu.ops import lazy_adamw as la

            def impl(table, mu, nu, last, count):
                w, mu_f, nu_f, new_last = la.materialize_arrays(
                    table, mu.astype(jnp.float32), nu.astype(jnp.float32),
                    last, count, tail_terms=self.lazy_tail_terms,
                    **self._hparams,
                )
                return (
                    w,
                    self._store_moment(mu_f, mu.dtype, count, 0),
                    self._store_moment(nu_f, nu.dtype, count, 1),
                    new_last,
                )

            self._mat_jit = jax.jit(impl)
        table, mu, nu, last = self._mat_jit(
            params[EMBEDDING_KEY], state["emb_mu"], state["emb_nu"],
            state["last_step"], state["count"],
        )
        return (
            {**params, EMBEDDING_KEY: table},
            {**state, "emb_mu": mu, "emb_nu": nu, "last_step": last},
        )
