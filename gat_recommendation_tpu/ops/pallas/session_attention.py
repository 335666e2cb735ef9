"""Fused masked session-graph attention (Pallas TPU kernel).

**NEGATIVE RESULT — kept unwired** (like ops/pallas/score_chunkmax.py; see
docs/PERFORMANCE.md "Negative result: fused session attention"). Measured on
TPU v5e at the eval configuration (optimized GT forward, B=512) the fused
path LOSES at every node bucket: 0.31x at N=8, 0.40x at N=16, 0.65x at
N=32, 0.79x at N=56 (scripts/bench_attention.py). Sessions are far smaller
than an MXU tile (N ≤ 56 vs 128x128), so the per-session score/weight
matrices XLA materializes are tiny ([B,H,N,N] ≤ 26 MB), while this kernel's
serialized per-session loop under-fills the MXU. There is no
flash-attention-style fusion win at session-graph sizes; the XLA batched
einsum path in models/layers.py:transformer_conv is the production path.

Original design: the TransformerConv attention core — scores = q·kᵀ/√d,
adjacency-masked softmax over sources, weighted sum of values — fused into
one VMEM-resident kernel per batch tile, q/k/v projections and the β-gated
skip left to XLA. Interpret-mode correctness tests remain
(tests/test_session_attention_kernel.py) so the kernel stays a valid
starting point if batch-blocked session attention is ever revisited.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def _kernel(q_ref, k_ref, v_ref, adj_ref, out_ref, *, heads: int, head_dim: int):
    bT, N, HD = q_ref.shape

    def one_session(s, _):
        adj = adj_ref[s].astype(jnp.float32)  # [N, N] (dst, src)
        for h in range(heads):  # heads are few and static: unroll
            sl = slice(h * head_dim, (h + 1) * head_dim)
            q = q_ref[s, :, sl]  # [N, d]
            k = k_ref[s, :, sl]
            v = v_ref[s, :, sl]
            scores = jnp.dot(q, k.T, preferred_element_type=jnp.float32) / math.sqrt(
                head_dim
            )
            scores = jnp.where(adj > 0, scores, NEG_INF)
            m = jnp.max(scores, axis=1, keepdims=True)
            m = jnp.where(m <= NEG_INF / 2, 0.0, m)  # all-masked rows
            e = jnp.exp(scores - m) * adj
            denom = jnp.maximum(jnp.sum(e, axis=1, keepdims=True), 1e-16)
            alpha = e / denom
            out_ref[s, :, sl] = jnp.dot(alpha, v, preferred_element_type=jnp.float32)
        return 0

    jax.lax.fori_loop(0, bT, one_session, 0)


@functools.partial(jax.jit, static_argnames=("heads", "batch_tile", "interpret"))
def fused_session_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    adj: jax.Array,
    *,
    heads: int,
    batch_tile: int = 8,
    interpret: bool = False,
) -> jax.Array:
    """Masked multi-head attention over per-session adjacency.

    q/k/v: [B, N, heads*d]; adj: [B, N, N] bool (adj[b, dst, src]).
    Returns [B, N, heads*d]; destinations with no in-edges output zeros
    (segment-softmax scatter-of-nothing parity). No attention dropout —
    callers wanting train-time attention dropout use the XLA path.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, N, HD = q.shape
    head_dim = HD // heads
    bT = min(batch_tile, B)
    grid = (pl.cdiv(B, bT),)

    qkv_spec = pl.BlockSpec((bT, N, HD), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    adj_spec = pl.BlockSpec((bT, N, N), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)

    kernel = functools.partial(_kernel, heads=heads, head_dim=head_dim)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[qkv_spec, qkv_spec, qkv_spec, adj_spec],
        out_specs=qkv_spec,
        out_shape=jax.ShapeDtypeStruct((B, N, HD), jnp.float32),
        interpret=interpret,
    )(q, k, v, adj.astype(jnp.int8))
