"""Stochastic rounding of bf16 optimizer moments (round 5).

RNE storage stalls the second moment (its per-step increment is 0.1% of
the running value — below a bf16 ulp) and collapsed reference-scale
quality by 17 points (docs/EXPERIMENTS.md). These tests pin: the XLA SR
primitive's unbiasedness and exactness properties, the in-kernel SR
(interpret mode) against the same properties, and the stagnation scenario
itself — RNE freezes, SR tracks.
"""

import jax
import jax.numpy as jnp
import numpy as np

from gat_recommendation_tpu.ops.rounding import stochastic_round_bf16


def test_sr_exact_values_unchanged():
    """bf16-representable values (low 16 f32 bits zero) never move."""
    x = jnp.asarray([0.0, 1.0, -2.5, 0.15625, -384.0], jnp.float32)
    assert (np.asarray(x.astype(jnp.bfloat16).astype(jnp.float32))
            == np.asarray(x)).all()  # sanity: all chosen values exact in bf16
    for s in range(5):
        out = stochastic_round_bf16(x, jax.random.key(s))
        np.testing.assert_array_equal(
            np.asarray(out.astype(jnp.float32)), np.asarray(x)
        )


def test_sr_unbiased_and_adjacent():
    """SR lands on one of the two adjacent bf16 values, with expectation
    equal to the input."""
    rng = np.random.default_rng(0)
    xnp = rng.normal(size=4096).astype(np.float32)
    x = jnp.asarray(xnp)
    # the two admissible outputs: truncation (f32 bits with low 16 cleared)
    # and the next bf16 up in bit order
    bits = xnp.view(np.uint32)
    lo = (bits & np.uint32(0xFFFF0000)).view(np.float32)
    hi = ((bits & np.uint32(0xFFFF0000)) + np.uint32(0x00010000)).view(np.float32)
    n, acc = 400, 0.0
    for s in range(n):
        out = np.asarray(
            stochastic_round_bf16(x, jax.random.key(s)).astype(jnp.float32)
        )
        assert ((out == lo) | (out == hi)).all()
        acc = acc + out.astype(np.float64)
    mean = acc / n
    # unbiased: the Monte-Carlo mean converges to x, far inside one ulp
    err = np.abs(mean - np.asarray(x, np.float64))
    ulp = np.abs(np.asarray(x, np.float64)) * 2.0**-8 + 1e-12
    assert (err < 0.15 * ulp + 1e-12).mean() > 0.99


def test_sr_fixes_second_moment_stagnation():
    """The collapse mechanism, distilled: accumulate b2*nu + (1-b2)*g^2 in
    bf16 storage. RNE freezes once nu is ~256x the increment; SR keeps an
    unbiased running value."""
    b2, g2, steps = 0.999, 1.0, 3000
    exact = 0.0
    rne = jnp.zeros((), jnp.bfloat16)
    sr = jnp.zeros((1,), jnp.bfloat16)
    key = jax.random.key(7)
    for t in range(steps):
        exact = b2 * exact + (1 - b2) * g2
        rne = (b2 * rne.astype(jnp.float32) + (1 - b2) * g2).astype(jnp.bfloat16)
        sr = stochastic_round_bf16(
            b2 * sr.astype(jnp.float32) + (1 - b2) * g2,
            jax.random.fold_in(key, t),
        )
    # exact -> 1 - b2^steps ~ 0.95; RNE stalls far below; SR tracks within a few %.
    assert float(exact) > 0.9
    assert float(rne) < 0.7 * float(exact), "RNE should visibly stall here"
    assert abs(float(sr[0]) - exact) < 0.05 * exact, float(sr[0])


def test_kernel_sr_matches_properties():
    """In-kernel SR (interpret mode): outputs are adjacent-bf16 of the f32
    oracle's moments, and the weight update itself is UNAFFECTED by SR
    (rounding applies to storage only)."""
    from tests.test_sparse_adamw_kernel import HP, make_inputs, xla_reference
    from jax.experimental.pallas import tpu as pltpu
    from gat_recommendation_tpu.ops.pallas.sparse_adamw import fused_sparse_adamw

    interp = pltpu.InterpretParams()  # TPU interpreter: supports pltpu.prng_*
    table, mu, nu, uid, summed, count = make_inputs(seed=3)
    want_t, want_m, want_n = xla_reference(table, mu, nu, uid, summed, count)
    got_t, got_m, got_n = fused_sparse_adamw(
        table, mu.astype(jnp.bfloat16), nu.astype(jnp.bfloat16),
        uid, summed, count, **HP, stochastic_rounding=True, interpret=interp,
    )
    assert got_m.dtype == jnp.bfloat16 and got_n.dtype == jnp.bfloat16
    # table: identical math up to the bf16 *input* moments' quantization
    np.testing.assert_allclose(
        np.asarray(got_t), np.asarray(want_t), rtol=5e-3, atol=5e-4
    )
    # moments: each element is one of the two bf16 neighbours of the f32
    # value computed from the SAME bf16 inputs
    want_t2, want_m2, want_n2 = xla_reference(
        table, mu.astype(jnp.bfloat16).astype(jnp.float32),
        nu.astype(jnp.bfloat16).astype(jnp.float32), uid, summed, count,
    )
    for got, want in ((got_m, want_m2), (got_n, want_n2)):
        g = np.asarray(got.astype(jnp.float32), np.float64)
        w = np.asarray(want, np.float64)
        # bf16 spacing is up to 2^-7 relative (mantissa 1.0 edge)
        ulp = np.abs(w) * 2.0**-7 + 1e-30
        assert (np.abs(g - w) <= ulp * 1.001).all()


def test_kernel_sr_deterministic_per_step():
    """Same count -> same bits -> identical output (resume reproducibility);
    different count -> different rounding pattern.

    The TPU interpreter's pltpu.prng_random_bits returns ZEROS (seed
    ignored — verified empirically), so SR degenerates to truncation
    there and the different-count inequality can only be checked on real
    hardware (scripts/pipeline/validate_sr_onchip.py, run in round 5 —
    see docs/PERFORMANCE.md 'bf16 moments with stochastic rounding').
    Here we pin what the interpreter CAN check: determinism and dtype.
    """
    from tests.test_sparse_adamw_kernel import HP, make_inputs
    from jax.experimental.pallas import tpu as pltpu
    from gat_recommendation_tpu.ops.pallas.sparse_adamw import fused_sparse_adamw

    interp = pltpu.InterpretParams()
    table, mu, nu, uid, summed, _ = make_inputs(seed=4)
    args = (table, mu.astype(jnp.bfloat16), nu.astype(jnp.bfloat16), uid, summed)
    a = fused_sparse_adamw(*args, 5, **HP, stochastic_rounding=True, interpret=interp)
    b = fused_sparse_adamw(*args, 5, **HP, stochastic_rounding=True, interpret=interp)
    np.testing.assert_array_equal(np.asarray(a[2]), np.asarray(b[2]))
    assert a[1].dtype == jnp.bfloat16 and a[2].dtype == jnp.bfloat16
    if jax.default_backend() == "tpu":  # real bits only on hardware
        c = fused_sparse_adamw(*args, 6, **HP, stochastic_rounding=True, interpret=False)
        d = fused_sparse_adamw(*args, 5, **HP, stochastic_rounding=True, interpret=False)
        assert (np.asarray(d[2]) != np.asarray(c[2])).any()


def test_optimizer_sr_plumbing():
    """FusedEmbeddingAdamW: SR defaults ON for bf16 moments, OFF for f32;
    the XLA fallback path stores SR'd bf16 moments."""
    from gat_recommendation_tpu.train.optimizers import FusedEmbeddingAdamW

    opt = FusedEmbeddingAdamW(1e-3, moment_dtype=jnp.bfloat16, use_pallas=False)
    assert opt.stochastic_rounding
    assert not FusedEmbeddingAdamW(1e-3, use_pallas=False).stochastic_rounding

    params = {"item_embedding": jnp.ones((512, 8), jnp.float32),
              "w": jnp.ones((8,), jnp.float32)}
    state = opt.init(params)
    assert state["emb_mu"].dtype == jnp.bfloat16
    uid = jnp.asarray([1, 2, 3, 511], jnp.int32)
    summed = jnp.full((4, 8), 1e-3, jnp.float32)
    p2, s2 = opt.update_sparse({"w": jnp.zeros((8,))}, uid, summed, state, params)
    assert s2["emb_mu"].dtype == jnp.bfloat16
    assert np.asarray(s2["emb_nu"].astype(jnp.float32))[uid].any()


def test_mixed_moment_dtypes():
    """(mu_dtype, nu_dtype) tuples: only the bf16 buffer rounds
    stochastically; the f32 buffer stays exact (attribution-study config)."""
    from gat_recommendation_tpu.train.optimizers import FusedEmbeddingAdamW

    params = {"item_embedding": jnp.ones((512, 8), jnp.float32),
              "w": jnp.ones((8,), jnp.float32)}
    uid = jnp.asarray([3, 7], jnp.int32)
    summed = jnp.full((2, 8), 1e-3, jnp.float32)

    opt = FusedEmbeddingAdamW(
        1e-3, moment_dtype=(None, jnp.bfloat16), use_pallas=False
    )
    assert opt.stochastic_rounding  # any narrowed buffer turns SR on
    state = opt.init(params)
    assert state["emb_mu"].dtype == jnp.float32
    assert state["emb_nu"].dtype == jnp.bfloat16
    _, s2 = opt.update_sparse({"w": jnp.zeros((8,))}, uid, summed, state, params)
    assert s2["emb_mu"].dtype == jnp.float32
    assert s2["emb_nu"].dtype == jnp.bfloat16
    # exact f32 mu: matches the closed-form first step
    want_mu = (1 - 0.9) * 1e-3
    np.testing.assert_allclose(
        np.asarray(s2["emb_mu"])[np.asarray(uid)], want_mu, rtol=1e-6
    )


def test_kernel_mixed_dtypes_interpret():
    """Pallas kernel with (f32 mu, bf16 nu): runs, preserves dtypes."""
    from tests.test_sparse_adamw_kernel import HP, make_inputs
    from jax.experimental.pallas import tpu as pltpu
    from gat_recommendation_tpu.ops.pallas.sparse_adamw import fused_sparse_adamw

    table, mu, nu, uid, summed, count = make_inputs(seed=5)
    got_t, got_m, got_n = fused_sparse_adamw(
        table, mu, nu.astype(jnp.bfloat16), uid, summed, count, **HP,
        stochastic_rounding=True, interpret=pltpu.InterpretParams(),
    )
    assert got_m.dtype == jnp.float32 and got_n.dtype == jnp.bfloat16


def test_update_full_bf16_moments_stay_bf16():
    """Dense path (update_full): bf16 moments must come back bf16 — the XLA
    fallback used to silently widen them to f32 after the first update —
    and SR must keep nu live under sub-ulp increments."""
    from gat_recommendation_tpu.train.optimizers import FusedEmbeddingAdamW

    opt = FusedEmbeddingAdamW(1e-3, moment_dtype=jnp.bfloat16, use_pallas=False)
    params = {"item_embedding": jnp.ones((128, 8), jnp.float32),
              "w": jnp.ones((8,), jnp.float32)}
    state = opt.init(params)
    grads = {"item_embedding": jnp.full((128, 8), 1e-3, jnp.float32),
             "w": jnp.zeros((8,), jnp.float32)}
    p, s = opt.update_full(grads, state, params)
    assert s["emb_mu"].dtype == jnp.bfloat16
    assert s["emb_nu"].dtype == jnp.bfloat16
    assert np.isfinite(np.asarray(p["item_embedding"])).all()


def test_sr_gate_covers_nu_only(monkeypatch):
    """Regression: with (f32 mu, bf16 nu) the Pallas branch's SR gate used
    to check only emb_mu and silently ran RNE — reproducing the collapse
    the config was meant to prevent. Assert the kernel is invoked with
    stochastic_rounding=True for a nu-only config."""
    from gat_recommendation_tpu.ops.pallas import sparse_adamw as sk
    from gat_recommendation_tpu.train.optimizers import FusedEmbeddingAdamW

    seen = {}
    def fake_fused(table, mu, nu, uid, summed, count, **kw):
        seen["sr"] = kw.get("stochastic_rounding")
        return table, mu, nu
    monkeypatch.setattr(sk, "fused_sparse_adamw", fake_fused)
    monkeypatch.setattr(sk, "supports", lambda *a, **k: True)

    opt = FusedEmbeddingAdamW(1e-3, moment_dtype=(None, jnp.bfloat16), use_pallas=True)
    params = {"item_embedding": jnp.ones((512, 8), jnp.float32),
              "w": jnp.ones((8,), jnp.float32)}
    state = opt.init(params)
    opt.update_sparse(
        {"w": jnp.zeros((8,))}, jnp.asarray([1, 2], jnp.int32),
        jnp.full((2, 8), 1e-3, jnp.float32), state, params,
    )
    assert seen["sr"] is True


def test_sharded_sparse_step_with_sr_moments():
    """Mesh path: the sharded sparse train step with bf16+SR moments runs
    on the virtual CPU mesh, preserves moment dtypes, and produces a
    finite loss (the sharded kernel seeds SR per shard via row_offset)."""
    from gat_recommendation_tpu.models import create_model
    from gat_recommendation_tpu.parallel import make_mesh
    from gat_recommendation_tpu.parallel.steps import (
        make_sharded_sparse_train_step,
        shard_params,
    )
    from gat_recommendation_tpu.train.losses import dual_loss
    from gat_recommendation_tpu.train.optimizers import FusedEmbeddingAdamW
    from tests.conftest import make_dummy_batch

    mesh = make_mesh(2, 4)  # dummy batch has 2 rows -> data axis 2
    model = create_model("graphsage", num_items=104, embedding_dim=16, hidden_dim=16)
    params, state = model.init_params(jax.random.key(0))
    opt = FusedEmbeddingAdamW(1e-3, moment_dtype=(None, jnp.bfloat16))
    opt_state = opt.init(params)
    params, state, opt_state = shard_params(params, state, opt_state, mesh)
    step = make_sharded_sparse_train_step(model, dual_loss, opt, mesh)

    from gat_recommendation_tpu.parallel.steps import shard_batch

    batch = shard_batch(make_dummy_batch(bucket_n=8), mesh)
    p2, s2, o2, loss = step(params, state, opt_state, batch, jax.random.key(1))
    assert np.isfinite(float(loss))
    assert o2["emb_mu"].dtype == jnp.float32
    assert o2["emb_nu"].dtype == jnp.bfloat16
