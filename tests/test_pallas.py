"""Pallas fused-kernel tests.

On CPU the kernel runs in interpreter mode (tiny shapes); on a real TPU
(bench environment) the compiled kernel was verified against the jnp path:
max |w diff| 1.6e-5 after a full ML-100K round.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from svdfeature_tpu.ops.embed import (
    HyperParams,
    TrainConsts,
    TrainState,
    train_rounds,
)


def make_inputs(N=256, k=8, B=128, T=4, R=2, seed=0):
    rng = np.random.RandomState(seed)
    state = TrainState(
        w=jnp.asarray(rng.normal(0, 0.01, (N, k)).astype(np.float32)),
        b=jnp.asarray(rng.normal(0, 0.01, (N,)).astype(np.float32)),
        g=jnp.zeros((1,), jnp.float32),
        step=jnp.zeros((), jnp.int32),
        ref_ui=jnp.zeros((N,), jnp.int32),
        ref_g=jnp.zeros((1,), jnp.int32),
    )
    consts = TrainConsts(
        wd_u_row=jnp.full((N,), 0.004, jnp.float32),
        wd_i_row=jnp.full((N,), 0.004, jnp.float32),
        wd_g_row=jnp.zeros((1,), jnp.float32),
        wd_user_bias=jnp.float32(0.002),
        wd_item_bias=jnp.float32(0.002),
    )
    half = (N - 1) // 2
    stacked = {
        "label": jnp.asarray(rng.randint(1, 6, (T, B)).astype(np.float32)),
        "weight": jnp.ones((T, B), jnp.float32),
        "g_idx": jnp.zeros((T, B, 1), jnp.int32),
        "g_val": jnp.zeros((T, B, 1), jnp.float32),
        "u_idx": jnp.asarray(rng.randint(0, half, (T, B, 1)).astype(np.int32)),
        "u_val": jnp.ones((T, B, 1), jnp.float32),
        "i_idx": jnp.asarray(
            (half + rng.randint(0, half, (T, B, 1))).astype(np.int32)
        ),
        "i_val": jnp.ones((T, B, 1), jnp.float32),
    }
    hp = HyperParams(active_type=0, base_score=3.0)
    lrs = jnp.full((R,), 0.01, jnp.float32)
    return state, stacked, consts, hp, lrs


def test_pallas_supported_gate():
    from svdfeature_tpu.ops.pallas_embed import pallas_supported

    state, stacked, consts, hp, lrs = make_inputs()
    assert pallas_supported(hp, state, stacked)
    import dataclasses

    assert not pallas_supported(
        dataclasses.replace(hp, reg_method=1), state, stacked
    )


@pytest.mark.parametrize("precise", [False, True])
def test_pallas_matches_jnp_interpret(precise):
    """Interpreter-mode run of the fused kernel vs the jnp reference.

    fast mode (precise=False) reads the table in bf16 during the forward;
    updates accumulate in f32, so small-shape drift stays tiny."""
    from jax.experimental.pallas import tpu as pltpu

    from svdfeature_tpu.ops import pallas_embed

    state, stacked, consts, hp, lrs = make_inputs()
    ref = train_rounds(jax.tree.map(jnp.copy, state), stacked, lrs, consts, hp)
    with pltpu.force_tpu_interpret_mode():
        out = pallas_embed.train_rounds_pallas(
            jax.tree.map(jnp.copy, state), stacked, lrs, consts, hp,
            precise=precise,
        )
    atol_w, atol_b = (2e-5, 2e-4) if precise else (5e-5, 5e-4)
    np.testing.assert_allclose(
        np.asarray(out.w), np.asarray(ref.w), atol=atol_w, rtol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(out.b), np.asarray(ref.b), atol=atol_b, rtol=1e-3
    )
    assert int(out.step) == int(ref.step)


def make_inputs_g(NG=7, SG=3, **kw):
    """Inputs with a real global linear segment (neighborhoodModel-like:
    NG-1 real slots + dummy, SG entries per example, non-unit values)."""
    state, stacked, consts, hp, lrs = make_inputs(**kw)
    import dataclasses

    rng = np.random.RandomState(7)
    T, B = stacked["label"].shape
    state = dataclasses.replace(
        state,
        g=jnp.asarray(rng.normal(0, 0.01, (NG,)).astype(np.float32)),
        ref_g=jnp.zeros((NG,), jnp.int32),
    )
    wd_g = np.full((NG,), 0.001, np.float32)
    wd_g[-1] = 0.0
    consts = dataclasses.replace(consts, wd_g_row=jnp.asarray(wd_g))
    g_idx = rng.randint(0, NG - 1, (T, B, SG)).astype(np.int32)
    g_val = rng.uniform(0.1, 1.0, (T, B, SG)).astype(np.float32)
    # some entries padded to the dummy slot with value 0 (like pack)
    pad = rng.rand(T, B, SG) < 0.3
    g_idx[pad] = NG - 1
    g_val[pad] = 0.0
    stacked = dict(stacked, g_idx=jnp.asarray(g_idx), g_val=jnp.asarray(g_val))
    return state, stacked, consts, hp, lrs


@pytest.mark.parametrize("exact_global", [False, True])
def test_pallas_global_segment_matches_jnp(exact_global):
    """The in-kernel global linear segment (one-hot matvec forward,
    damped update_no_decay, touch-count decay) matches the jnp fused
    path on a neighborhoodModel-shaped workload."""
    import dataclasses

    from jax.experimental.pallas import tpu as pltpu

    from svdfeature_tpu.ops import pallas_embed

    state, stacked, consts, hp, lrs = make_inputs_g()
    hp = dataclasses.replace(hp, exact_global=exact_global)
    assert pallas_embed.pallas_supported(hp, state, stacked)
    ref = train_rounds(jax.tree.map(jnp.copy, state), stacked, lrs, consts, hp)
    with pltpu.force_tpu_interpret_mode():
        out = pallas_embed.train_rounds_pallas(
            jax.tree.map(jnp.copy, state), stacked, lrs, consts, hp
        )
    np.testing.assert_allclose(
        np.asarray(out.g), np.asarray(ref.g), atol=2e-5, rtol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(out.w), np.asarray(ref.w), atol=5e-5, rtol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(out.b), np.asarray(ref.b), atol=5e-4, rtol=1e-3
    )
    assert float(np.abs(np.asarray(out.g)).max()) > 0  # g actually trained
