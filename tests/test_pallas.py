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
