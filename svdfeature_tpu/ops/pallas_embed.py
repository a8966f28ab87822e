"""Pallas TPU kernel: fully-fused multi-round SGD for VMEM-resident tables.

The flagship compute kernel.  For models whose unified factor table fits
in VMEM (N*k*4 <= ~4 MB — every reference demo, and any per-shard slab of
that size), the ENTIRE multi-round training run is one `pallas_call`:

* grid = (rounds, steps): Mosaic executes grid cells sequentially on a
  core, so the factor/bias tables — aliased in/out with constant index
  maps — stay resident in VMEM for the whole run and are written back to
  HBM once at the end;
* each grid cell processes one [B] batch: gathers and scatter-adds are
  one-hot matmuls on the MXU with the one-hot tiles built in VMEM
  (bf16 0/1 — exact), so the table-update path never touches HBM;
* the per-round learning-rate schedule is a scalar-prefetch operand.

Covers the hot configuration (one feature per u/i segment, eager L2,
no global features / hierarchy / nonnegativity); everything else uses the
jnp path in ops/embed.py.  Verified numerics vs the jnp path: max |dw| ~
1.6e-5 after a full ML-100K round (bf16 one-hot rounding).  Current status:
measured ~74 us/grid-cell on v5e vs ~50 us/step for the jnp one-hot path,
so it is opt-in (config use_pallas=1) pending further tiling work.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import losses
from .embed import HyperParams, TrainState, TrainConsts

# table budget: N*k*4 bytes for w + slack for one-hots and batch slices
PALLAS_VMEM_TABLE_BYTES = 4 * 1024 * 1024


def pallas_supported(hp: HyperParams, state: TrainState, stacked) -> bool:
    n, k = state.w.shape
    return (
        hp.reg_method == 0
        and hp.reg_global == 0
        and not hp.user_nonnegative
        and not hp.item_nonnegative
        and hp.active_type in (losses.LINEAR, losses.SIGMOID_L2,
                               losses.SIGMOID_LIKELIHOOD, losses.SIGMOID_RANK,
                               losses.SIGMOID_QSGRAD)
        and stacked["u_idx"].shape[-1] == 1
        and stacked["i_idx"].shape[-1] == 1
        and stacked["g_idx"].shape[-1] == 1
        and state.g.shape[0] == 1  # no global features (dummy slot only)
        and n * k * 4 <= PALLAS_VMEM_TABLE_BYTES
        and k % 8 == 0
    )


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def _make_kernel(hp: HyperParams, B: int, N: int, k: int, T: int):
    at = hp.active_type
    with_user_bias = not hp.no_user_bias

    def kernel(
        lrs_ref,  # scalar prefetch: [R] per-round lr
        u_idx_ref, u_val_ref, i_idx_ref, i_val_ref, label_ref, weight_ref,
        wd_u_ref, wd_i_ref, wd_bu_ref, wd_bi_ref,  # consts (VMEM)
        w_in_ref, b_in_ref,
        w_ref, b_ref,  # aliased outputs (VMEM-resident across the grid)
    ):
        r = pl.program_id(0)
        t = pl.program_id(1)
        lr = lrs_ref[r]

        # first grid cell: seed the VMEM output windows from the inputs
        # (the aliased HBM buffer is shared, but the output VMEM window
        # starts uninitialized)
        @pl.when((r == 0) & (t == 0))
        def _():
            w_ref[:] = w_in_ref[:]
            b_ref[:] = b_in_ref[:]


        u_idx = u_idx_ref[:]  # [B]
        i_idx = i_idx_ref[:]
        u_val = u_val_ref[:]
        i_val = i_val_ref[:]
        label = label_ref[:]
        weight = weight_ref[:]

        w = w_ref[:]  # [N, k]
        b = b_ref[:]  # [1, N] (kept 2-D for layout)
        bvec = b[0, :]

        # ---- forward: native VMEM row gathers (the one-hot is only
        # needed on the scatter side — the jnp fused path's trick,
        # ops/embed._train_step_fused, moved into the kernel)
        p_u = u_val[:, None] * jnp.take(w, u_idx, axis=0)
        p_i = i_val[:, None] * jnp.take(w, i_idx, axis=0)
        score = hp.base_score + jnp.sum(p_u * p_i, axis=1)
        score = score + i_val * jnp.take(bvec, i_idx)
        if with_user_bias:
            score = score + u_val * jnp.take(bvec, u_idx)
        pred = losses.map_active(score, at)
        err = losses.cal_grad(label, pred, at) * weight
        lr_err = lr * err

        # ---- scatter: ONE [B,N] one-hot read per segment, with the
        # w-update, b-update and touch count stacked into a [B, k+2]
        # payload matmul (duplicates sum on the MXU)
        iota = jax.lax.broadcasted_iota(jnp.int32, (B, N), 1)
        Eu = (u_idx[:, None] == iota).astype(jnp.bfloat16)  # VMEM-only
        Ei = (i_idx[:, None] == iota).astype(jnp.bfloat16)

        def mm_t(E, x):
            # E^T @ x contracting the batch axis (no transpose materialized);
            # x holds already-small update terms -> single bf16 pass
            dn = (((0,), (0,)), ((), ()))
            return jax.lax.dot_general(
                E, x.astype(jnp.bfloat16), dn, preferred_element_type=jnp.float32
            )

        coef_u = lr_err * u_val  # [B]
        coef_i = lr_err * i_val
        ones = jnp.ones((B, 1), jnp.float32)
        pay_u = jnp.concatenate(
            [coef_u[:, None] * p_i, coef_u[:, None], ones], axis=1
        )
        pay_i = jnp.concatenate(
            [coef_i[:, None] * p_u, coef_i[:, None], ones], axis=1
        )
        out_u = mm_t(Eu, pay_u)  # [N, k+2]
        out_i = mm_t(Ei, pay_i)
        cu = out_u[:, k + 1]
        ci = out_i[:, k + 1]
        w = w + out_u[:, :k] + out_i[:, :k]
        bvec = bvec + out_i[:, k]
        if with_user_bias:
            bvec = bvec + out_u[:, k]

        # ---- eager L2 decay with touch multiplicity
        fac = jnp.power(1.0 - lr * wd_u_ref[0, :], cu) * jnp.power(
            1.0 - lr * wd_i_ref[0, :], ci
        )
        w = w * fac[:, None]
        fac_b = jnp.power(1.0 - lr * wd_bi_ref[0, 0], ci)
        if with_user_bias:
            fac_b = fac_b * jnp.power(1.0 - lr * wd_bu_ref[0, 0], cu)
        bvec = bvec * fac_b

        # keep the dummy row clean
        dummy = jax.lax.broadcasted_iota(jnp.int32, (N, 1), 0)[:, 0] == N - 1
        w = jnp.where(dummy[:, None], 0.0, w)
        bvec = jnp.where(dummy, 0.0, bvec)

        w_ref[:] = w
        b_ref[0, :] = bvec

    return kernel


@partial(jax.jit, static_argnames=("hp",), donate_argnames=("state",))
def train_rounds_pallas(
    state: TrainState,
    stacked,
    lrs: jax.Array,
    consts: TrainConsts,
    hp: HyperParams,
) -> TrainState:
    """Multi-round training as a single fused Pallas kernel."""
    T, B = stacked["label"].shape
    N, k = state.w.shape
    R = lrs.shape[0]
    kernel = _make_kernel(hp, B, N, k, T)

    u_idx = stacked["u_idx"][..., 0].reshape(-1)
    i_idx = stacked["i_idx"][..., 0].reshape(-1)
    u_val = stacked["u_val"][..., 0].reshape(-1)
    i_val = stacked["i_val"][..., 0].reshape(-1)
    label = stacked["label"].reshape(-1)
    weight = stacked["weight"].reshape(-1)

    def batch_spec(_):
        # flat [T*B] arrays, one [B] block per grid step (1-D blocks only
        # constrain the last dim: B is a multiple of 128)
        return pl.BlockSpec((B,), lambda r, t, *_: (t,), memory_space=pltpu.VMEM)

    table_spec = pl.BlockSpec((N, k), lambda r, t, *_: (0, 0), memory_space=pltpu.VMEM)
    vec_spec = pl.BlockSpec((1, N), lambda r, t, *_: (0, 0), memory_space=pltpu.VMEM)
    scal_spec = pl.BlockSpec((1, 1), lambda r, t, *_: (0, 0), memory_space=pltpu.VMEM)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(R, T),
        in_specs=[
            batch_spec(u_idx), batch_spec(u_val), batch_spec(i_idx),
            batch_spec(i_val), batch_spec(label), batch_spec(weight),
            vec_spec, vec_spec, scal_spec, scal_spec,
            table_spec, vec_spec,
        ],
        out_specs=(table_spec, vec_spec),
    )
    w_out, b_out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((N, k), jnp.float32),
            jax.ShapeDtypeStruct((1, N), jnp.float32),
        ),
        input_output_aliases={11: 0, 12: 1},  # w, b (incl. scalar-prefetch operand)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024,
        ),
    )(
        lrs,
        u_idx, u_val, i_idx, i_val, label, weight,
        consts.wd_u_row[None, :], consts.wd_i_row[None, :],
        consts.wd_user_bias[None, None], consts.wd_item_bias[None, None],
        state.w, state.b[None, :],
    )
    nstep = state.step + (
        jnp.sum(stacked["weight"] > 0).astype(jnp.int32) * jnp.int32(R)
    )
    return TrainState(
        w=w_out,
        b=b_out[0],
        g=state.g,
        step=nstep,
        ref_ui=state.ref_ui,
        ref_g=state.ref_g,
    )
