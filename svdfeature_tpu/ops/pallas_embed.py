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
jnp path in ops/embed.py.  ON BY DEFAULT on TPU (config use_pallas=0
forces the jnp path).

Measured on v5e, ML-100K basicMF (B=4096, N=2626, k=64, 40 rounds):
jnp fused path 155 us/step (25.4M ex/s) vs this kernel 128 us/step
(30.8M ex/s) in the default fast mode — bf16 single-pass forward table
reads, f32 update accumulation; 40-round test RMSE identical to the jnp
path to 5 decimals (0.93329), max |dw| 1.2e-3.  pallas_precise=1 selects
a per-segment bf16 hi/lo compensated forward (max |dw| 1.7e-4, 171
us/step, still faster than jnp).
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
        # global linear segment rides in-kernel one-hot matvecs
        # (apex_svd_base.h's update_no_decay on the g table); the
        # selector footprint is [B, NGp] so cap the padded table at 1024
        # lanes and the per-example entries at 8 — every demo workload
        # (neighborhoodModel: G+1 = 7, SG = 3) sits far below both
        and stacked["g_idx"].shape[-1] <= 8
        and state.g.shape[0] <= 1024
        and n * k * 4 <= PALLAS_VMEM_TABLE_BYTES
        and k % 8 == 0
    )


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def _make_kernel(hp: HyperParams, B: int, N: int, k: int, T: int, precise: bool,
                 SG: int = 0, NG: int = 0, NGp: int = 0):
    """SG/NG/NGp: global-linear segment (0 = absent) — SG sublane-padded
    per-example entries, NG the real [G+1] table size, NGp its 128-lane
    padding."""
    at = hp.active_type
    with_user_bias = not hp.no_user_bias

    def kernel(*refs):
        if SG:
            (lrs_ref, lbu_ref, lbi_ref,
             u_idx_ref, u_val_ref, i_idx_ref, i_val_ref, label_ref,
             weight_ref, g_idx_ref, g_val_ref, lu_ref, li_ref, lg_ref,
             w_in_ref, b_in_ref, g_in_ref,
             w_ref, b_ref, g_ref) = refs
        else:
            (lrs_ref, lbu_ref, lbi_ref,
             u_idx_ref, u_val_ref, i_idx_ref, i_val_ref, label_ref,
             weight_ref, lu_ref, li_ref,
             w_in_ref, b_in_ref,
             w_ref, b_ref) = refs
        r = pl.program_id(0)
        t = pl.program_id(1)
        lr = lrs_ref[r]

        # first grid cell: seed the VMEM output windows from the inputs
        # (the aliased HBM buffer is shared, but the output VMEM window
        # starts uninitialized)
        @pl.when((r == 0) & (t == 0))
        def _():
            # seed and zero the dummy row ONCE; thereafter it stays exactly
            # 0 without per-cell masking (padded examples carry weight 0 so
            # their coef terms are exactly 0 even in bf16, and the dummy
            # row's wd is 0 so its decay factor is exactly 1)
            dummy = jax.lax.broadcasted_iota(jnp.int32, (N, 1), 0)[:, 0] == N - 1
            w_ref[:] = jnp.where(dummy[:, None], 0.0, w_in_ref[:])
            b_ref[0, :] = jnp.where(dummy, 0.0, b_in_ref[0, :])
            if SG:
                lane = jax.lax.broadcasted_iota(jnp.int32, (1, NGp), 1)
                g_ref[:] = jnp.where(lane < NG - 1, g_in_ref[:], 0.0)


        u_idx = u_idx_ref[:]  # [B]
        i_idx = i_idx_ref[:]
        u_val = u_val_ref[:]
        i_val = i_val_ref[:]
        label = label_ref[:]
        weight = weight_ref[:]

        w = w_ref[:]  # [N, k]
        b = b_ref[:]  # [1, N] (kept 2-D for layout)
        bvec = b[0, :]

        # One-hot row selectors built in VMEM and reused by the forward
        # gather and the scatter (Mosaic's gather lowering cannot fetch B
        # arbitrary rows of an [N,k] table — dynamic_gather is single-vreg
        # only — so gathers must ride the MXU as one-hot matmuls anyway).
        # fast mode: ONE merged [2B,N] selector, one bf16 matmul per
        # direction (table reads rounded to bf16; updates still accumulate
        # in f32 — measured RMSE-neutral, see module doc).
        # precise mode: per-segment selectors with a bf16 hi + bf16 lo
        # compensated forward (~2^-16 relative); the merged-E multi-pass
        # equivalents crash this Mosaic toolchain, the split form compiles.
        m = jnp.concatenate([w, bvec[:, None]], axis=1)  # [N, k+1]
        dn = (((1,), (0,)), ((), ()))
        dnT = (((0,), (0,)), ((), ()))
        ones = jnp.ones((B, 1), jnp.float32)
        zeros = jnp.zeros((B, 1), jnp.float32)
        if precise:
            iota = jax.lax.broadcasted_iota(jnp.int32, (B, N), 1)
            Eu = (u_idx[:, None] == iota).astype(jnp.bfloat16)
            Ei = (i_idx[:, None] == iota).astype(jnp.bfloat16)
            hi = m.astype(jnp.bfloat16)
            lo = (m - hi.astype(jnp.float32)).astype(jnp.bfloat16)

            def mm(E):
                return jax.lax.dot_general(
                    E, hi, dn, preferred_element_type=jnp.float32
                ) + jax.lax.dot_general(E, lo, dn, preferred_element_type=jnp.float32)

            scaled_u = u_val[:, None] * mm(Eu)  # [B, k+1]
            scaled_i = i_val[:, None] * mm(Ei)
        else:
            ui = jnp.concatenate([u_idx, i_idx])  # [2B]
            vv = jnp.concatenate([u_val, i_val])  # [2B]
            iota = jax.lax.broadcasted_iota(jnp.int32, (2 * B, N), 1)
            E = (ui[:, None] == iota).astype(jnp.bfloat16)  # VMEM-only
            rows = jax.lax.dot_general(
                E, m.astype(jnp.bfloat16), dn, preferred_element_type=jnp.float32
            )
            scaled = vv[:, None] * rows  # [2B, k+1]
            scaled_u = scaled[:B]
            scaled_i = scaled[B:]
        p_u = scaled_u[:, :k]
        p_i = scaled_i[:, :k]
        score = hp.base_score + jnp.sum(p_u * p_i, axis=1)
        score = score + scaled_i[:, k]  # item bias
        if with_user_bias:
            score = score + scaled_u[:, k]
        if SG:
            # global linear segment: weighted one-hot selectors
            # (value / value^2 / count) built once, reused by the forward
            # matvec and the update reductions — f32 throughout (the
            # damped update's S and C2 reductions are exact-mirror of
            # embed._update_global's f32 scatter-adds)
            giota = jax.lax.broadcasted_iota(jnp.int32, (B, NGp), 1)
            selv = jnp.zeros((B, NGp), jnp.float32)
            selv2 = jnp.zeros((B, NGp), jnp.float32)
            selc = jnp.zeros((B, NGp), jnp.float32)
            for s in range(SG):
                oh = (g_idx_ref[s, :][:, None] == giota).astype(jnp.float32)
                vs = g_val_ref[s, :][:, None]
                selv = selv + oh * vs
                selv2 = selv2 + oh * (vs * vs)
                selc = selc + oh
            gvec = g_ref[:]  # [1, NGp]
            gdn = (((1,), (1,)), ((), ()))
            score = score + jax.lax.dot_general(
                selv, gvec, gdn, preferred_element_type=jnp.float32
            )[:, 0]
        pred = losses.map_active(score, at)
        err = losses.cal_grad(label, pred, at) * weight
        lr_err = lr * err

        # ---- scatter: [*, k+3] payload matmul(s) — w-update, b-update and
        # per-segment touch counts stacked so duplicates sum on the MXU
        # (separate u/i count columns keep common_latent_space aliasing
        # exact when wd_u != wd_i)
        coef_u = lr_err * u_val  # [B]
        coef_i = lr_err * i_val
        bias_u = coef_u[:, None] if with_user_bias else zeros
        pay_u = jnp.concatenate(
            [coef_u[:, None] * p_i, bias_u, ones, zeros], axis=1
        )
        pay_i = jnp.concatenate(
            [coef_i[:, None] * p_u, coef_i[:, None], zeros, ones], axis=1
        )
        if precise:
            out = jax.lax.dot_general(
                Eu, pay_u.astype(jnp.bfloat16), dnT,
                preferred_element_type=jnp.float32,
            ) + jax.lax.dot_general(
                Ei, pay_i.astype(jnp.bfloat16), dnT,
                preferred_element_type=jnp.float32,
            )  # [N, k+3]
        else:
            pay = jnp.concatenate([pay_u, pay_i], axis=0)  # [2B, k+3]
            out = jax.lax.dot_general(
                E, pay.astype(jnp.bfloat16), dnT,
                preferred_element_type=jnp.float32,
            )  # [N, k+3]
        cu = out[:, k + 1]
        ci = out[:, k + 2]
        w = w + out[:, :k]
        bvec = bvec + out[:, k]

        # ---- eager L2 decay with touch multiplicity:
        # (1-lr*wd_u)^cu * (1-lr*wd_i)^ci == exp(cu*log(..) + ci*log(..))
        # with the logs precomputed per round on the XLA side — ONE exp
        # pass here instead of four pow-transcendental passes
        fac = jnp.exp(cu * lu_ref[0, 0, :] + ci * li_ref[0, 0, :])
        w = w * fac[:, None]
        sb = ci * lbi_ref[r]
        if with_user_bias:
            sb = sb + cu * lbu_ref[r]
        bvec = bvec * jnp.exp(sb)

        # the dummy row stays exactly 0 without masking: padded examples
        # carry weight 0 (coef terms exactly 0, even in bf16) and the
        # dummy row's wd is 0 (log term 0 -> fac 1)

        w_ref[:] = w
        b_ref[0, :] = bvec

        if SG:
            # update_no_decay on the g table (proximal-damped at batch>1
            # unless exact_global, mirroring embed._update_global), then
            # touch-count decay; dummy + padding lanes pinned to 0
            erow = err[None, :]  # [1, B]
            onesr = jnp.ones((1, B), jnp.float32)
            dng = (((1,), (0,)), ((), ()))
            S = jax.lax.dot_general(
                erow, selv, dng, preferred_element_type=jnp.float32
            )  # [1, NGp]
            gv = gvec
            if hp.exact_global:
                gv = gv + lr * S
            else:
                C2 = jax.lax.dot_general(
                    onesr, selv2, dng, preferred_element_type=jnp.float32
                )
                gv = gv + lr * S / (1.0 + lr * C2)
            cg = jax.lax.dot_general(
                onesr, selc, dng, preferred_element_type=jnp.float32
            )
            gv = gv * jnp.exp(cg * lg_ref[0, 0, :][None, :])
            lane = jax.lax.broadcasted_iota(jnp.int32, (1, NGp), 1)
            g_ref[:] = jnp.where(lane < NG - 1, gv, 0.0)

    return kernel


@partial(jax.jit, static_argnames=("hp", "precise"), donate_argnames=("state",))
def train_rounds_pallas(
    state: TrainState,
    stacked,
    lrs: jax.Array,
    consts: TrainConsts,
    hp: HyperParams,
    precise: bool = False,
) -> TrainState:
    """Multi-round training as a single fused Pallas kernel.

    precise=False (default): single-pass bf16 forward reads.
    precise=True: compensated hi/lo forward (~2^-16 relative), one extra
    MXU pass per step; config key ``pallas_precise=1``.
    """
    T, B = stacked["label"].shape
    N, k = state.w.shape
    R = lrs.shape[0]
    NG = state.g.shape[0]
    # global linear segment present iff the table has real slots; SG=0
    # compiles the exact pre-global kernel (basicMF unchanged)
    SG = stacked["g_idx"].shape[-1] if NG > 1 else 0
    SGp = _round_up(SG, 8) if SG else 0
    NGp = _round_up(NG, 128) if SG else 0
    kernel = _make_kernel(hp, B, N, k, T, precise, SG=SGp, NG=NG, NGp=NGp)

    u_idx = stacked["u_idx"][..., 0].reshape(-1)
    i_idx = stacked["i_idx"][..., 0].reshape(-1)
    u_val = stacked["u_val"][..., 0].reshape(-1)
    i_val = stacked["i_val"][..., 0].reshape(-1)
    label = stacked["label"].reshape(-1)
    weight = stacked["weight"].reshape(-1)

    # per-round decay-log tables: fac = exp(cnt*log(1-lr_r*wd)); clamp at
    # a tiny positive so lr*wd == 1 underflows to fac 0 (pow parity)
    # instead of propagating -inf*0 = nan for untouched rows
    def _log1m(x):
        return jnp.log(jnp.maximum(1.0 - x, 1e-38))

    # [R, 1, N] so the per-round (1, 1, N) window satisfies Mosaic's
    # trailing-dims block constraint
    log_u = _log1m(lrs[:, None, None] * consts.wd_u_row[None, None, :])
    log_i = _log1m(lrs[:, None, None] * consts.wd_i_row[None, None, :])
    log_bu = _log1m(lrs * consts.wd_user_bias)  # [R]
    log_bi = _log1m(lrs * consts.wd_item_bias)

    def batch_spec(_):
        # flat [T*B] arrays, one [B] block per grid step (1-D blocks only
        # constrain the last dim: B is a multiple of 128)
        return pl.BlockSpec((B,), lambda r, t, *_: (t,), memory_space=pltpu.VMEM)

    table_spec = pl.BlockSpec((N, k), lambda r, t, *_: (0, 0), memory_space=pltpu.VMEM)
    vec_spec = pl.BlockSpec((1, N), lambda r, t, *_: (0, 0), memory_space=pltpu.VMEM)
    row_spec = pl.BlockSpec(
        (1, 1, N), lambda r, t, *_: (r, 0, 0), memory_space=pltpu.VMEM
    )

    in_specs = [
        batch_spec(u_idx), batch_spec(u_val), batch_spec(i_idx),
        batch_spec(i_val), batch_spec(label), batch_spec(weight),
    ]
    inputs = [u_idx, u_val, i_idx, i_val, label, weight]
    out_shape = [
        jax.ShapeDtypeStruct((N, k), jnp.float32),
        jax.ShapeDtypeStruct((1, N), jnp.float32),
    ]
    out_specs = [table_spec, vec_spec]
    if SG:
        # g planes transposed to [T*SGp, B] so the lane dim is B;
        # sublane padding entries point at the dummy slot with value 0
        g_idx_t = jnp.swapaxes(stacked["g_idx"], 1, 2).astype(jnp.int32)
        g_val_t = jnp.swapaxes(stacked["g_val"], 1, 2).astype(jnp.float32)
        if SGp > SG:
            g_idx_t = jnp.concatenate([
                g_idx_t,
                jnp.full((T, SGp - SG, B), NG - 1, jnp.int32),
            ], axis=1)
            g_val_t = jnp.concatenate([
                g_val_t, jnp.zeros((T, SGp - SG, B), jnp.float32)
            ], axis=1)
        g_plane_spec = pl.BlockSpec(
            (SGp, B), lambda r, t, *_: (t, 0), memory_space=pltpu.VMEM
        )
        wd_g = jnp.concatenate([
            consts.wd_g_row, jnp.zeros((NGp - NG,), jnp.float32)
        ])
        log_g = _log1m(lrs[:, None, None] * wd_g[None, None, :])  # [R,1,NGp]
        gvec_spec = pl.BlockSpec(
            (1, NGp), lambda r, t, *_: (0, 0), memory_space=pltpu.VMEM
        )
        grow_spec = pl.BlockSpec(
            (1, 1, NGp), lambda r, t, *_: (r, 0, 0), memory_space=pltpu.VMEM
        )
        g_pad = jnp.concatenate([
            state.g, jnp.zeros((NGp - NG,), jnp.float32)
        ])[None, :]
        in_specs += [g_plane_spec, g_plane_spec]
        inputs += [g_idx_t.reshape(T * SGp, B), g_val_t.reshape(T * SGp, B)]
        in_specs += [row_spec, row_spec, grow_spec, table_spec, vec_spec,
                     gvec_spec]
        inputs += [log_u, log_i, log_g, state.w, state.b[None, :], g_pad]
        out_shape.append(jax.ShapeDtypeStruct((1, NGp), jnp.float32))
        out_specs.append(gvec_spec)
        # w, b, g aliases (indices count the 3 scalar-prefetch operands)
        aliases = {14: 0, 15: 1, 16: 2}
    else:
        in_specs += [row_spec, row_spec, table_spec, vec_spec]
        inputs += [log_u, log_i, state.w, state.b[None, :]]
        aliases = {11: 0, 12: 1}

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(R, T),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
    )
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=tuple(out_shape),
        input_output_aliases=aliases,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024,
        ),
    )(lrs, log_bu, log_bi, *inputs)
    w_out, b_out = outs[0], outs[1]
    g_out = outs[2][0, :NG] if SG else state.g
    nstep = state.step + (
        jnp.sum(stacked["weight"] > 0).astype(jnp.int32) * jnp.int32(R)
    )
    return TrainState(
        w=w_out,
        b=b_out[0],
        g=g_out,
        step=nstep,
        ref_ui=state.ref_ui,
        ref_g=state.ref_g,
    )
