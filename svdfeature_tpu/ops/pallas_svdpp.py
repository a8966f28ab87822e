"""Pallas TPU kernel: fully-fused SVD++ (user-group) training rounds.

The SVD++ analogue of ops/pallas_embed.py.  Reference semantics are the
user-block feedback protocol of SVDPPFeature (prepare_ufeedback /
update_svdpp / update_ufeedback, apex_svd_base.h:484-592) in the
overlap-carried formulation of ops/svdpp.train_epoch_plus (trajectory-
identical to per-batch pool refresh; see that module's docstring).

Why a kernel: the jnp path is HBM-bound — every step re-materializes
[GS, N] one-hots and full-table update/decay passes to HBM.  Here the
whole unified table (w, b) stays VMEM-resident across the grid, the
one-hot selectors live only in VMEM, and every per-user reduction is a
small MXU matmul:

* grid = (rounds, steps); carried chunk state (aggregates, overlap
  deltas) persists in VMEM scratch across grid cells;
* SLAB-LOCAL selectors: the unified row space (model.py) puts user rows
  in [off_user, off_item) and item rows in [off_item, N-1), so the
  per-slot selectors are built only over 128-aligned windows covering
  those slabs ([AU, AU+WU), [AI, AI+WI)) instead of the full table.
  For SVD++ layouts the feedback slab is as large as the item slab, so
  this cuts one-hot compare + matmul area ~3x vs full-N selectors (the
  feedback rows never appear in u_idx/i_idx and were pure waste);
* a constant slot->user selector S [GS, G+1] turns slot-to-user
  broadcasts (S @ agg) and per-user sums (S^T @ x) into matmuls;
* chunk boundaries (first cell of each chunk): the previous chunk's
  accumulated deltas are flushed to the feedback pool rows and the new
  chunk's aggregates [fb_sum | fb_bias | norm] are gathered, in
  FT-entry tiles of one-hots restricted to the FEEDBACK SLAB
  ([0, off_user) of the unified table) — the pool never pays
  user/item-slab one-hot FLOPs either;
* within a chunk the carried aggregates evolve in closed form,
  ``agg += O @ delta`` with O the pack-time overlap matrix.

Numerics follow the fast mode of pallas_embed (bf16 single-pass table
reads, f32 accumulation).  Gate: pallas_svdpp_supported.

Stability note: rows_per_user (M) widens BOTH the within-user Jacobi
step (damped here, scalar implicit form) and the cross-user feedback
coupling through shared pool rows, whose per-batch gain is
``lr_fb * m * lambda_max(O)``; measured on ML-100K sorted packing this
diverges at M=16 (gain ~3) and is stable at M=8 (the default).
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

PALLAS_VMEM_TABLE_BYTES = 4 * 1024 * 1024
FB_TILE = 2048  # pool entries per boundary one-hot tile


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def _live_tiles(fb_val, F: int):
    """Per-chunk live FB_TILE count: pools are filled from the front and
    zero-valued entries contribute nothing to aggregates or writebacks,
    so ceil(last-nonzero / FB_TILE) bounds the live region exactly."""
    live = fb_val != 0  # [C, F]
    cnt = jnp.where(
        live.any(axis=1),
        F - jnp.argmax(live[:, ::-1], axis=1),
        0,
    ).astype(jnp.int32)
    return -(-cnt // FB_TILE)



def pallas_svdpp_supported(hp, state, stacked, fb, off_user: int) -> bool:
    """The hot SVD++ configuration: separate feedback space (rows
    [0, off_user)), one feature per u/i segment, eager L2, no globals."""
    n, k = state.w.shape
    GS = stacked["label"].shape[1]
    return (
        off_user > 0  # separate feedback space below the user rows
        and hp.reg_method == 0
        and hp.reg_global == 0
        and not hp.user_nonnegative
        and not hp.item_nonnegative
        and hp.active_type in (losses.LINEAR, losses.SIGMOID_L2,
                               losses.SIGMOID_LIKELIHOOD, losses.SIGMOID_RANK,
                               losses.SIGMOID_QSGRAD)
        and stacked["u_idx"].shape[-1] == 1
        # item width 2 = pairwise-rank difference rows ([pos, neg] with
        # values [+v, -v]); forward sums the per-column factor gathers,
        # scatter sums the per-column payloads
        and stacked["i_idx"].shape[-1] in (1, 2)
        and stacked["g_idx"].shape[-1] == 1
        and state.g.shape[0] == 1  # no global features
        and _round_up(n, 128) * k * 4 <= PALLAS_VMEM_TABLE_BYTES
        and k % 8 == 0
        and GS % 128 == 0
        and fb["fb_idx"].shape[1] <= 1 << 17
        # fb slab padded to a lane multiple must stay clear of the dummy row
        and _round_up(off_user, 128) < n
    )


def _make_kernel(hp, B, NP, N, k, G, M, Gp, Fp, Nfb, R, T,
                 AU, WU, AI, WI, SI=1, D=0):
    """B = GS = G*M slots per cell; NP = padded table rows; Gp = padded
    G+1 segments; Fp = padded pool entries per chunk; Nfb = padded
    feedback-slab rows; [AU, AU+WU) / [AI, AI+WI) = 128-aligned windows
    covering the user / item slabs; SI = item entries per slot (2 for
    pairwise-rank difference rows: [pos, neg] with values [+v, -v]).

    D = 0: plain SVD++, segments are users (slot s -> user s//M).
    D > 0: multi-IMFB stacked contexts (apex_multi_imfb.h:83-148) —
    segments are the chunk's local feedback contexts, each slot reads D
    context ids from its ctx planes (pad = an always-gated slot), the
    selector S becomes multi-hot, and a per-chunk gate masks disabled
    depths' deltas (the reference skips those contexts entirely: no
    accumulate AND no decay, update_svdpp :85-94)."""
    at = hp.active_type
    with_user_bias = not hp.no_user_bias
    kb = k + 1  # factor cols + bias col

    def kernel(*refs):
        (
            # scalar prefetch
            lrs_ref,            # [R] per-round lr
            lbu_ref, lbi_ref,   # [R] log(1-lr_r*wd_bias)
            logd_ref, logdb_ref,  # [R] log(d), log(db) feedback decay
            lrfb_ref,           # [R] lr_fb = lr_r * scale_lr_ufeedback
            cid_ref,            # [T] chunk id per step
            pcid_ref,           # [T] chunk id of step t-1 (t=0 -> chunk T-1)
            ntc_ref,            # [C] per-chunk live pool tiles (<= Fp/FB_TILE)
            # batch blocks (SI (idx, val) pairs for the item segment)
            u_idx_ref, u_val_ref,
        ) = refs[:11]
        item_refs = refs[11:11 + 2 * SI]
        ctx_refs = refs[11 + 2 * SI:11 + 2 * SI + D]
        (
            label_ref, weight_ref,
            # per-round row-decay log tables (windows of [R, NP, 1])
            lu_ref, li_ref,
            # current chunk pool [1, Fp] + overlap [1, Gp, Gp]
            fbi_ref, fbv_ref, fbb_ref, O_ref,
        ) = refs[11 + 2 * SI + D:19 + 2 * SI + D]
        gate_refs = refs[19 + 2 * SI + D:19 + 2 * SI + D + (1 if D else 0)]
        (
            # previous chunk pool [1, Fp] (for the boundary flush)
            pfbi_ref, pfbv_ref, pfbb_ref,
            # tables in/out ([NP, k] factors, [NP, 1] bias column)
            w_in_ref, b_in_ref,
            w_ref, b_ref,
            # scratch: carried chunk state
            agg_ref,   # [Gp, k+2]: [fb_sum | fb_bias | norm]
            inv_ref,   # [Gp, 1]  : 1/norm (0 where empty)
            dacc_ref,  # [Gp, k+1]: accumulated [dw | db] deltas
        ) = refs[19 + 2 * SI + D + (1 if D else 0):]
        r = pl.program_id(0)
        t = pl.program_id(1)
        lr = lrs_ref[r]
        lr_fb = lrfb_ref[r]
        at_first_cell = (r == 0) & (t == 0)
        first = (t == 0) | (cid_ref[t] != pcid_ref[t])

        @pl.when(at_first_cell)
        def _():
            # zero the dummy row and the [N, NP) padding rows
            live = jax.lax.broadcasted_iota(jnp.int32, (NP, 1), 0) < N - 1
            w_ref[:] = jnp.where(live, w_in_ref[:], 0.0)
            b_ref[:] = jnp.where(live, b_in_ref[:], 0.0)
            dacc_ref[:] = jnp.zeros((Gp, kb), jnp.float32)

        def fb_tiles(idx_ref, val_ref, blk_ref, body, init, nt):
            """fori_loop over the chunk's LIVE FT-entry pool tiles (nt =
            ceil(real entries / FB_TILE), scalar-prefetched per chunk);
            body gets (E, A, fval).  Tiles past nt hold only padding
            (value 0 -> zero contribution), so skipping them is exact —
            and on sorted packings most chunks are far below the max
            pool Fp, cutting the boundary scan ~(C*Fp / sum Fc)x."""
            def step(i, carry):
                o = i * FB_TILE
                fi = idx_ref[0, 0, pl.ds(o, FB_TILE)]
                fv = val_ref[0, 0, pl.ds(o, FB_TILE)]
                fbk = blk_ref[0, 0, pl.ds(o, FB_TILE)]
                iota_n = jax.lax.broadcasted_iota(
                    jnp.int32, (FB_TILE, Nfb), 1
                )
                iota_g = jax.lax.broadcasted_iota(
                    jnp.int32, (FB_TILE, Gp), 1
                )
                E = (fi[:, None] == iota_n).astype(jnp.bfloat16)
                A = (fbk[:, None] == iota_g).astype(jnp.bfloat16)
                return body(carry, E, A, fv)

            return jax.lax.fori_loop(0, nt, step, init)

        dn = (((1,), (0,)), ((), ()))
        dnT = (((0,), (0,)), ((), ()))

        def apply_pool_delta(i_ref, v_ref, k_ref, nt):
            """Scatter dacc over the pool rows of the referenced chunk:
            w[fb_idx_f] += dacc[fb_block_f] * fval_f (update_ufeedback,
            apex_svd_base.h:539-554, accumulated over the chunk).  Stores
            are full-width (the [Nfb:] tail rows of ``out`` are zero: no
            one-hot column past the fb slab ever matches)."""
            dacc = dacc_ref[:].astype(jnp.bfloat16)  # [Gp, k+1]

            def tile(out, E, A, fv):
                pay = jax.lax.dot_general(
                    A, dacc, dn, preferred_element_type=jnp.float32
                ) * fv[:, None]  # [FT, k+1]
                return out + jax.lax.dot_general(
                    E, pay.astype(jnp.bfloat16), dnT,
                    preferred_element_type=jnp.float32,
                )

            out = fb_tiles(
                i_ref, v_ref, k_ref, tile, jnp.zeros((Nfb, kb), jnp.float32),
                nt,
            )
            pad = jnp.zeros((NP - Nfb, kb), jnp.float32)
            full = jnp.concatenate([out, pad], axis=0)  # [NP, k+1]
            w_ref[:] = w_ref[:] + full[:, :k]
            if with_user_bias:
                b_ref[:] = b_ref[:] + full[:, k:k + 1]

        # ---- boundary: flush previous chunk's deltas, gather this chunk's
        # aggregates from the live feedback slab
        @pl.when(first & ~at_first_cell)
        def _():
            apply_pool_delta(
                pfbi_ref, pfbv_ref, pfbb_ref, ntc_ref[pcid_ref[t]]
            )

        @pl.when(first)
        def _():
            m_fb = jnp.concatenate(
                [w_ref[0:Nfb, :], b_ref[0:Nfb, :]], axis=1
            ).astype(jnp.bfloat16)  # [Nfb, k+1]

            def gather(acc, E, A, fv):
                rows = jax.lax.dot_general(
                    E, m_fb, dn, preferred_element_type=jnp.float32
                ) * fv[:, None]  # [FT, k+1]
                pay = jnp.concatenate([rows, (fv * fv)[:, None]], axis=1)
                return acc + jax.lax.dot_general(
                    A, pay.astype(jnp.bfloat16), dnT,
                    preferred_element_type=jnp.float32,
                )

            agg = fb_tiles(
                fbi_ref, fbv_ref, fbb_ref, gather,
                jnp.zeros((Gp, k + 2), jnp.float32),
                ntc_ref[cid_ref[t]],
            )
            agg_ref[:] = agg
            norm = agg[:, k + 1 : k + 2]
            inv_ref[:] = jnp.where(
                norm > 0, 1.0 / jnp.maximum(norm, 1e-30), 0.0
            )
            dacc_ref[:] = jnp.zeros((Gp, kb), jnp.float32)

        # ---- cell: slab-local one-hot forward/scatter + feedback recurrence
        u_idx = u_idx_ref[0, 0, :]
        u_val = u_val_ref[0, 0, :]
        i_idx = [item_refs[2 * s][0, 0, :] for s in range(SI)]
        i_val = [item_refs[2 * s + 1][0, 0, :] for s in range(SI)]
        label = label_ref[0, 0, :]
        weight = weight_ref[0, 0, :]

        agg = agg_ref[:]          # [Gp, k+2]
        fbs = agg[:, :kb]         # [fb_sum | fb_bias]
        norm_col = agg[:, k + 1 : k + 2]
        inv_col = inv_ref[:]

        iota_gp = jax.lax.broadcasted_iota(jnp.int32, (B, Gp), 1)
        if D == 0:
            # constant slot->user selector (slot = g*M + m -> user g)
            slot_user = jax.lax.broadcasted_iota(jnp.int32, (B, Gp), 0) // M
            S = (slot_user == iota_gp).astype(jnp.bfloat16)  # [B, Gp]
        else:
            # multi-hot slot->contexts selector: a row reads/updates the
            # SUM of its active contexts (prepare_svdpp,
            # apex_multi_imfb.h:66-75); pad ctx ids hit an always-empty,
            # always-gated segment
            S = sum(
                (c_ref[0, 0, :][:, None] == iota_gp).astype(jnp.bfloat16)
                for c_ref in ctx_refs
            )  # [B, Gp]

        # slab-local selectors: padded slots carry the dummy index N-1,
        # which never matches a real user/item column (zero contribution)
        iota_u = jax.lax.broadcasted_iota(jnp.int32, (B, WU), 1) + AU
        Eu = (u_idx[:, None] == iota_u).astype(jnp.bfloat16)
        iota_i = jax.lax.broadcasted_iota(jnp.int32, (B, WI), 1) + AI
        Ei = [
            (i_idx[s][:, None] == iota_i).astype(jnp.bfloat16)
            for s in range(SI)
        ]
        mu = jnp.concatenate(
            [w_ref[AU:AU + WU, :], b_ref[AU:AU + WU, :]], axis=1
        ).astype(jnp.bfloat16)  # [WU, k+1]
        mi = jnp.concatenate(
            [w_ref[AI:AI + WI, :], b_ref[AI:AI + WI, :]], axis=1
        ).astype(jnp.bfloat16)  # [WI, k+1]
        scaled_u = u_val[:, None] * jax.lax.dot_general(
            Eu, mu, dn, preferred_element_type=jnp.float32
        )  # [B, k+1]
        scaled_i = sum(
            i_val[s][:, None] * jax.lax.dot_general(
                Ei[s], mi, dn, preferred_element_type=jnp.float32
            )
            for s in range(SI)
        )
        fb_slot = jax.lax.dot_general(
            S, fbs.astype(jnp.bfloat16), dn, preferred_element_type=jnp.float32
        )  # [B, k+1]
        p_u = scaled_u[:, :k] + fb_slot[:, :k]
        p_i = scaled_i[:, :k]
        score = hp.base_score + jnp.sum(p_u * p_i, axis=1)
        score = score + scaled_i[:, k]
        if with_user_bias:
            score = score + scaled_u[:, k] + fb_slot[:, k]
        pred = losses.map_active(score, at)
        err = losses.cal_grad(label, pred, at) * weight
        lr_err = lr * err

        coef_u = lr_err * u_val
        ones = jnp.ones((B, 1), jnp.float32)
        zeros = jnp.zeros((B, 1), jnp.float32)
        bias_u = coef_u[:, None] if with_user_bias else zeros
        pay_u = jnp.concatenate(
            [coef_u[:, None] * p_i, bias_u, ones], axis=1
        )  # [B, k+2]: [dw | db | touch]
        out_u = jax.lax.dot_general(
            Eu, pay_u.astype(jnp.bfloat16), dnT,
            preferred_element_type=jnp.float32,
        )  # [WU, k+2]
        out_i = jnp.zeros((WI, k + 2), jnp.float32)
        for s in range(SI):
            coef_i = lr_err * i_val[s]
            pay_i = jnp.concatenate(
                [coef_i[:, None] * p_u, coef_i[:, None], ones], axis=1
            )
            out_i = out_i + jax.lax.dot_general(
                Ei[s], pay_i.astype(jnp.bfloat16), dnT,
                preferred_element_type=jnp.float32,
            )  # [WI, k+2]
        cu = out_u[:, k + 1 : k + 2]  # [WU, 1] touch counts
        ci = out_i[:, k + 1 : k + 2]

        # update + eager decay, per slab.  The windows may overlap on a
        # 128-row boundary strip, but a row only ever has real touches in
        # one segment (slabs are disjoint), so the other slab adds zeros
        # and multiplies by exp(0) — order does not matter.
        wu = w_ref[AU:AU + WU, :] + out_u[:, :k]
        w_ref[AU:AU + WU, :] = wu * jnp.exp(cu * lu_ref[0, AU:AU + WU, :])
        bu = b_ref[AU:AU + WU, :] + out_u[:, k:k + 1]
        if with_user_bias:
            bu = bu * jnp.exp(cu * lbu_ref[r])
        b_ref[AU:AU + WU, :] = bu

        wi = w_ref[AI:AI + WI, :] + out_i[:, :k]
        w_ref[AI:AI + WI, :] = wi * jnp.exp(ci * li_ref[0, AI:AI + WI, :])
        bi = b_ref[AI:AI + WI, :] + out_i[:, k:k + 1]
        b_ref[AI:AI + WI, :] = bi * jnp.exp(ci * lbi_ref[r])

        # ---- feedback recurrence (closed form, per user)
        # per-user sums via S^T: [Gp, k+2] = S^T @ [err*p_i | err | present]
        red = jnp.concatenate(
            [err[:, None] * p_i, err[:, None], weight[:, None]], axis=1
        )
        sums = jax.lax.dot_general(
            S, red.astype(jnp.bfloat16), dnT, preferred_element_type=jnp.float32
        )  # [Gp, k+2]
        errpi = sums[:, :k]
        err_g = sums[:, k : k + 1]
        m_g = sums[:, k + 1 : k + 2]
        if M > 1:
            # implicit damping of the M-wide within-user Jacobi step
            # (ops/svdpp.train_epoch_plus body, same formulas)
            pip2 = jnp.sum(p_i * p_i, axis=1)[:, None]  # [B,1]
            pip2_g = jax.lax.dot_general(
                S, pip2.astype(jnp.bfloat16), dnT,
                preferred_element_type=jnp.float32,
            )  # [Gp, 1]
            if D == 0:
                # one unit per segment: excess is m_g - 1
                frac = jnp.where(
                    m_g > 0, (m_g - 1.0) / jnp.maximum(m_g, 1.0), 0.0
                )
                errpi = errpi / (1.0 + lr_fb * norm_col * pip2_g * frac)
                err_g = err_g / (
                    1.0 + lr_fb * norm_col * (m_g - 1.0) * (m_g > 0)
                )
            else:
                # contexts are SHARED across units: damp only the
                # WITHIN-unit excess m_g - U (U = distinct units feeding
                # the context, the present/m_unit indicator summed by
                # the same multi-hot selector) — the exact law of
                # ops/imfb._imfb_step's rows_per_user branch.  m_unit is
                # broadcast to slots via a banded unit selector matmul
                # (Mosaic rejects cross-lane reshapes).
                band_r = jax.lax.broadcasted_iota(jnp.int32, (B, B), 0) // M
                band_c = jax.lax.broadcasted_iota(jnp.int32, (B, B), 1) // M
                Su = (band_r == band_c).astype(jnp.bfloat16)  # [B, B]
                m_slot = jax.lax.dot_general(
                    Su, weight[:, None].astype(jnp.bfloat16), dn,
                    preferred_element_type=jnp.float32,
                )  # [B, 1] present rows of the slot's unit
                ind = jnp.where(
                    m_slot > 0,
                    weight[:, None] / jnp.maximum(m_slot, 1.0),
                    0.0,
                )
                U = jax.lax.dot_general(
                    S, ind.astype(jnp.bfloat16), dnT,
                    preferred_element_type=jnp.float32,
                )  # [Gp, 1]
                excess = jnp.maximum(m_g - U, 0.0)
                frac = jnp.where(
                    m_g > 0, excess / jnp.maximum(m_g, 1.0), 0.0
                )
                errpi = errpi / (1.0 + lr_fb * norm_col * pip2_g * frac)
                err_g = err_g / (1.0 + lr_fb * norm_col * excess)
        powd = jnp.exp(m_g * logd_ref[r]) - 1.0   # d^m_g - 1
        powdb = jnp.exp(m_g * logdb_ref[r]) - 1.0
        dtmp = jnp.concatenate(
            [
                fbs[:, :k] * powd + lr_fb * norm_col * errpi,
                fbs[:, k : k + 1] * powdb + lr_fb * norm_col * err_g,
            ],
            axis=1,
        )  # [Gp, k+1]
        delta = dtmp * inv_col
        if D:
            # disabled depths: no accumulate, no decay (the reference
            # `continue`s the whole context, apex_multi_imfb.h:85-87)
            delta = delta * gate_refs[0][0, 0, :][:, None]
        dacc_ref[:] = dacc_ref[:] + delta
        # carried aggregates: agg[:, :k+1] += O @ delta (norm col carried
        # via a zero pad — full-width store, no lane-offset slicing)
        Od = jax.lax.dot_general(
            O_ref[0], delta.astype(jnp.bfloat16), dn,
            preferred_element_type=jnp.float32,
        )  # [Gp, k+1]
        agg_ref[:] = agg_ref[:] + jnp.concatenate(
            [Od, jnp.zeros((Gp, 1), jnp.float32)], axis=1
        )

        # ---- final flush (last grid cell): current chunk's deltas
        @pl.when((r == R - 1) & (t == T - 1))
        def _():
            apply_pool_delta(fbi_ref, fbv_ref, fbb_ref, ntc_ref[cid_ref[t]])

    return kernel


@partial(
    jax.jit,
    static_argnames=("hp", "G", "M", "off_user", "off_item"),
    donate_argnames=("state",),
)
def train_rounds_svdpp_pallas(
    state: TrainState,
    stacked,
    chunk_id,
    fb,
    fb_overlap,
    lrs: jax.Array,
    consts: TrainConsts,
    hp: HyperParams,
    G: int,
    M: int,
    off_user: int,
    off_item: int,
    scale_lr_ufeedback=1.0,
    wd_ufeedback=0.0,
    wd_ufeedback_bias=0.0,
) -> TrainState:
    """Multi-round SVD++ training as a single fused Pallas kernel.

    stacked["u_*"]/["i_*"] may carry R per-round data planes (leading dim
    R*T instead of T) — fresh pairwise-rank samples per round train in one
    dispatch; label/weight/chunk geometry stay per-epoch."""
    T, GS = stacked["label"].shape
    assert GS == G * M
    N, k = state.w.shape
    R = lrs.shape[0]
    per_round = stacked["u_idx"].shape[0] != T
    if per_round:
        assert stacked["u_idx"].shape[0] == R * T
    C, F = fb["fb_idx"].shape
    NP = _round_up(N, 128)
    Gp = _round_up(G + 1, 128)
    Fp = _round_up(F, FB_TILE)
    Nfb = _round_up(off_user, 128)
    # 128-aligned windows covering the user / item slabs of the unified
    # row space (the item window runs through the dummy + padding rows;
    # padded slots' dummy index never matches a window column)
    AU = (off_user // 128) * 128
    WU = _round_up(off_item - AU, 128)
    AI = (off_item // 128) * 128
    WI = NP - AI
    SI = stacked["i_idx"].shape[-1]
    kernel = _make_kernel(hp, GS, NP, N, k, G, M, Gp, Fp, Nfb, R, T,
                          AU, WU, AI, WI, SI=SI)

    # [T, 1, GS] so the (1, 1, GS) block satisfies Mosaic's trailing-dims
    # rule for any GS multiple of 128 (1-D operands get XLA's T(1024)
    # layout, which Mosaic rejects below GS=1024).  Item entries ship as
    # SI separate (idx, val) planes for the same reason.
    u_idx = stacked["u_idx"][..., 0][:, None, :]
    u_val = stacked["u_val"][..., 0][:, None, :]
    item_ops = []
    for s in range(SI):
        item_ops.append(stacked["i_idx"][..., s][:, None, :])
        item_ops.append(stacked["i_val"][..., s][:, None, :])
    label = stacked["label"][:, None, :]
    weight = stacked["weight"][:, None, :]

    def _log1m(x):
        return jnp.log(jnp.maximum(1.0 - x, 1e-38))

    padN = NP - N
    wd_u = jnp.pad(consts.wd_u_row, (0, padN))
    wd_i = jnp.pad(consts.wd_i_row, (0, padN))
    log_u = _log1m(lrs[:, None, None] * wd_u[None, :, None])  # [R, NP, 1]
    log_i = _log1m(lrs[:, None, None] * wd_i[None, :, None])
    log_bu = _log1m(lrs * consts.wd_user_bias)
    log_bi = _log1m(lrs * consts.wd_item_bias)
    lr_fbs = lrs * jnp.float32(scale_lr_ufeedback)
    log_d = _log1m(lr_fbs * jnp.float32(wd_ufeedback))
    log_db = _log1m(lr_fbs * jnp.float32(wd_ufeedback_bias))

    cid = chunk_id.astype(jnp.int32)
    pcid = jnp.roll(cid, 1)  # chunk of the previous step; t=0 -> last chunk
    ntc = _live_tiles(fb["fb_val"], F)  # per-chunk live pool tiles

    # pad pool to Fp (padded entries: idx = N-1 outside the fb slab in
    # value terms -> one-hot misses; val 0; block = G)
    padF = Fp - F
    fbi = jnp.pad(fb["fb_idx"].astype(jnp.int32), ((0, 0), (0, padF)),
                  constant_values=N)[:, None, :]
    fbv = jnp.pad(fb["fb_val"], ((0, 0), (0, padF)))[:, None, :]
    fbb = jnp.pad(fb["fb_block"].astype(jnp.int32), ((0, 0), (0, padF)),
                  constant_values=G)[:, None, :]
    # overlap [C, G+1, G+1] -> padded [C, Gp, Gp]
    O = jnp.pad(
        fb_overlap, ((0, 0), (0, Gp - G - 1), (0, Gp - G - 1))
    )

    w_pad = jnp.pad(state.w, ((0, padN), (0, 0)))
    b_pad = jnp.pad(state.b, (0, padN))[:, None]

    def batch_spec(_):
        return pl.BlockSpec(
            (1, 1, GS), lambda r, t, *_: (t, 0, 0), memory_space=pltpu.VMEM
        )

    def round_spec(_):
        """Per-round data planes: round r's step t lives at plane r*T+t."""
        return pl.BlockSpec(
            (1, 1, GS), lambda r, t, *_: (r * T + t, 0, 0),
            memory_space=pltpu.VMEM,
        )

    ui_spec = round_spec if per_round else batch_spec

    table_spec = pl.BlockSpec((NP, k), lambda r, t, *_: (0, 0),
                              memory_space=pltpu.VMEM)
    bias_spec = pl.BlockSpec((NP, 1), lambda r, t, *_: (0, 0),
                             memory_space=pltpu.VMEM)
    row_spec = pl.BlockSpec(
        (1, NP, 1), lambda r, t, *_: (r, 0, 0), memory_space=pltpu.VMEM
    )
    # scalar-prefetch operand order (9): lrs, lbu, lbi, logd, logdb, lrfb,
    # cid, pcid, ntc -> index-map args follow the grid ids
    pool_cur = pl.BlockSpec(
        (1, 1, Fp),
        lambda r, t, lrs, lbu, lbi, ld, ldb, lf, cid, pcid, ntc: (cid[t], 0, 0),
        memory_space=pltpu.VMEM,
    )
    pool_prev = pl.BlockSpec(
        (1, 1, Fp),
        lambda r, t, lrs, lbu, lbi, ld, ldb, lf, cid, pcid, ntc: (pcid[t], 0, 0),
        memory_space=pltpu.VMEM,
    )
    O_spec = pl.BlockSpec(
        (1, Gp, Gp),
        lambda r, t, lrs, lbu, lbi, ld, ldb, lf, cid, pcid, ntc: (cid[t], 0, 0),
        memory_space=pltpu.VMEM,
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=9,
        grid=(R, T),
        in_specs=[
            ui_spec(u_idx), ui_spec(u_val),
            *[ui_spec(op) for op in item_ops],
            batch_spec(label), batch_spec(weight),
            row_spec, row_spec,
            pool_cur, pool_cur, pool_cur, O_spec,
            pool_prev, pool_prev, pool_prev,
            table_spec, bias_spec,
        ],
        out_specs=(table_spec, bias_spec),
        scratch_shapes=[
            pltpu.VMEM((Gp, k + 2), jnp.float32),
            pltpu.VMEM((Gp, 1), jnp.float32),
            pltpu.VMEM((Gp, k + 1), jnp.float32),
        ],
    )
    # tables are operands 9 (scalar prefetch) + 13 + 2*SI onward
    w_op = 22 + 2 * SI
    w_out, b_out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((NP, k), jnp.float32),
            jax.ShapeDtypeStruct((NP, 1), jnp.float32),
        ),
        input_output_aliases={w_op: 0, w_op + 1: 1},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024,
        ),
    )(
        lrs, log_bu, log_bi, log_d, log_db, lr_fbs, cid, pcid, ntc,
        u_idx, u_val, *item_ops, label, weight,
        log_u, log_i,
        fbi, fbv, fbb, O,
        fbi, fbv, fbb,
        w_pad, b_pad,
    )
    nstep = state.step + (
        jnp.sum(stacked["weight"] > 0).astype(jnp.int32) * jnp.int32(R)
    )
    return TrainState(
        w=w_out[:N],
        b=b_out[:N, 0],
        g=state.g,
        step=nstep,
        ref_ui=state.ref_ui,
        ref_g=state.ref_g,
    )


def pallas_imfb_supported(hp, state, stacked, fb, enabled, off_user) -> bool:
    """Stacked multi-IMFB whole-run kernel: the SVD++ predicate plus
    imfb-specific shape constraints (context count fits the padded
    segment dimension); layout-agnostic in rows_per_user — ctx planes
    are per-slot, and the M>1 damping rides the same selector."""
    n, k = state.w.shape
    GS = stacked["label"].shape[1]
    return (
        off_user > 0
        and hp.reg_method == 0
        and hp.reg_global == 0
        and not hp.user_nonnegative
        and not hp.item_nonnegative
        and hp.active_type in (losses.LINEAR, losses.SIGMOID_L2,
                               losses.SIGMOID_LIKELIHOOD, losses.SIGMOID_RANK,
                               losses.SIGMOID_QSGRAD)
        and stacked["u_idx"].shape[-1] == 1
        and stacked["i_idx"].shape[-1] == 1
        and stacked["g_idx"].shape[-1] == 1
        and state.g.shape[0] == 1  # no global features
        and _round_up(n, 128) * k * 4 <= PALLAS_VMEM_TABLE_BYTES
        and k % 8 == 0
        and GS % 128 == 0
        and fb["fb_idx"].shape[1] <= 1 << 17
        and _round_up(off_user, 128) < n
        # the carried overlap form needs the pool-row/ui-row disjointness
        # (solver gates on overlap is not None); VMEM budget for the
        # per-chunk [Gp, Gp] overlap block
        and _round_up(enabled.shape[1], 128) <= 1024
    )


@partial(
    jax.jit,
    static_argnames=("hp", "off_user", "off_item", "rows_per_user"),
    donate_argnames=("state",),
)
def train_rounds_imfb_pallas(
    state: TrainState,
    stacked,
    chunk_id,
    fb,
    fb_overlap,
    enabled,
    lrs: jax.Array,
    consts: TrainConsts,
    hp: HyperParams,
    off_user: int,
    off_item: int,
    scale_lr_ufeedback=1.0,
    wd_ufeedback=0.0,
    wd_ufeedback_bias=0.0,
    rows_per_user: int = 1,
) -> TrainState:
    """Multi-round STACKED multi-IMFB training as one fused Pallas kernel.

    The SVD++ whole-run kernel in D>0 mode: segments are the chunk's
    local feedback contexts (fb keyed by fb_ctx, overlap keyed likewise,
    ops/imfb.train_epoch_imfb_carried is the jnp reference), each slot
    carries D context-id planes, disabled depths ride the per-chunk gate.
    Trajectory matches train_epoch_imfb_carried (pinned in
    tests/test_pallas_svdpp.py, interpret mode)."""
    T, GS = stacked["label"].shape
    N, k = state.w.shape
    R = lrs.shape[0]
    C, F = fb["fb_idx"].shape
    nseg = enabled.shape[1]
    D = stacked["ctx_slots"].shape[-1]
    NP = _round_up(N, 128)
    Gp = _round_up(nseg, 128)
    Fp = _round_up(F, FB_TILE)
    Nfb = _round_up(off_user, 128)
    AU = (off_user // 128) * 128
    WU = _round_up(off_item - AU, 128)
    AI = (off_item // 128) * 128
    WI = NP - AI
    M = rows_per_user
    kernel = _make_kernel(hp, GS, NP, N, k, GS // M, M, Gp, Fp, Nfb, R, T,
                          AU, WU, AI, WI, SI=1, D=D)

    u_idx = stacked["u_idx"][..., 0][:, None, :]
    u_val = stacked["u_val"][..., 0][:, None, :]
    i_idx = stacked["i_idx"][..., 0][:, None, :]
    i_val = stacked["i_val"][..., 0][:, None, :]
    label = stacked["label"][:, None, :]
    weight = stacked["weight"][:, None, :]
    # ctx ids beyond nseg-1 (the pad slot) would alias padding segments;
    # pack_imfb pads with nseg-1 which the gate holds at 0
    ctx_ops = [
        stacked["ctx_slots"][..., d].astype(jnp.int32)[:, None, :]
        for d in range(D)
    ]

    def _log1m(x):
        return jnp.log(jnp.maximum(1.0 - x, 1e-38))

    padN = NP - N
    wd_u = jnp.pad(consts.wd_u_row, (0, padN))
    wd_i = jnp.pad(consts.wd_i_row, (0, padN))
    log_u = _log1m(lrs[:, None, None] * wd_u[None, :, None])
    log_i = _log1m(lrs[:, None, None] * wd_i[None, :, None])
    log_bu = _log1m(lrs * consts.wd_user_bias)
    log_bi = _log1m(lrs * consts.wd_item_bias)
    lr_fbs = lrs * jnp.float32(scale_lr_ufeedback)
    log_d = _log1m(lr_fbs * jnp.float32(wd_ufeedback))
    log_db = _log1m(lr_fbs * jnp.float32(wd_ufeedback_bias))

    cid = chunk_id.astype(jnp.int32)
    pcid = jnp.roll(cid, 1)
    ntc = _live_tiles(fb["fb_val"], F)  # per-chunk live pool tiles

    padF = Fp - F
    fbi = jnp.pad(fb["fb_idx"].astype(jnp.int32), ((0, 0), (0, padF)),
                  constant_values=N)[:, None, :]
    fbv = jnp.pad(fb["fb_val"], ((0, 0), (0, padF)))[:, None, :]
    fbb = jnp.pad(fb["fb_ctx"].astype(jnp.int32), ((0, 0), (0, padF)),
                  constant_values=nseg - 1)[:, None, :]
    O = jnp.pad(fb_overlap, ((0, 0), (0, Gp - nseg), (0, Gp - nseg)))
    gate = jnp.pad(enabled, ((0, 0), (0, Gp - nseg)))[:, None, :]

    w_pad = jnp.pad(state.w, ((0, padN), (0, 0)))
    b_pad = jnp.pad(state.b, (0, padN))[:, None]

    def batch_spec(_):
        return pl.BlockSpec(
            (1, 1, GS), lambda r, t, *_: (t, 0, 0), memory_space=pltpu.VMEM
        )

    table_spec = pl.BlockSpec((NP, k), lambda r, t, *_: (0, 0),
                              memory_space=pltpu.VMEM)
    bias_spec = pl.BlockSpec((NP, 1), lambda r, t, *_: (0, 0),
                             memory_space=pltpu.VMEM)
    row_spec = pl.BlockSpec(
        (1, NP, 1), lambda r, t, *_: (r, 0, 0), memory_space=pltpu.VMEM
    )
    pool_cur = pl.BlockSpec(
        (1, 1, Fp),
        lambda r, t, lrs, lbu, lbi, ld, ldb, lf, cid, pcid, ntc: (cid[t], 0, 0),
        memory_space=pltpu.VMEM,
    )
    pool_prev = pl.BlockSpec(
        (1, 1, Fp),
        lambda r, t, lrs, lbu, lbi, ld, ldb, lf, cid, pcid, ntc: (pcid[t], 0, 0),
        memory_space=pltpu.VMEM,
    )
    O_spec = pl.BlockSpec(
        (1, Gp, Gp),
        lambda r, t, lrs, lbu, lbi, ld, ldb, lf, cid, pcid, ntc: (cid[t], 0, 0),
        memory_space=pltpu.VMEM,
    )
    gate_spec = pl.BlockSpec(
        (1, 1, Gp),
        lambda r, t, lrs, lbu, lbi, ld, ldb, lf, cid, pcid, ntc: (cid[t], 0, 0),
        memory_space=pltpu.VMEM,
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=9,
        grid=(R, T),
        in_specs=[
            batch_spec(u_idx), batch_spec(u_val),
            batch_spec(i_idx), batch_spec(i_val),
            *[batch_spec(op) for op in ctx_ops],
            batch_spec(label), batch_spec(weight),
            row_spec, row_spec,
            pool_cur, pool_cur, pool_cur, O_spec,
            gate_spec,
            pool_prev, pool_prev, pool_prev,
            table_spec, bias_spec,
        ],
        out_specs=(table_spec, bias_spec),
        scratch_shapes=[
            pltpu.VMEM((Gp, k + 2), jnp.float32),
            pltpu.VMEM((Gp, 1), jnp.float32),
            pltpu.VMEM((Gp, k + 1), jnp.float32),
        ],
    )
    # operand index of w: 9 scalar prefetch + 4 u/i planes + D ctx planes
    # + label/weight + 2 row-decay tables + 4 pool/overlap + gate
    # + 3 prev-pool = 25 + D
    w_op = 25 + D
    w_out, b_out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((NP, k), jnp.float32),
            jax.ShapeDtypeStruct((NP, 1), jnp.float32),
        ),
        input_output_aliases={w_op: 0, w_op + 1: 1},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024,
        ),
    )(
        lrs, log_bu, log_bi, log_d, log_db, lr_fbs, cid, pcid, ntc,
        u_idx, u_val, i_idx, i_val, *ctx_ops, label, weight,
        log_u, log_i,
        fbi, fbv, fbb, O, gate,
        fbi, fbv, fbb,
        w_pad, b_pad,
    )
    nstep = state.step + (
        jnp.sum(stacked["weight"] > 0).astype(jnp.int32) * jnp.int32(R)
    )
    return TrainState(
        w=w_out[:N],
        b=b_out[:N, 0],
        g=state.g,
        step=nstep,
        ref_ui=state.ref_ui,
        ref_g=state.ref_g,
    )
