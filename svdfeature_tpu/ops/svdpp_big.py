"""Large-table SVD++ epoch: the train_epoch_plus algorithm on the
augmented big-table layout (ops/big_embed.py).

Above ONEHOT_THRESHOLD the small-table SVD++ machinery breaks down on
TPU: per-batch row updates lower to XLA's serializing scatter and the
chunk flush's [F, N] one-hot write grows linearly in the table size.
This module keeps the exact chunk-carried algorithm of
ops/svdpp.train_epoch_plus — pack-time overlap matrices, fb_sum += O @
delta closed form, pool touched twice per chunk (train_epoch_plus's
docstring has the derivation; reference semantics prepare_ufeedback /
update_ufeedback, apex_svd_base.h:523-554) — but re-routes all
table-sized work through the big-table primitives:

  - per-batch row updates: big_embed._forward_entries (native row
    gathers + the SVD++ p_u_extra/bias_extra feedback injection) and
    big_embed.apply_entries (sort -> dedup -> unique-row DMA write);
  - chunk-boundary aggregates: gathers from the augmented table + the
    small [F, G+1] one-hot payload matmul (G is users-per-batch, never
    table-sized);
  - chunk-exit flush: sorted-dedup accumulate of the pool deltas +
    ONE unique-row write (``_fb_writeback_big``) instead of the
    [F, N] one-hot.

Requires common_feedback_space=0 (disjoint feedback rows — the same
precondition as train_epoch_plus; the solver falls back to the
small-table layout otherwise) and the dedup write path (SVD++ batches
are far too sparse for the tile sweep).  Trajectory parity with
train_epoch_plus is pinned by tests/test_svdpp_big.py.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from .big_embed import (
    _forward_entries,
    apply_entries,
    gather_rows,
    sorted_dedup,
    write_rows_unique,
)
from .embed import TrainState
from .svdpp import _fb_aggregates


def _fb_writeback_big(w, cfb, delta_pad, delta_b_pad, with_bias, k, row_dma):
    """Accumulate the chunk's pool deltas into the augmented table.

    w[fb_idx_f, :k] += delta[fb_block_f] * fval_f (and the bias lane
    analogue) — update_ufeedback's writeback (apex_svd_base.h:539-554)
    accumulated over the chunk.  Duplicate pool rows (feedback items
    shared between the chunk's users) are merged by sorted_dedup;
    padded entries carry fval=0 and target the dummy row, which only
    ever receives zeros.
    """
    n_tbl = w.shape[0]
    dummy = n_tbl - 1
    fval = cfb["fb_val"]
    dw = delta_pad[cfb["fb_block"]] * fval[:, None]  # [F, k]
    if with_bias:
        db = delta_b_pad[cfb["fb_block"]] * fval
    else:
        db = jnp.zeros_like(fval)
    pay = jnp.concatenate([dw, db[:, None]], axis=1)  # [F, k+1]
    order, si, acc, first, last = sorted_dedup(cfb["fb_idx"], pay)
    old = gather_rows(w, si, row_dma=row_dma)  # [F, W]
    new_rows = old.at[:, :k].add(acc[:, :k])
    if with_bias:
        new_rows = new_rows.at[:, k].add(acc[:, k])
    is_real = last & (si != dummy)
    tgt = jnp.where(is_real, si, dummy)
    new_rows = jnp.where(is_real[:, None], new_rows, 0.0)
    return write_rows_unique(w, tgt, new_rows, row_dma=row_dma)


@partial(
    jax.jit,
    static_argnames=("hp", "rows_per_user"),
    donate_argnames=("state",),
)
def train_epoch_plus_big(
    state: TrainState,
    stacked,
    chunk_id,
    fb,
    fb_overlap,
    lr: jax.Array,
    consts,
    hp,
    scale_lr_ufeedback=1.0,
    wd_ufeedback=0.0,
    wd_ufeedback_bias=0.0,
    rows_per_user: int = 1,
):
    """One pass over [T, G*M] batches on the augmented table.

    Same carried-state recurrence as ops/svdpp.train_epoch_plus (see
    its docstring for the closed-form derivation and the M-wide Jacobi
    damping); only the table-sized reads/writes differ.  ``state`` must
    be in the augmented layout (big_embed.augment_state, no tile
    padding) with ``hp.big_table`` set.
    """
    assert hp.big_table and not hp.sweep_table
    T, GS = stacked["label"].shape
    M = rows_per_user
    G = GS // M
    k = hp.num_factor
    lr_fb = lr * scale_lr_ufeedback
    d = 1.0 - lr_fb * wd_ufeedback
    db = 1.0 - lr_fb * wd_ufeedback_bias
    with_bias = not hp.no_user_bias
    is_first = jnp.concatenate(
        [jnp.ones((1,), bool), chunk_id[1:] != chunk_id[:-1]]
    )

    def flush(st, cid, dacc, dbacc):
        cfb = jax.tree.map(lambda a: a[cid], fb)
        w = _fb_writeback_big(
            st.w, cfb, dacc, dbacc if with_bias else None, with_bias, k,
            hp.row_dma,
        )
        return dataclasses.replace(st, w=w)

    def body(carry, xs):
        st, pc, O, fb_sum, fb_bias, norm, inv, dacc, dbacc = carry
        batch, cid, first = xs

        def on_boundary(op):
            st, pc, dacc, dbacc = op
            st = flush(st, pc, dacc, dbacc)
            cfb = jax.tree.map(lambda a: a[cid], fb)
            # table-sized gathers on the augmented views; the one-hot
            # inside is [F, G+1] — small in the table dimension
            s, nrm, sb = _fb_aggregates(
                st.w[:, :k], st.w[:, k], cfb, G + 1, with_bias
            )
            nrm = nrm[:G]
            inv = jnp.where(nrm > 0, 1.0 / jnp.maximum(nrm, 1e-30), 0.0)
            return (
                st, fb_overlap[cid], s[:G], sb[:G], nrm, inv,
                jnp.zeros_like(dacc), jnp.zeros_like(dbacc),
            )

        def off_boundary(op):
            st, pc, dacc, dbacc = op
            return st, O, fb_sum, fb_bias, norm, inv, dacc, dbacc

        st, O, fb_sum, fb_bias, norm, inv, dacc, dbacc = jax.lax.cond(
            first, on_boundary, off_boundary, (st, pc, dacc, dbacc)
        )
        fb_slot = jnp.repeat(fb_sum, M, axis=0) if M > 1 else fb_sum
        fbb_slot = (
            (jnp.repeat(fb_bias, M) if M > 1 else fb_bias)
            if with_bias
            else None
        )
        g, ref_g, ent_idx, payload, rows_u, rows_i, wu, wi, nstep, err, p_i = (
            _forward_entries(
                st, batch, lr, consts, hp,
                p_u_extra=fb_slot, bias_extra=fbb_slot,
            )
        )
        w = apply_entries(
            st.w, st.step, ent_idx, payload, rows_u, rows_i, wu, wi,
            lr, consts, hp,
        )
        st = TrainState(
            w=w, b=st.b, g=g, step=nstep, ref_ui=st.ref_ui, ref_g=ref_g
        )
        # feedback recurrence — identical math to train_epoch_plus
        present = batch["weight"]
        m_g = present.reshape(G, M).sum(axis=1)
        errpi = (err[:, None] * p_i).reshape(G, M, k).sum(axis=1)
        err_g = err.reshape(G, M).sum(axis=1)
        if M > 1:
            frac = jnp.where(m_g > 0, (m_g - 1.0) / jnp.maximum(m_g, 1.0), 0.0)
            pip2 = jnp.sum(p_i * p_i, axis=1).reshape(G, M).sum(axis=1)
            errpi = errpi / (1.0 + lr_fb * norm * pip2 * frac)[:, None]
            err_g = err_g / (1.0 + lr_fb * norm * (m_g - 1.0) * (m_g > 0))
        dtmp = (
            fb_sum * (jnp.power(d, m_g) - 1.0)[:, None]
            + lr_fb * norm[:, None] * errpi
        )
        delta_pad = jnp.concatenate([dtmp * inv[:, None], jnp.zeros((1, k))], 0)
        dacc = dacc + delta_pad
        fb_sum = fb_sum + (O @ delta_pad)[:G]
        if with_bias:
            dtmp_b = (
                fb_bias * (jnp.power(db, m_g) - 1.0) + lr_fb * norm * err_g
            )
            delta_b_pad = jnp.concatenate([dtmp_b * inv, jnp.zeros((1,))])
            dbacc = dbacc + delta_b_pad
            fb_bias = fb_bias + (O @ delta_b_pad)[:G]
        return (st, cid, O, fb_sum, fb_bias, norm, inv, dacc, dbacc), None

    z = jnp.zeros((G, k), jnp.float32)
    zb = jnp.zeros((G,), jnp.float32)
    init = (
        state, jnp.int32(0), jnp.zeros((G + 1, G + 1), jnp.float32),
        z, zb, zb, zb,
        jnp.zeros((G + 1, k), jnp.float32), jnp.zeros((G + 1,), jnp.float32),
    )
    (state, last_cid, _, _, _, _, _, dacc, dbacc), _ = jax.lax.scan(
        body, init, (stacked, chunk_id, is_first)
    )
    return flush(state, last_cid, dacc, dbacc)
