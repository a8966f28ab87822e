"""Fused SVD++ (user-group) train epoch.

Re-design of SVDPPFeature (solvers/base-solver/apex_svd_base.h:484-592).
Reference semantics, per user block: compute the implicit-feedback factor
sum (prepare_ufeedback :523-538), train the rows sequentially while the
feedback state evolves (update_svdpp :512-520), write the accumulated
delta back scaled by 1/||feedback||^2 (update_ufeedback :539-554).

TPU formulation (layout in data/batching_plus.py): each batch holds ONE
row of each of G users; every step

  1. gathers its chunk's feedback pool and segment_sums the per-user
     aggregates  fb_sum[g] = sum_f val_f W[fb_idx_f],  norm[g],  fb_bias[g]
     from the live tables (per-batch freshness — fresher than the
     reference's per-block);
  2. runs the standard fused row update with p_u += fb_sum[g];
  3. applies the reference's per-row feedback update in closed form:
         tmp_1 - tmp_0 = fb_sum (d - 1) + lr_fb * norm * err * p_i,
         d = 1 - lr_fb * wd_ufeedback
     scattered back as  W_fb[f] += (tmp_1 - tmp_0)/norm * val_f
     (and likewise the feedback bias when user bias is enabled).

Because each user contributes one row per step, this matches the
reference's sequential per-row feedback recurrence exactly (up to
simultaneous-users summation of width G on shared rows, stable for
lr * G * overlap << 2).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .. import losses
from .embed import (
    HyperParams,
    TrainConsts,
    TrainState,
    _apply_factor_reg,
    _scatter_rows,
    _scatter_vals,
    _soft_threshold,
    _touch_counts,
    _update_global,
    forward_scores,
)


def _fb_aggregates(w, b, cfb, nseg: int, with_bias: bool):
    """(fb_sum [nseg,k], norm [nseg], fb_bias [nseg]) from a chunk pool."""
    rows = w[cfb["fb_idx"]] * cfb["fb_val"][:, None]
    fb_sum = jax.ops.segment_sum(rows, cfb["fb_block"], num_segments=nseg)
    norm = jax.ops.segment_sum(
        cfb["fb_val"] * cfb["fb_val"], cfb["fb_block"], num_segments=nseg
    )
    if with_bias:
        fb_bias = jax.ops.segment_sum(
            b[cfb["fb_idx"]] * cfb["fb_val"], cfb["fb_block"], num_segments=nseg
        )
    else:
        fb_bias = jnp.zeros((nseg,), jnp.float32)
    return fb_sum, norm, fb_bias


def _plus_step(
    state, batch, cfb, lr, consts, hp, fb_hyper,
    bias_plugin=None, return_err=False,
):
    """One batch (one row per user) with fresh feedback + direct writeback."""
    lr_fb, d, db = fb_hyper
    w, b, g = state.w, state.b, state.g
    n_ui, n_g = w.shape[0], g.shape[0]
    u_idx, i_idx, g_idx = batch["u_idx"], batch["i_idx"], batch["g_idx"]
    with_bias = not hp.no_user_bias
    G = batch["label"].shape[0]
    nseg = G + 1

    fb_sum, norm, fb_bias = _fb_aggregates(w, b, cfb, nseg, with_bias)
    slot = jnp.arange(G)  # user g of this batch is block slot g

    cu = _touch_counts(n_ui, u_idx)
    ci = _touch_counts(n_ui, i_idx)
    cg = _touch_counts(n_g, g_idx)

    p_u_extra = fb_sum[slot]
    bias_extra = fb_bias[slot] if with_bias else None
    pred, p_u, p_i = forward_scores(
        state, batch, hp, p_u_extra, bias_extra, bias_plugin
    )
    err = losses.cal_grad(batch["label"], pred, hp.active_type) * batch["weight"]
    lr_err = lr * err

    g = _update_global(g, g_idx, batch["g_val"], err, lr)
    coef_u = lr_err[:, None] * batch["u_val"]
    coef_i = lr_err[:, None] * batch["i_val"]
    w = _scatter_rows(w, u_idx, coef_u, p_i)
    w = _scatter_rows(w, i_idx, coef_i, p_u)
    b = _scatter_vals(b, i_idx, coef_i)
    if with_bias:
        b = _scatter_vals(b, u_idx, coef_u)

    # feedback writeback: one reference row-update per present user
    present = batch["weight"]  # [G]
    inv_norm = jnp.where(norm[:G] > 0, 1.0 / jnp.maximum(norm[:G], 1e-30), 0.0)
    dtmp = (
        fb_sum[:G] * (d - 1.0) * present[:, None]
        + lr_fb * norm[:G, None] * (err[:, None] * p_i)
    )
    delta = dtmp * inv_norm[:, None]  # [G, k]
    delta_pad = jnp.concatenate([delta, jnp.zeros((1, w.shape[1]))], axis=0)
    w = w.at[cfb["fb_idx"]].add(
        delta_pad[cfb["fb_block"]] * cfb["fb_val"][:, None]
    )
    if with_bias:
        dtmp_b = fb_bias[:G] * (db - 1.0) * present + lr_fb * norm[:G] * err
        delta_b = dtmp_b * inv_norm
        delta_b_pad = jnp.concatenate([delta_b, jnp.zeros((1,))])
        b = b.at[cfb["fb_idx"]].add(delta_b_pad[cfb["fb_block"]] * cfb["fb_val"])

    if hp.reg_method < 4:
        w = _apply_factor_reg(w, cu, ci, lr, consts, hp)
    if hp.reg_global < 4:
        if hp.reg_global == 0:
            g = g * jnp.power(1.0 - lr * consts.wd_g_row, cg)
        elif hp.reg_global == 1:
            g = _soft_threshold(g, lr * consts.wd_g_row * cg)
        else:
            raise ValueError(f"unknown global decay method {hp.reg_global}")
    fac_b = jnp.power(1.0 - lr * consts.wd_item_bias, ci)
    if with_bias:
        fac_b = fac_b * jnp.power(1.0 - lr * consts.wd_user_bias, cu)
    b = b * fac_b

    if hp.user_nonnegative:
        w = jnp.where((cu > 0)[:, None], jnp.maximum(w, 0.0), w)
    if hp.item_nonnegative:
        w = jnp.where((ci > 0)[:, None], jnp.maximum(w, 0.0), w)

    w = w.at[-1].set(0.0)
    b = b.at[-1].set(0.0)
    g = g.at[-1].set(0.0)
    nstep = state.step + jnp.sum(batch["weight"] > 0).astype(jnp.int32)
    new_state = TrainState(
        w=w, b=b, g=g, step=nstep, ref_ui=state.ref_ui, ref_g=state.ref_g
    )
    if return_err:
        return new_state, err
    return new_state


@partial(jax.jit, static_argnames=("hp",), donate_argnames=("state",))
def train_epoch_plus(
    state: TrainState,
    stacked,
    chunk_id,
    fb,
    lr: jax.Array,
    consts: TrainConsts,
    hp: HyperParams,
    scale_lr_ufeedback=1.0,
    wd_ufeedback=0.0,
    wd_ufeedback_bias=0.0,
):
    """One pass: scan over [T, G] batches; each step dynamically gathers its
    chunk's feedback pool."""
    lr_fb = lr * scale_lr_ufeedback
    d = 1.0 - lr_fb * wd_ufeedback
    db = 1.0 - lr_fb * wd_ufeedback_bias

    def body(st, xs):
        batch, cid = xs
        cfb = jax.tree.map(lambda a: a[cid], fb)
        st = _plus_step(st, batch, cfb, lr, consts, hp, (lr_fb, d, db))
        return st, None

    state, _ = jax.lax.scan(body, state, (stacked, chunk_id))
    return state


@partial(jax.jit, static_argnames=("hp",))
def predict_batches_plus(state: TrainState, stacked, chunk_id, fb, hp: HyperParams):
    """Forward-only predictions -> [T, G]."""
    with_bias = not hp.no_user_bias

    def body(_, xs):
        batch, cid = xs
        cfb = jax.tree.map(lambda a: a[cid], fb)
        G = batch["label"].shape[0]
        fb_sum, _, fb_bias = _fb_aggregates(state.w, state.b, cfb, G + 1, with_bias)
        slot = jnp.arange(G)
        pred, _, _ = forward_scores(
            state,
            batch,
            hp,
            fb_sum[slot],
            fb_bias[slot] if with_bias else None,
        )
        return None, pred

    _, preds = jax.lax.scan(body, None, (stacked, chunk_id))
    return preds
