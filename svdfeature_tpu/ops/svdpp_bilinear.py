"""Bilinear-extended SVD++ train epoch (extend_type=15).

Adds the W_bi[item, bi_feedback] interaction of SVDBiLinearTrainer
(solvers/bilinear/apex_svd_bilinear.h) to the one-row-per-user SVD++ step:

  score   += sum_s i_val[g,s] * <W_bi[iid_s], up[g]>      (get_bias_plugin)
  W_bi[iid] += lr_bi * err * i_val * up[g]                 (update_bias_plugin)

where up[g] is the dense user-property vector of block g (feedback entries
with id < num_bi_feedback), precomputed at pack time.

Regularization modes for W_bi (reg_feedback, apex_svd_bilinear.h:93-128):
  0 L2 per touched pair, 1 L1 per touched pair,
  2 L2 whole item row per item-occurrence, 3 L1 whole row,
  4/5 truncated-gradient L1 per touched pair (the reference's lazy k
  counter has the same unsigned-subtraction bug as the base solver; we
  apply the per-touch threshold, i.e. k=1).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .embed import HyperParams, TrainConsts, TrainState, _soft_threshold
from .svdpp import _fb_aggregates, _plus_step, forward_scores


def _bi_bias(W_bi_pad, up_slot, i_idx_local, i_val):
    """[G] plugin bias: sum_s i_val[g,s] * <W_bi[lid], up[g]>."""
    rows = W_bi_pad[i_idx_local]  # [G, S, nbf]
    per = jnp.einsum("gsn,gn->gs", rows, up_slot)
    return jnp.einsum("gs,gs->g", per, i_val)


def _local_item_ids(i_idx, off_item, num_item):
    lid = i_idx - off_item
    ok = (lid >= 0) & (lid < num_item)
    return jnp.where(ok, lid, num_item), ok


def _bi_step(W_bi_pad, up_slot, batch, err, lr_bi, wd_bi, reg_bi, off_item):
    """Update + regularize W_bi for one batch; returns new W_bi_pad."""
    num_item = W_bi_pad.shape[0] - 1
    i_idx, i_val = batch["i_idx"], batch["i_val"]
    lid, _ = _local_item_ids(i_idx, off_item, num_item)
    G, S = lid.shape
    coef = (lr_bi * err)[:, None] * i_val  # [G, S]
    upd = coef[..., None] * up_slot[:, None, :]  # [G, S, nbf]
    W_bi_pad = W_bi_pad.at[lid.reshape(-1)].add(upd.reshape(G * S, -1))

    lam = lr_bi * wd_bi
    if reg_bi in (0, 1, 4, 5):
        # per-pair decay on touched (item, prop) pairs, once per touch
        touch = jnp.zeros_like(W_bi_pad)
        pair_touch = (jnp.abs(i_val) > 0)[..., None] * (
            jnp.abs(up_slot) > 0
        )[:, None, :]
        touch = touch.at[lid.reshape(-1)].add(
            pair_touch.reshape(G * S, -1).astype(jnp.float32)
        )
        if reg_bi == 0:
            W_bi_pad = W_bi_pad * jnp.power(1.0 - lam, touch)
        else:
            W_bi_pad = _soft_threshold(W_bi_pad, lam * touch)
    elif reg_bi in (2, 3):
        # whole-row decay per item occurrence
        cnt = jnp.zeros((num_item + 1,), jnp.float32).at[lid.reshape(-1)].add(
            jnp.where(jnp.abs(i_val).reshape(-1) > 0, 1.0, 0.0)
        )
        if reg_bi == 2:
            W_bi_pad = W_bi_pad * jnp.power(1.0 - lam, cnt)[:, None]
        else:
            W_bi_pad = _soft_threshold(W_bi_pad, (lam * cnt)[:, None])
    else:
        raise ValueError(f"unknown bi feedback decay method {reg_bi}")
    return W_bi_pad.at[-1].set(0.0)


@partial(jax.jit, static_argnames=("hp", "reg_bi"), donate_argnames=("state", "W_bi"))
def train_epoch_bi(
    state: TrainState,
    W_bi,
    stacked,
    chunk_id,
    fb,
    up,
    lr,
    consts: TrainConsts,
    hp: HyperParams,
    scale_lr_ufeedback=1.0,
    wd_ufeedback=0.0,
    wd_ufeedback_bias=0.0,
    slr_bi=1.0,
    wd_bi=0.0,
    reg_bi: int = 0,
    off_item: int = 0,
):
    lr_fb = lr * scale_lr_ufeedback
    d = 1.0 - lr_fb * wd_ufeedback
    db = 1.0 - lr_fb * wd_ufeedback_bias
    lr_bi = lr * slr_bi
    num_item = W_bi.shape[0]
    W_bi_pad = jnp.concatenate([W_bi, jnp.zeros((1, W_bi.shape[1]))], axis=0)

    def body(carry, xs):
        st, Wb = carry
        batch, cid = xs
        cfb = jax.tree.map(lambda a: a[cid], fb)
        up_slot = up[cid][: batch["label"].shape[0]]  # [G, nbf]
        lid, _ = _local_item_ids(batch["i_idx"], off_item, num_item)
        plug = _bi_bias(Wb, up_slot, lid, batch["i_val"])
        st, err = _plus_step(
            st, batch, cfb, lr, consts, hp, (lr_fb, d, db),
            bias_plugin=plug, return_err=True,
        )
        Wb = _bi_step(Wb, up_slot, batch, err, lr_bi, wd_bi, reg_bi, off_item)
        return (st, Wb), None

    (state, W_bi_pad), _ = jax.lax.scan(body, (state, W_bi_pad), (stacked, chunk_id))
    return state, W_bi_pad[:-1]


@partial(jax.jit, static_argnames=("hp",))
def predict_batches_bi(
    state: TrainState, W_bi, stacked, chunk_id, fb, up, hp: HyperParams, off_item: int
):
    with_bias = not hp.no_user_bias
    num_item = W_bi.shape[0]
    W_bi_pad = jnp.concatenate([W_bi, jnp.zeros((1, W_bi.shape[1]))], axis=0)

    def body(_, xs):
        batch, cid = xs
        cfb = jax.tree.map(lambda a: a[cid], fb)
        G = batch["label"].shape[0]
        fb_sum, _, fb_bias = _fb_aggregates(state.w, state.b, cfb, G + 1, with_bias)
        up_slot = up[cid][:G]
        lid, _ = _local_item_ids(batch["i_idx"], off_item, num_item)
        plug = _bi_bias(W_bi_pad, up_slot, lid, batch["i_val"])
        slot = jnp.arange(G)
        pred, _, _ = forward_scores(
            state,
            batch,
            hp,
            fb_sum[slot],
            (fb_bias[slot] if with_bias else None),
            bias_plugin=plug,
        )
        return None, pred

    _, preds = jax.lax.scan(body, None, (stacked, chunk_id))
    return preds
