"""Didactic minimal solver: the customization recipe.

Port of solvers/example (apex_svd_lite.h:35-194 + apex_svd_lite.cpp:24-33):
the reference shows how to write a custom solver by reimplementing the
base algorithm without plugins/lazy-reg and re-defining
create_svd_trainer.  Here the same recipe is ``register_trainer``: define
a trainer class and register it under an extend_type — no relinking.

SVDFeatureLiteTrainer is a pure-jnp restatement of the L2-only SGD update
(one batch at a time, no scan, no dummy-row tricks) — slower than the
fused base solver but easy to read and a template for experimentation.
Registered under extend_type=99.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .. import losses
from .base import SVDFeatureTrainer
from .registry import register_trainer


class SVDFeatureLiteTrainer(SVDFeatureTrainer):
    """Same model/checkpoint as the base solver; simplified update path."""

    def update_all(self, ds) -> None:
        stacked, _ = self._pack(ds)
        lr = jnp.float32(self.learning_rate)
        p = self.model.param
        tp = self.tparam
        T = stacked["label"].shape[0]
        for t in range(T):
            batch = {k: v[t] for k, v in stacked.items()}
            self.state = _lite_step(
                self.state, batch, lr, self.hp,
                jnp.float32(tp.wd_user), jnp.float32(tp.wd_item),
                jnp.float32(tp.wd_user_bias), jnp.float32(tp.wd_item_bias),
                jnp.float32(tp.wd_global),
            )


from functools import partial

from ..ops.embed import HyperParams, TrainState, forward_scores


@partial(jax.jit, static_argnames=("hp",), donate_argnames=("state",))
def _lite_step(state, batch, lr, hp, wd_u, wd_i, wd_bu, wd_bi, wd_g):
    """One batch of plain L2 SGD (apex_svd_lite.h:118-152 semantics)."""
    pred, p_u, p_i = forward_scores(state, batch, hp)
    err = losses.cal_grad(batch["label"], pred, hp.active_type) * batch["weight"]
    lr_err = lr * err
    w, b, g = state.w, state.b, state.g
    u_idx, i_idx, g_idx = batch["u_idx"], batch["i_idx"], batch["g_idx"]
    cu = jnp.zeros(w.shape[0]).at[u_idx.reshape(-1)].add(1.0)
    ci = jnp.zeros(w.shape[0]).at[i_idx.reshape(-1)].add(1.0)
    cg = jnp.zeros(g.shape[0]).at[g_idx.reshape(-1)].add(1.0)
    coef_u = lr_err[:, None] * batch["u_val"]
    coef_i = lr_err[:, None] * batch["i_val"]
    B, Su = u_idx.shape
    k = w.shape[1]
    w = w.at[u_idx.reshape(-1)].add(
        (coef_u[..., None] * p_i[:, None, :]).reshape(-1, k)
    )
    w = w.at[i_idx.reshape(-1)].add(
        (coef_i[..., None] * p_u[:, None, :]).reshape(-1, k)
    )
    b = b.at[u_idx.reshape(-1)].add(coef_u.reshape(-1))
    b = b.at[i_idx.reshape(-1)].add(coef_i.reshape(-1))
    g = g.at[g_idx.reshape(-1)].add((lr_err[:, None] * batch["g_val"]).reshape(-1))
    w = w * jnp.power(1.0 - lr * wd_u, cu)[:, None] * jnp.power(1.0 - lr * wd_i, ci)[:, None]
    b = b * jnp.power(1.0 - lr * wd_bu, cu) * jnp.power(1.0 - lr * wd_bi, ci)
    g = g * jnp.power(1.0 - lr * wd_g, cg)
    w = w.at[-1].set(0.0)
    b = b.at[-1].set(0.0)
    g = g.at[-1].set(0.0)
    return TrainState(
        w=w, b=b, g=g,
        step=state.step + jnp.sum(batch["weight"] > 0).astype(jnp.int32),
        ref_ui=state.ref_ui, ref_g=state.ref_g,
    )


register_trainer(99, SVDFeatureLiteTrainer)
