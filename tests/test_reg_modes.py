"""Exactness against a straight-line numpy port of the reference's
sequential SGD (update_inner, apex_svd_base.h:456-462): with batch_size=1
the fused batched step must reproduce the per-example math bit-for-bit
(up to f32 summation order) for every regularization mode, hierarchical
side features, per-range weight decay, and lr decay."""

import numpy as np
import pytest

from svdfeature_tpu import losses
from svdfeature_tpu.data.text import load_feature_text
from svdfeature_tpu.params import SVDTypeParam
from svdfeature_tpu.solvers.base import SVDFeatureTrainer


def seq_reference(ds, w0, b0, g0, off_u, off_i, hp, n_user, n_item):
    """Sequential per-example SGD oracle (reg modes 0/1/2/3; eager)."""
    w, b, g = w0.copy(), b0.copy(), g0.copy()
    lr = hp["lr"]
    for r in range(ds.num_row):
        label, (gi, gv), (ui, uv), (ii, iv) = ds.row(r)
        ui = ui.astype(int) + off_u
        ii = ii.astype(int) + off_i
        gi = gi.astype(int)
        # pred
        score = hp["base"] + (g[gi] * gv).sum()
        if not hp["no_user_bias"]:
            score += (b[ui] * uv).sum()
        score += (b[ii] * iv).sum()
        pu = (w[ui] * uv[:, None]).sum(0)
        pi = (w[ii] * iv[:, None]).sum(0)
        score += pu @ pi
        pred = float(np.asarray(losses.map_active(np.float32(score), hp["at"])))
        err = float(np.asarray(losses.cal_grad(np.float32(label), np.float32(pred), hp["at"])))
        # update — the reference's update_no_decay verbatim
        # (apex_svd_base.h:384-387: g_bias[gid] += lr * err * value)
        for j, (idx, v) in enumerate(zip(gi, gv)):
            g[idx] += lr * err * v
        for idx, v in zip(ui, uv):
            w[idx] += lr * err * v * pi
            if not hp["no_user_bias"]:
                b[idx] += lr * err * v
        for idx, v in zip(ii, iv):
            w[idx] += lr * err * v * pu
            b[idx] += lr * err * v
        # eager reg (post)
        m = hp["reg"]
        for idx in gi:
            g[idx] *= 1.0 - lr * hp["wd_g"]
        for idx, is_user in [(x, True) for x in ui] + [(x, False) for x in ii]:
            wd = hp["wd_u"] if is_user else hp["wd_i"]
            lam = lr * wd
            if m == 0 or (m == 3 and not is_user):
                w[idx] *= 1.0 - lam
            elif m == 1 or (m == 3 and is_user):
                w[idx] = np.sign(w[idx]) * np.maximum(np.abs(w[idx]) - lam, 0.0)
            elif m == 2:
                sq = float(w[idx] @ w[idx])
                if sq > wd:
                    w[idx] *= np.sqrt(wd / sq)
            if is_user:
                if not hp["no_user_bias"]:
                    b[idx] *= 1.0 - lr * hp["wd_bu"]
            else:
                b[idx] *= 1.0 - lr * hp["wd_bi"]
    return w, b, g


def make_ds(seed=0, rows=60, nu=6, ni=9, ng=3):
    rng = np.random.RandomState(seed)
    lines = []
    for _ in range(rows):
        gfeat = f"{rng.randint(0,ng)}:{rng.rand():.3f} " if ng else ""
        lines.append(
            f"{rng.randint(1,6)} {1 if ng else 0} 1 1 {gfeat}"
            f"{rng.randint(0,nu)}:1 {rng.randint(0,ni)}:1"
        )
    return load_feature_text("x", text="\n".join(lines))


@pytest.mark.parametrize("reg", [0, 1, 2, 3])
@pytest.mark.parametrize("atype", [0, 2])
def test_batch1_matches_sequential(reg, atype):
    ds = make_ds()
    nu, ni, ng = 6, 9, 3
    tr = SVDFeatureTrainer(SVDTypeParam(active_type=atype))
    for k, v in dict(
        num_user=nu, num_item=ni, num_global=ng, num_factor=4,
        base_score=(3 if atype == 0 else 0.5), learning_rate=0.05,
        wd_user=0.02, wd_item=0.03, wd_global=0.01,
        wd_user_bias=0.01, wd_item_bias=0.02, reg_method=reg,
        batch_size=1,
    ).items():
        tr.set_param(k, str(v))
    tr.init_model()
    tr.init_trainer()
    w0 = np.asarray(tr.state.w)[:-1].copy()
    b0 = np.asarray(tr.state.b)[:-1].copy()
    g0 = np.asarray(tr.state.g)[:-1].copy()
    tr.update_all(ds)

    hp = dict(lr=0.05, base=float(tr.model.param.base_score), at=atype,
              reg=reg, wd_u=0.02, wd_i=0.03, wd_g=0.01, wd_bu=0.01,
              wd_bi=0.02, no_user_bias=False)
    # append dummy row so padded (dummy) entries are harmless in the oracle
    w_ref, b_ref, g_ref = seq_reference(
        ds,
        np.vstack([w0, np.zeros((1, 4), np.float32)]),
        np.append(b0, 0.0).astype(np.float32),
        np.append(g0, 0.0).astype(np.float32),
        tr.model.off_user, tr.model.off_item, hp, nu, ni,
    )
    # tolerance: jnp.power(x, 1.0) vs direct multiply differ by ~1 ulp per
    # step; drift over 60 sequential steps stays ~1e-5 absolute
    np.testing.assert_allclose(
        np.asarray(tr.state.w)[:-1], w_ref[:-1], atol=3e-5
    )
    np.testing.assert_allclose(
        np.asarray(tr.state.b)[:-1], b_ref[:-1], atol=3e-5
    )
    np.testing.assert_allclose(
        np.asarray(tr.state.g)[:-1], g_ref[:-1], atol=3e-5
    )


def test_lazy_l2_equals_eager_on_dense_touch():
    """Lazy L2 (mode 4) decays by elapsed SAMPLE count at catch-up
    (apex_svd_base.h:225-229); with a single user/item touched every
    sample it coincides with eager mode 0 (up to the final not-yet-
    caught-up touch)."""
    ds = make_ds(rows=40, nu=1, ni=1, ng=0)

    def run(reg):
        tr = SVDFeatureTrainer(SVDTypeParam())
        for k, v in dict(num_user=1, num_item=1, num_global=0, num_factor=4,
                         base_score=3, learning_rate=0.05, wd_user=0.02,
                         wd_item=0.02, reg_method=reg, batch_size=1).items():
            tr.set_param(k, str(v))
        tr.init_model()
        tr.init_trainer()
        tr.update_all(ds)
        return np.asarray(tr.state.w)

    w_eager, w_lazy = run(0), run(4)
    # final touch's eager decay hasn't been caught up by the lazy mode
    np.testing.assert_allclose(w_eager, w_lazy, rtol=3e-3, atol=3e-4)


def test_hierarchical_feature_expansion_matches_manual():
    """feature_user/feature_item side tables equal manually pre-expanded
    features (apex_svd_base.h:298-309,365-379 semantics)."""
    import tempfile, os

    with tempfile.TemporaryDirectory() as td:
        # user 0 -> ancestor 3 (val 0.5); item 1 -> ancestor 4 (val 2.0)
        fu = os.path.join(td, "fu.txt")
        open(fu, "w").write("1 3:0.5\n0\n0\n0\n")
        fi = os.path.join(td, "fi.txt")
        open(fi, "w").write("0\n1 4:2.0\n0\n0\n0\n")
        raw = "4 0 1 1 0:1 1:0.7\n2 0 1 1 1:1 2:1\n"
        ds = load_feature_text("x", text=raw)
        # manual expansion: user 0 also activates user 3 (0.5);
        # item 1 (val .7) also activates item 4 (2.0*0.7)
        expanded = "4 0 2 2 0:1 3:0.5 1:0.7 4:1.4\n2 0 1 1 1:1 2:1\n"
        ds2 = load_feature_text("x", text=expanded)

        def run(d, use_side):
            tr = SVDFeatureTrainer(SVDTypeParam())
            for k, v in dict(num_user=4, num_item=5, num_factor=4,
                             base_score=3, learning_rate=0.05, wd_user=0.01,
                             wd_item=0.01, batch_size=1).items():
                tr.set_param(k, str(v))
            if use_side:
                tr.set_param("feature_user", fu)
                tr.set_param("feature_item", fi)
            tr.init_model()
            tr.init_trainer()
            tr.update_all(d)
            return np.asarray(tr.state.w), np.asarray(tr.state.b)

        w1, b1 = run(ds, True)
        w2, b2 = run(ds2, False)
        np.testing.assert_allclose(w1, w2, rtol=1e-6, atol=1e-7)
        np.testing.assert_allclose(b1, b2, rtol=1e-6, atol=1e-7)


def test_parameter_set_ranges():
    """up:/ip: bound/wd per-range decay tables (apex_svd_base.h:33-75)."""
    tr = SVDFeatureTrainer(SVDTypeParam())
    for k, v in [("num_user", "10"), ("num_item", "10"), ("num_factor", "2"),
                 ("base_score", "3"), ("wd_user", "0.5"),
                 ("up:wd", "0.1"), ("up:bound", "4"),
                 ("up:wd", "0.2"), ("up:bound", "10")]:
        tr.set_param(k, v)
    tr.init_model()
    tr.init_trainer()
    wd = np.asarray(tr.consts.wd_u_row)
    assert np.allclose(wd[tr.model.off_user : tr.model.off_user + 4], 0.1)
    assert np.allclose(wd[tr.model.off_user + 4 : tr.model.off_user + 10], 0.2)


def test_lr_decay_schedule():
    tr = SVDFeatureTrainer(SVDTypeParam())
    for k, v in dict(num_user=2, num_item=2, num_factor=2, base_score=3,
                     learning_rate=1.0, decay_learning_rate=1,
                     decay_rate=0.5).items():
        tr.set_param(k, str(v))
    tr.init_model()
    tr.init_trainer()
    tr.set_round(0)
    assert tr.learning_rate == 1.0
    tr.set_round(2)
    assert tr.learning_rate == 0.25
