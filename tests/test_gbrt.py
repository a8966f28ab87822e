"""GBRT tests.

Cross-system parity (verified manually vs the reference binary, ML-100K
implicitFeedback workload, extend_type=31): RMSE per round identical to 6
decimals for 6 rounds (1.150907/1.093262/1.066003/1.053791/1.049791/
1.049080), and a reference-trained GBRT model file loads and evaluates to
the identical RMSE.  APLambda (extend_type=30) matches to ~3 decimals
(pair sampling uses a different PRNG).
"""

import io

import numpy as np
import pytest

from svdfeature_tpu.params import SVDTypeParam, svd_type
from svdfeature_tpu.solvers.gbrt.schedulers import GBRTParamScheduler, GBRTScheduler
from svdfeature_tpu.solvers.gbrt.tree import RTreeTrainer, SparseRows
from svdfeature_tpu.solvers.gbrt.trainer import (
    APLambdaGBRTTrainer,
    RegGBRTTrainer,
    create_gbrt_trainer,
)


def loose_tree(**kw):
    tr = RTreeTrainer()
    defaults = dict(
        min_split_instance=10, min_child_instance=2, min_split_weight=2,
        min_child_weight=1, min_split_loss=0.01, learning_rate=1.0, max_depth=4,
    )
    defaults.update(kw)
    for k, v in defaults.items():
        tr.set_param(k, str(v))
    tr.init_trainer()
    return tr


def dense_rows(X):
    """SparseRows from a dense matrix (no unknowns)."""
    R, F = X.shape
    row_ptr = np.arange(R + 1) * F
    findex = np.tile(np.arange(F), R)
    return SparseRows(row_ptr, findex, X.reshape(-1).astype(np.float32), F)


def test_tree_stump():
    rng = np.random.RandomState(0)
    x = rng.rand(1000)
    grad = np.where(x < 0.5, -1.0, 1.0)  # leaf value = -lr*sum(g)/sum(h)
    sm = dense_rows(x[:, None])
    tr = loose_tree()
    tr.do_boost(grad, np.ones(1000), sm, None, None)
    pred = tr.predict_rows(sm, np.zeros(1000, np.int64))
    assert pred[x < 0.45].mean() > 0.5 and pred[x > 0.55].mean() < -0.5


def test_tree_missing_default_direction():
    """Rows missing the split feature follow the learned default."""
    rng = np.random.RandomState(1)
    R = 600
    x = rng.rand(R)
    known = np.arange(R) % 3 != 0  # a third missing
    grad = np.where(x < 0.5, -1.0, 1.0)
    grad[~known] = -1.0  # missing rows behave like the low group
    ptr = np.concatenate(([0], np.cumsum(known.astype(np.int64))))
    sm = SparseRows(ptr, np.zeros(int(known.sum()), np.int64),
                    x[known].astype(np.float32), 1)
    tr = loose_tree()
    tr.do_boost(grad, np.ones(R), sm, None, None)
    pred = tr.predict_rows(sm, np.zeros(R, np.int64))
    # missing rows should land with the low/positive-value leaf
    assert pred[~known].mean() > 0.3


def test_tree_group_roots():
    rng = np.random.RandomState(2)
    R = 800
    x = rng.rand(R)
    gid = (np.arange(R) % 2).astype(np.int64)
    # group 0: split at 0.5; group 1: inverted
    grad = np.where(gid == 0, np.where(x < 0.5, -1.0, 1.0), np.where(x < 0.5, 1.0, -1.0))
    sm = dense_rows(x[:, None])
    tr = loose_tree()
    tr.set_param("rt_num_group", "2")
    tr.init_trainer()
    tr.do_boost(grad, np.ones(R), sm, gid, None)
    pred = tr.predict_rows(sm, gid)
    lo0 = pred[(gid == 0) & (x < 0.45)].mean()
    lo1 = pred[(gid == 1) & (x < 0.45)].mean()
    assert lo0 > 0.5 and lo1 < -0.5


def test_tree_model_io_roundtrip():
    rng = np.random.RandomState(3)
    x = rng.rand(500, 3)
    grad = np.where(x[:, 1] < 0.3, -1.0, 1.0) + 0.3 * np.where(x[:, 2] < 0.7, -1, 1)
    sm = dense_rows(x)
    tr = loose_tree()
    tr.do_boost(grad, np.ones(500), sm, None, None)
    buf = io.BytesIO()
    tr.save_model(buf)
    buf.seek(0)
    tr2 = RTreeTrainer()
    tr2.load_model(buf)
    assert buf.read() == b""
    np.testing.assert_array_equal(
        tr.predict_rows(sm, np.zeros(500, np.int64)),
        tr2.predict_rows(sm, np.zeros(500, np.int64)),
    )


def test_scheduler():
    s = GBRTScheduler("r")
    s.set_param("rtype_chg_cycle", "3")
    s.set_param("rtype[0]", "5")
    s.set_param("rtype[1]", "7")
    s.set_param("rtype_start_cycle", "0")
    s.set_param("rtype_start_default", "100")
    s.set_round(0)
    assert s.curr_type() == 5
    s.set_round(1)
    assert s.curr_type() == 7
    s.set_round(2)
    assert s.curr_type() == 0  # beyond type_set -> default
    s.set_param("rtypef[5]", "9")
    s.set_round(5)
    assert s.curr_type() == 9


def test_param_scheduler_pset():
    ps = GBRTParamScheduler()
    ps.set_param("pset", "10-20.0-5")
    ps.set_param("ptype[0]", "1")
    ps.set_param("ptype_start_cycle", "0")
    ps.set_param("ptype_start_default", "100")
    ps.set_round(0)
    e = ps.curr_type()
    assert (e.fstart, e.fend, e.gstart, e.gend) == (10, 20, 0, 5)


def gbrt_dataset():
    from svdfeature_tpu.data.text import load_plus_text

    rng = np.random.RandomState(0)
    rows, fb = [], []
    for u in range(30):
        n = 6
        items = rng.choice(12, n, replace=False)
        for i in items:
            rows.append(f"{rng.randint(0,2)} 0 1 1 {u}:1 {i}:1")
        v = 1.0 / np.sqrt(n)
        fb.append(f"{n} {n} " + " ".join(f"{i}:{v:.5f}" for i in items))
    return load_plus_text("x", "y", text="\n".join(rows), feedback_text="\n".join(fb))


def _mk(et, **over):
    mt = SVDTypeParam(format_type=svd_type.USER_GROUP_FORMAT, extend_type=et)
    tr = create_gbrt_trainer(mt)
    p = dict(
        num_item=12, num_ufeedback=12, num_spec_sparse=30, num_global=0,
        learning_rate=0.3, min_split_loss=0.01, min_split_instance=4,
        min_child_instance=2, min_child_weight=0.5, min_split_weight=1,
        max_depth=3, rt_loss_type=1, base_score=0.5,
    )
    p.update(over)
    for k, v in p.items():
        mt.set_param(k, str(v))
        tr.set_param(k, str(v))
    tr.init_model()
    tr.init_trainer()
    return tr


def test_reg_gbrt_learns():
    ds = gbrt_dataset()
    tr = _mk(31)
    assert isinstance(tr, RegGBRTTrainer)
    labels = ds.rows.labels
    first = None
    for r in range(5):
        tr.set_round(r)
        tr.update_all(ds)
        tr.finish_round()
        p = tr.predict_all(ds)
        mse = float(np.mean((p - labels) ** 2))
        if first is None:
            first = mse
    assert len(tr.trees) == 5
    assert mse < first  # training reduces loss


def test_aplambda_gbrt_runs():
    ds = gbrt_dataset()
    tr = _mk(30, active_type=3, lambda_ap_alpha=0.5, lambda_ap_reject=1)
    assert isinstance(tr, APLambdaGBRTTrainer)
    for r in range(3):
        tr.set_round(r)
        tr.update_all(ds)
        tr.finish_round()
    p = tr.predict_all(ds)
    assert np.isfinite(p).all()
    # positives should score above negatives on train data
    labels = ds.rows.labels
    assert p[labels > 0.5].mean() > p[labels <= 0.5].mean()


def test_gbrt_model_io():
    ds = gbrt_dataset()
    tr = _mk(31)
    for r in range(3):
        tr.set_round(r)
        tr.update_all(ds)
        tr.finish_round()
    buf = io.BytesIO()
    tr.save_model(buf)
    buf.seek(0)
    tr2 = _mk(31)
    tr2.load_model(buf)
    assert buf.read() == b""
    tr2.init_trainer()
    np.testing.assert_allclose(tr.predict_all(ds), tr2.predict_all(ds), atol=1e-6)


def test_device_forward_matches_host():
    """ops/gbrt_forward.py device walk vs the host numpy walk, incl.
    missing-feature default directions and multi-root group ids."""
    ds = gbrt_dataset()
    tr = _mk(31)
    for r in range(5):
        tr.set_round(r)
        tr.update_all(ds)
        tr.finish_round()

    tr.device_forward = 0
    tr._fwd_cache.clear()
    host = tr.forward_all(ds)
    tr.device_forward = 1
    tr._fwd_cache.clear()
    dev = tr.forward_all(ds)
    np.testing.assert_allclose(dev, host, atol=1e-5, rtol=1e-5)
    # predict_all parity through the activation
    tr.device_forward = 0
    tr._fwd_cache.clear()
    p_host = tr.predict_all(ds)
    tr.device_forward = 1
    tr._fwd_cache.clear()
    p_dev = tr.predict_all(ds)
    np.testing.assert_allclose(p_dev, p_host, atol=1e-5, rtol=1e-5)


def test_device_forward_incremental_cache():
    """Device walk of trees [start:] composes with the incremental cache."""
    ds = gbrt_dataset()
    tr = _mk(31)
    for r in range(4):
        tr.set_round(r)
        tr.update_all(ds)
        tr.finish_round()
    tr.device_forward = 0
    tr._fwd_cache.clear()
    host = tr.forward_all(ds)
    # warm the cache over the first 2 trees, then device-walk the rest
    tr._fwd_cache.clear()
    trees = tr.trees
    tr.trees = trees[:2]
    tr.forward_all(ds)
    tr.trees = trees
    tr.device_forward = 1
    dev = tr.forward_all(ds)
    np.testing.assert_allclose(dev, host, atol=1e-5, rtol=1e-5)
