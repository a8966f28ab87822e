"""rows_per_user (M>1) SVD++ batching: parity and degenerate-equality.

M>1 widens the within-user step to M simultaneous rows (hogwild
contract, data/batching_plus.py).  Two guarantees pinned here:
  1. users with a single row are bit-identical between M=1 and M>1
     (the recurrence reduces exactly);
  2. the ML-100K implicitFeedback trajectory stays within the golden
     gate tolerance at M=4 (the throughput configuration).
"""

import json

import numpy as np
import pytest

from svdfeature_tpu.data.text import load_plus_text
from svdfeature_tpu.params import SVDTypeParam, svd_type
from svdfeature_tpu.solvers.svdpp import SVDPPFeatureTrainer
from tests.conftest import GOLDEN, read_fixture_text

P = dict(
    base_score=3, learning_rate=0.005, wd_item=0.004, wd_user=0.004,
    num_item=1682, num_user=943, num_global=0, num_factor=16,
    num_ufeedback=1682, wd_ufeedback=0.004,
)


def make(ds_params, extra):
    tr = SVDPPFeatureTrainer(SVDTypeParam(format_type=svd_type.USER_GROUP_FORMAT))
    for n, v in {**ds_params, **extra}.items():
        tr.set_param(n, str(v))
    tr.init_model()
    tr.init_trainer()
    return tr


def tiny_ds():
    # 3 users, ONE row each -> M>1 must be exactly M=1 (pure padding)
    rows = "\n".join(
        f"4 0 1 1 {u}:1 {10 + u}:1" for u in range(3)
    )
    fb = "\n".join(f"1 2 {u}:0.5 {u + 3}:0.5" for u in range(3))
    return load_plus_text("x", "y", text=rows, feedback_text=fb)


def test_single_row_users_bitwise_equal():
    ds = tiny_ds()
    outs = {}
    for m in (1, 4):
        tr = make(P, dict(num_item=20, num_user=3, num_ufeedback=10,
                          rows_per_user=m))
        for _ in range(3):
            tr.update_all(ds)
        outs[m] = (np.asarray(tr.state.w), np.asarray(tr.state.b))
    np.testing.assert_array_equal(outs[1][0], outs[4][0])
    np.testing.assert_array_equal(outs[1][1], outs[4][1])


def test_predictions_match_any_m():
    ds = tiny_ds()
    tr1 = make(P, dict(num_item=20, num_user=3, num_ufeedback=10, rows_per_user=1))
    tr4 = make(P, dict(num_item=20, num_user=3, num_ufeedback=10, rows_per_user=4))
    p1 = tr1.predict_all(ds)
    p4 = tr4.predict_all(ds)
    np.testing.assert_allclose(p1, p4, atol=1e-6)


@pytest.mark.parametrize("m", [4])
def test_ml100k_trajectory_parity_multirow(m):
    golden = json.load(open(GOLDEN / "GOLDEN.json"))
    train = load_plus_text(
        "x", "y",
        text=read_fixture_text("ml100k.base.group.feature.gz"),
        feedback_text=read_fixture_text("ml100k.base.feedback.gz"),
    )
    test = load_plus_text(
        "x", "y",
        text=read_fixture_text("ml100k.test.ug.feature.gz"),
        feedback_text=read_fixture_text("ml100k.test.feedback.gz"),
    )
    tr = make(P, dict(num_factor=64, rows_per_user=m, sort_blocks=1))
    gr = golden["implicitFeedback"]["rmse_per_round"]
    for r in range(1, 4):
        tr.update_all(train)
    pred = tr.predict_all(test)
    got = float(np.sqrt(np.mean((pred - test.rows.labels) ** 2)))
    want = gr["3"] if "3" in gr else gr[3]
    # same gate as the fast-suite M=1 test (batched SVD++ lags early)
    assert abs(got - want) < 0.05, (got, want)
