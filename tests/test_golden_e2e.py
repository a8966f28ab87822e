"""Golden end-to-end tests: train the demo workloads and compare RMSE
against the regenerated reference numbers (golden/GOLDEN.json).

Runs shortened horizons on CPU to keep the suite fast; the full-40-round
parity is exercised by bench.py and was verified manually:
  basicMF        final RMSE 0.9332 vs 0.9328 (reference)
  implicitFeedback best RMSE 0.92297 vs 0.92226 (reference)
"""

import json

import numpy as np
import pytest

from svdfeature_tpu.config import ConfigSaver
from svdfeature_tpu.data.text import load_feature_text, load_plus_text
from svdfeature_tpu.params import SVDTypeParam, svd_type
from svdfeature_tpu.solvers.base import SVDFeatureTrainer
from svdfeature_tpu.solvers.svdpp import SVDPPFeatureTrainer
from tests.conftest import GOLDEN, read_fixture_text


@pytest.fixture(scope="module")
def golden():
    return json.load(open(GOLDEN / "GOLDEN.json"))


def make_trainer(cls, mtype_kw, params):
    mt = SVDTypeParam(**mtype_kw)
    tr = cls(mt)
    for n, v in params.items():
        tr.set_param(n, str(v))
    tr.init_model()
    tr.init_trainer()
    return tr


BASIC = dict(
    base_score=3, learning_rate=0.005, wd_item=0.004, wd_user=0.004,
    num_item=1682, num_user=943, num_global=0, num_factor=64,
)


def rmse(pred, labels, scale=1.0):
    d = (pred - labels) * scale
    return float(np.sqrt(np.mean(d * d)))


def test_basicmf_rmse_trajectory(ml100k_base_text, ml100k_test_text, golden):
    train = load_feature_text("x", text=ml100k_base_text)
    test = load_feature_text("x", text=ml100k_test_text)
    tr = make_trainer(SVDFeatureTrainer, {}, BASIC)
    gr = golden["basicMF"]["rmse_per_round"]
    for r in range(1, 11):
        tr.update_all(train)
        got = rmse(tr.predict_all(test), test.labels)
        assert abs(got - gr[str(r)] if isinstance(next(iter(gr)), str) else got - gr[r]) < 0.003, (
            r, got, gr[r] if r in gr else gr[str(r)]
        )


def test_binary_classification_rmse(golden):
    train = load_feature_text("x", text=read_fixture_text("ml100k.base.bin.feature.gz"))
    test = load_feature_text("x", text=read_fixture_text("ml100k.test.bin.feature.gz"))
    p = dict(BASIC, base_score=0.5, active_type=2)
    tr = make_trainer(SVDFeatureTrainer, dict(active_type=2), p)
    gr = golden["binaryClassification"]["rmse_per_round"]
    for r in range(1, 9):
        tr.update_all(train)
    got = rmse(tr.predict_all(test), test.labels)
    want = gr[8] if 8 in gr else gr["8"]
    assert abs(got - want) < 0.003, (got, want)


def test_neighborhood_rmse(golden):
    train = load_feature_text("x", text=read_fixture_text("ml100k.base.nb.feature.gz"))
    test = load_feature_text("x", text=read_fixture_text("ml100k.test.nb.feature.gz"))
    p = dict(BASIC, num_global=6, wd_global=0.001)
    tr = make_trainer(SVDFeatureTrainer, {}, p)
    gr = golden["neighborhoodModel"]["rmse_per_round"]
    for r in range(1, 9):
        tr.update_all(train)
    got = rmse(tr.predict_all(test), test.labels)
    want = gr[8] if 8 in gr else gr["8"]
    assert abs(got - want) < 0.003, (got, want)


def test_implicit_feedback_rmse(golden):
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
    p = dict(BASIC, format_type=1, num_ufeedback=1682, wd_ufeedback=0.004)
    tr = make_trainer(
        SVDPPFeatureTrainer, dict(format_type=svd_type.USER_GROUP_FORMAT), p
    )
    gr = golden["implicitFeedback"]["rmse_per_round"]
    for r in range(1, 4):
        tr.update_all(train)
    got = rmse(tr.predict_all(test), test.rows.labels)
    want = gr[3] if 3 in gr else gr["3"]
    # the batched SVD++ trajectory lags the sequential one early; see
    # module docstring for the converged parity
    assert abs(got - want) < 0.05, (got, want)
