"""Loss library checks against the reference formulas
(apex_svd_model.h:61-238)."""

import math

import numpy as np
import pytest

from svdfeature_tpu import losses as L


def sigmoid(x):
    return 1.0 / (1.0 + math.exp(-x))


@pytest.mark.parametrize("atype", L.ALL_TYPES)
def test_map_active(atype):
    s = np.linspace(-3, 3, 13)
    out = np.asarray(L.map_active(s, atype))
    if atype in (L.SIGMOID_L2, L.SIGMOID_LIKELIHOOD):
        np.testing.assert_allclose(out, [sigmoid(x) for x in s], rtol=1e-5)
    else:
        np.testing.assert_allclose(out, s)


def test_cal_grad_linear():
    assert float(L.cal_grad(3.0, 2.5, L.LINEAR)) == pytest.approx(0.5)


def test_cal_grad_sigmoid_l2():
    r, p = 1.0, 0.7
    assert float(L.cal_grad(r, p, L.SIGMOID_L2)) == pytest.approx((r - p) * p * (1 - p))


def test_cal_grad_sigmoid_likelihood():
    assert float(L.cal_grad(1.0, 0.7, L.SIGMOID_LIKELIHOOD)) == pytest.approx(0.3)


def test_cal_grad_rank():
    # SIGMOID_RANK grads work on raw scores: r - sigmoid(pred)
    assert float(L.cal_grad(1.0, 0.5, L.SIGMOID_RANK)) == pytest.approx(
        1.0 - sigmoid(0.5), rel=1e-6
    )


def test_cal_grad_hinge_smooth():
    # label=1, z=pred-0.5: grad = clip(1-z, 0, 1) (apex_svd_model.h:90-94)
    assert float(L.cal_grad(1.0, 0.2, L.HINGE_SMOOTH)) == 1.0   # z=-0.3 < 0
    assert float(L.cal_grad(1.0, 1.0, L.HINGE_SMOOTH)) == pytest.approx(0.5)
    assert float(L.cal_grad(1.0, 2.0, L.HINGE_SMOOTH)) == 0.0   # z=1.5 > 1
    # label=0, pred=0.9: -smooth_hinge_grad(0.5-0.9) = -1 (z=-0.4 < 0)
    assert float(L.cal_grad(0.0, 0.9, L.HINGE_SMOOTH)) == -1.0


def test_cal_grad_hinge_l2():
    assert float(L.cal_grad(1.0, 1.5, L.HINGE_L2)) == 0.0
    assert float(L.cal_grad(1.0, 0.5, L.HINGE_L2)) == pytest.approx(0.5)
    assert float(L.cal_grad(0.0, -0.5, L.HINGE_L2)) == 0.0
    assert float(L.cal_grad(0.0, 0.5, L.HINGE_L2)) == pytest.approx(-0.5)


def test_cal_sgrad():
    assert float(L.cal_sgrad(1.0, 0.3, L.LINEAR)) == -1.0
    assert float(L.cal_sgrad(1.0, 0.3, L.SIGMOID_LIKELIHOOD)) == pytest.approx(-0.3 * 0.7)
    p = sigmoid(0.3)
    assert float(L.cal_sgrad(1.0, 0.3, L.SIGMOID_RANK)) == pytest.approx(-p * (1 - p), rel=1e-6)
    assert float(L.cal_sgrad(1.0, 0.3, L.SIGMOID_QSGRAD)) == -0.25


def test_calc_base_score():
    assert L.calc_base_score(3.0, L.LINEAR) == 3.0
    assert L.calc_base_score(0.5, L.SIGMOID_LIKELIHOOD) == pytest.approx(0.0)
    assert sigmoid(L.calc_base_score(0.8, L.SIGMOID_L2)) == pytest.approx(0.8)
    with pytest.raises(ValueError):
        L.calc_base_score(3.0, L.SIGMOID_L2)


def test_calc_loss_l2():
    assert float(L.calc_loss(3.0, 2.0, L.LINEAR)) == pytest.approx(0.5)
