"""Model checkpoint IO: byte-compatibility with the reference format
(apex_svd_model.h:570-660)."""

import io

import numpy as np
import pytest

from svdfeature_tpu.model import SVDModel
from svdfeature_tpu.params import SVDModelParam, SVDTypeParam, svd_type


def roundtrip(param, mtype):
    m = SVDModel.rand_init(param, mtype, seed=3)
    buf = io.BytesIO()
    buf.write(mtype.to_bytes())
    m.save(buf)
    buf.seek(0)
    mt2 = SVDTypeParam.from_bytes(buf.read(4))
    m2 = SVDModel.load(buf, mt2)
    assert buf.read() == b""
    np.testing.assert_array_equal(np.asarray(m.w), np.asarray(m2.w))
    np.testing.assert_array_equal(np.asarray(m.b), np.asarray(m2.b))
    np.testing.assert_array_equal(np.asarray(m.g), np.asarray(m2.g))
    return m, m2


def test_roundtrip_basic():
    p = SVDModelParam(num_user=11, num_item=17, num_factor=8, num_global=5, base_score=3.0)
    roundtrip(p, SVDTypeParam(format_type=svd_type.RANDOM_ORDER_FORMAT))


def test_roundtrip_usergroup():
    p = SVDModelParam(
        num_user=11, num_item=17, num_factor=8, num_ufeedback=13, base_score=3.0
    )
    mt = SVDTypeParam(format_type=svd_type.USER_GROUP_FORMAT)
    m, _ = roundtrip(p, mt)
    # layout: feedback rows first, then user, then item (apex_svd_model.h:513-534)
    assert m.off_ufeedback == 0 and m.off_user == 13 and m.off_item == 24
    assert m.num_rows == 13 + 11 + 17


def test_roundtrip_common_latent():
    p = SVDModelParam(
        num_user=9,
        num_item=9,
        num_factor=4,
        common_latent_space=1,
        common_feedback_space=1,
        base_score=3.0,
    )
    mt = SVDTypeParam(format_type=svd_type.USER_GROUP_FORMAT)
    m, _ = roundtrip(p, mt)
    assert m.num_rows == 9 and m.off_user == 0 and m.off_item == 0


def test_load_reference_trained_model(golden_dir):
    """Byte-for-byte reload of a model trained by the reference binary."""
    path = golden_dir.parent / ".baseline" / "demo" / "basicMF" / "0040.model"
    if not path.exists():
        pytest.skip("reference-trained model not present")
    raw = path.read_bytes()
    f = io.BytesIO(raw)
    mt = SVDTypeParam.from_bytes(f.read(4))
    m = SVDModel.load(f, mt)
    assert m.param.num_user == 943 and m.param.num_item == 1682
    out = io.BytesIO()
    out.write(mt.to_bytes())
    m.save(out)
    assert out.getvalue() == raw


def test_base_score_transform():
    p = SVDModelParam(num_user=2, num_item=2, num_factor=2, base_score=0.5)
    mt = SVDTypeParam(active_type=2)  # sigmoid likelihood
    m = SVDModel.rand_init(p, mt)
    assert m.param.base_score == pytest.approx(0.0)


def test_rand_init_sigma():
    p = SVDModelParam(num_user=500, num_item=500, num_factor=32, base_score=3.0,
                      u_init_sigma=0.01, i_init_sigma=0.02)
    m = SVDModel.rand_init(p, SVDTypeParam())
    w = np.asarray(m.w)
    assert abs(w[:500].std() - 0.01) < 2e-3
    assert abs(w[500:].std() - 0.02) < 4e-3
    assert np.all(np.asarray(m.b) == 0)


def test_nonnegative_init():
    p = SVDModelParam(num_user=10, num_item=10, num_factor=4, base_score=3.0,
                      user_nonnegative=1, item_nonnegative=1)
    m = SVDModel.rand_init(p, SVDTypeParam())
    assert np.all(np.asarray(m.w) >= 0)
