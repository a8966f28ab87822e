"""Bilinear and multi-IMFB solver tests.

ML-100K parity (verified via the implicitFeedback workload, rounds 1-4
vs reference 1.0384/1.0040/0.9868/0.9772):
  svdpp           1.0340/1.0036/0.9878/0.9786
  multi_imfb      identical to svdpp at stack depth 1 (as the algorithm
                  degenerates to plain SVD++ for DEFAULT blocks)
  bilinear nbf=0  identical to svdpp
Note: the shipped reference binary's bilinear solver is inert (its
prepare_ufeedback override never binds — virtual on a non-virtual base),
so extend_type=15 golden equals svdpp; we implement the intended behavior.
"""

import io

import numpy as np
import pytest

from svdfeature_tpu.config import ConfigSaver
from svdfeature_tpu.data.csr import PlusBlock, PlusDataset, TAG_DEFAULT, TAG_END, TAG_MIDDLE, TAG_START
from svdfeature_tpu.data.text import load_plus_text
from svdfeature_tpu.params import SVDTypeParam, svd_type
from svdfeature_tpu.solvers.bilinear import SVDBiLinearTrainer
from svdfeature_tpu.solvers.multi_imfb import SVDPPMultiIMFBTrainer
from svdfeature_tpu.solvers.registry import create_svd_trainer
from svdfeature_tpu.solvers.svdpp import SVDPPFeatureTrainer


PARAMS = dict(
    base_score=3, learning_rate=0.01, wd_item=0.004, wd_user=0.004,
    num_item=20, num_user=8, num_global=0, num_factor=8,
    num_ufeedback=20, wd_ufeedback=0.004, format_type=1,
)


def tiny_plus():
    rows = []
    fb = []
    rng = np.random.RandomState(0)
    for u in range(8):
        n = 3 + u % 3
        items = rng.choice(20, n, replace=False)
        for i in items:
            rows.append(f"{rng.randint(1,6)} 0 1 1 {u}:1 {i}:1")
        v = 1.0 / np.sqrt(n)
        fb.append(f"{n} {n} " + " ".join(f"{i}:{v:.6f}" for i in items))
    return load_plus_text("x", "y", text="\n".join(rows), feedback_text="\n".join(fb))


def make(cls_or_extend, **over):
    mt = SVDTypeParam()
    p = dict(PARAMS, **over)
    for k, v in p.items():
        mt.set_param(k, str(v))
    mt.decide_format()
    tr = create_svd_trainer(mt) if isinstance(cls_or_extend, int) is False else None
    if isinstance(cls_or_extend, type):
        tr = cls_or_extend(mt)
    for k, v in p.items():
        tr.set_param(k, str(v))
    tr.init_model()
    tr.init_trainer()
    return tr


def test_registry_dispatch():
    for et, name in [(0, "SVDPPFeatureTrainer"), (1, "SVDPPFeatureTrainer"),
                     (2, "SVDPPMultiIMFBTrainer"), (15, "SVDBiLinearTrainer")]:
        mt = SVDTypeParam(format_type=svd_type.USER_GROUP_FORMAT, extend_type=et)
        assert type(create_svd_trainer(mt)).__name__ == name


def test_imfb_depth1_equals_svdpp():
    ds = tiny_plus()
    t1 = make(SVDPPFeatureTrainer)
    t2 = make(SVDPPMultiIMFBTrainer)
    for _ in range(3):
        t1.update_all(ds)
        t2.update_all(ds)
    np.testing.assert_allclose(
        np.asarray(t1.state.w), np.asarray(t2.state.w), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(t1.predict_all(ds), t2.predict_all(ds), atol=1e-5)


def test_imfb_nested_contexts():
    """START/MIDDLE/END-tagged blocks create nested feedback scopes."""
    base = tiny_plus()
    blocks = list(base.blocks())
    # wrap the first two DEFAULT blocks inside an outer context
    outer_fb = blocks[0].fb_index[:2], blocks[0].fb_value[:2]
    nested = [
        PlusBlock(outer_fb[0], outer_fb[1], blocks[0].data, extend_tag=TAG_START),
        PlusBlock(blocks[1].fb_index, blocks[1].fb_value, blocks[1].data, extend_tag=TAG_MIDDLE),
        PlusBlock(np.zeros(0, np.uint32), np.zeros(0, np.float32),
                  blocks[2].data, extend_tag=TAG_END),
    ] + blocks[3:]
    ds = PlusDataset.from_blocks(nested)
    tr = make(SVDPPMultiIMFBTrainer)
    for _ in range(2):
        tr.update_all(ds)
    assert np.isfinite(np.asarray(tr.state.w)).all()
    p = tr.predict_all(ds)
    assert np.isfinite(p).all() and len(p) == ds.rows.num_row


def test_imfb_disable_level():
    ds = tiny_plus()
    tr = make(SVDPPMultiIMFBTrainer)
    tr.set_param("ufeedback_disable_level", "0")
    tr.init_model()
    tr.init_trainer()
    w0 = np.asarray(tr.state.w)[: 20].copy()  # feedback rows
    tr.update_all(ds)
    # disabled level -> no feedback writeback at depth 0
    np.testing.assert_array_equal(np.asarray(tr.state.w)[:20], w0)


def test_bilinear_zero_props_equals_svdpp():
    ds = tiny_plus()
    t1 = make(SVDPPFeatureTrainer)
    t2 = make(SVDBiLinearTrainer)  # num_bi_feedback=0
    for _ in range(3):
        t1.update_all(ds)
        t2.update_all(ds)
    np.testing.assert_allclose(
        np.asarray(t1.state.w), np.asarray(t2.state.w), rtol=1e-5, atol=1e-6
    )


def test_bilinear_active_and_model_io():
    ds = tiny_plus()
    tr = make(SVDBiLinearTrainer, num_bi_feedback=10, wd_bi_feedback=0.004)
    for _ in range(3):
        tr.update_all(ds)
    Wb = np.asarray(tr.W_bi)
    assert Wb.shape == (20, 10)
    assert np.abs(Wb).max() > 0  # plugin actually trained
    # model IO roundtrip with the appended BModel section
    buf = io.BytesIO()
    tr.save_model(buf)
    buf.seek(0)
    tr2 = make(SVDBiLinearTrainer, num_bi_feedback=10)
    tr2.load_model(buf)
    assert buf.read() == b""
    np.testing.assert_array_equal(np.asarray(tr2.W_bi), Wb)
    tr2.init_trainer()
    np.testing.assert_allclose(tr.predict_all(ds), tr2.predict_all(ds), atol=1e-6)


@pytest.mark.parametrize("reg", [0, 1, 2, 3, 4, 5])
def test_bilinear_reg_modes(reg):
    ds = tiny_plus()
    tr = make(SVDBiLinearTrainer, num_bi_feedback=10, wd_bi_feedback=0.01,
              reg_bi_feedback=reg)
    tr.update_all(ds)
    assert np.isfinite(np.asarray(tr.W_bi)).all()


@pytest.mark.parametrize("reg", [0, 1, 4, 5])
def test_imfb_lazy_reg_matches_svdpp(reg):
    """At stack depth 1 multi-IMFB degenerates to plain SVD++ for EVERY
    reg mode — including lazy 4/5, which need the _lazy_catchup the
    eager modes don't (regularize(pre), apex_svd_base.h:457)."""
    ds = tiny_plus()
    t1 = make(SVDPPFeatureTrainer, reg_method=reg, wd_user=0.01, wd_item=0.01)
    t2 = make(SVDPPMultiIMFBTrainer, reg_method=reg, wd_user=0.01, wd_item=0.01)
    for _ in range(3):
        t1.update_all(ds)
        t2.update_all(ds)
    np.testing.assert_allclose(
        np.asarray(t1.state.w), np.asarray(t2.state.w), rtol=1e-5, atol=1e-6
    )
    if reg >= 4:
        np.testing.assert_array_equal(
            np.asarray(t1.state.ref_ui), np.asarray(t2.state.ref_ui)
        )


@pytest.mark.parametrize("reg", [0, 4])
def test_imfb_routes_big_table(monkeypatch, reg):
    """Forcing ONEHOT_THRESHOLD below the table size must flip multi-IMFB
    onto the augmented epoch (ops/imfb.train_epoch_imfb_big) with an
    unchanged training outcome, including nested contexts and disable
    levels."""
    from svdfeature_tpu.ops import embed

    base = tiny_plus()
    blocks = list(base.blocks())
    nested = [
        PlusBlock(blocks[0].fb_index[:2], blocks[0].fb_value[:2],
                  blocks[0].data, extend_tag=TAG_START),
        PlusBlock(blocks[1].fb_index, blocks[1].fb_value, blocks[1].data,
                  extend_tag=TAG_END),
    ] + blocks[2:]
    ds = PlusDataset.from_blocks(nested)

    def run():
        tr = make(SVDPPMultiIMFBTrainer, reg_method=reg, wd_user=0.01,
                  wd_item=0.01)
        tr.set_param("ufeedback_disable_level", "1")
        tr.init_model()
        tr.init_trainer()
        for _ in range(3):
            tr.update_all(ds)
        return tr

    tr1 = run()
    p1 = tr1.predict_all(ds)
    monkeypatch.setattr(embed, "ONEHOT_THRESHOLD", 4)
    tr2 = run()
    assert tr2.hp.big_table and not tr2.hp.sweep_table
    p2 = tr2.predict_all(ds)
    np.testing.assert_allclose(p2, p1, rtol=1e-4, atol=1e-5)
    tr1._sync_model_from_state()
    tr2._sync_model_from_state()
    np.testing.assert_allclose(
        np.asarray(tr2.model.w), np.asarray(tr1.model.w), rtol=1e-4, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(tr2.model.b), np.asarray(tr1.model.b), rtol=1e-4, atol=1e-6
    )


@pytest.mark.parametrize("reg", [0, 2, 5])
def test_bilinear_routes_big_table(monkeypatch, reg):
    """Forcing ONEHOT_THRESHOLD below the table size must flip bilinear
    onto the augmented epoch (ops/svdpp_bilinear.train_epoch_bi_big, W_bi
    on dedup writes) with an unchanged training outcome — mirrors
    tests/test_svdpp_big.py::test_solver_routes_big_table."""
    from svdfeature_tpu.ops import embed

    ds = tiny_plus()
    kw = dict(num_bi_feedback=10, wd_bi_feedback=0.01, reg_bi_feedback=reg)
    tr1 = make(SVDBiLinearTrainer, **kw)
    for _ in range(3):
        tr1.update_all(ds)
    p1 = tr1.predict_all(ds)

    monkeypatch.setattr(embed, "ONEHOT_THRESHOLD", 4)
    tr2 = make(SVDBiLinearTrainer, **kw)
    assert tr2.hp.big_table and not tr2.hp.sweep_table
    for _ in range(3):
        tr2.update_all(ds)
    np.testing.assert_allclose(
        np.asarray(tr2.W_bi), np.asarray(tr1.W_bi), rtol=1e-4, atol=1e-6
    )
    np.testing.assert_allclose(tr2.predict_all(ds), p1, rtol=1e-4, atol=1e-5)
    # checkpoint sync deaugments cleanly
    tr2._sync_model_from_state()
    tr1._sync_model_from_state()
    np.testing.assert_allclose(
        np.asarray(tr2.model.w), np.asarray(tr1.model.w), rtol=1e-4, atol=1e-6
    )
