"""Fused SVD++ Pallas kernel (ops/pallas_svdpp.py) vs the jnp path.

Interpreter-mode parity on a synthetic multi-chunk user-group workload
(3 chunks so the boundary flush/gather and the carried overlap recurrence
are all exercised); the compiled kernel's TPU parity and throughput are
verified on the bench device (findings recorded in PERF.md).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from svdfeature_tpu.data.text import load_plus_text
from svdfeature_tpu.params import SVDTypeParam, svd_type
from svdfeature_tpu.solvers.svdpp import SVDPPFeatureTrainer
from svdfeature_tpu.ops.svdpp import train_epoch_plus
from svdfeature_tpu.ops.pallas_svdpp import (
    pallas_svdpp_supported,
    train_rounds_svdpp_pallas,
)

P = dict(
    base_score=3, learning_rate=0.01, wd_item=0.004, wd_user=0.004,
    num_item=100, num_user=40, num_global=0, num_factor=8,
    num_ufeedback=25, wd_ufeedback=0.004, users_per_batch=16,
)


def synth_ds(seed=0, n_users=40):
    rng = np.random.RandomState(seed)
    rows, fbs = [], []
    for u in range(n_users):
        r = rng.randint(1, 6)
        for _ in range(r):
            i = rng.randint(0, 100)
            rows.append(f"{rng.randint(1, 6)} 0 1 1 {u}:1 {i}:1")
        nf = rng.randint(2, 7)
        ids = rng.choice(25, size=nf, replace=False)
        feats = " ".join(f"{j}:{0.3 + 0.1 * (j % 3):.1f}" for j in ids)
        fbs.append(f"{r} {nf} {feats}")
    return load_plus_text(
        "x", "y", text="\n".join(rows), feedback_text="\n".join(fbs)
    )


def make(extra):
    tr = SVDPPFeatureTrainer(SVDTypeParam(format_type=svd_type.USER_GROUP_FORMAT))
    for n, v in {**P, **extra}.items():
        tr.set_param(n, str(v))
    tr.init_model()
    tr.init_trainer()
    return tr


@pytest.mark.parametrize("m", [1, 2])
def test_pallas_svdpp_matches_jnp_interpret(m):
    from jax.experimental.pallas import tpu as pltpu

    ds = synth_ds()
    tr = make(dict(rows_per_user=m))
    stacked, chunk_id, fb, _, overlap = tr._pack_plus(ds)
    assert fb["fb_idx"].shape[0] >= 3, "want multiple chunks"
    G = stacked["label"].shape[1] // m
    fbh = (
        tr.tparam.scale_lr_ufeedback,
        tr.tparam.wd_ufeedback,
        tr.tparam.wd_ufeedback_bias,
    )
    R = 2
    lr = jnp.float32(tr.learning_rate)

    st = jax.tree.map(jnp.copy, tr.state)
    for _ in range(R):
        st = train_epoch_plus(
            st, stacked, chunk_id, fb, overlap, lr, tr.consts, tr.hp,
            *fbh, rows_per_user=m,
        )

    lrs = jnp.full((R,), lr, jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        out = train_rounds_svdpp_pallas(
            jax.tree.map(jnp.copy, tr.state), stacked, chunk_id, fb,
            overlap, lrs, tr.consts, tr.hp, G, m, tr.model.off_user, tr.model.off_item, *fbh,
        )
    np.testing.assert_allclose(
        np.asarray(out.w), np.asarray(st.w), atol=2e-4, rtol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(out.b), np.asarray(st.b), atol=5e-4, rtol=1e-3
    )
    assert int(out.step) == int(st.step)


def test_supported_gate():
    ds = synth_ds()
    tr = make(dict(rows_per_user=1))
    stacked, _, fb, _, _ = tr._pack_plus(ds)
    # synthetic shapes fail only the GS%128 lane gate; everything else holds
    assert not pallas_svdpp_supported(
        tr.hp, tr.state, stacked, fb, tr.model.off_user
    )
    import dataclasses

    hp = dataclasses.replace(tr.hp, reg_method=4)
    assert not pallas_svdpp_supported(hp, tr.state, stacked, fb, tr.model.off_user)


def test_update_rounds_matches_per_round_updates():
    """SVDPPFeatureTrainer.update_rounds == N sequential update_all calls
    on the jnp path (CPU)."""
    ds = synth_ds(seed=3)
    a = make(dict(rows_per_user=2))
    b = make(dict(rows_per_user=2))
    for _ in range(3):
        a.update_all(ds)
    b.update_rounds(ds, 3)
    np.testing.assert_array_equal(np.asarray(a.state.w), np.asarray(b.state.w))
    np.testing.assert_array_equal(np.asarray(a.state.b), np.asarray(b.state.b))


def synth_pair_ds(seed=1, n_users=40):
    """Pair-shaped workload: two item entries per row ([pos, neg] with
    values [+1, -1]) — the width the pairwise-rank difference rows pack to."""
    rng = np.random.RandomState(seed)
    rows, fbs = [], []
    for u in range(n_users):
        r = rng.randint(1, 6)
        for _ in range(r):
            i1, i2 = rng.choice(100, size=2, replace=False)
            rows.append(f"1 0 1 2 {u}:1 {i1}:1 {i2}:-1")
        nf = rng.randint(2, 7)
        ids = rng.choice(25, size=nf, replace=False)
        feats = " ".join(f"{j}:{0.3 + 0.1 * (j % 3):.1f}" for j in ids)
        fbs.append(f"{r} {nf} {feats}")
    return load_plus_text(
        "x", "y", text="\n".join(rows), feedback_text="\n".join(fbs)
    )


@pytest.mark.parametrize("m", [1, 2])
def test_pallas_svdpp_item_width2_matches_jnp_interpret(m):
    """SI=2 kernel (pairwise-rank rows) vs the jnp epoch, interpret mode."""
    from jax.experimental.pallas import tpu as pltpu

    ds = synth_pair_ds()
    tr = make(dict(rows_per_user=m, active_type=3, no_user_bias=1))
    stacked, chunk_id, fb, _, overlap = tr._pack_plus(ds)
    assert stacked["i_idx"].shape[-1] == 2
    G = stacked["label"].shape[1] // m
    fbh = (
        tr.tparam.scale_lr_ufeedback,
        tr.tparam.wd_ufeedback,
        tr.tparam.wd_ufeedback_bias,
    )
    R = 2
    lr = jnp.float32(tr.learning_rate)

    st = jax.tree.map(jnp.copy, tr.state)
    for _ in range(R):
        st = train_epoch_plus(
            st, stacked, chunk_id, fb, overlap, lr, tr.consts, tr.hp,
            *fbh, rows_per_user=m,
        )

    lrs = jnp.full((R,), lr, jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        out = train_rounds_svdpp_pallas(
            jax.tree.map(jnp.copy, tr.state), stacked, chunk_id, fb,
            overlap, lrs, tr.consts, tr.hp, G, m,
            tr.model.off_user, tr.model.off_item, *fbh,
        )
    np.testing.assert_allclose(
        np.asarray(out.w), np.asarray(st.w), atol=2e-4, rtol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(out.b), np.asarray(st.b), atol=5e-4, rtol=1e-3
    )
    assert int(out.step) == int(st.step)


def synth_stacked_ds(seed=2, n_users=24):
    """Depth-2 taxonomy families: per user START(user fb, first rows) ->
    DEFAULT(own fb, rest; trains under [user, own]) -> END(user fb, 0
    rows; pops through the same list, kddcup_combine_ugroup convention)."""
    from svdfeature_tpu.data.csr import (
        PlusBlock, PlusDataset, TAG_END, TAG_START,
    )

    base = synth_ds(seed=seed, n_users=n_users)
    blocks = []
    for blk in base.blocks():
        n = blk.data.num_row
        if n >= 2:
            h = n // 2
            half = max(1, len(blk.fb_index) // 2)
            blocks += [
                PlusBlock(blk.fb_index, blk.fb_value,
                          blk.data.slice_rows(0, h), extend_tag=TAG_START),
                PlusBlock(blk.fb_index[:half], blk.fb_value[:half],
                          blk.data.slice_rows(h, n - h)),
                PlusBlock(blk.fb_index, blk.fb_value,
                          blk.data.slice_rows(n, 0), extend_tag=TAG_END),
            ]
        else:
            blocks.append(blk)
    return PlusDataset.from_blocks(blocks)


@pytest.mark.parametrize("extra", [{}, {"no_user_bias": 1},
                                   {"ufeedback_disable_level": 1},
                                   {"rows_per_user": 2}])
def test_pallas_imfb_matches_carried_interpret(extra):
    """Stacked multi-IMFB whole-run kernel (D>0 mode) vs the carried jnp
    epoch, interpret mode — multi-hot context selector, depth gate."""
    from jax.experimental.pallas import tpu as pltpu

    from svdfeature_tpu.ops.imfb import train_epoch_imfb_carried
    from svdfeature_tpu.ops.pallas_svdpp import train_rounds_imfb_pallas
    from svdfeature_tpu.solvers.multi_imfb import SVDPPMultiIMFBTrainer

    ds = synth_stacked_ds()
    tr = SVDPPMultiIMFBTrainer(
        SVDTypeParam(format_type=svd_type.USER_GROUP_FORMAT, extend_type=2)
    )
    for n, v in {**P, "users_per_batch": 8, **extra}.items():
        tr.set_param(n, str(v))
    tr.init_model()
    tr.init_trainer()
    assert not tr._plain_svdpp(ds)
    stacked, chunk_id, fb, _, enabled, overlap = tr._pack_plus(ds)
    assert stacked["ctx_slots"].shape[-1] == 2  # genuinely depth-2
    fbh = (
        tr.tparam.scale_lr_ufeedback,
        tr.tparam.wd_ufeedback,
        tr.tparam.wd_ufeedback_bias,
    )
    R = 2
    lr = jnp.float32(tr.learning_rate)

    st = jax.tree.map(jnp.copy, tr.state)
    for _ in range(R):
        st = train_epoch_imfb_carried(
            st, stacked, chunk_id, fb, overlap, enabled, lr, tr.consts,
            tr.hp, *fbh, rows_per_user=tr.rows_per_user,
        )

    lrs = jnp.full((R,), lr, jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        out = train_rounds_imfb_pallas(
            jax.tree.map(jnp.copy, tr.state), stacked, chunk_id, fb,
            overlap, enabled, lrs, tr.consts, tr.hp,
            tr.model.off_user, tr.model.off_item, *fbh,
            rows_per_user=tr.rows_per_user,
        )
    np.testing.assert_allclose(
        np.asarray(out.w), np.asarray(st.w), atol=2e-4, rtol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(out.b), np.asarray(st.b), atol=5e-4, rtol=1e-3
    )
    assert int(out.step) == int(st.step)


def test_imfb_update_rounds_routes_to_pallas(monkeypatch):
    """Solver wiring: stacked entries on a 'TPU' take the whole-run D>0
    kernel through update_rounds (one fused dispatch), and learn."""
    from jax.experimental.pallas import tpu as pltpu

    from svdfeature_tpu.ops import embed, pallas_svdpp
    from svdfeature_tpu.solvers.multi_imfb import SVDPPMultiIMFBTrainer

    monkeypatch.setattr(embed, "default_device_is_tpu", lambda: True)
    calls = []
    real = pallas_svdpp.train_rounds_imfb_pallas

    def spy(*a, **kw):
        calls.append(a[5].shape)  # lrs
        return real(*a, **kw)

    monkeypatch.setattr(pallas_svdpp, "train_rounds_imfb_pallas", spy)

    ds = synth_stacked_ds(n_users=80)
    tr = SVDPPMultiIMFBTrainer(
        SVDTypeParam(format_type=svd_type.USER_GROUP_FORMAT, extend_type=2)
    )
    for n, v in {**P, "users_per_batch": 128, "num_user": 80}.items():
        tr.set_param(n, str(v))
    tr.init_model()
    tr.init_trainer()
    with pltpu.force_tpu_interpret_mode():
        tr.update_rounds(ds, 2)
    assert calls and calls[0][0] == 2  # whole run, one dispatch, R=2
    assert np.isfinite(np.asarray(tr.state.w)).all()
    assert int(tr.state.step) == 2 * ds.rows.num_row
