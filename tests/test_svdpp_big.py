"""Large-table SVD++ epoch (ops/svdpp_big.py) equivalence tests.

train_epoch_plus_big must reproduce the train_epoch_plus trajectory —
same chunk-carried algorithm, augmented-table execution — across bias
modes, reg modes, rows_per_user and feedback weight decay.  Runs on CPU
(write_rows_unique falls back to .at[].set; the DMA kernel itself is
covered by tests/test_pallas.py and bench.py on TPU).
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from svdfeature_tpu.data.text import load_plus_text
from svdfeature_tpu.ops.big_embed import augment_state, deaugment_state
from svdfeature_tpu.ops.svdpp import train_epoch_plus
from svdfeature_tpu.ops.svdpp_big import train_epoch_plus_big
from svdfeature_tpu.params import SVDTypeParam
from svdfeature_tpu.solvers.svdpp import SVDPPFeatureTrainer

K = 8


def make_trainer(seed=13, extra=None, fb_bound=15):
    rng = np.random.RandomState(seed)
    data_lines, fb_lines = [], []
    for u in range(10):
        nrows = int(rng.randint(2, 6))
        nfb = int(rng.randint(1, 5))
        fb_lines.append(
            f"{nrows} {nfb} "
            + " ".join(
                f"{rng.randint(0, fb_bound)}:{rng.rand():.3f}"
                for _ in range(nfb)
            )
        )
        for _ in range(nrows):
            data_lines.append(
                f"{rng.randint(1, 6)} 1 1 1 {rng.randint(0, 3)}:1 {u}:1 "
                f"{rng.randint(0, 12)}:1"
            )
    ds = load_plus_text(
        "x", "y", text="\n".join(data_lines), feedback_text="\n".join(fb_lines)
    )
    tr = SVDPPFeatureTrainer(SVDTypeParam(format_type=1))
    params = dict(
        num_user=10, num_item=12, num_ufeedback=15, num_global=3,
        num_factor=K, base_score=3, learning_rate=0.01,
        wd_user=0.004, wd_item=0.004, wd_ufeedback=0.003,
        wd_ufeedback_bias=0.002, users_per_batch=4,
    )
    params.update(extra or {})
    for n, v in params.items():
        tr.set_param(n, str(v))
    tr.init_model()
    tr.init_trainer()
    return tr, ds


def run_both(tr, ds, epochs=3, rows_per_user=1):
    stacked, chunk_id, fb, _, overlap = tr._pack_plus(ds)
    args = (
        jnp.float32(0.01), tr.consts, tr.hp,
        tr.tparam.scale_lr_ufeedback, tr.tparam.wd_ufeedback,
        tr.tparam.wd_ufeedback_bias,
    )
    n = int(tr.state.w.shape[0])
    hp_big = dataclasses.replace(
        tr.hp, big_table=True, num_factor=K, row_dma=False, sweep_table=False
    )
    args_big = (
        jnp.float32(0.01), tr.consts, hp_big,
        tr.tparam.scale_lr_ufeedback, tr.tparam.wd_ufeedback,
        tr.tparam.wd_ufeedback_bias,
    )
    st1 = jax.tree.map(jnp.copy, tr.state)
    st2 = augment_state(jax.tree.map(jnp.copy, tr.state), K)
    for _ in range(epochs):
        st1 = train_epoch_plus(
            st1, stacked, chunk_id, fb, overlap, *args,
            rows_per_user=rows_per_user,
        )
        st2 = train_epoch_plus_big(
            st2, stacked, chunk_id, fb, overlap, *args_big,
            rows_per_user=rows_per_user,
        )
    return st1, deaugment_state(st2, K, n_rows=n)


def assert_close(st1, st2):
    np.testing.assert_allclose(
        np.asarray(st1.w), np.asarray(st2.w), rtol=1e-4, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(st1.b), np.asarray(st2.b), rtol=1e-4, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(st1.g), np.asarray(st2.g), rtol=1e-4, atol=1e-6
    )
    assert int(st1.step) == int(st2.step)


def test_big_epoch_matches_small():
    tr, ds = make_trainer()
    assert_close(*run_both(tr, ds))


def test_big_epoch_no_user_bias():
    tr, ds = make_trainer(seed=7, extra={"no_user_bias": 1})
    assert_close(*run_both(tr, ds))


@pytest.mark.parametrize("reg", [1, 4])
def test_big_epoch_reg_modes(reg):
    tr, ds = make_trainer(seed=5, extra={"reg_method": reg})
    st1, st2 = run_both(tr, ds)
    assert_close(st1, st2)
    if reg >= 4:
        np.testing.assert_array_equal(
            np.asarray(st1.ref_ui), np.asarray(st2.ref_ui)
        )


def test_big_epoch_multirow():
    tr, ds = make_trainer(seed=3, extra={"rows_per_user": 2})
    assert_close(*run_both(tr, ds, rows_per_user=2))


def test_solver_routes_big_table(monkeypatch):
    """Forcing ONEHOT_THRESHOLD below the table size must flip the solver
    onto the augmented epoch with an unchanged training outcome."""
    from svdfeature_tpu.ops import embed

    tr1, ds = make_trainer(seed=11)
    tr1.update_rounds(ds, 2)
    p1 = tr1.predict_all(ds)

    monkeypatch.setattr(embed, "ONEHOT_THRESHOLD", 4)
    tr2, _ = make_trainer(seed=11)
    assert tr2.hp.big_table and not tr2.hp.sweep_table
    assert tr2.state.w.ndim == 2 and tr2.state.b.shape == (0,)
    tr2.update_rounds(ds, 2)
    p2 = tr2.predict_all(ds)
    np.testing.assert_allclose(p1, p2, rtol=1e-4, atol=1e-5)

    # checkpoint sync round-trips through deaugment_state
    tr2._sync_model_from_state()
    np.testing.assert_allclose(
        np.asarray(tr1.state.w[:-1]),
        np.asarray(tr2.model.w),
        rtol=1e-4,
        atol=1e-5,
    )


def test_solver_common_space_keeps_small_layout(monkeypatch):
    """common_feedback_space=1 has aliasing pool rows — the solver must
    keep the standard layout even above the threshold."""
    from svdfeature_tpu.ops import embed

    monkeypatch.setattr(embed, "ONEHOT_THRESHOLD", 4)
    tr, ds = make_trainer(
        seed=9,
        extra={"common_feedback_space": 1, "num_ufeedback": 10},
        fb_bound=10,
    )
    assert not tr.hp.big_table
    tr.update_rounds(ds, 1)  # refresh path, standard layout
    assert tr.state.b.shape[0] > 0
