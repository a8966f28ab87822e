"""Tile-sweep write path (ops/tile_sweep.py) equivalence tests.

The sweep step must produce exactly the semantics of the sorted-dedup
big-table step (ops/big_embed.train_step_big) — which is itself pinned
against the general path by tests/test_big_embed.py — for every
regularization mode, duplicates, hierarchy slots, padding entries and
multi-step chains.  Runs in Pallas interpret mode on CPU; the compiled
kernel is exercised on the TPU by bench.py.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from svdfeature_tpu.ops import embed
from svdfeature_tpu.ops.big_embed import augment_state, deaugment_state, train_step_big
from svdfeature_tpu.ops.tile_sweep import (
    attach_sweep_plans,
    make_sweep_plan,
    train_step_sweep,
)

from test_big_embed import assert_state_close, clone, make_inputs

TILE = 16
ECAP = 8


def pad_consts(consts, n_pad):
    n = consts.wd_u_row.shape[0]
    return dataclasses.replace(
        consts,
        wd_u_row=jnp.pad(consts.wd_u_row, (0, n_pad - n)),
        wd_i_row=jnp.pad(consts.wd_i_row, (0, n_pad - n)),
    )


def run_pair(state, batch, lr, consts, hp, k=4):
    """Run sorted-dedup and sweep steps on clones; return both deaugmented."""
    n = state.w.shape[0]
    n_pad = -(-n // TILE) * TILE
    hp_big = dataclasses.replace(hp, big_table=True, num_factor=k)
    hp_sw = dataclasses.replace(
        hp_big, sweep_table=True, sweep_tile=TILE, sweep_ecap=ECAP
    )
    stacked = {
        key: np.asarray(v)[None] for key, v in batch.items()
    }  # [1, ...] for attach_sweep_plans
    planned = attach_sweep_plans(stacked, n_pad, TILE, ECAP)
    sw_batch = dict(batch)
    for key in ("sw_tids", "sw_lids", "sw_src"):
        sw_batch[key] = jnp.asarray(planned[key][0])
    consts_p = pad_consts(consts, n_pad)
    out_big = train_step_big(
        augment_state(clone(state), k), batch, lr, consts, hp_big
    )
    out_sw = train_step_sweep(
        augment_state(clone(state), k, pad_rows_to=TILE),
        sw_batch,
        lr,
        consts_p,
        hp_sw,
    )
    pad_rows = np.asarray(out_sw.w)[n:]
    assert np.all(pad_rows == 0.0), "pad rows must stay untouched"
    return deaugment_state(out_big, k), deaugment_state(out_sw, k, n_rows=n)


@pytest.mark.parametrize("reg", [0, 1, 2, 3, 4, 5])
def test_sweep_matches_big(reg):
    state, batch, consts = make_inputs(reg + 21)
    hp = embed.HyperParams(reg_method=reg, reg_global=0, base_score=3.0)
    lr = jnp.float32(0.05)
    a, b = run_pair(state, batch, lr, consts, hp)
    assert_state_close(a, b)


def test_sweep_no_user_bias_nonneg():
    state, batch, consts = make_inputs(31)
    hp = embed.HyperParams(
        reg_method=0, no_user_bias=1, user_nonnegative=1, item_nonnegative=1,
        base_score=3.0,
    )
    a, b = run_pair(state, batch, lr=jnp.float32(0.05), consts=consts, hp=hp)
    assert_state_close(a, b)


def test_sweep_heavy_duplicates():
    """Row collisions far beyond e_cap force multi-cell tile runs."""
    state, batch, consts = make_inputs(33, B=64, Su=2, Si=2)
    batch = dict(batch)
    rng = np.random.RandomState(7)
    batch["u_idx"] = jnp.asarray(rng.randint(0, 3, (64, 2)).astype(np.int32))
    batch["i_idx"] = jnp.asarray(rng.randint(20, 24, (64, 2)).astype(np.int32))
    hp = embed.HyperParams(reg_method=0, base_score=3.0)
    a, b = run_pair(state, batch, lr=jnp.float32(0.05), consts=consts, hp=hp)
    assert_state_close(a, b)


def test_sweep_padding_entries():
    state, batch, consts = make_inputs(35)
    n = state.w.shape[0]
    batch = dict(batch)
    batch["weight"] = batch["weight"].at[-4:].set(0.0)
    batch["u_idx"] = batch["u_idx"].at[-4:].set(n - 1)
    batch["i_idx"] = batch["i_idx"].at[-4:].set(n - 1)
    batch["g_idx"] = batch["g_idx"].at[-4:].set(state.g.shape[0] - 1)
    hp = embed.HyperParams(reg_method=0, base_score=3.0)
    a, b = run_pair(state, batch, lr=jnp.float32(0.05), consts=consts, hp=hp)
    assert_state_close(a, b)
    assert np.all(np.asarray(b.w)[n - 1] == 0.0)


@pytest.mark.parametrize("reg", [0, 4])
def test_sweep_two_steps_chain(reg):
    """Lazy counters/ref bits must survive a chained second step."""
    state, b1, consts = make_inputs(41)
    _, b2, _ = make_inputs(42)
    n = state.w.shape[0]
    k = 4
    n_pad = -(-n // TILE) * TILE
    hp = embed.HyperParams(reg_method=reg, reg_global=0, base_score=3.0)
    hp_big = dataclasses.replace(hp, big_table=True, num_factor=k)
    hp_sw = dataclasses.replace(
        hp_big, sweep_table=True, sweep_tile=TILE, sweep_ecap=ECAP
    )
    consts_p = pad_consts(consts, n_pad)
    lr = jnp.float32(0.05)

    big = augment_state(clone(state), k)
    sw = augment_state(clone(state), k, pad_rows_to=TILE)
    for batch in (b1, b2):
        stacked = {key: np.asarray(v)[None] for key, v in batch.items()}
        planned = attach_sweep_plans(stacked, n_pad, TILE, ECAP)
        sw_batch = dict(batch)
        for key in ("sw_tids", "sw_lids", "sw_src"):
            sw_batch[key] = jnp.asarray(planned[key][0])
        big = train_step_big(big, batch, lr, consts, hp_big)
        sw = train_step_sweep(sw, sw_batch, lr, consts_p, hp_sw)
    assert_state_close(
        deaugment_state(big, k), deaugment_state(sw, k, n_rows=n)
    )


def test_solver_wiring_sweep_matches_dedup(tmp_path, monkeypatch):
    """End-to-end: the train task with big_sweep forced on must produce
    the same model as the sorted-dedup big path (padding, consts
    padding, plan attachment and deaugment all wired correctly)."""
    from svdfeature_tpu.model import SVDModel
    from svdfeature_tpu.params import SVDTypeParam
    from svdfeature_tpu.train.loop import SVDTrainTask
    import svdfeature_tpu.ops.embed as embed_mod

    monkeypatch.setattr(embed_mod, "ONEHOT_THRESHOLD", 8)
    text = "\n".join(
        f"{(i % 5) + 1} 0 1 1 {i % 29}:1 {(i * 7) % 37}:1" for i in range(200)
    )
    feat = tmp_path / "train.feature"
    feat.write_text(text + "\n")
    conf = tmp_path / "t.conf"
    conf.write_text(
        f"""
input_type = 1
data_in = "{feat}"
num_user = 29
num_item = 37
num_factor = 8
base_score = 3
learning_rate = 0.01
wd_user = 0.004
wd_item = 0.004
batch_size = 32
silent = 1
"""
    )

    def run(flag):
        out = tmp_path / f"m{flag}"
        SVDTrainTask().run(
            str(conf),
            [f"model_out_folder={out}", "num_round=2", f"big_sweep={flag}"],
        )
        with open(out / "0002.model", "rb") as f:
            mt = SVDTypeParam.from_bytes(f.read(4))
            m = SVDModel.load(f, mt)
        return np.asarray(m.w), np.asarray(m.b)

    w0, b0 = run(0)
    w1, b1 = run(1)
    np.testing.assert_allclose(w0, w1, atol=2e-6)
    np.testing.assert_allclose(b0, b1, atol=2e-6)


def test_plan_reconstructs_scatter():
    """The plan's (tids, lids, src) triples exactly cover every entry."""
    rng = np.random.RandomState(3)
    E, n_pad, tile, e_cap = 100, 64, 16, 8
    ent = rng.randint(0, 60, E).astype(np.int32)
    plan = make_sweep_plan(ent, n_pad, tile, e_cap)
    tids, lids, src = plan["sw_tids"], plan["sw_lids"], plan["sw_src"]
    G = tids.shape[0]
    got = np.zeros(n_pad, np.int64)
    seen_src = []
    for j in range(G):
        for s in range(e_cap):
            l = lids[j * e_cap + s]
            p = src[j * e_cap + s]
            assert (l == -1) == (p == E), "pad markers must agree"
            if l >= 0:
                row = tids[j] * tile + l
                got[row] += 1
                seen_src.append(p)
                assert ent[p] == row, "src entry must map to its row"
    want = np.zeros(n_pad, np.int64)
    np.add.at(want, ent, 1)
    np.testing.assert_array_equal(got, want)
    assert sorted(seen_src) == list(range(E))
    # equal tiles must be consecutive (kernel derives first/last visits)
    changes = np.flatnonzero(np.diff(tids)) + 1
    assert len(set(tids)) == 1 + len(changes)
