"""Tile-sweep step (ops/tile_sweep.py) on-device benchmark + parity.

One process, per the axon discipline: tiny-matmul health check first,
then narrow-take probes, then the synthetic 2M-row k=64 workload --
sorted-dedup step vs tile-sweep step at several batch sizes, with an
on-device parity check between the two paths.

Run:  PYTHONPATH=/root/repo:/root/.axon_site timeout 1800 python scripts/bench_sweep.py
"""

import dataclasses
import json
import os
import sys
import time

SMALL = bool(int(os.environ.get("BENCH_SWEEP_SMALL", "0")))  # CPU dry-run

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")


def fetch(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    return float(np.asarray(jax.device_get(leaf.ravel()[:1]))[0])


def emit(**kw):
    print(json.dumps(kw), flush=True)


# ---------------------------------------------------------------- health
t0 = time.time()
x = jnp.ones((256, 256))
fetch(x @ x)
emit(probe="health", devices=[str(d) for d in jax.devices()], s=round(time.time() - t0, 1))

from svdfeature_tpu.ops import embed  # noqa: E402
from svdfeature_tpu.ops.big_embed import augment_state, train_step_big  # noqa: E402
from svdfeature_tpu.ops.tile_sweep import (  # noqa: E402
    SWEEP_ECAP,
    SWEEP_TILE,
    attach_sweep_plans,
    train_step_sweep,
)

rng = np.random.default_rng(0)


def bench(name, fn, *args, reps=3, note=None):
    try:
        out = fn(*args)
        fetch(out)
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            o = out
            for _ in range(reps):
                o = fn(*args)
            fetch(o)
            best = min(best, (time.perf_counter() - t0) / reps)
        rec = {"probe": name, "ms": round(best * 1e3, 3)}
        if note:
            rec["note"] = note(best)
        print(json.dumps(rec), flush=True)
        return best
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"probe": name, "error": str(e)[:240]}), flush=True)
        return None


# ------------------------------------------------------- narrow-take probes
B = 16 * 1024 if SMALL else 1024 * 1024
perm = jnp.asarray(rng.permutation(B).astype(np.int32))
for w_ in (1, 8, 64, 128):
    srcw = jnp.asarray(rng.standard_normal((B, w_), dtype=np.float32))
    src = srcw[:, 0] if w_ == 1 else srcw
    take = jax.jit(lambda x, p: x[p])
    bench(
        f"take_B1M_w{w_}", take, src, perm,
        note=lambda t: f"{t / B * 1e9:.1f} ns/row",
    )

# ------------------------------------------------- synthetic big workload
N_ROWS = 16 * 1024 if SMALL else 2 * 1024 * 1024  # includes dummy
K = 64
NG = 2
SCALE_BS = (2048, 8192) if SMALL else (262144, 1048576)


def make_state(n_rows, pad_to=0):
    st = embed.TrainState(
        w=jnp.asarray(rng.standard_normal((n_rows, K), dtype=np.float32) * 0.01),
        b=jnp.zeros((n_rows,), jnp.float32),
        g=jnp.zeros((NG,), jnp.float32),
        step=jnp.zeros((), jnp.int32),
        ref_ui=jnp.zeros((n_rows,), jnp.int32),
        ref_g=jnp.zeros((NG,), jnp.int32),
    )
    return augment_state(st, K, pad_rows_to=pad_to)


def make_consts(n_pad):
    z = jnp.full((n_pad,), 0.004, jnp.float32)
    return embed.TrainConsts(
        wd_u_row=z,
        wd_i_row=z,
        wd_g_row=jnp.zeros((NG,), jnp.float32),
        wd_user_bias=jnp.float32(0.004),
        wd_item_bias=jnp.float32(0.004),
    )


def make_batch(n_rows, b):
    half = n_rows // 2
    u = rng.integers(0, half, size=b).astype(np.int32)
    i = rng.integers(half, n_rows - 1, size=b).astype(np.int32)
    batch = {
        "u_idx": u[:, None],
        "i_idx": i[:, None],
        "g_idx": np.full((b, 1), NG - 1, np.int32),
        "u_val": np.ones((b, 1), np.float32),
        "i_val": np.ones((b, 1), np.float32),
        "g_val": np.zeros((b, 1), np.float32),
        "label": rng.integers(1, 6, size=b).astype(np.float32),
        "weight": np.ones((b, 1), np.float32)[:, 0],
    }
    return batch


HP_BIG = embed.HyperParams(
    reg_method=0, reg_global=0, base_score=3.0, big_table=True,
    num_factor=K, row_dma=True,
)
HP_SW = dataclasses.replace(
    HP_BIG, sweep_table=True, sweep_tile=SWEEP_TILE, sweep_ecap=SWEEP_ECAP,
    row_dma=False,
)
LR = jnp.float32(0.005)

# parity first, small table (fast)
n_small = 4 * SWEEP_TILE
st_a = make_state(n_small)
st_b = make_state(n_small, pad_to=SWEEP_TILE)
# rebuild identical contents (rng advanced between the two make_state calls)
st_b = dataclasses.replace(
    st_b, w=st_b.w.at[:n_small].set(st_a.w)
)
consts_small = make_consts(n_small)
consts_small_p = make_consts(st_b.w.shape[0])
bt = make_batch(n_small, 8192)
planned = attach_sweep_plans(
    {k: v[None] for k, v in bt.items()}, int(st_b.w.shape[0]), SWEEP_TILE, SWEEP_ECAP
)
bt_j = {k: jnp.asarray(v) for k, v in bt.items()}
bt_sw = dict(bt_j)
for key in ("sw_tids", "sw_lids", "sw_src"):
    bt_sw[key] = jnp.asarray(planned[key][0])
try:
    out_a = train_step_big(st_a, bt_j, LR, consts_small, HP_BIG)
    out_b = train_step_sweep(st_b, bt_sw, LR, consts_small_p, HP_SW)
    da = np.asarray(out_a.w)
    db = np.asarray(out_b.w)[:n_small]
    emit(probe="parity_small", max_abs_err=float(np.max(np.abs(da - db))))
except Exception as e:  # noqa: BLE001
    emit(probe="parity_small", error=str(e)[:400])

# throughput at scale: chain donated steps, value-fetch to sync
def time_chain(name, step, st0, batch, consts, hp, b, warm=2, reps=6):
    try:
        st = st0
        for _ in range(warm):
            st = step(st, batch, LR, consts, hp)
        fetch(st.step)
        t0 = time.perf_counter()
        for _ in range(reps):
            st = step(st, batch, LR, consts, hp)
        fetch(st.step)
        dt = (time.perf_counter() - t0) / reps
        emit(
            probe=name, ms=round(dt * 1e3, 2),
            metric=f"{name}_exps", value=round(b / dt / 1e6, 2),
            unit="M examples/s",
        )
        return st
    except Exception as e:  # noqa: BLE001
        emit(probe=name, error=str(e)[:400])
        return None


for b in SCALE_BS:
    bt = make_batch(N_ROWS, b)
    bt_j = {k: jnp.asarray(v) for k, v in bt.items()}
    consts = make_consts(N_ROWS)

    st = make_state(N_ROWS)
    time_chain(f"dedup_B{b}", train_step_big, st, bt_j, consts, HP_BIG, b)
    del st

    st = make_state(N_ROWS, pad_to=SWEEP_TILE)
    n_pad = int(st.w.shape[0])
    consts_p = make_consts(n_pad)
    planned = attach_sweep_plans(
        {k: v[None] for k, v in bt.items()}, n_pad, SWEEP_TILE, SWEEP_ECAP
    )
    bt_sw = dict(bt_j)
    for key in ("sw_tids", "sw_lids", "sw_src"):
        bt_sw[key] = jnp.asarray(planned[key][0])
    G = int(bt_sw["sw_tids"].shape[0])
    emit(probe=f"plan_B{b}", cells=G, pad_ratio=round(G * SWEEP_ECAP / (2 * b), 3))
    time_chain(f"sweep_B{b}", train_step_sweep, st, bt_sw, consts_p, HP_SW, b)
    del st

emit(probe="done")
