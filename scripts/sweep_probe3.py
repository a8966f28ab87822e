"""Round 3 of the tile-sweep primitive probe.

Round 2 findings: sweeps are HBM-bound (read 110-115 GB/s, aliased r+w
178 GB/s); in-kernel one-hot gather at T=8192 is read-bound at DEFAULT
precision and ~69ns/entry of MXU time at HIGHEST; every row-granular
primitive (XLA take, per-row DMA, run DMA) is ~27-40ns/row.  T=2048
kernels crashed the remote compiler — hypothesis: E_cap=256 1-D int32
blocks are below the minimum tile, E_cap=1024 worked everywhere.

This round: per-entry MXU cost vs T (gather HIGHEST/DEFAULT), the
aliased scatter with a scalar-prefetched out index map including a
revisit-accumulate correctness check, and take baselines at B=512k.

Run:  PYTHONPATH=/root/repo:/root/.axon_site timeout 1800 python scripts/sweep_probe3.py
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = 2 * 1024 * 1024
W = 128
REPS = 4
E_CAP = 1024

rng = np.random.default_rng(0)


def fetch(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(np.asarray(jax.device_get(leaf.ravel()[:1]))[0])


def bench(name, fn, *args, reps=REPS, chain=False, note=None):
    try:
        out = fn(*args)
        fetch(out)
        x = out
        best = float("inf")
        for _trial in range(2):
            t0 = time.perf_counter()
            if chain:
                for _ in range(reps):
                    x = fn(x, *args[1:])
                out = x
            else:
                for _ in range(reps):
                    out = fn(*args)
            fetch(out)
            dt = (time.perf_counter() - t0) / reps
            best = min(best, dt)
        rec = {"probe": name, "ms": round(best * 1e3, 3)}
        if note:
            rec["note"] = note(best)
        print(json.dumps(rec), flush=True)
        return best
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"probe": name, "error": str(e)[:200]}), flush=True)
        return None


def fresh_table():
    return jnp.asarray(rng.standard_normal((N, W), dtype=np.float32))


print(json.dumps({"devices": [str(d) for d in jax.devices()]}), flush=True)
tbl = fresh_table()
gb = N * W * 4 / 1e9

# --------------------------- one-hot gather vs T (grid covers full table)
def make_onehot_gather(T, precision):
    Tn = N // T

    def kernel(ids_ref, x_ref, o_ref):
        ids = ids_ref[:]
        sel = (
            ids[:, None] == jax.lax.broadcasted_iota(jnp.int32, (E_CAP, T), 1)
        ).astype(jnp.float32)
        o_ref[:] = jax.lax.dot_general(
            sel, x_ref[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=precision,
        )

    def run(ids, t):
        return pl.pallas_call(
            kernel,
            grid_spec=pl.GridSpec(
                grid=(Tn,),
                in_specs=[
                    pl.BlockSpec((E_CAP,), lambda i: (i,), memory_space=pltpu.VMEM),
                    pl.BlockSpec((T, W), lambda i: (i, 0), memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec(
                    (E_CAP, W), lambda i: (i, 0), memory_space=pltpu.VMEM
                ),
            ),
            out_shape=jax.ShapeDtypeStruct((Tn * E_CAP, W), jnp.float32),
        )(ids, t)

    ids = jnp.asarray(rng.integers(0, T, size=Tn * E_CAP).astype(np.int32))
    return jax.jit(run), ids, Tn * E_CAP


for T in [512, 1024, 2048, 4096]:
    for prec in [jax.lax.Precision.HIGHEST, jax.lax.Precision.DEFAULT]:
        fn, ids, tot = make_onehot_gather(T, prec)
        bench(
            f"gather_T{T}_{str(prec).split('.')[-1]}", fn, ids, tbl,
            note=lambda t, tot=tot: f"{t / tot * 1e9:.1f} ns/entry ({tot} entries)",
        )

# ------------- aliased scatter-update, scalar-prefetched out map + revisit
def make_scatter(T, precision, visits_per_tile):
    """Work items = (tile, visit): grid cells G = Tn * visits_per_tile,
    consecutive cells revisit the same tile (accumulate in VMEM, written
    back once).  tids is scalar-prefetched and drives in/out index maps."""
    Tn = N // T
    G = Tn * visits_per_tile

    def kernel(tids_ref, ids_ref, pay_ref, x_ref, o_ref):
        v = pl.program_id(0) % visits_per_tile

        @pl.when(v == 0)
        def _():
            o_ref[:] = x_ref[:]

        ids = ids_ref[:]
        sel = (
            ids[:, None] == jax.lax.broadcasted_iota(jnp.int32, (E_CAP, T), 1)
        ).astype(jnp.float32)
        o_ref[:] += jax.lax.dot_general(
            sel, pay_ref[:],
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=precision,
        )

    def run(t, tids, ids, pay):
        return pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(G,),
                in_specs=[
                    pl.BlockSpec((E_CAP,), lambda j, tids: (j,), memory_space=pltpu.VMEM),
                    pl.BlockSpec((E_CAP, W), lambda j, tids: (j, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((T, W), lambda j, tids: (tids[j], 0), memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec(
                    (T, W), lambda j, tids: (tids[j], 0), memory_space=pltpu.VMEM
                ),
            ),
            out_shape=jax.ShapeDtypeStruct((N, W), jnp.float32),
            input_output_aliases={3: 0},
        )(tids, ids, pay, t)

    tids = jnp.asarray(np.repeat(np.arange(Tn, dtype=np.int32), visits_per_tile))
    ids = jnp.asarray(rng.integers(0, T, size=G * E_CAP).astype(np.int32))
    pay = jnp.asarray(rng.standard_normal((G * E_CAP, W), dtype=np.float32))
    return jax.jit(run, donate_argnums=0), tids, ids, pay, G * E_CAP


# correctness check first: tiny table, visits=2, compare with numpy
def check_scatter():
    global N
    N_save = N
    try:
        N = 16384
        T = 2048
        fn, tids, ids, pay, _ = make_scatter(T, jax.lax.Precision.HIGHEST, 2)
        t0 = fresh_table()
        ref = np.asarray(t0)
        idn = np.asarray(ids)
        pyn = np.asarray(pay)
        tdn = np.asarray(tids)
        for j in range(len(tdn)):
            base = tdn[j] * T
            for e in range(E_CAP):
                ref[base + idn[j * E_CAP + e]] += pyn[j * E_CAP + e]
        out = np.asarray(fn(t0, tids, ids, pay))
        err = float(np.max(np.abs(out - ref)))
        print(json.dumps({"probe": "scatter_check", "max_abs_err": err}), flush=True)
    finally:
        N = N_save


check_scatter()

# chain=True: the donated table rotates through the output each rep
for T in [1024, 2048, 4096]:
    fn, tids, ids, pay, tot = make_scatter(T, jax.lax.Precision.HIGHEST, 1)
    bench(
        f"scatter_T{T}_HIGHEST", fn, fresh_table(), tids, ids, pay,
        chain=True,
        note=lambda t, tot=tot: f"{t / tot * 1e9:.1f} ns/entry ({tot} entries)",
    )

for T in [2048]:
    fn, tids, ids, pay, tot = make_scatter(T, jax.lax.Precision.DEFAULT, 1)
    bench(
        f"scatter_T{T}_DEFAULT", fn, fresh_table(), tids, ids, pay,
        chain=True,
        note=lambda t, tot=tot: f"{t / tot * 1e9:.1f} ns/entry ({tot} entries)",
    )

# --------------------------------------------- take baselines at B = 512k
B = 512 * 1024
src = jnp.asarray(rng.standard_normal((B, 64), dtype=np.float32))
perm = jnp.asarray(rng.permutation(B).astype(np.int32))
take = jax.jit(lambda x, p: x[p])
bench("xla_take_B512k_w64", take, src, perm,
      note=lambda t: f"{t / B * 1e9:.1f} ns/row")

import sys
sys.path.insert(0, "/root/repo")
from svdfeature_tpu.ops.pallas_scatter import row_reader

srcW = jnp.asarray(rng.standard_normal((B, 128), dtype=np.float32))
bench("row_reader_B512k_w128", row_reader, srcW, perm,
      note=lambda t: f"{t / B * 1e9:.1f} ns/row")

print(json.dumps({"probe": "done"}), flush=True)
