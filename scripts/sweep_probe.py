"""Microbenchmark candidate primitives for the big-table tile-sweep step.

The big path (ops/big_embed.py) plateaus at ~3M examples/s because every
per-row primitive on this backend costs ~30-55 ns/row (PERF.md).  The
tile-sweep design streams the table tile-by-tile (sequential DMA at full
HBM bandwidth) and replaces per-row gathers/scatters with per-tile
one-hot MXU matmuls over pack-time-bucketed entry runs.  This probe
measures, on the real chip, the rates of every primitive the design
could use, so the implementation follows the numbers rather than guesses
(jax.block_until_ready lies under the axon tunnel: all timings are
value-fetch synced).

Run:  PYTHONPATH=/root/repo:/root/.axon_site timeout 1800 python scripts/sweep_probe.py
"""

import json
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = 2 * 1024 * 1024  # table rows
W = 128              # augmented row width (k=64 -> 128)
E = 262144           # entries per step (B=131072 MF: user+item)
REPS = 4

rng = np.random.default_rng(0)


def bench(name, fn, *args, fetch=None, reps=REPS, chain=False):
    """Time fn with value-fetch sync (the only honest sync here)."""
    try:
        out = fn(*args)
        (fetch or default_fetch)(out)
        x = out  # chained (donating) fns must continue from the result
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
            (fetch or default_fetch)(out)
            dt = (time.perf_counter() - t0) / reps
            best = min(best, dt)
        print(json.dumps({"probe": name, "ms": round(best * 1e3, 3)}), flush=True)
        return best
    except Exception as e:  # noqa: BLE001 - probe must survive any failure
        print(json.dumps({"probe": name, "error": str(e)[:300]}), flush=True)
        return None


def default_fetch(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(np.asarray(jax.device_get(leaf.ravel()[:1]))[0])


def fresh_table(w=W):
    return jnp.asarray(rng.standard_normal((N, w), dtype=np.float32))


print(json.dumps({"devices": [str(d) for d in jax.devices()]}), flush=True)

# ---------------------------------------------------------------- P0: XLA take
perm = jnp.asarray(rng.permutation(E).astype(np.int32))
xE = jnp.asarray(rng.standard_normal((E, W), dtype=np.float32))
take = jax.jit(lambda x, p: x[p])
bench("xla_take_E_W128", take, xE, perm)
xE8 = jnp.asarray(rng.standard_normal((E, 8), dtype=np.float32))
bench("xla_take_E_W8", take, xE8, perm)
b_of_e = jnp.asarray(rng.integers(0, E // 2, size=E).astype(np.int32))
errs = jnp.asarray(rng.standard_normal(E // 2, dtype=np.float32))
bench("xla_take_1d", take, errs, b_of_e)

# ------------------------------------------------- P1: pallas sweep, read-only
def sweep_read_kernel(x_ref, o_ref):
    o_ref[:] = jnp.sum(x_ref[:], axis=0, keepdims=True)


def make_sweep_read(T, w):
    Tn = N // T
    return jax.jit(
        lambda tbl: pl.pallas_call(
            sweep_read_kernel,
            grid_spec=pl.GridSpec(
                grid=(Tn,),
                in_specs=[pl.BlockSpec((T, w), lambda i: (i, 0), memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((1, w), lambda i: (i, 0), memory_space=pltpu.VMEM),
            ),
            out_shape=jax.ShapeDtypeStruct((Tn, w), jnp.float32),
        )(tbl)
    )


tbl = fresh_table()
gb = N * W * 4 / 1e9
t = bench("sweep_read_T2048_W128", make_sweep_read(2048, W), tbl)
if t:
    print(json.dumps({"note": f"read BW {gb / t:.0f} GB/s"}), flush=True)

# feature-major [66, N] layout
tblT = jnp.asarray(rng.standard_normal((66, N), dtype=np.float32))


def sweep_read_fm_kernel(x_ref, o_ref):
    o_ref[:] = jnp.sum(x_ref[:], axis=1, keepdims=True)


def make_sweep_read_fm(Tc):
    Tn = N // Tc
    return jax.jit(
        lambda tbl: pl.pallas_call(
            sweep_read_fm_kernel,
            grid_spec=pl.GridSpec(
                grid=(Tn,),
                in_specs=[pl.BlockSpec((66, Tc), lambda i: (0, i), memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((66, 1), lambda i: (0, i), memory_space=pltpu.VMEM),
            ),
            out_shape=jax.ShapeDtypeStruct((66, Tn), jnp.float32),
        )(tbl)
    )


gb_fm = 66 * N * 4 / 1e9
t = bench("sweep_read_fm_Tc8192_W66", make_sweep_read_fm(8192), tblT)
if t:
    print(json.dumps({"note": f"fm read BW {gb_fm / t:.0f} GB/s"}), flush=True)

# --------------------------------------- P2: pallas sweep, aliased read+write
def sweep_rw_kernel(x_ref, o_ref):
    o_ref[:] = x_ref[:] * 1.0001


def make_sweep_rw(T, w):
    Tn = N // T
    return jax.jit(
        lambda tbl: pl.pallas_call(
            sweep_rw_kernel,
            grid_spec=pl.GridSpec(
                grid=(Tn,),
                in_specs=[pl.BlockSpec((T, w), lambda i: (i, 0), memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((T, w), lambda i: (i, 0), memory_space=pltpu.VMEM),
            ),
            out_shape=jax.ShapeDtypeStruct((N, w), jnp.float32),
            input_output_aliases={0: 0},
        )(tbl),
        donate_argnums=0,
    )


t = bench("sweep_rw_T2048_W128", make_sweep_rw(2048, W), fresh_table(), chain=True)
if t:
    print(json.dumps({"note": f"r+w BW {2 * gb / t:.0f} GB/s"}), flush=True)

# ---------------------------------- P3: in-kernel one-hot gather (MXU), f32/bf16
def make_onehot_gather(T, E_cap, dtype):
    Tn = N // T

    def kernel(ids_ref, x_ref, o_ref):
        ids = ids_ref[0]  # [E_cap] int32, local row ids in [0, T)
        sel = (ids[:, None] == jax.lax.broadcasted_iota(jnp.int32, (E_cap, T), 1))
        if dtype == "bf16":
            out = jnp.dot(
                sel.astype(jnp.bfloat16),
                x_ref[:].astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            )
        else:
            out = jnp.dot(
                sel.astype(jnp.float32), x_ref[:], preferred_element_type=jnp.float32
            )
        o_ref[:] = out

    def run(ids, tbl):
        return pl.pallas_call(
            kernel,
            grid_spec=pl.GridSpec(
                grid=(Tn,),
                in_specs=[
                    pl.BlockSpec((1, E_cap), lambda i: (i, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((T, W), lambda i: (i, 0), memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec(
                    (E_cap, W), lambda i: (i, 0), memory_space=pltpu.VMEM
                ),
            ),
            out_shape=jax.ShapeDtypeStruct((Tn * E_cap, W), jnp.float32),
        )(ids, tbl)

    ids = jnp.asarray(rng.integers(0, T, size=(Tn, E_cap)).astype(np.int32))
    return jax.jit(run), ids


for T, E_cap in [(512, 64), (2048, 256), (8192, 1024)]:
    for dt in ["f32", "bf16"]:
        fn, ids = make_onehot_gather(T, E_cap, dt)
        bench(f"onehot_gather_T{T}_Ecap{E_cap}_{dt}", fn, ids, tbl)

# ------------------------------- P4: in-kernel VMEM dynamic row gather (loop)
def make_vmem_gather(T, E_cap):
    Tn = N // T

    def kernel(ids_ref, x_ref, o_ref):
        def body(j, _):
            o_ref[j, :] = x_ref[ids_ref[0, j], :]
            return 0

        jax.lax.fori_loop(0, E_cap, body, 0)

    def run(ids, tbl):
        return pl.pallas_call(
            kernel,
            grid_spec=pl.GridSpec(
                grid=(Tn,),
                in_specs=[
                    pl.BlockSpec((1, E_cap), lambda i: (i, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((T, W), lambda i: (i, 0), memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec(
                    (E_cap, W), lambda i: (i, 0), memory_space=pltpu.VMEM
                ),
            ),
            out_shape=jax.ShapeDtypeStruct((Tn * E_cap, W), jnp.float32),
        )(ids, tbl)

    ids = jnp.asarray(rng.integers(0, T, size=(Tn, E_cap)).astype(np.int32))
    return jax.jit(run), ids


fn, ids = make_vmem_gather(2048, 256)
bench("vmem_loop_gather_T2048_Ecap256", fn, ids, tbl)

# ----------------------------- P4b: in-kernel jnp.take row gather (if lowered)
def make_vmem_take(T, E_cap):
    Tn = N // T

    def kernel(ids_ref, x_ref, o_ref):
        o_ref[:] = jnp.take(x_ref[:], ids_ref[0], axis=0, fill_value=0.0)

    def run(ids, tbl):
        return pl.pallas_call(
            kernel,
            grid_spec=pl.GridSpec(
                grid=(Tn,),
                in_specs=[
                    pl.BlockSpec((1, E_cap), lambda i: (i, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((T, W), lambda i: (i, 0), memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec(
                    (E_cap, W), lambda i: (i, 0), memory_space=pltpu.VMEM
                ),
            ),
            out_shape=jax.ShapeDtypeStruct((Tn * E_cap, W), jnp.float32),
        )(ids, tbl)

    ids = jnp.asarray(rng.integers(0, T, size=(Tn, E_cap)).astype(np.int32))
    return jax.jit(run), ids


fn, ids = make_vmem_take(2048, 256)
bench("vmem_take_gather_T2048_Ecap256", fn, ids, tbl)

# --------------------------------------------- P5: run-granular DMA (HBM->HBM)
NBUF = 16


def make_run_dma(L):
    K = E // L

    def kernel(starts_ref, src, out, sems):
        def dma(j):
            return pltpu.make_async_copy(
                src.at[pl.ds(starts_ref[j], L)],
                out.at[pl.ds(j * L, L)],
                sems.at[jax.lax.rem(j, NBUF)],
            )

        def body(j, _):
            @pl.when(j >= NBUF)
            def _():
                dma(j - NBUF).wait()

            dma(j).start()
            return 0

        jax.lax.fori_loop(0, K, body, 0)

        def drain(tt, _):
            j = K - NBUF + tt

            @pl.when(j >= 0)
            def _():
                dma(j).wait()

            return 0

        jax.lax.fori_loop(0, NBUF, drain, 0)

    def run(starts, tbl):
        return pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(1,),
                in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
                out_specs=pl.BlockSpec(memory_space=pl.ANY),
                scratch_shapes=[pltpu.SemaphoreType.DMA((NBUF,))],
            ),
            out_shape=jax.ShapeDtypeStruct((E, W), jnp.float32),
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )(starts, tbl)

    starts = jnp.asarray(
        (rng.integers(0, N - L, size=K) // 8 * 8).astype(np.int32)
    )
    return jax.jit(run), starts


for L in [1, 8, 64]:
    fn, starts = make_run_dma(L)
    bench(f"run_dma_L{L}", fn, starts, tbl)

# ------------------------------------------ P6: XLA einsum bucketed gather
def make_xla_gather(T, E_cap):
    Tn = N // T

    def run(ids, tbl):
        tiles = tbl.reshape(Tn, T, W)
        sel = (ids[:, :, None] == jnp.arange(T, dtype=jnp.int32)).astype(jnp.bfloat16)
        return jnp.einsum(
            "teT,tTw->tew", sel, tiles.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )

    ids = jnp.asarray(rng.integers(0, T, size=(Tn, E_cap)).astype(np.int32))
    return jax.jit(run), ids


for T, E_cap in [(512, 64), (2048, 256)]:
    fn, ids = make_xla_gather(T, E_cap)
    bench(f"xla_einsum_gather_T{T}_Ecap{E_cap}", fn, ids, tbl)

# ------------------------------------------ P7: XLA einsum scatter sweep
def make_xla_scatter(T, E_cap):
    Tn = N // T

    def run(tbl, ids, payload):
        tiles = tbl.reshape(Tn, T, W)
        sel = (ids[:, :, None] == jnp.arange(T, dtype=jnp.int32)).astype(jnp.bfloat16)
        upd = jnp.einsum(
            "teT,tew->tTw", sel, payload.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )
        return (tiles + upd).reshape(N, W)

    ids = jnp.asarray(rng.integers(0, T, size=(Tn, E_cap)).astype(np.int32))
    payload = jnp.asarray(
        rng.standard_normal((Tn, E_cap, W), dtype=np.float32)
    )
    return jax.jit(run, donate_argnums=0), ids, payload


fn, ids, payload = make_xla_scatter(2048, 256)
bench("xla_einsum_scatter_T2048_Ecap256", fn, fresh_table(), ids, payload,
      chain=True)

# --------------------------- P8: in-kernel one-hot scatter into aliased tiles
def make_onehot_scatter(T, E_cap):
    Tn = N // T

    def kernel(ids_ref, pay_ref, x_ref, o_ref):
        ids = ids_ref[0]
        sel = (ids[:, None] == jax.lax.broadcasted_iota(jnp.int32, (E_cap, T), 1))
        upd = jax.lax.dot_general(
            sel.astype(jnp.bfloat16), pay_ref[:].astype(jnp.bfloat16),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o_ref[:] = x_ref[:] + upd

    def run(tbl, ids, pay):
        return pl.pallas_call(
            kernel,
            grid_spec=pl.GridSpec(
                grid=(Tn,),
                in_specs=[
                    pl.BlockSpec((1, E_cap), lambda i: (i, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((E_cap, W), lambda i: (i, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((T, W), lambda i: (i, 0), memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((T, W), lambda i: (i, 0), memory_space=pltpu.VMEM),
            ),
            out_shape=jax.ShapeDtypeStruct((N, W), jnp.float32),
            input_output_aliases={2: 0},
        )(ids, pay, tbl)

    ids = jnp.asarray(rng.integers(0, T, size=(Tn, E_cap)).astype(np.int32))
    pay = jnp.asarray(
        rng.standard_normal((Tn * E_cap, W), dtype=np.float32)
    )
    return jax.jit(run, donate_argnums=0), ids, pay


fn, ids, pay = make_onehot_scatter(2048, 256)
bench("onehot_scatter_T2048_Ecap256", fn, fresh_table(), ids, pay, chain=True)

print(json.dumps({"probe": "done"}), flush=True)
