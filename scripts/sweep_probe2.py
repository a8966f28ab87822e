"""Round 2 of the tile-sweep primitive probe (block shapes fixed).

Adds true-bandwidth baselines (XLA sum/copy of the whole table) so the
pallas sweep numbers can be judged against what the device actually
sustains, and re-runs the kernels that failed round 1's block-shape
rules (sublane dim divisible by 8; index vectors as 1-D blocks).

Run:  PYTHONPATH=/root/repo:/root/.axon_site timeout 1800 python scripts/sweep_probe2.py
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
E = 262144
REPS = 4

rng = np.random.default_rng(0)


def default_fetch(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(np.asarray(jax.device_get(leaf.ravel()[:1]))[0])


def bench(name, fn, *args, reps=REPS, chain=False, note=None):
    try:
        out = fn(*args)
        default_fetch(out)
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
            default_fetch(out)
            dt = (time.perf_counter() - t0) / reps
            best = min(best, dt)
        rec = {"probe": name, "ms": round(best * 1e3, 3)}
        if note:
            rec["note"] = note(best)
        print(json.dumps(rec), flush=True)
        return best
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"probe": name, "error": str(e)[:240]}), flush=True)
        return None


def fresh_table(w=W):
    return jnp.asarray(rng.standard_normal((N, w), dtype=np.float32))


print(json.dumps({"devices": [str(d) for d in jax.devices()]}), flush=True)
tbl = fresh_table()
gb = N * W * 4 / 1e9

# ------------------------------------------------ true-bandwidth baselines
bench("xla_sum_table", jax.jit(jnp.sum), tbl,
      note=lambda t: f"read {gb / t:.0f} GB/s")
bench("xla_copy_table", jax.jit(lambda x: x + 1.0, donate_argnums=0),
      fresh_table(), chain=True, note=lambda t: f"r+w {2 * gb / t:.0f} GB/s")

# ------------------------------------------------ pallas sweep read (fixed)
def make_sweep_read(T):
    Tn = N // T

    def kernel(x_ref, o_ref):
        @pl.when(pl.program_id(0) == 0)
        def _():
            o_ref[:] = jnp.zeros_like(o_ref)

        o_ref[:] += jnp.sum(x_ref[:].reshape(T // 8, 8, W), axis=0)

    return jax.jit(
        lambda t: pl.pallas_call(
            kernel,
            grid_spec=pl.GridSpec(
                grid=(Tn,),
                in_specs=[pl.BlockSpec((T, W), lambda i: (i, 0), memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((8, W), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ),
            out_shape=jax.ShapeDtypeStruct((8, W), jnp.float32),
        )(t)
    )


for T in [2048, 8192]:
    bench(f"sweep_read_T{T}", make_sweep_read(T), tbl,
          note=lambda t: f"read {gb / t:.0f} GB/s")

# ----------------------------------- pallas sweep r+w, aliased vs separate
def make_sweep_rw(T, aliased):
    Tn = N // T

    def kernel(x_ref, o_ref):
        o_ref[:] = x_ref[:] * 1.0001

    def run(t):
        return pl.pallas_call(
            kernel,
            grid_spec=pl.GridSpec(
                grid=(Tn,),
                in_specs=[pl.BlockSpec((T, W), lambda i: (i, 0), memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((T, W), lambda i: (i, 0), memory_space=pltpu.VMEM),
            ),
            out_shape=jax.ShapeDtypeStruct((N, W), jnp.float32),
            input_output_aliases={0: 0} if aliased else {},
        )(t)

    return jax.jit(run, donate_argnums=0) if aliased else jax.jit(run)


bench("sweep_rw_alias_T8192", make_sweep_rw(8192, True), fresh_table(),
      chain=True, note=lambda t: f"r+w {2 * gb / t:.0f} GB/s")
bench("sweep_rw_noalias_T8192", make_sweep_rw(8192, False), tbl,
      note=lambda t: f"r+w {2 * gb / t:.0f} GB/s")

# ------------------------------------- one-hot gather in-kernel (fixed ids)
def make_onehot_gather(T, E_cap, precision):
    Tn = N // T

    def kernel(ids_ref, x_ref, o_ref):
        ids = ids_ref[:]  # [E_cap]
        sel = (
            ids[:, None] == jax.lax.broadcasted_iota(jnp.int32, (E_cap, T), 1)
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
                    pl.BlockSpec((E_cap,), lambda i: (i,), memory_space=pltpu.VMEM),
                    pl.BlockSpec((T, W), lambda i: (i, 0), memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec(
                    (E_cap, W), lambda i: (i, 0), memory_space=pltpu.VMEM
                ),
            ),
            out_shape=jax.ShapeDtypeStruct((Tn * E_cap, W), jnp.float32),
        )(ids, t)

    ids = jnp.asarray(rng.integers(0, T, size=Tn * E_cap).astype(np.int32))
    return jax.jit(run), ids


for T, E_cap in [(2048, 256), (8192, 1024)]:
    for prec in [jax.lax.Precision.DEFAULT, jax.lax.Precision.HIGHEST]:
        fn, ids = make_onehot_gather(T, E_cap, prec)
        bench(f"onehot_gather_T{T}_E{E_cap}_{str(prec).split('.')[-1]}", fn, ids, tbl)

# ------------------------------------- one-hot scatter in-kernel (aliased)
def make_onehot_scatter(T, E_cap, precision):
    Tn = N // T

    def kernel(ids_ref, pay_ref, x_ref, o_ref):
        ids = ids_ref[:]
        sel = (
            ids[:, None] == jax.lax.broadcasted_iota(jnp.int32, (E_cap, T), 1)
        ).astype(jnp.float32)
        upd = jax.lax.dot_general(
            sel, pay_ref[:],
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=precision,
        )
        o_ref[:] = x_ref[:] + upd

    def run(t, ids, pay):
        return pl.pallas_call(
            kernel,
            grid_spec=pl.GridSpec(
                grid=(Tn,),
                in_specs=[
                    pl.BlockSpec((E_cap,), lambda i: (i,), memory_space=pltpu.VMEM),
                    pl.BlockSpec((E_cap, W), lambda i: (i, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((T, W), lambda i: (i, 0), memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((T, W), lambda i: (i, 0), memory_space=pltpu.VMEM),
            ),
            out_shape=jax.ShapeDtypeStruct((N, W), jnp.float32),
            input_output_aliases={2: 0},
        )(ids, pay, t)

    ids = jnp.asarray(rng.integers(0, T, size=Tn * E_cap).astype(np.int32))
    pay = jnp.asarray(rng.standard_normal((Tn * E_cap, W), dtype=np.float32))
    return jax.jit(run, donate_argnums=0), ids, pay


for prec in [jax.lax.Precision.DEFAULT, jax.lax.Precision.HIGHEST]:
    fn, ids, pay = make_onehot_scatter(2048, 256, prec)
    bench(f"onehot_scatter_T2048_E256_{str(prec).split('.')[-1]}", fn,
          fresh_table(), ids, pay, chain=True)

# --------------------------------------- VMEM loop / take gather (fixed)
def make_vmem_gather(T, E_cap, use_take):
    Tn = N // T

    def kernel(ids_ref, x_ref, o_ref):
        if use_take:
            o_ref[:] = jnp.take(x_ref[:], ids_ref[:], axis=0, fill_value=0.0)
        else:
            def body(j, _):
                o_ref[j, :] = x_ref[ids_ref[j], :]
                return 0

            jax.lax.fori_loop(0, E_cap, body, 0)

    def run(ids, t):
        return pl.pallas_call(
            kernel,
            grid_spec=pl.GridSpec(
                grid=(Tn,),
                in_specs=[
                    pl.BlockSpec((E_cap,), lambda i: (i,), memory_space=pltpu.VMEM),
                    pl.BlockSpec((T, W), lambda i: (i, 0), memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec(
                    (E_cap, W), lambda i: (i, 0), memory_space=pltpu.VMEM
                ),
            ),
            out_shape=jax.ShapeDtypeStruct((Tn * E_cap, W), jnp.float32),
        )(ids, t)

    ids = jnp.asarray(rng.integers(0, T, size=Tn * E_cap).astype(np.int32))
    return jax.jit(run), ids


fn, ids = make_vmem_gather(2048, 256, False)
bench("vmem_loop_gather_T2048_E256", fn, ids, tbl)
fn, ids = make_vmem_gather(2048, 256, True)
bench("vmem_take_gather_T2048_E256", fn, ids, tbl)

# ------------------------------- run DMA with more buffers + VMEM staging
NBUF = 64


def make_run_dma(L, stage_vmem):
    K = E // L

    def kernel(starts_ref, src, out, scratch, sems):
        def dma_in(j, slot):
            return pltpu.make_async_copy(
                src.at[pl.ds(starts_ref[j], L)],
                scratch.at[slot] if stage_vmem else out.at[pl.ds(j * L, L)],
                sems.at[slot],
            )

        if stage_vmem:
            def body(j, _):
                slot = jax.lax.rem(j, NBUF)

                @pl.when(j >= NBUF)
                def _():
                    # flush the previous occupant of this slot
                    pltpu.make_async_copy(
                        scratch.at[slot],
                        out.at[pl.ds((j - NBUF) * L, L)],
                        sems.at[slot],
                    ).wait()

                dma_in(j, slot).start()
                return 0

            # simplified: in-copies only (upper bound on read rate)
            def body2(j, _):
                slot = jax.lax.rem(j, NBUF)

                @pl.when(j >= NBUF)
                def _():
                    dma_in(j - NBUF, slot).wait()

                dma_in(j, slot).start()
                return 0

            jax.lax.fori_loop(0, K, body2, 0)

            def drain(t, _):
                j = K - NBUF + t

                @pl.when(j >= 0)
                def _():
                    dma_in(j, jax.lax.rem(j, NBUF)).wait()

                return 0

            jax.lax.fori_loop(0, NBUF, drain, 0)
            # touch scratch so the kernel has a visible output
            out_first = scratch[0]
            pltpu.make_async_copy(scratch.at[0], out.at[pl.ds(0, L)], sems.at[0]).start()
            pltpu.make_async_copy(scratch.at[0], out.at[pl.ds(0, L)], sems.at[0]).wait()
        else:
            def body(j, _):
                slot = jax.lax.rem(j, NBUF)

                @pl.when(j >= NBUF)
                def _():
                    dma_in(j - NBUF, slot).wait()

                dma_in(j, slot).start()
                return 0

            jax.lax.fori_loop(0, K, body, 0)

            def drain(t, _):
                j = K - NBUF + t

                @pl.when(j >= 0)
                def _():
                    dma_in(j, jax.lax.rem(j, NBUF)).wait()

                return 0

            jax.lax.fori_loop(0, NBUF, drain, 0)

    def run(starts, t):
        return pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(1,),
                in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
                out_specs=pl.BlockSpec(memory_space=pl.ANY),
                scratch_shapes=[
                    pltpu.VMEM((NBUF, L, W), jnp.float32),
                    pltpu.SemaphoreType.DMA((NBUF,)),
                ],
            ),
            out_shape=jax.ShapeDtypeStruct((E, W), jnp.float32),
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )(starts, t)

    starts = jnp.asarray((rng.integers(0, N - L, size=K) // 8 * 8).astype(np.int32))
    return jax.jit(run), starts


fn, starts = make_run_dma(64, False)
bench("run_dma_L64_NBUF64_hbm2hbm", fn, starts, tbl)
fn, starts = make_run_dma(64, True)
bench("run_dma_L64_NBUF64_hbm2vmem", fn, starts, tbl)

# ------------------------------------------- sorted-index XLA take variants
perm = jnp.asarray(rng.permutation(E).astype(np.int32))
xE = jnp.asarray(rng.standard_normal((E, W), dtype=np.float32))
srt = jnp.sort(perm)
take = jax.jit(lambda x, p: x[p])
bench("xla_take_sorted_idx", take, xE, srt)
take_s = jax.jit(lambda x, p: jnp.take(x, p, axis=0, indices_are_sorted=True))
bench("xla_take_sorted_hint", take_s, xE, srt)

print(json.dumps({"probe": "done"}), flush=True)
