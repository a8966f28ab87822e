"""Pallas per-row DMA kernels for large embedding tables.

XLA's TPU scatter lowers to a serialized update loop (~1 s for 8k rows
into a 2M x 64 table, measured on v5e); these kernels replace it with
pipelined per-row async DMA copies, updating the table IN PLACE via
input/output aliasing — the table is never copied.

``row_writer`` is a write-only scatter: the caller computes the final
row values (old + delta, decayed, clamped — ops/big_embed.py) and the
kernel just lands them.  Targets must be unique except for a designated
dummy row that only ever receives zeros — concurrent identical writes
are benign.  This is the TPU replacement for the reference's
update_no_decay row writes (apex_svd_base.h:383-427) at table sizes
where neither one-hot matmuls nor XLA scatters work.

``row_reader`` is the mirrored gather (kept for completeness /
benchmarks; the forward path uses XLA's native gather, which is fast).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# DMA pipeline depth: enough in-flight copies to hide HBM latency while
# the scalar core issues the next descriptors.
NBUF = 16

# Scalar-prefetch operands live in SMEM (1 MiB/core on v5e).  A single
# call's index operand must fit with room to spare — at KDD-scale batch
# sizes (bench.py B=2^19 -> E=2^20 entries) one int32 index array alone
# is 4 MiB and the compile fails with "would exceed memory (space=smem)".
# The wrappers below therefore split large calls into slices of at most
# EMAX rows (512 KiB of int32 each); slices chain through the aliased
# table inside one jit, so this costs only kernel-issue overhead.
EMAX = 131_072


def _writer_kernel(idx_ref, vals_ref, w_in, w_out, sems):
    """For j in [E): DMA vals[j] -> w[idx[j]].  w_in is aliased to w_out
    (in-place); vals and the table both stay in HBM (HBM->HBM row DMAs)."""
    E = vals_ref.shape[0]

    def dma(j):
        return pltpu.make_async_copy(
            vals_ref.at[j], w_out.at[idx_ref[j]], sems.at[jax.lax.rem(j, NBUF)]
        )

    def body(j, _):
        @pl.when(j >= NBUF)
        def _():
            dma(j - NBUF).wait()

        dma(j).start()
        return 0

    jax.lax.fori_loop(0, E, body, 0)

    def drain(t, _):
        j = E - NBUF + t

        @pl.when(j >= 0)
        def _():
            dma(j).wait()

        return 0

    jax.lax.fori_loop(0, NBUF, drain, 0)


def _row_writer_one(w: jax.Array, idx: jax.Array, vals: jax.Array) -> jax.Array:
    n, k = w.shape
    return pl.pallas_call(
        _writer_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(1,),
            in_specs=[
                # vals stay in HBM: VMEM slices must be 128-lane aligned,
                # HBM->HBM row DMAs have no such constraint
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            scratch_shapes=[pltpu.SemaphoreType.DMA((NBUF,))],
        ),
        out_shape=jax.ShapeDtypeStruct((n, k), w.dtype),
        input_output_aliases={2: 0},  # (idx, vals, w) -> w aliased in place
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(idx, vals, w)


@partial(jax.jit, donate_argnums=(0,))
def row_writer(w: jax.Array, idx: jax.Array, vals: jax.Array) -> jax.Array:
    """w[idx[j]] = vals[j] in place.  idx must be unique apart from a
    dummy row receiving only zeros.  Returns the (aliased) table.

    Calls above EMAX rows are split into SMEM-sized slices (see EMAX);
    slices target disjoint row sets (apart from the zero-write dummy
    row), so chaining them through the aliased table is exact."""
    (e,) = idx.shape
    for s in range(0, e, EMAX):
        w = _row_writer_one(w, idx[s : s + EMAX], vals[s : s + EMAX])
    return w


def _reader_kernel(idx_ref, w_ref, out_ref, sems):
    E = out_ref.shape[0]

    def dma(j):
        return pltpu.make_async_copy(
            w_ref.at[idx_ref[j]], out_ref.at[j], sems.at[jax.lax.rem(j, NBUF)]
        )

    def body(j, _):
        @pl.when(j >= NBUF)
        def _():
            dma(j - NBUF).wait()

        dma(j).start()
        return 0

    jax.lax.fori_loop(0, E, body, 0)

    def drain(t, _):
        j = E - NBUF + t

        @pl.when(j >= 0)
        def _():
            dma(j).wait()

        return 0

    jax.lax.fori_loop(0, NBUF, drain, 0)


def _row_reader_one(w: jax.Array, idx: jax.Array) -> jax.Array:
    n, k = w.shape
    (e,) = idx.shape
    return pl.pallas_call(
        _reader_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            scratch_shapes=[pltpu.SemaphoreType.DMA((NBUF,))],
        ),
        out_shape=jax.ShapeDtypeStruct((e, k), w.dtype),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(idx, w)


@jax.jit
def row_reader(w: jax.Array, idx: jax.Array) -> jax.Array:
    """out[j] = w[idx[j]] via per-row DMA (HBM->HBM).  Split into
    SMEM-sized slices above EMAX rows (see EMAX)."""
    (e,) = idx.shape
    if e <= EMAX:
        return _row_reader_one(w, idx)
    return jnp.concatenate(
        [_row_reader_one(w, idx[s : s + EMAX]) for s in range(0, e, EMAX)]
    )
