"""Tile-sweep large-table update: pack-time sort plans + one-hot MXU tiles.

The sorted-dedup step (ops/big_embed.py) is latency-bound: every
row-granular primitive on this backend — XLA row gathers, compact takes,
per-row DMA — costs ~30-55 ns/row regardless of locality, capping the
big-table path at ~3M examples/s.  This module removes the row-granular
WRITE half for large batches: the batch's entry->row map is fixed across
rounds (training data is packed once), so the sort, the tile grouping
and the dedup structure are all computed ONCE on the host at pack time
(`make_sweep_plan`).  The runtime step then:

  1. runs the shared forward half (big_embed._forward_entries: native
     gathers for reads — TPU gathers are the cheap direction),
  2. permutes the payload into plan order with ONE compact take,
  3. sweeps the table tile-by-tile with a Pallas kernel: per grid cell a
     [E_CAP, TILE] one-hot built from pack-time local ids lands the
     cell's payload on the MXU (duplicate rows accumulate for free —
     no dedup pass at all), cells of the same tile accumulate in VMEM
     scratch, and the tile's LAST cell applies the regularization /
     clamp math of big_embed.train_step_big once and writes the tile
     back in place (input/output aliasing — the table is never copied).

Tiles are visited in sorted order (consecutive grid cells share a tile),
so the table moves at sequential-DMA bandwidth instead of per-row
latency.  Semantics are identical to train_step_big — same reference
citations (update_no_decay apex_svd_base.h:383-427, regularize modes
:188-310) — pinned by tests/test_tile_sweep.py.

When it wins: the sweep touches every tile holding at least one entry,
so it needs dense batches — entries-per-tile of order E_CAP (e.g.
B >= 256k on a 2M-row table).  The solver auto-selects it per workload
(solvers/base.py); sparse batches keep the sorted-dedup step.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Entries per grid cell.  1-D int32 blocks narrower than ~1024 lanes
# crash the remote Mosaic compiler (measured: 256 fails, 1024 works).
SWEEP_ECAP = 1024
# Table rows per tile (VMEM block height of the sweep).
SWEEP_TILE = 2048


# --------------------------------------------------------------------------
# pack-time plan
# --------------------------------------------------------------------------
def make_sweep_plan(ent_idx, n_pad_rows: int, tile: int, e_cap: int):
    """Host-side sweep plan for one batch's fixed entry->row map.

    ent_idx: [E] row id per entry, batch order (concat of u_idx.ravel()
    and i_idx.ravel() — must match big_embed._forward_entries).

    Returns numpy arrays:
      sw_tids [G]        tile index per grid cell; equal tiles are
                         consecutive (the kernel derives first/last
                         visit from transitions)
      sw_lids [G*e_cap]  row id local to the cell's tile, -1 = padding
      sw_src  [G*e_cap]  batch-order entry position feeding the cell's
                         payload row, E = padding (a zero payload row)
    """
    ent = np.asarray(ent_idx).reshape(-1).astype(np.int64)
    E = ent.shape[0]
    order = np.argsort(ent, kind="stable")
    si = ent[order]
    tl = si // tile
    uniq, counts = np.unique(tl, return_counts=True)
    cells_per = -(-counts // e_cap)
    G = int(cells_per.sum())
    tids = np.repeat(uniq, cells_per).astype(np.int32)
    lids = np.full(G * e_cap, -1, np.int32)
    src = np.full(G * e_cap, E, np.int32)
    run_start = np.repeat(np.concatenate([[0], np.cumsum(counts)[:-1]]), counts)
    r = np.arange(E, dtype=np.int64) - run_start
    cell_base = np.repeat(
        np.concatenate([[0], np.cumsum(cells_per)[:-1]]), counts
    )
    pos = (cell_base + r // e_cap) * e_cap + r % e_cap
    lids[pos] = (si - tl * tile).astype(np.int32)
    src[pos] = order.astype(np.int32)
    assert n_pad_rows % tile == 0
    return {"sw_tids": tids, "sw_lids": lids, "sw_src": src}


def attach_sweep_plans(batches, n_pad_rows: int, tile: int, e_cap: int):
    """Add stacked plan arrays to a stacked batch dict.

    batches["u_idx"]/["i_idx"] are [T, B, S]; per-batch plans are padded
    to a common cell count G with passthrough cells on the last (pad)
    tile — their finalize sees zero touch counts and rewrites the tile
    unchanged.
    """
    u = np.asarray(batches["u_idx"])
    i = np.asarray(batches["i_idx"])
    T = u.shape[0]
    E = u[0].size + i[0].size
    plans = [
        make_sweep_plan(
            np.concatenate([u[t].reshape(-1), i[t].reshape(-1)]),
            n_pad_rows,
            tile,
            e_cap,
        )
        for t in range(T)
    ]
    Gm = max(p["sw_tids"].shape[0] for p in plans)
    pad_tile = n_pad_rows // tile - 1
    tids = np.full((T, Gm), pad_tile, np.int32)
    lids = np.full((T, Gm * e_cap), -1, np.int32)
    src = np.full((T, Gm * e_cap), E, np.int32)
    for t, p in enumerate(plans):
        g = p["sw_tids"].shape[0]
        tids[t, :g] = p["sw_tids"]
        lids[t, : g * e_cap] = p["sw_lids"]
        src[t, : g * e_cap] = p["sw_src"]
    out = dict(batches)
    out["sw_tids"] = tids
    out["sw_lids"] = lids
    out["sw_src"] = src
    return out


# --------------------------------------------------------------------------
# the sweep kernel
# --------------------------------------------------------------------------
def _soft_threshold(w, lam):
    return jnp.sign(w) * jnp.maximum(jnp.abs(w) - lam, 0.0)


def _log1m(v):
    # pow parity trick from ops/pallas_embed.py: clamp so lr*wd == 1
    # yields factor 0 instead of -inf*0 = nan on untouched rows
    return jnp.log(jnp.maximum(1.0 - v, 1e-38))


def _make_sweep_kernel(hp, tile: int, e_cap: int, W: int):
    k = hp.num_factor
    m = hp.reg_method
    lazy = m >= 4

    def kernel(
        tids_ref, scal_ref, stepi_ref,  # scalar prefetch
        lids_ref, pay_ref, wdu_ref, wdi_ref, x_ref,
        o_ref, acc_ref,
    ):
        j = pl.program_id(0)
        G = pl.num_programs(0)
        t = tids_ref[j]
        prev = tids_ref[jnp.maximum(j - 1, 0)]
        nxt = tids_ref[jnp.minimum(j + 1, G - 1)]
        is_first = jnp.logical_or(j == 0, prev != t)
        is_last = jnp.logical_or(j == G - 1, nxt != t)

        # one-hot of pack-time local row ids; -1 padding matches nothing.
        # payload lanes [dw(k) | db | cnt_u | cnt_i | 0...]: the deltas
        # AND the touch counts accumulate in the same matmul.
        sel = (
            lids_ref[:][:, None]
            == jax.lax.broadcasted_iota(jnp.int32, (e_cap, tile), 1)
        ).astype(jnp.float32)
        delta = jax.lax.dot_general(
            sel,
            pay_ref[:],
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # [tile, W]

        @pl.when(is_first)
        def _():
            acc_ref[:] = delta

        @pl.when(jnp.logical_not(is_first))
        def _():
            acc_ref[:] = acc_ref[:] + delta

        # non-final visits write the tile back unchanged: idempotent
        # under any flush schedule, and same-tile x re-fetches stay valid
        @pl.when(jnp.logical_not(is_last))
        def _():
            o_ref[:] = x_ref[:]

        @pl.when(is_last)
        def _():
            x = x_ref[:]
            acc = acc_ref[:]
            lr = scal_ref[0]
            wd_ub = scal_ref[1]
            wd_ib = scal_ref[2]
            wdu = wdu_ref[:]
            wdi = wdi_ref[:]
            dw = acc[:, :k]
            db = acc[:, k]
            cu = acc[:, k + 1]
            ci = acc[:, k + 2]
            touched = (cu + ci) > 0.0
            x_w = x[:, :k]

            # --- factor rows: same math as big_embed.train_step_big ---
            if lazy:
                ref_bits = x[:, k + 1]
                el = (
                    stepi_ref[0]
                    - jax.lax.bitcast_convert_type(ref_bits, jnp.int32)
                ).astype(jnp.float32)
                lam = lr * jnp.where(cu > 0.0, wdu, wdi)
                if m == 4:
                    base = x_w * jnp.exp(el * _log1m(lam))[:, None]
                else:
                    base = _soft_threshold(x_w, (lam * el)[:, None])
                new_w = base + dw
                new_ref = jnp.where(
                    touched,
                    jax.lax.bitcast_convert_type(
                        jnp.broadcast_to(stepi_ref[0], (tile,)), jnp.float32
                    ),
                    ref_bits,
                )
            else:
                new_w = x_w + dw
                if m == 0:
                    fac = jnp.exp(
                        cu * _log1m(lr * wdu) + ci * _log1m(lr * wdi)
                    )
                    new_w = new_w * fac[:, None]
                elif m == 1:
                    new_w = _soft_threshold(
                        new_w, (lr * (wdu * cu + wdi * ci))[:, None]
                    )
                elif m == 2:
                    wd_row = jnp.where(cu > 0.0, wdu, wdi)
                    sq = jnp.sum(new_w * new_w, axis=1)
                    scale = jnp.where(
                        sq > wd_row,
                        jnp.sqrt(wd_row / jnp.maximum(sq, 1e-30)),
                        1.0,
                    )
                    new_w = new_w * scale[:, None]
                elif m == 3:
                    new_w = _soft_threshold(new_w, (lr * wdu * cu)[:, None])
                    new_w = new_w * jnp.exp(ci * _log1m(lr * wdi))[:, None]
                else:
                    raise ValueError(f"unknown reg_method {m}")
                new_ref = x[:, k + 1]
            if hp.user_nonnegative:
                new_w = jnp.where(
                    (cu > 0.0)[:, None], jnp.maximum(new_w, 0.0), new_w
                )
            if hp.item_nonnegative:
                new_w = jnp.where(
                    (ci > 0.0)[:, None], jnp.maximum(new_w, 0.0), new_w
                )

            # --- bias lane ---
            logb = ci * _log1m(lr * wd_ib)
            if not hp.no_user_bias:
                logb = logb + cu * _log1m(lr * wd_ub)
            new_b = (x[:, k] + db) * jnp.exp(logb)

            out = jnp.concatenate(
                [new_w, new_b[:, None], new_ref[:, None], x[:, k + 2 :]],
                axis=1,
            )
            o_ref[:] = jnp.where(touched[:, None], out, x)

    return kernel


def _interpret() -> bool:
    from .embed import default_device_is_tpu

    return not default_device_is_tpu()


def sweep_update(w, tids, lids, pay_plan, wdu, wdi, scal, stepi, hp):
    """In-place tile sweep: apply plan-ordered payloads to the table.

    w        [n_pad, W]    augmented table, n_pad % sweep_tile == 0
    tids     [G]           plan tile per grid cell
    lids     [G*e_cap]     plan local row ids
    pay_plan [G*e_cap, W]  plan-ordered payload rows
    wdu/wdi  [n_pad]       per-row weight-decay tables (padded)
    scal     [4] f32       (lr, wd_user_bias, wd_item_bias, 0)
    stepi    [1] i32       pre-batch sample counter (lazy modes)
    """
    n_pad, W = w.shape
    tile = hp.sweep_tile
    e_cap = hp.sweep_ecap
    G = tids.shape[0]
    kernel = _make_sweep_kernel(hp, tile, e_cap, W)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(G,),
        in_specs=[
            pl.BlockSpec((e_cap,), lambda j, t, s, p: (j,), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (e_cap, W), lambda j, t, s, p: (j, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (tile,), lambda j, t, s, p: (t[j],), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (tile,), lambda j, t, s, p: (t[j],), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (tile, W), lambda j, t, s, p: (t[j], 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (tile, W), lambda j, t, s, p: (t[j], 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[pltpu.VMEM((tile, W), jnp.float32)],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_pad, W), jnp.float32),
        # operand numbering includes the scalar-prefetch args:
        # tids(0) scal(1) stepi(2) lids(3) pay(4) wdu(5) wdi(6) x(7)
        input_output_aliases={7: 0},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=_interpret(),
    )(tids, scal, stepi, lids, pay_plan, wdu, wdi, w)


@partial(jax.jit, static_argnames=("hp",), donate_argnames=("state",))
def train_step_sweep(state, batch, lr, consts, hp):
    """train_step_big semantics with the tile-sweep write path.

    Requires the sweep plan in the batch dict (attach_sweep_plans), the
    augmented table padded to a multiple of hp.sweep_tile, and consts
    row tables padded to match (solvers/base.py arranges both).
    """
    from .big_embed import _forward_entries
    from .embed import TrainState

    w = state.w
    n_pad, W = w.shape
    k = hp.num_factor
    assert 0 < k + 3 <= W, "sweep payload needs k+3 lanes"
    assert n_pad % hp.sweep_tile == 0

    g, ref_g, ent_idx, payload, _ru, _ri, _wu, _wi, nstep, _err, _pi = (
        _forward_entries(state, batch, lr, consts, hp)
    )
    E = ent_idx.shape[0]
    pay = jnp.zeros((E + 1, W), jnp.float32).at[:E, : k + 3].set(payload)
    pay_plan = pay[batch["sw_src"]]  # the ONE remaining row-granular op
    scal = jnp.stack(
        [
            lr.astype(jnp.float32),
            consts.wd_user_bias.astype(jnp.float32),
            consts.wd_item_bias.astype(jnp.float32),
            jnp.float32(0.0),
        ]
    )
    stepi = state.step[None].astype(jnp.int32)
    w = sweep_update(
        w,
        batch["sw_tids"],
        batch["sw_lids"],
        pay_plan,
        consts.wd_u_row,
        consts.wd_i_row,
        scal,
        stepi,
        hp,
    )
    return TrainState(
        w=w, b=state.b, g=g, step=nstep, ref_ui=state.ref_ui, ref_g=ref_g
    )
