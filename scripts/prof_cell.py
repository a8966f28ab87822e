"""Per-cell cost breakdown of the basicMF whole-run kernel's shapes:
one-hot build vs forward matmul vs payload scatter, B=4096, N=2626, k=64.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/prof_cell.py
"""

import json
import sys
import time
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")

t0 = time.time()
x = jnp.ones((256, 256))
_ = float(np.asarray(jax.device_get((x @ x)[:1, :1])).ravel()[0])
print(json.dumps({"probe": "health", "s": round(time.time() - t0, 1)}), flush=True)

B, N, k = 4096, 2626, 64
T, R = 23, 40  # grid cells per round x rounds (basicMF 40-round shape)
dn = (((1,), (0,)), ((), ()))
dnT = (((0,), (0,)), ((), ()))


def make(variant):
    def kernel(ui_ref, m_ref, out_ref, acc_ref):
        r = pl.program_id(0)
        t = pl.program_id(1)

        @pl.when((r == 0) & (t == 0))
        def _():
            acc_ref[0, 0] = 0.0  # SMEM scratch starts uninitialized

        ui = ui_ref[0, 0, :]
        iota = jax.lax.broadcasted_iota(jnp.int32, (2 * B, N), 1)
        E = (ui[:, None] == iota).astype(jnp.bfloat16)
        if variant == "onehot":
            # consume the FULL selector so the compiler cannot narrow the
            # [2B, N] build to one column (the reduction itself adds a
            # few us — the baseline slightly OVERSTATES the build cost)
            acc_ref[0, 0] += jnp.sum(E.astype(jnp.float32))
            return
        m = m_ref[:].astype(jnp.bfloat16)
        rows = jax.lax.dot_general(E, m, dn, preferred_element_type=jnp.float32)
        if variant == "forward":
            acc_ref[0, 0] += rows[0, 0]
            return
        # forward + payload scatter-matmul (the full step's matmul load)
        pay = jnp.concatenate(
            [rows[:, :k] * 0.001, jnp.ones((2 * B, 2), jnp.float32)], axis=1
        )
        out = jax.lax.dot_general(
            E, pay.astype(jnp.bfloat16), dnT, preferred_element_type=jnp.float32
        )
        if variant == "full":
            out_ref[:] = out_ref[:] + out[:, :k + 1]
            acc_ref[0, 0] += out[0, 0]
            return
        # "aux": add the real kernel's per-cell extras — score/loss maps,
        # split u/i halves, update + exp() row decay on the table window
        score = 3.0 + jnp.sum(rows[:B, :k] * rows[B:, :k], axis=1)
        err = (score - 4.0) * 0.001
        cnt = out[:, k + 1 : k + 2]
        upd = out_ref[:] + out[:, :k + 1]
        out_ref[:] = upd * jnp.exp(cnt * (-1e-5))
        acc_ref[0, 0] += jnp.sum(err[:1])

    grid = (R, T)
    ui_spec = pl.BlockSpec(
        (1, 1, 2 * B), lambda r, t: (t, 0, 0), memory_space=pltpu.VMEM
    )
    m_spec = pl.BlockSpec((N, k + 1), lambda r, t: (0, 0), memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((N, k + 1), lambda r, t: (0, 0), memory_space=pltpu.VMEM)

    def kern(ui_ref, m_ref, out_ref, acc_ref):
        kernel(ui_ref, m_ref, out_ref, acc_ref)

    f = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[ui_spec, m_spec],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((N, k + 1), jnp.float32),
        scratch_shapes=[pltpu.SMEM((1, 1), jnp.float32)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=128 * 1024 * 1024),
    )
    return jax.jit(f)


rng = np.random.default_rng(0)
ui = jnp.asarray(rng.integers(0, N - 1, (T, 1, 2 * B)).astype(np.int32))
m = jnp.asarray(rng.standard_normal((N, k + 1)).astype(np.float32) * 0.01)

for variant in ("onehot", "forward", "full", "aux"):
    f = make(variant)
    out = f(ui, m)
    _ = float(np.asarray(jax.device_get(out[:1, :1])).ravel()[0])
    times = []
    for _ in range(3):
        t0 = time.time()
        out = f(ui, m)
        _ = float(np.asarray(jax.device_get(out[:1, :1])).ravel()[0])
        times.append(time.time() - t0)
    best = min(times)
    print(
        json.dumps(
            {
                "variant": variant,
                "best_s": round(best, 4),
                "us_per_cell": round(best / (R * T) * 1e6, 1),
            }
        ),
        flush=True,
    )
