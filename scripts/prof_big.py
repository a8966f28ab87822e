"""bigTable step breakdown at bench scale (2M rows, k=64, B=2^19):
gathers vs payload-take vs sweep kernel vs whole step.

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 1200 python scripts/prof_big.py
"""

import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")


def emit(**kw):
    print(json.dumps(kw), flush=True)


t0 = time.time()
x = jnp.ones((256, 256))
_ = float(np.asarray(jax.device_get((x @ x)[:1, :1])).ravel()[0])
emit(probe="health", dev=str(jax.devices()[0]), s=round(time.time() - t0, 1))

from svdfeature_tpu.data.csr import CSRDataset  # noqa: E402
from svdfeature_tpu.params import SVDTypeParam  # noqa: E402
from svdfeature_tpu.solvers.base import SVDFeatureTrainer  # noqa: E402

NU, NI, KF = 1_000_000, 1_048_576, 64
EX = 1 << 21
brng = np.random.default_rng(7)
uu = brng.integers(0, NU, EX).astype(np.uint32)
ii = brng.integers(0, NI, EX).astype(np.uint32)
labels = 3.0 + brng.standard_normal(EX).astype(np.float32) * 0.1
row_ptr = np.zeros(3 * EX + 1, np.int32)
row_ptr[1:] = np.cumsum(np.tile(np.array([0, 1, 1], np.int32), EX))
index = np.empty(2 * EX, np.uint32)
index[0::2] = uu
index[1::2] = ii
bds = CSRDataset(labels=labels, row_ptr=row_ptr, index=index,
                 value=np.ones(2 * EX, np.float32))

tr = SVDFeatureTrainer(SVDTypeParam())
for k, v in [("base_score", "3"), ("learning_rate", "0.005"),
             ("wd_item", "0.004"), ("wd_user", "0.004"),
             ("num_item", str(NI)), ("num_user", str(NU)),
             ("num_factor", str(KF)), ("batch_size", str(1 << 19))]:
    tr.set_param(k, str(v))
tr.init_model()
tr.init_trainer()
tr.update_rounds(bds, 1)  # compile + warm
_ = int(tr.state.step)
emit(stage="warm", sweep=bool(tr.hp.sweep_table), row_dma=bool(tr.hp.row_dma))

# whole rounds
for rep in range(3):
    t0 = time.time()
    tr.update_rounds(bds, 1)
    _ = int(tr.state.step)
    dt = time.time() - t0
    emit(stage="round", rep=rep, s=round(dt, 3), ex_per_s=round(EX / dt))

# component: batch arrays
entry = tr._pack(bds)
batches = entry[0] if isinstance(entry, tuple) else entry
emit(stage="packed", kind=str(type(batches))[:80])

# raw gather cost at this scale
B = 1 << 19
W = tr.state.w.shape[1]
idx = jax.device_put(np.random.default_rng(0).integers(0, NU, (B, 1)).astype(np.int32))
from svdfeature_tpu.ops.big_embed import gather_rows  # noqa: E402

gj = jax.jit(lambda w, i: gather_rows(w, i, row_dma=tr.hp.row_dma))
r = gj(tr.state.w, idx)
jax.block_until_ready(r)
for rep in range(2):
    t0 = time.time()
    r = gj(tr.state.w, idx)
    jax.block_until_ready(r)
    emit(stage="gather_rows", rep=rep, ms=round((time.time() - t0) * 1e3, 1),
         ns_per_row=round((time.time() - t0) / B * 1e9, 1), W=W)

gj2 = jax.jit(lambda w, i: gather_rows(w, i, row_dma=False))
r = gj2(tr.state.w, idx)
jax.block_until_ready(r)
for rep in range(2):
    t0 = time.time()
    r = gj2(tr.state.w, idx)
    jax.block_until_ready(r)
    emit(stage="gather_rows_xla", rep=rep, ms=round((time.time() - t0) * 1e3, 1),
         ns_per_row=round((time.time() - t0) / B * 1e9, 1))

# ---- piecewise: forward_entries / pay take / sweep_update ----------------
from functools import partial
from svdfeature_tpu.ops.big_embed import _forward_entries
from svdfeature_tpu.ops.tile_sweep import sweep_update

# grab one real packed batch
bt = None
packed = tr._pack(bds)
bl = packed[0] if isinstance(packed, tuple) else packed
emit(stage="pack_keys", keys=sorted(list(bl.keys()))[:12] if hasattr(bl, "keys") else str(type(bl)))
