"""Big-table SVD++ epoch (ops/svdpp_big.py) on-device benchmark.

Synthetic KDD-Cup-shaped workload: 100k users x 200k items x 200k
feedback ids (500k-row unified table, far above ONEHOT_THRESHOLD),
k=64, ~20 rows/user.  One process, axon discipline: tiny-matmul health
check first, then solver-level rounds with value-fetch timing.

Run:  PYTHONPATH=/root/repo:/root/.axon_site timeout 1500 python scripts/bench_svdpp_big.py
"""

import json
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

SMALL = bool(int(os.environ.get("BENCH_SMALL", "0")))


def emit(**kw):
    print(json.dumps(kw), flush=True)


t0 = time.time()
x = jnp.ones((256, 256))
_ = float(np.asarray(jax.device_get((x @ x)[:1, :1])).ravel()[0])
emit(probe="health", devices=[str(d) for d in jax.devices()], s=round(time.time() - t0, 1))

from svdfeature_tpu.data.csr import CSRDataset, PlusBlock, PlusDataset  # noqa: E402
from svdfeature_tpu.params import SVDTypeParam  # noqa: E402
from svdfeature_tpu.solvers.svdpp import SVDPPFeatureTrainer  # noqa: E402

NU, NI, NF, K = (2000, 3000, 3000, 16) if SMALL else (100_000, 200_000, 200_000, 64)
USERS = 2000 if SMALL else 100_000
ROWS_MEAN = 20

rng = np.random.default_rng(0)
t0 = time.time()
counts = rng.poisson(ROWS_MEAN, USERS).clip(1, 64)
fbcounts = rng.integers(1, 12, USERS)
blocks = []
for u in range(USERS):
    n = int(counts[u])
    items = rng.integers(0, NI, n)
    row_ptr = np.zeros(3 * n + 1, np.int32)
    row_ptr[1:] = np.cumsum(np.tile([0, 1, 1], n))
    idx = np.empty(2 * n, np.uint32)
    idx[0::2] = u
    idx[1::2] = items
    data = CSRDataset(
        rng.integers(1, 6, n).astype(np.float32),
        row_ptr,
        idx,
        np.ones(2 * n, np.float32),
    )
    nfb = int(fbcounts[u])
    blocks.append(
        PlusBlock(
            rng.integers(0, NF, nfb).astype(np.uint32),
            np.ones(nfb, np.float32),
            data,
        )
    )
ds = PlusDataset.from_blocks(blocks)
EX = ds.rows.num_row
emit(probe="dataset", rows=EX, build_s=round(time.time() - t0, 1))

for G, M in ((256, 8), (512, 8), (256, 4)):
    tr = SVDPPFeatureTrainer(SVDTypeParam(format_type=1))
    for kk, vv in dict(
        num_user=NU, num_item=NI, num_ufeedback=NF, num_factor=K,
        base_score=3, learning_rate=0.005, wd_user=0.004, wd_item=0.004,
        wd_ufeedback=0.004, users_per_batch=G, rows_per_user=M,
        sort_blocks=1,
    ).items():
        tr.set_param(kk, str(vv))
    tr.init_model()
    tr.init_trainer()
    assert tr.hp.big_table or SMALL, tr.hp
    t0 = time.time()
    tr.update_rounds(ds, 1)  # pack + compile + 1 round
    _ = int(tr.state.step)
    warm = time.time() - t0
    R = 3
    t0 = time.time()
    tr.update_rounds(ds, R)
    _ = int(tr.state.step)
    dt = (time.time() - t0) / R
    emit(
        probe=f"svdpp_big_G{G}_M{M}", warm_s=round(warm, 1),
        ms_per_round=round(dt * 1e3, 1),
        metric="examples_per_sec", value=round(EX / dt),
    )
    del tr

emit(probe="done")
