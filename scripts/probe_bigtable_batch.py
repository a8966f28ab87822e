"""Probe: bigTable (2M-row, k=64) examples/s vs batch size on the live
TPU — picks the batch bench.py should use.  Mirrors bench.bench_big."""
import sys
import time

import numpy as np

sys.path.insert(0, ".")
from svdfeature_tpu.data.csr import CSRDataset
from svdfeature_tpu.params import SVDTypeParam
from svdfeature_tpu.solvers.base import SVDFeatureTrainer

NU, NI, KF = 1_000_000, 1_048_576, 64
EX = 1 << 21
brng = np.random.default_rng(7)
uu = brng.integers(0, NU, EX).astype(np.uint32)
ii = brng.integers(0, NI, EX).astype(np.uint32)
labels = np.full(EX, 3.0, np.float32)
row_ptr = np.zeros(3 * EX + 1, np.int32)
row_ptr[1:] = np.cumsum(np.tile(np.array([0, 1, 1], np.int32), EX))
index = np.empty(2 * EX, np.uint32)
index[0::2] = uu
index[1::2] = ii
bds = CSRDataset(labels=labels, row_ptr=row_ptr, index=index,
                 value=np.ones(2 * EX, np.float32))

for B in (65536, 131072, 262144, 524288):
    tr = SVDFeatureTrainer(SVDTypeParam())
    for n, v in [("base_score", "3"), ("learning_rate", "0.005"),
                 ("wd_item", "0.004"), ("wd_user", "0.004"),
                 ("num_item", str(NI)), ("num_user", str(NU)),
                 ("num_factor", str(KF)), ("batch_size", str(B))]:
        tr.set_param(n, v)
    tr.init_model()
    tr.init_trainer()
    tr.update_rounds(bds, 1)  # compile + warm
    _ = int(tr.state.step)
    t0 = time.time()
    tr.update_rounds(bds, 3)
    _ = int(tr.state.step)
    d = time.time() - t0
    print(f"B={B:>7} path={'sweep' if tr.hp.sweep_table else 'dedup'} "
          f"ex/s={3 * EX / d:,.0f}", flush=True)
