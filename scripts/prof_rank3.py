"""End-to-end pairwiseRank timing on the real TPU with the multi-round
host-sampled path (solvers/svdpp._train_pair_rounds_host) — the same
40-round workload bench.py measures.

Run: PYTHONPATH=/root/repo timeout 1200 python scripts/prof_rank3.py
"""

import gzip
import json
import pathlib
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

REPO = pathlib.Path("/root/repo")
FIX = REPO / "tests" / "fixtures"


def emit(**kw):
    print(json.dumps(kw), flush=True)


t0 = time.time()
x = jnp.ones((256, 256))
_ = float(np.asarray(jax.device_get((x @ x)[:1, :1])).ravel()[0])
emit(probe="health", dev=str(jax.devices()[0]), s=round(time.time() - t0, 1))

from svdfeature_tpu.data.rank import PairSource  # noqa: E402
from svdfeature_tpu.data.registry import IteratorConfig  # noqa: E402
from svdfeature_tpu.data.text import load_plus_text  # noqa: E402
from svdfeature_tpu.params import SVDTypeParam  # noqa: E402
from svdfeature_tpu.solvers.svdpp import SVDPPFeatureTrainer  # noqa: E402


def fx(name):
    with gzip.open(FIX / name, "rt") as f:
        return f.read()


train = load_plus_text(
    "x", "y",
    text=fx("ml100k.rank.base.feature.gz"),
    feedback_text=fx("ml100k.rank.base.feedback.gz"),
    scale_score=5,
)
PP = [
    ("learning_rate", "0.005"), ("wd_user", "0.004"),
    ("wd_item", "0.004"), ("num_user", "943"),
    ("num_item", "1682"), ("num_global", "0"),
    ("num_factor", "64"), ("active_type", "3"),
    ("num_ufeedback", "1682"), ("wd_ufeedback", "0.004"),
    ("no_user_bias", "1"),
]
ROUNDS = 40


def run(rounds):
    src = PairSource(train, IteratorConfig(), seed=10)
    tr = SVDPPFeatureTrainer(SVDTypeParam(format_type=1, active_type=3))
    for k, v in PP:
        tr.set_param(k, v)
    tr.init_model()
    tr.init_trainer()
    tr.update_rounds(src, rounds)
    _ = int(tr.state.step)
    return tr


t0 = time.time()
tr = run(1)
emit(stage="compile1", s=round(time.time() - t0, 1),
     path="multi" if (tr._pair_sk and "geo" in tr._pair_sk) else "other")
n_pairs = PairSource(train, IteratorConfig()).epoch_dataset().rows.num_row
for rep in range(3):
    t0 = time.time()
    tr = run(ROUNDS)
    dt = time.time() - t0
    emit(rep=rep, s=round(dt, 3),
         ex_per_s=round(ROUNDS * n_pairs / dt),
         vs_ref=round(ROUNDS * n_pairs / dt / 2891998, 2),
         path="multi" if (tr._pair_sk and "geo" in tr._pair_sk) else "other")
