"""Profile the pairwiseRank pair path on the real TPU: skeleton build,
host sampling, pure device epoch (per-round dispatch vs all-rounds-one-
dispatch on presampled planes).

Run: PYTHONPATH=/root/repo timeout 900 python scripts/prof_rank.py
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
from svdfeature_tpu.solvers.svdpp import (  # noqa: E402
    SVDPPFeatureTrainer, _pair_assemble_train,
)


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
    ("learning_rate", "0.005"), ("wd_user", "0.004"), ("wd_item", "0.004"),
    ("num_user", "943"), ("num_item", "1682"), ("num_global", "0"),
    ("num_factor", "64"), ("active_type", "3"), ("num_ufeedback", "1682"),
    ("wd_ufeedback", "0.004"), ("no_user_bias", "1"),
]


def make():
    tr = SVDPPFeatureTrainer(SVDTypeParam(format_type=1, active_type=3))
    for k, v in PP:
        tr.set_param(k, v)
    tr.init_model()
    tr.init_trainer()
    return tr


src = PairSource(train, IteratorConfig(), seed=10)
tr = make()
tr._apply_pair_layout()

t0 = time.time()
sk = tr._build_pair_skeleton(src)
emit(stage="skeleton_build", s=round(time.time() - t0, 3),
     T=sk["T"], GS=sk["GS"], G=sk["G"], M=sk["M"], Rr=sk["Rr"],
     use_pallas=sk["use_pallas"],
     fb_shapes={k: list(v.shape) for k, v in sk["fb"].items()})

# host sampling cost (current sequential path)
t0 = time.time()
for _ in range(5):
    pr, nr, _c = src.epoch_pairs()
emit(stage="epoch_pairs_x5", s=round(time.time() - t0, 3),
     per_round_ms=round((time.time() - t0) / 5 * 1000, 1))

t0 = time.time()
for _ in range(5):
    flats = tr._pair_flats(src, sk)
emit(stage="pair_flats_x5(incl sampling+device_put)",
     s=round(time.time() - t0, 3),
     per_round_ms=round((time.time() - t0) / 5 * 1000, 1))

# pure device epoch: per-round dispatches on a FIXED plane
fbh = tr._fbh()
kw = dict(hp=tr.hp, G=sk["G"], M=sk["M"], off_user=tr.model.off_user,
          off_item=tr.model.off_item, use_pallas=sk["use_pallas"])
lr1 = jnp.asarray([0.005], jnp.float32)
st = tr.state
st = _pair_assemble_train(st, flats[0], flats[1], lr1, tr.consts,
                          sk["dev"], sk["chunk_id"], sk["fb"],
                          sk["overlap"], fbh, **kw)
_ = float(np.asarray(st.w[:1, :1]).ravel()[0])  # sync
for rep in range(3):
    t0 = time.time()
    for _ in range(10):
        st = _pair_assemble_train(st, flats[0], flats[1], lr1, tr.consts,
                                  sk["dev"], sk["chunk_id"], sk["fb"],
                                  sk["overlap"], fbh, **kw)
    _ = float(np.asarray(st.w[:1, :1]).ravel()[0])
    emit(stage="device_epoch_per_round_x10", rep=rep,
         s=round(time.time() - t0, 3),
         per_round_ms=round((time.time() - t0) / 10 * 1000, 1))

# all-rounds-one-dispatch: R=10 rounds with tiled planes [R*T, GS]
R = 10
fp = jnp.tile(flats[0], (R, 1))
fn_ = jnp.tile(flats[1], (R, 1))
lrs = jnp.full((R,), 0.005, jnp.float32)
st = _pair_assemble_train(st, fp, fn_, lrs, tr.consts, sk["dev"],
                          sk["chunk_id"], sk["fb"], sk["overlap"], fbh, **kw)
_ = float(np.asarray(st.w[:1, :1]).ravel()[0])
for rep in range(3):
    t0 = time.time()
    st = _pair_assemble_train(st, fp, fn_, lrs, tr.consts, sk["dev"],
                              sk["chunk_id"], sk["fb"], sk["overlap"], fbh,
                              **kw)
    _ = float(np.asarray(st.w[:1, :1]).ravel()[0])
    emit(stage=f"device_R{R}_one_dispatch", rep=rep,
         s=round(time.time() - t0, 3),
         per_round_ms=round((time.time() - t0) / R * 1000, 1))

n_pairs = int(src.epoch_dataset().rows.num_row)
emit(stage="summary", pairs_per_round=n_pairs,
     note="examples/s = pairs_per_round / per_round_s")
