"""Pair-epoch geometry sweep on TPU: device epoch time vs
(users_per_batch, rank_rows_per_user).

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 1200 python scripts/prof_rank2.py
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


def probe(upb, m):
    tr = SVDPPFeatureTrainer(SVDTypeParam(format_type=1, active_type=3))
    for k, v in PP + [("users_per_batch", str(upb)),
                      ("rank_rows_per_user", str(m))]:
        tr.set_param(k, v)
    tr.init_model()
    tr.init_trainer()
    tr._apply_pair_layout()
    src = PairSource(train, IteratorConfig(), seed=10)
    sk = tr._build_pair_skeleton(src)
    if not sk["use_pallas"]:
        emit(upb=upb, m=m, note="pallas unsupported", T=sk["T"], GS=sk["GS"])
        return
    flats = tr._pair_flats(src, sk)
    fbh = tr._fbh()
    kw = dict(hp=tr.hp, G=sk["G"], M=sk["M"], off_user=tr.model.off_user,
              off_item=tr.model.off_item, use_pallas=True)
    lr1 = jnp.asarray([0.005], jnp.float32)
    st = _pair_assemble_train(tr.state, flats[0], flats[1], lr1, tr.consts,
                              sk["dev"], sk["chunk_id"], sk["fb"],
                              sk["overlap"], fbh, **kw)
    _ = float(np.asarray(st.w[:1, :1]).ravel()[0])
    best = None
    for _rep in range(2):
        t0 = time.time()
        for _ in range(10):
            st = _pair_assemble_train(st, flats[0], flats[1], lr1, tr.consts,
                                      sk["dev"], sk["chunk_id"], sk["fb"],
                                      sk["overlap"], fbh, **kw)
        _ = float(np.asarray(st.w[:1, :1]).ravel()[0])
        d = (time.time() - t0) / 10
        best = d if best is None else min(best, d)
    emit(upb=upb, m=m, T=sk["T"], GS=sk["GS"], C=int(sk["fb"]["fb_idx"].shape[0]),
         F=int(sk["fb"]["fb_idx"].shape[1]),
         per_round_ms=round(best * 1000, 1),
         eps=round(149718 / best))


for upb, m in [(128, 8), (256, 8), (64, 8), (128, 16), (256, 16),
               (512, 8), (128, 4)]:
    try:
        probe(upb, m)
    except Exception as e:
        emit(upb=upb, m=m, error=str(e)[:200])
