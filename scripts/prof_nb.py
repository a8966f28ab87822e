"""neighborhoodModel vs basicMF warm round cost on the real TPU: where
does num_global=6 spend 40% of the throughput?

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 1200 python scripts/prof_nb.py
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

from svdfeature_tpu.data.text import load_feature_text  # noqa: E402
from svdfeature_tpu.params import SVDTypeParam  # noqa: E402
from svdfeature_tpu.solvers.base import SVDFeatureTrainer  # noqa: E402


def fx(name):
    with gzip.open(FIX / name, "rt") as f:
        return f.read()


BASIC = [
    ("base_score", "3"), ("learning_rate", "0.005"),
    ("wd_item", "0.004"), ("wd_user", "0.004"),
    ("num_item", "1682"), ("num_user", "943"),
    ("num_global", "0"), ("num_factor", "64"), ("batch_size", "4096"),
]


def bench(name, fname, extra):
    tds = load_feature_text("x", text=fx(fname))
    p = [kv for kv in BASIC if kv[0] not in dict(extra)] + extra
    tr = SVDFeatureTrainer(SVDTypeParam())
    for k, v in p:
        tr.set_param(k, str(v))
    tr.init_model()
    tr.init_trainer()
    tr.update_rounds(tds, 40)
    _ = int(tr.state.step)
    times = []
    for _ in range(3):
        tr2 = SVDFeatureTrainer(SVDTypeParam())
        for k, v in p:
            tr2.set_param(k, str(v))
        tr2.init_model()
        tr2.init_trainer()
        tr2._pack(tds)
        t0 = time.time()
        tr2.update_rounds(tds, 40)
        _ = int(tr2.state.step)
        times.append(time.time() - t0)
    ts = sorted(times)
    emit(workload=name, best_s=round(ts[0], 3), times=[round(t, 3) for t in times],
         ex_per_s=round(40 * tds.num_row / ts[0]),
         ms_per_round=round(ts[0] / 40 * 1e3, 2),
         pallas=bool(getattr(tr, "_pallas_rounds_ok", None)))
    return tr


bench("basicMF", "ml100k.base.feature.gz", [])
bench("neighborhood", "ml100k.base.nb.feature.gz",
      [("num_global", "6"), ("wd_global", "0.001")])
# control: same nb data but num_global=6 with global entries present —
# vs the same file trained WITHOUT globals?  (nb features include global
# ids per row; num_global=0 would error) — instead run basicMF data with
# num_global=6 configured (empty g planes): isolates the g-SEGMENT cost
# from the data difference.
bench("basic_g6", "ml100k.base.feature.gz",
      [("num_global", "6"), ("wd_global", "0.001")])
