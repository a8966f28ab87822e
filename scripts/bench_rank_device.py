"""pairwiseRank on-device benchmark: device-sampled whole-run vs host
skeleton rounds, plus a P@20 quality gate through the real demo pipeline.

One process, axon discipline: tiny-matmul health check first, CLI mains
called in-process (a subprocess would re-init the remote backend).

Run:  PYTHONPATH=/root/repo:/root/.axon_site timeout 1800 python scripts/bench_rank_device.py
"""

import gzip
import json
import os
import pathlib
import sys
import tempfile
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

REPO = pathlib.Path("/root/repo")
FIX = REPO / "tests" / "fixtures"
ROUNDS = 40


def emit(**kw):
    print(json.dumps(kw), flush=True)


t0 = time.time()
x = jnp.ones((256, 256))
_ = float(np.asarray(jax.device_get((x @ x)[:1, :1])).ravel()[0])
emit(probe="health", devices=[str(d) for d in jax.devices()], s=round(time.time() - t0, 1))

from svdfeature_tpu.data.rank import PairSource  # noqa: E402
from svdfeature_tpu.data.registry import IteratorConfig  # noqa: E402
from svdfeature_tpu.data.text import load_plus_text  # noqa: E402
from svdfeature_tpu.params import SVDTypeParam, svd_type  # noqa: E402
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
    ("learning_rate", "0.005"), ("wd_user", "0.004"), ("wd_item", "0.004"),
    ("num_user", "943"), ("num_item", "1682"), ("num_global", "0"),
    ("num_factor", "64"), ("active_type", "3"), ("num_ufeedback", "1682"),
    ("wd_ufeedback", "0.004"), ("no_user_bias", "1"),
]
n_pairs = PairSource(train, IteratorConfig()).epoch_dataset().rows.num_row
emit(workload="ml100k.rank", pairs_per_round=n_pairs)


def run(rounds, device_sample):
    src = PairSource(train, IteratorConfig(), seed=10)
    tr = SVDPPFeatureTrainer(
        SVDTypeParam(format_type=1, active_type=3)
    )
    for k, v in [("format_type", "1"), ("active_type", "3")] + PP + [
        ("rank_device_sample", str(device_sample))
    ]:
        tr.set_param(k, v)
    tr.init_model()
    tr.init_trainer()
    tr.update_rounds(src, rounds)
    jax.block_until_ready(tr.state.w)
    return tr


for ds_flag, name in [(1, "device_sampled"), (0, "host_skeleton")]:
    t0 = time.time()
    run(1, ds_flag)
    compile_s = time.time() - t0
    dt = None
    for _ in range(2):
        t0 = time.time()
        tr = run(ROUNDS, ds_flag)
        d = time.time() - t0
        dt = d if dt is None else min(dt, d)
    emit(
        variant=name,
        rounds=ROUNDS,
        compile_s=round(compile_s, 2),
        train_s=round(dt, 3),
        examples_per_sec=round(ROUNDS * n_pairs / dt),
        w_finite=bool(np.isfinite(np.asarray(tr.state.w)).all()),
    )

# ---- quality gate: full demo pipeline on TPU, P@20 vs the golden 0.1648
from svdfeature_tpu.cli import make_ugroup_buffer, svd_feature, svd_feature_infer  # noqa: E402

golden = json.loads((REPO / "golden" / "GOLDEN.json").read_text())
want_p20 = golden["pairwiseRank"]["precision_at_20"]
demo = REPO / "demo" / "pairwiseRank"
with tempfile.TemporaryDirectory() as td:
    run_dir = pathlib.Path(td)
    (run_dir / "pairwiseRank.conf").write_text(
        (demo / "pairwiseRank.conf").read_text()
    )
    for src, dst in [
        ("ml100k.rank.base.feature.gz", "ua.base.rank.feature"),
        ("ml100k.rank.base.feedback.gz", "ua.base.rank.feedback"),
        ("ml100k.rank.test.feature.gz", "ua.test.rank.feature"),
        ("ml100k.rank.test.feedback.gz", "ua.test.rank.feedback"),
    ]:
        (run_dir / dst).write_text(fx(src))
    cwd = os.getcwd()
    os.chdir(run_dir)
    try:
        t0 = time.time()
        make_ugroup_buffer.main([
            "ua.base.rank.feature", "buffer.base.svdpp",
            "-fd", "ua.base.rank.feedback", "-scale_score", "5",
        ])
        make_ugroup_buffer.main([
            "ua.test.rank.feature", "buffer.test.svdpp",
            "-fd", "ua.test.rank.feedback", "-scale_score", "1",
            "-max_block", "400",
        ])
        svd_feature.main(["pairwiseRank.conf", "num_round=40"])
        svd_feature_infer.main(["pairwiseRank.conf", "pred=40"])
        pipeline_s = time.time() - t0
        lines = (run_dir / "pred.txt").read_text().split()
        p20 = sum(1 for v in lines if int(v) < 20) / (943 * 20.0)
    finally:
        os.chdir(cwd)
emit(
    quality="demo_pipeline_tpu",
    pipeline_s=round(pipeline_s, 1),
    precision_at_20=round(p20, 4),
    golden_p20=want_p20,
    ok=bool(abs(p20 - want_p20) < 0.003),
)
