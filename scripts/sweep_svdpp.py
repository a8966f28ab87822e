"""Sweep SVD++ batch geometry (users_per_batch G, rows_per_user M) for the
Pallas fused kernel vs the jnp path — one process, one JSON-ish line per
config.  PYTHONPATH=/root/repo:/root/.axon_site python scripts/sweep_svdpp.py
"""

import gzip
import pathlib
import sys
import time

ROOT = pathlib.Path(__file__).parent.parent
sys.path.insert(0, str(ROOT))

import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

from svdfeature_tpu.data.text import load_plus_text
from svdfeature_tpu.params import SVDTypeParam
from svdfeature_tpu.solvers.svdpp import SVDPPFeatureTrainer
from svdfeature_tpu.ops.svdpp import train_epoch_plus
from svdfeature_tpu.ops.pallas_svdpp import (
    pallas_svdpp_supported,
    train_rounds_svdpp_pallas,
)


def fx(name):
    with gzip.open(ROOT / "tests/fixtures" / name, "rt") as f:
        return f.read()


PDS = load_plus_text(
    "x", "y",
    text=fx("ml100k.base.group.feature.gz"),
    feedback_text=fx("ml100k.base.feedback.gz"),
)
N_EX = PDS.rows.num_row
EPOCHS = 5


def run(G, M, time_jnp=True):
    tr = SVDPPFeatureTrainer(SVDTypeParam(format_type=1))
    for n, v in [
        ("base_score", "3"), ("learning_rate", "0.005"),
        ("wd_item", "0.004"), ("wd_user", "0.004"),
        ("num_item", "1682"), ("num_user", "943"),
        ("num_global", "0"), ("num_factor", "64"),
        ("wd_ufeedback", "0.004"), ("num_ufeedback", "1682"),
        ("sort_blocks", "1"), ("rows_per_user", str(M)),
        ("users_per_batch", str(G)),
    ]:
        tr.set_param(n, str(v))
    tr.init_model()
    tr.init_trainer()
    stacked, chunk_id, fb, _, overlap = tr._pack_plus(PDS)
    T, GS = stacked["label"].shape
    C, F = fb["fb_idx"].shape
    off_user = tr.model.off_user
    off_item = tr.model.off_item
    hp, consts = tr.hp, tr.consts
    lr = jnp.float32(tr.learning_rate)
    fbh = (
        tr.tparam.scale_lr_ufeedback,
        tr.tparam.wd_ufeedback,
        tr.tparam.wd_ufeedback_bias,
    )
    fill = N_EX / (T * GS)
    line = f"G={G:4d} M={M:2d} T={T:5d} GS={GS:5d} C={C} F={F} fill={fill:.2f}"
    if not pallas_svdpp_supported(hp, tr.state, stacked, fb, off_user):
        print(line + "  UNSUPPORTED", flush=True)
        return
    print(line + "  ...", flush=True)
    state0 = jax.tree.map(jnp.copy, tr.state)
    lrs = jnp.full((EPOCHS,), lr, jnp.float32)

    def time_pallas():
        stp = jax.tree.map(jnp.copy, state0)
        stp = train_rounds_svdpp_pallas(
            stp, stacked, chunk_id, fb, overlap, lrs, consts, hp,
            G, M, off_user, off_item, *fbh)
        _ = int(stp.step)
        best = None
        for _ in range(3):
            stp = jax.tree.map(jnp.copy, state0)
            t0 = time.time()
            stp = train_rounds_svdpp_pallas(
                stp, stacked, chunk_id, fb, overlap, lrs, consts, hp,
                G, M, off_user, off_item, *fbh)
            _ = int(stp.step)
            best = min(best or 9e9, time.time() - t0)
        return best

    dt_p = time_pallas()
    eps_p = EPOCHS * N_EX / dt_p
    out = line + f"  pallas {eps_p/1e6:6.2f}M ex/s ({dt_p/EPOCHS*1e3:.1f} ms/ep)"
    if time_jnp:
        st = jax.tree.map(jnp.copy, state0)
        st = train_epoch_plus(st, stacked, chunk_id, fb, overlap, lr,
                              consts, hp, *fbh, rows_per_user=M)
        _ = int(st.step)
        t0 = time.time()
        for _ in range(EPOCHS):
            st = train_epoch_plus(st, stacked, chunk_id, fb, overlap, lr,
                                  consts, hp, *fbh, rows_per_user=M)
        _ = int(st.step)
        dt_j = time.time() - t0
        out += f"  jnp {EPOCHS*N_EX/dt_j/1e6:6.2f}M ex/s"
    print(out, flush=True)


if __name__ == "__main__":
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("configs", nargs="*", default=["128x8", "256x8"])
    args = ap.parse_args()
    for spec in args.configs:
        G, M = (int(x) for x in spec.split("x"))
        try:
            run(G, M)
        except Exception as e:
            print(f"G={G} M={M} FAILED: {type(e).__name__}: {str(e)[:200]}",
                  flush=True)
