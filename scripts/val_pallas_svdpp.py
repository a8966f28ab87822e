"""Validate + time ops/pallas_svdpp.train_rounds_svdpp_pallas against the
jnp path (ops/svdpp.train_epoch_plus) on the ML-100K implicitFeedback
workload.  Run on the real TPU:

  PYTHONPATH=/root/repo:/root/.axon_site python scripts/val_pallas_svdpp.py
"""

import gzip
import pathlib
import sys
import time

ROOT = pathlib.Path(__file__).parent.parent
sys.path.insert(0, str(ROOT))

import jax
import jax.numpy as jnp
import numpy as np

from svdfeature_tpu.data.text import load_plus_text
from svdfeature_tpu.params import SVDTypeParam
from svdfeature_tpu.solvers.svdpp import SVDPPFeatureTrainer
from svdfeature_tpu.ops.svdpp import train_epoch_plus, predict_batches_plus
from svdfeature_tpu.ops.pallas_svdpp import (
    pallas_svdpp_supported,
    train_rounds_svdpp_pallas,
)


def fx(name):
    with gzip.open(ROOT / "tests/fixtures" / name, "rt") as f:
        return f.read()


def rmse(pred, labels):
    d = np.asarray(pred) - np.asarray(labels)
    return float(np.sqrt(np.mean(d * d)))


def main(rows_per_user=8, sort_blocks=1, R=40, time_epochs=5):
    pds = load_plus_text(
        "x", "y",
        text=fx("ml100k.base.group.feature.gz"),
        feedback_text=fx("ml100k.base.feedback.gz"),
    )
    eds = load_plus_text(
        "x", "y",
        text=fx("ml100k.test.ug.feature.gz"),
        feedback_text=fx("ml100k.test.feedback.gz"),
    )
    params = [
        ("base_score", "3"), ("learning_rate", "0.005"),
        ("wd_item", "0.004"), ("wd_user", "0.004"),
        ("num_item", "1682"), ("num_user", "943"),
        ("num_global", "0"), ("num_factor", "64"),
        ("wd_ufeedback", "0.004"), ("num_ufeedback", "1682"),
        ("sort_blocks", str(sort_blocks)), ("rows_per_user", str(rows_per_user)),
    ]
    tr = SVDPPFeatureTrainer(SVDTypeParam(format_type=1))
    for n, v in params:
        tr.set_param(n, str(v))
    tr.init_model()
    tr.init_trainer()

    stacked, chunk_id, fb, perm, overlap = tr._pack_plus(pds)
    M = tr.rows_per_user
    T, GS = stacked["label"].shape
    G = GS // M
    off_user = tr.model.off_user
    off_item = tr.model.off_item
    hp, consts = tr.hp, tr.consts
    lr = jnp.float32(tr.learning_rate)
    fbh = (
        tr.tparam.scale_lr_ufeedback,
        tr.tparam.wd_ufeedback,
        tr.tparam.wd_ufeedback_bias,
    )
    N, k = tr.state.w.shape
    print(f"T={T} GS={GS} G={G} M={M} N={N} k={k} off_user={off_user} "
          f"C={fb['fb_idx'].shape[0]} F={fb['fb_idx'].shape[1]}")
    ok = pallas_svdpp_supported(hp, tr.state, stacked, fb, off_user)
    print("supported:", ok)
    if not ok:
        return

    state0 = jax.tree.map(jnp.copy, tr.state)

    # ---- jnp path, R rounds
    st = jax.tree.map(jnp.copy, state0)
    for _ in range(R):
        st = train_epoch_plus(
            st, stacked, chunk_id, fb, overlap, lr, consts, hp,
            *fbh, rows_per_user=M,
        )
    w_j = np.asarray(st.w)
    b_j = np.asarray(st.b)
    pred_j = predict_batches_plus(st, stacked, chunk_id, fb, hp,
                                  rows_per_user=M)

    # ---- pallas path, R rounds in one call
    lrs = jnp.full((R,), lr, jnp.float32)
    stp = jax.tree.map(jnp.copy, state0)
    t0 = time.time()
    stp = train_rounds_svdpp_pallas(
        stp, stacked, chunk_id, fb, overlap, lrs, consts, hp,
        G, M, off_user, off_item, *fbh,
    )
    w_p = np.asarray(stp.w)
    print(f"pallas compile+run: {time.time()-t0:.1f}s")
    b_p = np.asarray(stp.b)
    pred_p = predict_batches_plus(stp, stacked, chunk_id, fb, hp,
                                  rows_per_user=M)

    print("max|dw|", np.abs(w_j - w_p).max(), " max|db|", np.abs(b_j - b_p).max())
    print("rms w_j", float(np.sqrt(np.mean(w_j**2))))

    # train-set RMSE from each
    lab = np.asarray(stacked["label"]).reshape(-1)
    wt = np.asarray(stacked["weight"]).reshape(-1) > 0
    r_j = rmse(np.asarray(pred_j).reshape(-1)[wt], lab[wt])
    r_p = rmse(np.asarray(pred_p).reshape(-1)[wt], lab[wt])
    print(f"train RMSE jnp={r_j:.5f} pallas={r_p:.5f}")

    # test-set RMSE vs the regenerated reference golden (bench gate: 0.02)
    import json
    golden = json.load(open(ROOT / "golden" / "GOLDEN.json"))
    want = float(golden["implicitFeedback"]["rmse_per_round"][str(R)])
    for name, st_x in (("jnp", st), ("pallas", stp)):
        tr.state = st_x
        te = rmse(tr.predict_all(eds), eds.rows.labels)
        print(f"test RMSE {name}={te:.5f} golden@{R}={want:.5f} "
              f"ok={abs(te - want) < 0.02}")

    # ---- timing: epochs/s both ways (value-fetch sync; axon lies)
    st = jax.tree.map(jnp.copy, state0)
    st = train_epoch_plus(st, stacked, chunk_id, fb, overlap, lr, consts,
                          hp, *fbh, rows_per_user=M)
    _ = int(st.step)
    t0 = time.time()
    for _ in range(time_epochs):
        st = train_epoch_plus(st, stacked, chunk_id, fb, overlap, lr,
                              consts, hp, *fbh, rows_per_user=M)
    _ = int(st.step)
    dt_j = time.time() - t0
    n_ex = pds.rows.num_row
    print(f"jnp:    {time_epochs} epochs {dt_j:.3f}s  "
          f"{time_epochs*n_ex/dt_j/1e6:.2f}M ex/s")

    lrs5 = jnp.full((time_epochs,), lr, jnp.float32)
    stp = jax.tree.map(jnp.copy, state0)
    stp = train_rounds_svdpp_pallas(
        stp, stacked, chunk_id, fb, overlap, lrs5, consts, hp,
        G, M, off_user, off_item, *fbh,
    )
    _ = int(stp.step)
    best = None
    for _ in range(3):
        stp = jax.tree.map(jnp.copy, state0)
        t0 = time.time()
        stp = train_rounds_svdpp_pallas(
            stp, stacked, chunk_id, fb, overlap, lrs5, consts, hp,
            G, M, off_user, off_item, *fbh,
        )
        _ = int(stp.step)
        d = time.time() - t0
        best = d if best is None else min(best, d)
    print(f"pallas: {time_epochs} epochs {best:.3f}s  "
          f"{time_epochs*n_ex/best/1e6:.2f}M ex/s")


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--M", type=int, default=8)
    ap.add_argument("--sort", type=int, default=1)
    ap.add_argument("--R", type=int, default=40)
    args = ap.parse_args()
    main(rows_per_user=args.M, sort_blocks=args.sort, R=args.R)
