"""Headline benchmark: the reference demo workloads + a KDD-scale
synthetic on the default device (real TPU chip under the driver).

Primary metric: basicMF ML-100K SGD throughput (demo/basicMF, k=64,
40 rounds), RMSE-checked against the regenerated reference golden
(golden/GOLDEN.json).  Secondary metrics cover the remaining demos:
implicitFeedback (SVD++, rows_per_user=8 fused-kernel path),
neighborhoodModel, binaryClassification (each 40 rounds + RMSE parity
check), pairwiseRank, and bigTable (synthetic KDD-Cup-scale 2M-row
table, k=64) exercising the large-table write paths.

Prints ONE COMPACT JSON line (sized to the driver's stdout tail
window; see build_summaries for the key legend):
  {"metric": "...", "value": N, "unit": "examples/s", "vs_baseline": N,
   "vs_baseline_median": N, ..., "workloads": {name: {eps, med, vs,
   vsm, ok, sp, hot}, ...}}
Full per-workload detail (reps, probe readings, rooflines, RMSE gates)
is published to the ``.bench_full_last.json`` sidecar; raw per-workload
lines stream to ``.bench_results_last.jsonl`` as they complete.

vs_baseline compares against the reference C++ binary's measured
throughput on this machine's CPU (golden/GOLDEN.json) — the only
hardware the reference runs on.  vs_baseline_median is the same
multiplier computed from the MEDIAN rep (the robust claim).

Measurement discipline: every workload runs BENCH_REPS (default 4)
timed repetitions and reports best + median + spread (the tunnel shows
up to ~2x variance); a fixed-size device round-trip probe runs before
every rep so congested windows are visible in the artifact, and up to
BENCH_EXTRA_REPS extra reps are taken until BENCH_REPS clean samples
exist; staging (trainer build + packing) is outside the timed window,
matching the reference's timing which excludes buffer creation; each
result carries a bytes-moved traffic model, achieved GB/s, % of the
v5e HBM peak, and the named binding resource; RMSE gates are
per-workload bands (RMSE_BANDS) around the reference golden, an order
of magnitude tighter than the old flat 0.02, and pairwiseRank carries
its own P@20 gate on the path being measured.

Robustness (the remote axon TPU is exclusive and FLAKY — a wedged
remote end hangs backend init or dispatch for the whole process
lifetime):

- This file runs as a jax-free PARENT that supervises a CHILD process
  (``python bench.py --child <results.jsonl>``).
- The child starts with a tiny-matmul health probe (value-fetch synced;
  ``block_until_ready`` does not synchronize under this backend) and
  flushes each workload's result to the results file as soon as it is
  measured.
- If the probe does not land within BENCH_PROBE_TIMEOUT (240 s), the
  parent kills the child's process group, waits BENCH_QUIET_WAIT
  (600 s — the device needs total quiet to recover; each failed probe
  restarts its recovery clock) and retries, up to BENCH_ATTEMPTS times.
- The parent ALWAYS prints exactly one JSON line and exits 0: on a
  wedged device the line carries ``"tpu_unavailable": true`` plus
  whatever sub-benches completed before the hang.

Env knobs: BENCH_SMALL=1 (tiny bigTable, CI/dev), BENCH_CPU=1 (child
deregisters the axon backend and runs CPU-only — dev testing),
BENCH_FAKE_WEDGE=1 (child hangs in the probe — exercises the
unavailable path), BENCH_ATTEMPTS / BENCH_PROBE_TIMEOUT /
BENCH_QUIET_WAIT / BENCH_TIMEOUT (seconds).
"""

import json
import os
import pathlib
import signal
import subprocess
import sys
import time

ROOT = pathlib.Path(__file__).parent
# Per-invocation scratch so concurrent bench runs (e.g. a CPU smoke next
# to a TPU capture) cannot cross-contaminate each other's results; the
# parent copies the final scratch to the canonical artifact path.
RESULTS = ROOT / f".bench_results_{os.getpid()}.jsonl"
RESULTS_CANONICAL = ROOT / ".bench_results_last.jsonl"

# ---- quality gates ------------------------------------------------------
# Per-workload RMSE bands around the reference golden.  The bands are
# DERIVED, not chosen: golden/derive_rmse_bands.py runs each bench
# configuration over N seeds and sets
#   band = ceil(max(2 * seed_spread, 1.5 * |delta_to_golden|), 1e-4)
# storing the full seed table + rule next to the band in
# golden/GOLDEN.json (rmse_band / rmse_band_provenance).  The fallback
# values below (used only if GOLDEN.json lacks a derived band) are the
# round-4 hand-sized ones.  tests/test_config.py pins that a 0.01 drift
# flips every gate.
def _load_bands() -> dict:
    fallback = {
        "basicMF": 0.005,
        "neighborhoodModel": 0.006,
        "binaryClassification": 0.003,
        "implicitFeedback": 0.008,
    }
    try:
        g = json.load(open(ROOT / "golden" / "GOLDEN.json"))
        return {
            k: g.get(k, {}).get("rmse_band", v) for k, v in fallback.items()
        }
    except Exception:  # pragma: no cover
        return fallback


RMSE_BANDS = _load_bands()


def rmse_gate(key: str, got: float, want: float) -> dict:
    band = RMSE_BANDS[key]
    return {
        "final_rmse": round(got, 5),
        "golden_rmse": want,
        "rmse_delta": round(got - want, 5),
        "rmse_band": band,
        "rmse_ok": abs(got - want) < band,
    }


# ---- measurement discipline --------------------------------------------
# The remote-tunnel device shows up to ~2x run-to-run variance with
# occasional multi-second congestion stalls; single samples are not
# claims.  Every workload times BENCH_REPS (default 4, gapped) runs,
# reporting best + median + spread so a multiplier can be read against
# the noise.  Each rep is PRECEDED by a fixed-size device round-trip
# probe (upload 8 MiB + reduce + fetch) so tunnel congestion is visible
# *in the artifact*: a rep whose probe reads > HOT_FACTOR x the
# session-start probe baseline is tagged hot, and up to
# BENCH_EXTRA_REPS extra reps are taken until REPS clean samples exist
# (so the all-reps median is not a congestion statistic).  Staging
# (trainer construction + host packing) runs OUTSIDE the timed window,
# matching the reference's timing which excludes its buffer-creation
# step (golden/provenance_run_golden.sh times svd_feature after
# make_feature_buffer has run).
REPS = max(1, int(os.environ.get("BENCH_REPS", "4")))
EXTRA_REPS = max(0, int(os.environ.get("BENCH_EXTRA_REPS", "4")))
HOT_FACTOR = float(os.environ.get("BENCH_HOT_FACTOR", "1.6"))
# short gap between reps: congestion on the remote tunnel is bursty at
# sub-minute scales, so decorrelating the samples slightly raises the
# odds that the best rep touches a clean interval
REP_GAP_S = float(os.environ.get("BENCH_REP_GAP", "3"))

# set by child_main once jax is up: () -> float milliseconds for a
# fixed-size device round-trip, and the session-start baseline (min of 3)
_PROBE_FN = None
_PROBE_BASE_MS = None


def timed_reps(run, setup=None) -> dict:
    """Times run() over >= REPS reps; setup() runs untimed before each.

    Returns best/median seconds + spread + per-rep congestion-probe
    readings (probe_ms, probe_base_ms, n_hot).  Takes up to EXTRA_REPS
    extra reps while fewer than REPS reps have a clean (not-hot) probe.
    """
    times, probes = [], []
    extra_left = EXTRA_REPS
    while True:
        if times and REP_GAP_S > 0:
            time.sleep(REP_GAP_S)
        probes.append(round(_PROBE_FN(), 1) if _PROBE_FN else None)
        if setup is not None:
            setup()
        t0 = time.time()
        run()
        times.append(time.time() - t0)
        if len(times) < REPS:
            continue
        if _PROBE_FN is None or _PROBE_BASE_MS is None:
            break
        n_clean = sum(1 for p in probes if p < HOT_FACTOR * _PROBE_BASE_MS)
        if n_clean >= REPS or extra_left == 0:
            break
        extra_left -= 1
    ts = sorted(times)
    out = {
        "reps": len(times),
        "best_s": round(ts[0], 4),
        "median_s": round(ts[len(ts) // 2], 4),
        "spread": round(ts[-1] / max(ts[0], 1e-9), 2),
    }
    if _PROBE_FN is not None:
        out["probe_ms"] = probes
        out["probe_base_ms"] = _PROBE_BASE_MS
        out["n_hot"] = sum(
            1 for p in probes if p >= HOT_FACTOR * (_PROBE_BASE_MS or p)
        )
        if 0 < out["n_hot"] < len(times):
            # the all-reps median above is the CONSERVATIVE claim (hot
            # reps only slow it down); the clean-rep median is recorded
            # alongside so a congested window is quantifiable
            clean = sorted(
                t for t, p in zip(times, probes)
                if p < HOT_FACTOR * _PROBE_BASE_MS
            )
            out["median_clean_s"] = round(clean[len(clean) // 2], 4)
    return out


# ---- roofline accounting -------------------------------------------------
# v5e single-chip HBM peak; the denominator for "is this actually fast".
# Demo-scale workloads run whole-run Pallas kernels with VMEM-resident
# tables, so their HBM traffic is the per-round data planes only and the
# binding resource is the sequential per-block scan, not bandwidth —
# the `bound` field names the wall per workload (models in PERF.md).
HBM_PEAK_GBPS = 819.0


# ---- KDD-Cup-scale SVD++ synthetic --------------------------------------
# Shared by the bigSvdpp bench below and the reference-CPU baseline
# provenance (golden/provenance_big_svdpp.sh writes the SAME dataset via
# the byte-compatible buffer writer and times the reference binary on
# it), so the two sides of the multiplier see identical data.
def make_big_plus():
    import numpy as np

    from svdfeature_tpu.data.csr import CSRDataset, PlusDataset

    # KDD-Cup 2011 Track-1 table geometry (~1M users x 624k items; the
    # reference's headline workload, apex_svd_base.h:523-554 at scale):
    # the full unified table is 2.25M rows, so item/feedback accesses
    # are cache-hostile for the reference CPU exactly as in the real
    # contest data.  One "round" trains a 100k-user shard (~2M rows) —
    # a KDD epoch is ~125x this, so per-round throughput is the metric.
    NU, NI, NF, KF = 1_000_000, 624_000, 624_000, 64
    USERS, ROWS_MEAN = 100_000, 20
    if os.environ.get("BENCH_SMALL"):
        NU, NI, NF, KF = 2000, 3000, 3000, 16
        USERS, ROWS_MEAN = 1000, 6
    rng = np.random.default_rng(0)
    counts = rng.poisson(ROWS_MEAN, USERS).clip(1, 64).astype(np.int64)
    fbcounts = rng.integers(1, 12, USERS).astype(np.int64)
    EX = int(counts.sum())
    uid = np.repeat(np.arange(USERS, dtype=np.uint32), counts)
    items = rng.integers(0, NI, EX).astype(np.uint32)
    pu = rng.standard_normal((USERS, 8), dtype=np.float32) * 0.25
    qi = rng.standard_normal((NI, 8), dtype=np.float32) * 0.25
    labels = 3.0 + np.einsum("ek,ek->e", pu[uid], qi[items])
    del pu, qi
    row_ptr = np.zeros(3 * EX + 1, np.int32)
    row_ptr[1:] = np.cumsum(np.tile(np.array([0, 1, 1], np.int32), EX))
    index = np.empty(2 * EX, np.uint32)
    index[0::2] = uid
    index[1::2] = items
    rows = CSRDataset(labels.astype(np.float32), row_ptr, index,
                      np.ones(2 * EX, np.float32))
    Ftot = int(fbcounts.sum())
    brp = np.zeros(USERS + 1, np.int32)
    brp[1:] = np.cumsum(counts)
    bfp = np.zeros(USERS + 1, np.int32)
    bfp[1:] = np.cumsum(fbcounts)
    pds = PlusDataset(
        rows, rng.integers(0, NF, Ftot).astype(np.uint32),
        np.ones(Ftot, np.float32), brp, bfp,
        np.zeros(USERS, np.int8), np.zeros(USERS, np.int8))
    return pds, dict(NU=NU, NI=NI, NF=NF, KF=KF, EX=EX)


# ---- KDD-Cup-scale pairwiseRank synthetic --------------------------------
# Same sharing contract as make_big_plus: golden/provenance_big_rank.sh
# writes THIS dataset via the byte-compatible buffer writer and times the
# reference binary on it (model_type=1, active_type=3 — its runtime pair
# generation follows the same deterministic count formula our PairSource
# implements, apex_svd_data.cpp:812-1025).
def make_big_rank():
    import numpy as np

    from svdfeature_tpu.data.csr import CSRDataset, PlusDataset

    # table geometry as bigSvdpp (1M-user space, 624k items/fb); 25k
    # active users x (20 positives + 60 sampled negatives) = 2M rows,
    # the offline "3N" shape of the reference's pairwiseRank demo
    # (sampleneg.py); labels pre-scaled to {0, 1} like scale_score=5
    NU, NI, NF, KF = 1_000_000, 624_000, 624_000, 64
    USERS, NPOS, NNEG = 25_000, 20, 60
    if os.environ.get("BENCH_SMALL"):
        NU, NI, NF, KF = 2000, 3000, 3000, 16
        USERS, NPOS, NNEG = 500, 5, 15
    rng = np.random.default_rng(3)
    NR = NPOS + NNEG
    EX = USERS * NR
    uid = np.repeat(np.arange(USERS, dtype=np.uint32), NR)
    # learnable signal: each user's positives come from the low half of
    # the item space (a planted global popularity ordering)
    pos = rng.integers(0, NI // 2, (USERS, NPOS))
    neg = rng.integers(NI // 2, NI, (USERS, NNEG))
    items = np.concatenate([pos, neg], axis=1).reshape(-1).astype(np.uint32)
    labels = np.concatenate(
        [np.ones((USERS, NPOS), np.float32),
         np.zeros((USERS, NNEG), np.float32)], axis=1).reshape(-1)
    row_ptr = np.zeros(3 * EX + 1, np.int32)
    row_ptr[1:] = np.cumsum(np.tile(np.array([0, 1, 1], np.int32), EX))
    index = np.empty(2 * EX, np.uint32)
    index[0::2] = uid
    index[1::2] = items
    rows = CSRDataset(labels, row_ptr, index, np.ones(2 * EX, np.float32))
    # feedback = the user's positive items (mkimplicitfeedbackfeature)
    fb_index = pos.reshape(-1).astype(np.uint32)
    brp = np.arange(USERS + 1, dtype=np.int32) * NR
    bfp = np.arange(USERS + 1, dtype=np.int32) * NPOS
    pds = PlusDataset(
        rows, fb_index, np.ones(USERS * NPOS, np.float32), brp, bfp,
        np.zeros(USERS, np.int8), np.zeros(USERS, np.int8))
    return pds, dict(NU=NU, NI=NI, NF=NF, KF=KF, EX=EX)


def slice_plus_blocks(pds, nblk):
    from svdfeature_tpu.data.csr import PlusDataset

    r1 = int(pds.block_row_ptr[nblk])
    f1 = int(pds.block_fb_ptr[nblk])
    return PlusDataset(
        pds.rows.slice_rows(0, r1), pds.fb_index[:f1], pds.fb_value[:f1],
        pds.block_row_ptr[: nblk + 1], pds.block_fb_ptr[: nblk + 1],
        pds.extend_tag[:nblk],
        pds.extra_info[:nblk] if pds.extra_info is not None else None)


def roofline(bytes_per_round: float, rounds: int, seconds: float, bound: str) -> dict:
    gbps = bytes_per_round * rounds / max(seconds, 1e-9) / 1e9
    return {
        "traffic_model_mb_per_round": round(bytes_per_round / 1e6, 2),
        "achieved_gb_per_sec": round(gbps, 2),
        "pct_hbm_peak": round(100.0 * gbps / HBM_PEAK_GBPS, 2),
        "bound": bound,
    }


# ======================================================================
# Child: owns jax; probes the device, runs the workloads, flushes each
# result line immediately so the parent can salvage partial runs.
# ======================================================================

def child_main(results_path: str) -> None:
    sys.path.insert(0, str(ROOT))
    out = open(results_path, "a")

    def put(name, data):
        out.write(json.dumps({"workload": name, "data": data}) + "\n")
        out.flush()
        os.fsync(out.fileno())

    if os.environ.get("BENCH_FAKE_WEDGE"):
        time.sleep(1 << 20)  # simulate a wedged backend: hang in "init"

    import gzip

    import numpy as np

    if os.environ.get("BENCH_CPU"):
        import jax
        from jax._src import xla_bridge as _xb

        _xb._backend_factories.pop("axon", None)
        jax.config.update("jax_platforms", "cpu")

    import jax
    import jax.numpy as jnp

    # ---- health probe (tiny matmul, value-fetch synced) ----------------
    x = jnp.ones((256, 256), jnp.bfloat16)
    _ = float(jnp.float32(jnp.sum(x @ x)))

    # ---- congestion probe: fixed-size device round-trip ----------------
    # 8 MiB host->device + reduce + scalar fetch, dominated by tunnel
    # transfer time; read once before every timed rep (timed_reps) so a
    # congested window shows up in the artifact next to the rep it hit.
    global _PROBE_FN, _PROBE_BASE_MS
    probe_buf = np.ones(1 << 21, np.float32)  # 8 MiB
    probe_sum = jax.jit(jnp.sum)

    def _congestion_probe() -> float:
        t0 = time.time()
        _ = float(probe_sum(jax.device_put(probe_buf)))
        return (time.time() - t0) * 1e3

    _ = _congestion_probe()  # compile
    _PROBE_FN = _congestion_probe
    _PROBE_BASE_MS = round(min(_congestion_probe() for _ in range(3)), 1)
    put("_probe", {"device": str(jax.devices()[0]),
                   "probe_base_ms": _PROBE_BASE_MS})

    from svdfeature_tpu.data.text import load_feature_text, load_plus_text
    from svdfeature_tpu.params import SVDTypeParam
    from svdfeature_tpu.solvers.base import SVDFeatureTrainer
    from svdfeature_tpu.solvers.svdpp import SVDPPFeatureTrainer

    golden = json.load(open(ROOT / "golden" / "GOLDEN.json"))

    def fx(name):
        with gzip.open(ROOT / "tests/fixtures" / name, "rt") as f:
            return f.read()

    def rmse(pred, labels):
        d = np.asarray(pred) - np.asarray(labels)
        return float(np.sqrt(np.mean(d * d)))

    BASIC = [
        ("base_score", "3"), ("learning_rate", "0.005"),
        ("wd_item", "0.004"), ("wd_user", "0.004"),
        ("num_item", "1682"), ("num_user", "943"),
        ("num_global", "0"), ("num_factor", "64"),
    ]

    def make(cls, mtype_kw, params):
        tr = cls(SVDTypeParam(**mtype_kw))
        for n, v in params:
            tr.set_param(n, str(v))
        tr.init_model()
        tr.init_trainer()
        return tr

    ROUNDS = 40

    # ---- basicMF / neighborhoodModel / binaryClassification ---------------
    def run_basic_like(key, train_name, test_name, extra, mtype_kw):
        tds = load_feature_text("x", text=fx(train_name))
        eds = load_feature_text("x", text=fx(test_name))
        p = [kv for kv in BASIC if kv[0] not in dict(extra)] + extra + [
            ("batch_size", "4096")
        ]
        t = make(SVDFeatureTrainer, mtype_kw, p)
        t.update_rounds(tds, ROUNDS)  # compile
        _ = int(t.state.step)  # value fetch: see module docstring
        last = {}

        def setup():
            # staging (trainer build + host pack + initial table upload)
            # runs untimed, like the reference's buffer-creation step
            last["tr"] = t = make(SVDFeatureTrainer, mtype_kw, p)
            t._pack(tds)
            _ = int(t.state.step)  # drain the initial-state upload

        def one():
            last["tr"].update_rounds(tds, ROUNDS)
            _ = int(last["tr"].state.step)

        stats = timed_reps(one, setup)
        eps = ROUNDS * tds.num_row / stats["best_s"]
        eps_med = ROUNDS * tds.num_row / stats["median_s"]
        got = rmse(last["tr"].predict_all(eds), eds.labels)
        # HBM model: VMEM-resident whole-run kernel; traffic = the packed
        # per-round data planes (u/i idx+val + label + weight, ~24 B/ex,
        # + 2 global idx/val pairs when present)
        ng = int(dict(p).get("num_global", "0") or 0)
        plane_b = tds.num_row * (24 + (16 if ng else 0))
        base = golden[key]["examples_per_sec_cpu"]
        put(key, {
            "examples_per_sec": round(eps),
            "examples_per_sec_median": round(eps_med),
            "vs_baseline": round(eps / base, 2),
            "vs_baseline_median": round(eps_med / base, 2),
            **stats,
            **rmse_gate(key, got, golden[key]["final_rmse"]),
            **roofline(plane_b, ROUNDS, stats["best_s"],
                       "sequential batch scan, tables VMEM-resident"),
        })
        return eps

    try:
        run_basic_like(
            "basicMF", "ml100k.base.feature.gz", "ml100k.test.feature.gz",
            [], {},
        )
    except Exception as e:  # pragma: no cover
        print(f"WARNING: basicMF bench failed: {e}", file=sys.stderr)
    try:
        run_basic_like(
            "neighborhoodModel", "ml100k.base.nb.feature.gz",
            "ml100k.test.nb.feature.gz",
            [("num_global", "6"), ("wd_global", "0.001")], {},
        )
    except Exception as e:  # pragma: no cover
        print(f"WARNING: neighborhood bench failed: {e}", file=sys.stderr)
    try:
        run_basic_like(
            "binaryClassification", "ml100k.base.bin.feature.gz",
            "ml100k.test.bin.feature.gz",
            [("base_score", "0.5"), ("active_type", "2")],
            dict(active_type=2),
        )
    except Exception as e:  # pragma: no cover
        print(f"WARNING: binary bench failed: {e}", file=sys.stderr)

    # ---- implicitFeedback (SVD++) -----------------------------------------
    def bench_svdpp():
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
        pp = BASIC + [
            ("wd_ufeedback", "0.004"), ("num_ufeedback", "1682"),
            # fast path: size-sorted packing + 8 rows/user per step
            # (RMSE parity pinned in tests/test_svdpp_multirow.py)
            ("sort_blocks", "1"), ("rows_per_user", "8"),
        ]
        tp = make(SVDPPFeatureTrainer, dict(format_type=1), pp)
        tp.update_rounds(pds, ROUNDS)  # compile (fused Pallas whole-run)
        _ = int(tp.state.step)
        last = {}

        def setup():
            last["tr"] = tp = make(SVDPPFeatureTrainer, dict(format_type=1), pp)
            tp._pack_plus(pds)  # staging untimed, like basicMF
            _ = int(tp.state.step)

        def one():
            last["tr"].update_rounds(pds, ROUNDS)
            _ = int(last["tr"].state.step)

        stats = timed_reps(one, setup)
        got = rmse(last["tr"].predict_all(eds), eds.rows.labels)
        # compare like-for-like: round-40 RMSE vs the reference's round-40
        # (the reference trajectory overfits past its best ~0.9223 back to
        # 0.9371 by round 40; best-round parity is gated by the slow suite)
        want = float(golden["implicitFeedback"]["rmse_per_round"]["40"])
        eps = ROUNDS * pds.rows.num_row / stats["best_s"]
        eps_med = ROUNDS * pds.rows.num_row / stats["median_s"]
        nfb = sum(len(b.fb_index) for b in pds.blocks())
        gate = rmse_gate("implicitFeedback", got, want)
        gate["golden_final_rmse"] = gate.pop("golden_rmse")
        base = golden["implicitFeedback"]["examples_per_sec_cpu"]
        return {
            "examples_per_sec": round(eps),
            "examples_per_sec_median": round(eps_med),
            "vs_baseline": round(eps / base, 2),
            "vs_baseline_median": round(eps_med / base, 2),
            **stats,
            **gate,
            # planes (~24 B/ex) + feedback-pool entry planes (8 B/entry);
            # pool + tables are VMEM-resident in the whole-run kernel
            **roofline(pds.rows.num_row * 24 + nfb * 8, ROUNDS,
                       stats["best_s"],
                       "sequential chunk scan, tables+pool VMEM-resident"),
        }

    svdpp_res = None
    try:
        svdpp_res = bench_svdpp()
        put("implicitFeedback", svdpp_res)
    except Exception as e:  # pragma: no cover
        print(f"WARNING: svdpp bench failed: {e}", file=sys.stderr)

    # ---- multi-IMFB (extend_type=2) ----------------------------------------
    # Two measurements: (a) the implicitFeedback data as-is — all-DEFAULT
    # blocks degenerate to plain SVD++ (solvers/multi_imfb._plain_svdpp)
    # and ride the whole SVD++ fast path incl. the Pallas whole-run
    # kernel, bit-identical trajectory (tests/test_side_solvers.py);
    # (b) a genuinely STACKED variant (each user's rows split into two
    # DEFAULT sub-blocks nested under a START/END user-level context,
    # depth 2) driving the carried stacked epoch
    # (ops/imfb.train_epoch_imfb_carried).
    def bench_imfb():
        from svdfeature_tpu.data.csr import (
            PlusBlock, PlusDataset, TAG_END, TAG_START,
        )
        from svdfeature_tpu.solvers.multi_imfb import SVDPPMultiIMFBTrainer

        pds = load_plus_text(
            "x", "y",
            text=fx("ml100k.base.group.feature.gz"),
            feedback_text=fx("ml100k.base.feedback.gz"),
        )
        pp = BASIC + [
            ("wd_ufeedback", "0.004"), ("num_ufeedback", "1682"),
        ]

        def measure(data, extra, rounds=ROUNDS):
            # warm with the SAME round count as the timed reps: lrs has
            # shape [rounds], so a different count recompiles inside the
            # first timed rep (the round-4 stacked spread of 17.29 was
            # exactly this one recompile)
            tp = make(SVDPPMultiIMFBTrainer,
                      dict(format_type=1, extend_type=2), pp + extra)
            tp.update_rounds(data, rounds)
            _ = int(tp.state.step)
            box = {}

            def setup():
                box["tr"] = tp = make(SVDPPMultiIMFBTrainer,
                                      dict(format_type=1, extend_type=2),
                                      pp + extra)
                tp._pack_plus(data)
                _ = int(tp.state.step)

            def one():
                box["tr"].update_rounds(data, rounds)
                _ = int(box["tr"].state.step)

            stats = timed_reps(one, setup)
            stats["examples_per_sec"] = round(
                rounds * data.rows.num_row / stats["best_s"])
            stats["examples_per_sec_median"] = round(
                rounds * data.rows.num_row / stats["median_s"])
            return stats

        stats_default = measure(
            pds, [("sort_blocks", "1"), ("rows_per_user", "8")]
        )
        nfb = sum(len(b.fb_index) for b in pds.blocks())
        res = dict(stats_default)
        # same traffic model as implicitFeedback: the all-DEFAULT data
        # degenerates to plain SVD++ and rides the same whole-run kernel
        res.update(roofline(
            pds.rows.num_row * 24 + nfb * 8, ROUNDS, stats_default["best_s"],
            "sequential chunk scan, tables+pool VMEM-resident"))
        # all-DEFAULT data IS the implicitFeedback workload (bit-identical
        # degeneration), so its reference-CPU baseline applies verbatim
        base_d = golden["implicitFeedback"]["examples_per_sec_cpu"]
        res["examples_per_sec_cpu_reference"] = base_d
        res["vs_baseline"] = round(res["examples_per_sec"] / base_d, 2)
        res["vs_baseline_median"] = round(
            res["examples_per_sec_median"] / base_d, 2)
        if svdpp_res:
            res["vs_svdpp"] = round(
                res["examples_per_sec"] / svdpp_res["examples_per_sec"], 3
            )

        import numpy as np

        stacked_blocks = []
        for blk in pds.blocks():
            n = blk.data.num_row
            if n >= 2:
                h = n // 2
                # user-level context stays open (START), the second half
                # runs under [user, session] = depth 2 (DEFAULT pushes its
                # own), END pops the user context
                stacked_blocks.append(PlusBlock(
                    blk.fb_index, blk.fb_value, blk.data.slice_rows(0, h),
                    extend_tag=TAG_START,
                ))
                stacked_blocks.append(PlusBlock(
                    blk.fb_index[: max(1, len(blk.fb_index) // 2)],
                    blk.fb_value[: max(1, len(blk.fb_value) // 2)],
                    blk.data.slice_rows(h, n - h),
                ))
                # END carries the SAME list as its START — the
                # reference writes the popped context back through the
                # POPPING block's list (apex_multi_imfb.h:173-179), and
                # its own generator repeats the list on START and END
                # (kddcup_combine_ugroup.cpp:196-230)
                stacked_blocks.append(PlusBlock(
                    blk.fb_index, blk.fb_value, blk.data.slice_rows(n, 0),
                    extend_tag=TAG_END,
                ))
            else:
                stacked_blocks.append(blk)
        sds = PlusDataset.from_blocks(stacked_blocks)
        # M=8 like the other SVD++-family throughput configs (the D>0
        # whole-run kernel takes G*M-slot batches; within-unit-excess
        # damping, tests/test_side_multirow.py + interpret-mode kernel
        # parity); 2.9M -> 6.0M ex/s measured
        stats_st = measure(sds, [("rows_per_user", "8")])
        eps_st = stats_st["examples_per_sec"]
        res["stacked_examples_per_sec"] = eps_st
        res["stacked_examples_per_sec_median"] = stats_st[
            "examples_per_sec_median"]
        res["stacked_spread"] = stats_st["spread"]
        res["stacked_reps"] = stats_st["reps"]
        res["stacked_best_s"] = stats_st["best_s"]
        res["stacked_median_s"] = stats_st["median_s"]
        if "probe_ms" in stats_st:
            res["stacked_probe_ms"] = stats_st["probe_ms"]
            res["stacked_n_hot"] = stats_st["n_hot"]
        # stacked traffic: split blocks carry the user fb list on START
        # and END too, so pool-entry planes roughly double
        nfb_st = sum(len(b.fb_index) for b in sds.blocks())
        st_roof = roofline(
            sds.rows.num_row * 24 + nfb_st * 8, ROUNDS, stats_st["best_s"],
            "sequential chunk scan (depth-2 carried), tables+pool "
            "VMEM-resident")
        res.update({f"stacked_{k}": v for k, v in st_roof.items()})
        # quality gate at the stacked golden's horizon (8 rounds,
        # golden/multi_imfb_stacked.rmse.tsv regenerated from the
        # reference binary on this same transform): fresh M=8 trainer,
        # eval on the degenerate test set like the reference's infer
        eds_st = load_plus_text(
            "x", "y",
            text=fx("ml100k.test.ug.feature.gz"),
            feedback_text=fx("ml100k.test.feedback.gz"),
        )
        tsv = (ROOT / "golden" / "multi_imfb_stacked.rmse.tsv").read_text()
        want_rounds = dict(
            (int(a), float(b))
            for a, b in (ln.split() for ln in tsv.splitlines() if ln.strip())
        )
        horizon = max(want_rounds)
        tq = make(SVDPPMultiIMFBTrainer,
                  dict(format_type=1, extend_type=2),
                  pp + [("rows_per_user", "8")])
        tq.update_rounds(sds, horizon)
        got_st = rmse(tq.predict_all(eds_st), eds_st.rows.labels)
        want_st = want_rounds[horizon]
        res["stacked_final_rmse"] = round(got_st, 5)
        res["stacked_golden_rmse"] = want_st
        res["stacked_rmse_delta"] = round(got_st - want_st, 5)
        res["stacked_rmse_ok"] = abs(got_st - want_st) < 0.008
        # reference binary on the SAME stacked transform, this host's CPU
        # (golden/GOLDEN.json multiIMFBStacked, min of 3 full runs)
        st_base = golden.get("multiIMFBStacked", {}).get("examples_per_sec_cpu")
        if st_base:
            res["stacked_examples_per_sec_cpu_reference"] = st_base
            res["stacked_vs_baseline"] = round(eps_st / st_base, 2)
            res["stacked_vs_baseline_median"] = round(
                res["stacked_examples_per_sec_median"] / st_base, 2)
        return res

    try:
        put("multiIMFB", bench_imfb())
    except Exception as e:  # pragma: no cover
        print(f"WARNING: multiIMFB bench failed: {e}", file=sys.stderr)

    # ---- pairwiseRank (PairSource + SIGMOID_RANK) --------------------------
    # Multi-round pair epochs (solvers/svdpp._train_pair_rounds_host): the
    # packed layout is epoch-invariant, so the run ships only block-local
    # permutation offsets (uint16, native Fisher-Yates sampled one block
    # ahead on a producer thread), K=8 rounds per dispatch with in-dispatch
    # packed-table plane assembly.  P@20 on the multi path is checked
    # below against the golden; the per-round CLI path keeps the exact
    # numpy stream and is gated by tests/test_golden_full.py.
    def bench_rank():
        from svdfeature_tpu.data.rank import PairSource
        from svdfeature_tpu.data.registry import IteratorConfig
        from svdfeature_tpu.solvers.ranker import SVDFeatureRanker

        train = load_plus_text(
            "x", "y",
            text=fx("ml100k.rank.base.feature.gz"),
            feedback_text=fx("ml100k.rank.base.feedback.gz"),
            scale_score=5,
        )
        pp = [
            ("learning_rate", "0.005"), ("wd_user", "0.004"),
            ("wd_item", "0.004"), ("num_user", "943"),
            ("num_item", "1682"), ("num_global", "0"),
            ("num_factor", "64"), ("active_type", "3"),
            ("num_ufeedback", "1682"), ("wd_ufeedback", "0.004"),
            ("no_user_bias", "1"),
        ]
        last = {}

        def run(rounds):
            src = PairSource(train, IteratorConfig(), seed=10)
            tr = make(SVDPPFeatureTrainer,
                      dict(format_type=1, active_type=3), pp)
            tr.update_rounds(src, rounds)
            _ = int(tr.state.step)
            last["tr"] = tr

        run(1)  # compile (K=1 block)
        run(ROUNDS)  # compile (K=8 blocks)
        n_pairs = PairSource(train, IteratorConfig()).epoch_dataset().rows.num_row

        def setup():
            # trainer build + initial table upload + the one-time pair
            # SKELETON build (epoch-invariant layout + candidate tables
            # — analogous to the reference's buffer creation) untimed;
            # per-round pair SAMPLING stays INSIDE the timed window
            # (the reference's 40-round wall includes its per-round
            # pair regeneration, apex_svd_data.cpp:812-1025)
            last["src"] = PairSource(train, IteratorConfig(), seed=10)
            last["tr"] = make(SVDPPFeatureTrainer,
                              dict(format_type=1, active_type=3), pp)
            last["tr"]._apply_pair_layout()
            last["tr"]._pair_host_multi_ok(last["src"])
            _ = int(last["tr"].state.step)

        def one():
            last["tr"].update_rounds(last["src"], ROUNDS)
            _ = int(last["tr"].state.step)

        stats = timed_reps(one, setup)
        eps = ROUNDS * n_pairs / stats["best_s"]
        eps_med = ROUNDS * n_pairs / stats["median_s"]
        res = {
            "examples_per_sec": round(eps),
            "examples_per_sec_median": round(eps_med),
            "pairs_per_round": n_pairs,
            **stats,
            # offsets upload + in-dispatch assembly intermediates
            # (packed-table planes, ~48 B/slot) + kernel data planes
            **roofline(n_pairs * 72, ROUNDS, stats["best_s"],
                       "assembly gathers + sequential block scan"),
        }
        # quality gate on the path just measured: rank the test protocol
        # with the multi-path-trained model (same eval as
        # demo/pairwiseRank/eval.py and the slow golden gate)
        test = load_plus_text(
            "x", "y",
            text=fx("ml100k.rank.test.feature.gz"),
            feedback_text=fx("ml100k.rank.test.feedback.gz"),
        )
        rk = SVDFeatureRanker(last["tr"].mtype)
        last["tr"]._sync_model_from_state()
        rk.model = last["tr"].model
        rk.init_ranker(1682)
        ranks = rk.process_dataset(test)
        p20 = float(sum(1 for v in ranks if int(v) < 20) / (943 * 20.0))
        want_p20 = golden["pairwiseRank"]["precision_at_20"]
        res["precision_at_20"] = round(p20, 5)
        res["golden_precision_at_20"] = want_p20
        res["p20_ok"] = abs(p20 - want_p20) < 0.003
        # reference 40-round wall time on the same 3N workload (its pair
        # counts follow the same deterministic formula,
        # apex_svd_data.cpp:812-1025)
        ref_s = golden.get("pairwiseRank", {}).get("train_seconds_40rounds_cpu")
        if ref_s:
            base = 40 * n_pairs / ref_s
            res["examples_per_sec_cpu_reference"] = round(base)
            res["vs_baseline"] = round(res["examples_per_sec"] / base, 2)
            res["vs_baseline_median"] = round(
                res["examples_per_sec_median"] / base, 2)
        return res

    try:
        put("pairwiseRank", bench_rank())
    except Exception as e:  # pragma: no cover
        print(f"WARNING: pairwiseRank bench failed: {e}", file=sys.stderr)

    # ---- bigTable (synthetic KDD-Cup-scale: 2M-row table, k=64) -----------
    # Every real SVDFeature workload lives far above ONEHOT_THRESHOLD
    # (KDD-Cup 2011: ~1M users x ~600k items); this measures the
    # large-table write path (ops/big_embed.py sorted-dedup or
    # ops/tile_sweep.py tile sweep, auto-selected) instead of the
    # demo-scale one-hot path.  Parity of both paths with the small-table
    # step is pinned by tests/test_big_embed.py + tests/test_tile_sweep.py.
    def bench_big():
        from svdfeature_tpu.data.csr import CSRDataset

        NU, NI, KF = 1_000_000, 1_048_576, 64
        EX = 1 << 21  # examples per epoch
        if os.environ.get("BENCH_SMALL"):  # CPU smoke mode (CI/dev only)
            NU, NI, EX = 8_192, 8_192, 1 << 14
        brng = np.random.default_rng(7)
        uu = brng.integers(0, NU, EX).astype(np.uint32)
        ii = brng.integers(0, NI, EX).astype(np.uint32)
        # planted rank-8 structure so learning is observable
        pu = brng.standard_normal((NU, 8), dtype=np.float32) * 0.25
        qi = brng.standard_normal((NI, 8), dtype=np.float32) * 0.25
        labels = 3.0 + np.einsum("ek,ek->e", pu[uu], qi[ii])
        del pu, qi
        row_ptr = np.zeros(3 * EX + 1, np.int32)
        row_ptr[1:] = np.cumsum(np.tile(np.array([0, 1, 1], np.int32), EX))
        index = np.empty(2 * EX, np.uint32)
        index[0::2] = uu
        index[1::2] = ii
        bds = CSRDataset(
            labels=labels.astype(np.float32),
            row_ptr=row_ptr,
            index=index,
            value=np.ones(2 * EX, np.float32),
        )
        bp = [
            ("base_score", "3"), ("learning_rate", "0.005"),
            ("wd_item", "0.004"), ("wd_user", "0.004"),
            ("num_item", str(NI)), ("num_user", str(NU)),
            # B=2^20: fewer batch boundaries amortize the per-batch
            # gather/take/sweep fixed costs (7.7M vs 6.4M ex/s at 2^19,
            # measured on v5e); learning at 2 steps/round is gated by
            # rmse_after below
            ("num_factor", str(KF)), ("batch_size", str(min(1 << 20, EX // 2))),
        ]
        BR = 5
        probe = bds.slice_rows(0, 4096)
        tb = make(SVDFeatureTrainer, {}, bp)
        rmse0 = rmse(tb.predict_all(probe), probe.labels)
        # warm with the SAME round count as the timed reps (lrs shape is
        # [BR]; warming at 1 round left a recompile in the first timed
        # rep — the round-4 spread of 4.46)
        tb.update_rounds(bds, BR)
        _ = int(tb.state.step)

        def one():
            tb.update_rounds(bds, BR)
            _ = int(tb.state.step)

        stats = timed_reps(one)
        big_eps = round(BR * EX / stats["best_s"])
        rmse1 = rmse(tb.predict_all(probe), probe.labels)
        # HBM model: the table (augmented 128-lane rows) cannot be
        # VMEM-resident — per batch the step gathers the touched rows
        # (read), rewrites the deduped rows (write), and the sweep path
        # re-reads+rewrites the swept tiles; planes are noise at this
        # scale.  Approximate as 3 row-moves per example (fwd gather,
        # grad gather reuse, dedup write) x 512 B.
        res = {
            "examples_per_sec": big_eps,
            "examples_per_sec_median": round(BR * EX / stats["median_s"]),
            "table_rows": NU + NI,
            "write_path": "sweep" if tb.hp.sweep_table else "dedup",
            "rmse_start": round(rmse0, 5),
            "rmse_after": round(rmse1, 5),
            "learning_ok": rmse1 < rmse0,
            **stats,
            **roofline(EX * 3 * 512, BR, stats["best_s"],
                       "row-granular gather/write ops (~30-55 ns/row)"),
        }
        # reference C++ binary on the same synthetic, this host's CPU
        # (golden/GOLDEN.json, regenerated by golden/provenance_run_golden.sh)
        base = golden.get("bigTable", {}).get("examples_per_sec_cpu")
        if base and not os.environ.get("BENCH_SMALL"):
            res["examples_per_sec_cpu_reference"] = base
            res["vs_baseline"] = round(big_eps / base, 2)
            res["vs_baseline_median"] = round(
                res["examples_per_sec_median"] / base, 2)
        return res

    try:
        put("bigTable", bench_big())
    except Exception as e:  # pragma: no cover
        print(f"WARNING: bigTable bench failed: {e}", file=sys.stderr)

    # ---- bigSvdpp (KDD-Cup-scale SVD++: 500k-row unified table) ------------
    # The ML-100K implicitFeedback numbers are scan-latency-bound (tiny
    # tables, whole run in VMEM); real SVDFeature SVD++ runs at KDD-Cup
    # 2011 scale (~1M users x 600k items,
    # /root/reference/solvers/base-solver/apex_svd_base.h:523-554).  This
    # measures ops/svdpp_big.py on a synthetic at that shape: 100k users
    # x 200k items x 200k feedback ids (rng(0), ~20 rows + ~6 fb/user,
    # planted rank-8 structure so learning is observable), k=64.
    def bench_svdpp_big():
        pds, dims = make_big_plus()
        pp = [
            ("base_score", "3"), ("learning_rate", "0.005"),
            ("wd_item", "0.004"), ("wd_user", "0.004"),
            ("wd_ufeedback", "0.004"),
            ("num_user", str(dims["NU"])), ("num_item", str(dims["NI"])),
            ("num_ufeedback", str(dims["NF"])), ("num_global", "0"),
            ("num_factor", str(dims["KF"])),
            # G=4096 x M=4: the carry-path sweep optimum
            # (scripts/bench_svdpp_big.py — 5.75M ex/s vs 5.34M at
            # G=2048xM=8; pre-carry the path peaked at 3.9M)
            ("sort_blocks", "1"), ("rows_per_user", "4"),
            ("users_per_batch", "4096"),
        ]
        BR = 3
        probe_ds = slice_plus_blocks(pds, min(2000, pds.num_block))
        tp = make(SVDPPFeatureTrainer, dict(format_type=1), pp)
        if not os.environ.get("BENCH_SMALL"):
            assert tp.hp.big_table, tp.hp
        rmse0 = rmse(tp.predict_all(probe_ds), probe_ds.rows.labels)
        tp._pack_plus(pds)
        tp.update_rounds(pds, BR)  # compile at the timed round count
        _ = int(tp.state.step)

        def one():
            tp.update_rounds(pds, BR)
            _ = int(tp.state.step)

        stats = timed_reps(one)
        eps = round(BR * dims["EX"] / stats["best_s"])
        eps_med = round(BR * dims["EX"] / stats["median_s"])
        rmse1 = rmse(tp.predict_all(probe_ds), probe_ds.rows.labels)
        # HBM model: augmented unified table (~500k rows x 512 B) cannot
        # be VMEM-resident — per example the step moves the touched user
        # + item rows plus the per-user feedback-pool rows (~6/user
        # amortized over ~20 rows -> ~0.3 extra row-moves/ex); same
        # 3-moves/row accounting as bigTable plus the feedback gathers.
        res = {
            "examples_per_sec": eps,
            "examples_per_sec_median": eps_med,
            "table_rows": dims["NU"] + dims["NI"] + dims["NF"],
            "rmse_start": round(rmse0, 5),
            "rmse_after": round(rmse1, 5),
            "learning_ok": rmse1 < rmse0,
            **stats,
            **roofline(dims["EX"] * 3.3 * 512, BR, stats["best_s"],
                       "row-granular gather/write ops on the unified table"),
        }
        base = golden.get("bigSvdpp", {}).get("examples_per_sec_cpu")
        if base and not os.environ.get("BENCH_SMALL"):
            res["examples_per_sec_cpu_reference"] = base
            res["vs_baseline"] = round(eps / base, 2)
            res["vs_baseline_median"] = round(eps_med / base, 2)
        return res

    try:
        put("bigSvdpp", bench_svdpp_big())
    except Exception as e:  # pragma: no cover
        print(f"WARNING: bigSvdpp bench failed: {e}", file=sys.stderr)

    # ---- bigRank (KDD-Cup-scale pairwiseRank) ------------------------------
    # The ML-100K rank numbers fit the reference's cache; at the
    # bigSvdpp table geometry its per-pair item/feedback accesses miss.
    # Ours rides the skeleton multi-round path with the augmented
    # user-carry epoch (solvers/svdpp._pair_multi_train big branch).
    def bench_rank_big():
        from svdfeature_tpu.data.rank import PairSource
        from svdfeature_tpu.data.registry import IteratorConfig

        train, dims = make_big_rank()
        pp = [
            ("learning_rate", "0.005"), ("wd_user", "0.004"),
            ("wd_item", "0.004"), ("num_user", str(dims["NU"])),
            ("num_item", str(dims["NI"])), ("num_global", "0"),
            ("num_factor", str(dims["KF"])), ("active_type", "3"),
            ("num_ufeedback", str(dims["NF"])), ("wd_ufeedback", "0.004"),
            ("no_user_bias", "1"), ("rank_users_per_batch", "2048"),
        ]
        BR = 8  # one K-block dispatch (PAIR_BLOCK_ROUNDS) per rep
        # one trainer reused across reps (like bigTable): the ~60 s
        # skeleton pack at this scale is one-time layout work (the
        # reference's buffer-creation analogue), and continued rounds
        # ARE the steady state; each timed rep still pays its per-round
        # pair sampling
        tr = make(SVDPPFeatureTrainer, dict(format_type=1, active_type=3), pp)
        if not os.environ.get("BENCH_SMALL"):
            assert tr.hp.big_table, tr.hp
        src = PairSource(train, IteratorConfig(), seed=10)
        tr.update_rounds(src, BR)  # skeleton + compile + warm
        _ = int(tr.state.step)
        last = {"tr": tr}

        def one():
            tr.update_rounds(src, BR)
            _ = int(tr.state.step)

        stats = timed_reps(one)
        # quality gate: the planted ordering (positives in the low item
        # half) must be learned on a fresh pair epoch; the pair count is
        # deterministic, so this probe epoch also provides it (no extra
        # 2M-row epoch synthesis just for the count)
        probe = PairSource(train, IteratorConfig(), seed=77).epoch_dataset()
        n_pairs = probe.rows.num_row
        eps = round(BR * n_pairs / stats["best_s"])
        eps_med = round(BR * n_pairs / stats["median_s"])
        pb = slice_plus_blocks(probe, min(2000, probe.num_block))
        # raw score of a [pos, neg] difference row > 0 == correctly
        # ordered (active_type=3 predicts the raw margin)
        acc = float(np.mean(np.asarray(last["tr"].predict_all(pb)) > 0.0))
        res = {
            "examples_per_sec": eps,
            "examples_per_sec_median": eps_med,
            "pairs_per_round": n_pairs,
            "table_rows": dims["NU"] + dims["NI"] + dims["NF"],
            "pair_order_acc": round(acc, 4),
            "learning_ok": acc > 0.75,
            **stats,
            # offsets upload + assembly intermediates + the augmented
            # epoch's row-granular gather/write traffic (~1 item row +
            # the per-chunk user slab amortized per pair)
            **roofline(n_pairs * (2.5 * 512 + 72), BR, stats["best_s"],
                       "row-granular item ops on the unified table + "
                       "pair-plane assembly"),
        }
        base = golden.get("bigRank", {}).get("examples_per_sec_cpu")
        if base and not os.environ.get("BENCH_SMALL"):
            res["examples_per_sec_cpu_reference"] = base
            res["vs_baseline"] = round(eps / base, 2)
            res["vs_baseline_median"] = round(eps_med / base, 2)
        return res

    try:
        put("bigRank", bench_rank_big())
    except Exception as e:  # pragma: no cover
        print(f"WARNING: bigRank bench failed: {e}", file=sys.stderr)

    out.close()


# ======================================================================
# Parent: jax-free supervisor.  Always prints one JSON line, exits 0.
# ======================================================================

def _read_results():
    rows = {}
    if RESULTS.exists():
        for line in RESULTS.read_text().splitlines():
            try:
                d = json.loads(line)
                rows[d["workload"]] = d["data"]
            except Exception:
                continue  # torn final write from a killed child
    return rows


def _kill_group(child):
    try:
        os.killpg(os.getpgid(child.pid), signal.SIGKILL)
    except Exception:
        try:
            child.kill()
        except Exception:
            pass
    try:
        child.wait(timeout=30)
    except Exception:
        pass


def parent_main() -> None:
    attempts = int(os.environ.get("BENCH_ATTEMPTS", "2"))
    probe_timeout = float(os.environ.get("BENCH_PROBE_TIMEOUT", "240"))
    quiet_wait = float(os.environ.get("BENCH_QUIET_WAIT", "600"))
    # 9 workloads incl. the two KDD-scale ones (dataset build + pack +
    # compile are untimed but real wall time): a full clean run is
    # ~35-40 min, so the kill timeout leaves headroom above that
    bench_timeout = float(os.environ.get("BENCH_TIMEOUT", "3300"))

    # sweep orphaned per-PID scratch from abnormal prior exits, and any
    # stale scratch under our own name
    for stale in ROOT.glob(".bench_results_*.jsonl"):
        if stale != RESULTS_CANONICAL:
            try:
                stale.unlink()
            except OSError:
                pass

    probe_ok = False
    incomplete = False
    for attempt in range(attempts):
        child = subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--child", str(RESULTS)],
            start_new_session=True,
        )
        t0 = time.time()
        while time.time() - t0 < probe_timeout:
            if "_probe" in _read_results():
                probe_ok = True
                break
            if child.poll() is not None:
                break
            time.sleep(2)
        if probe_ok:
            t1 = time.time()
            while child.poll() is None and time.time() - t1 < bench_timeout:
                time.sleep(5)
            if child.poll() is None:
                print("WARNING: bench child hung mid-run; killing, keeping "
                      "partial results", file=sys.stderr)
                _kill_group(child)
                incomplete = True
            elif child.returncode != 0:
                incomplete = True
            break
        # probe never landed (wedged backend) or child crashed pre-probe
        _kill_group(child)
        crashed = child.returncode not in (None, -signal.SIGKILL)
        print(f"WARNING: probe attempt {attempt + 1}/{attempts} failed "
              f"({'crash' if crashed else 'hang'})", file=sys.stderr)
        if attempt < attempts - 1:
            # the device needs TOTAL quiet to recover; each failed probe
            # restarts its recovery clock, so wait before the next one
            print(f"WARNING: waiting {quiet_wait:.0f}s of quiet before "
                  "retrying", file=sys.stderr)
            time.sleep(quiet_wait)

    rows = _read_results()
    try:  # publish the canonical artifact; scratch is per-PID
        if RESULTS.exists():
            RESULTS_CANONICAL.write_text(RESULTS.read_text())
            RESULTS.unlink()
    except Exception as e:  # pragma: no cover
        print(f"WARNING: could not publish {RESULTS_CANONICAL}: {e}",
              file=sys.stderr)
    probe_info = rows.pop("_probe", {})
    full, out = build_summaries(rows, probe_ok, probe_info, incomplete)
    try:
        (ROOT / ".bench_full_last.json").write_text(json.dumps(full, indent=1))
    except Exception as e:  # pragma: no cover
        print(f"WARNING: could not write .bench_full_last.json: {e}",
              file=sys.stderr)
    print(json.dumps(out))


def build_summaries(workloads, probe_ok, probe_info, incomplete):
    """Builds (full, compact) summary dicts from the per-workload results.

    The full dict (every field of every workload) is published to the
    ``.bench_full_last.json`` sidecar; the compact dict is the ONE
    printed JSON line and must fit the driver's stdout tail window
    (round 4's full-detail line overflowed it -> BENCH_r04
    "parsed: null"; tests/test_bench_summary.py pins the size).
    Compact per-workload keys:
      eps  best-rep examples/s         med  median-rep examples/s
      vs   best / reference-CPU        vsm  median / reference-CPU
      ok   the workload's quality gate (rmse/p20/learning)
      sp   spread (worst/best rep)     hot  reps with congested probe
      st_* the stacked multiIMFB measurement
    """
    golden = json.load(open(ROOT / "golden" / "GOLDEN.json"))
    base_eps = golden["basicMF"]["examples_per_sec_cpu"]
    basic = workloads.get("basicMF")
    device = probe_info.get("device")

    full = {
        "metric": "examples_per_sec_basicMF_40rounds",
        "value": basic["examples_per_sec"] if basic else 0,
        "unit": "examples/s",
        "vs_baseline": round(basic["examples_per_sec"] / base_eps, 2)
        if basic else 0,
        "tpu_unavailable": not probe_ok,
        "device": device,
        "probe_base_ms": probe_info.get("probe_base_ms"),
        "workloads": workloads,
    }
    if incomplete:
        full["bench_incomplete"] = True

    comp = {}
    for key, d in workloads.items():
        ok = d.get("rmse_ok", d.get("p20_ok", d.get("learning_ok")))
        if key == "multiIMFB":
            ok = d.get("stacked_rmse_ok")
        c = {"eps": d.get("examples_per_sec"),
             "med": d.get("examples_per_sec_median")}
        if "vs_baseline" in d:
            c["vs"] = d["vs_baseline"]
        if "vs_baseline_median" in d:
            c["vsm"] = d["vs_baseline_median"]
        if ok is not None:
            c["ok"] = ok
        c["sp"] = d.get("spread")
        if "n_hot" in d:
            c["hot"] = d["n_hot"]
        if key == "multiIMFB":  # stacked is the headline measurement
            c["st_eps"] = d.get("stacked_examples_per_sec")
            c["st_med"] = d.get("stacked_examples_per_sec_median")
            c["st_vs"] = d.get("stacked_vs_baseline")
            c["st_vsm"] = d.get("stacked_vs_baseline_median")
        comp[key] = c
    out = {
        "metric": full["metric"],
        "value": full["value"],
        "unit": full["unit"],
        "vs_baseline": full["vs_baseline"],
        "vs_baseline_median": (basic or {}).get("vs_baseline_median", 0),
        "rmse_ok": (basic or {}).get("rmse_ok"),
        "tpu_unavailable": not probe_ok,
        "device": device,
        "probe_base_ms": probe_info.get("probe_base_ms"),
        "detail": ".bench_full_last.json",
        "workloads": comp,
    }
    if incomplete:
        out["bench_incomplete"] = True
    return full, out


if __name__ == "__main__":
    if len(sys.argv) > 2 and sys.argv[1] == "--child":
        child_main(sys.argv[2])
    else:
        parent_main()
