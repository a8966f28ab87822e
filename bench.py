"""Headline benchmark: the reference demo workloads + a KDD-scale
synthetic on the default device (real TPU chip under the driver).

Primary metric: basicMF ML-100K SGD throughput (demo/basicMF, k=64,
40 rounds), RMSE-checked against the regenerated reference golden
(golden/GOLDEN.json).  Secondary metrics cover the remaining demos:
implicitFeedback (SVD++, rows_per_user=8 fused-kernel path),
neighborhoodModel, binaryClassification (each 40 rounds + RMSE parity
check), pairwiseRank, and bigTable (synthetic KDD-Cup-scale 2M-row
table, k=64) exercising the large-table write paths.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "examples/s", "vs_baseline": N,
   ..., "workloads": {...}}

vs_baseline compares against the reference C++ binary's measured
throughput on this machine's CPU (golden/GOLDEN.json) — the only
hardware the reference runs on.

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
RESULTS = ROOT / ".bench_results_last.jsonl"


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
    put("_probe", {"device": str(jax.devices()[0])})

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

    # ---- basicMF (primary) ---------------------------------------------
    def bench_basic():
        train_ds = load_feature_text("x", text=fx("ml100k.base.feature.gz"))
        test_ds = load_feature_text("x", text=fx("ml100k.test.feature.gz"))
        params = BASIC + [("batch_size", "4096")]
        tr = make(SVDFeatureTrainer, {}, params)
        tr.update_rounds(train_ds, ROUNDS)
        _ = int(tr.state.step)  # value fetch: see module docstring
        dt = None
        # ~2x run-to-run tunnel variance: time twice, report the better
        for _ in range(2):
            tr = make(SVDFeatureTrainer, {}, params)
            tr._pack(train_ds)  # staging excluded, like the reference's
            # buffer-creation step is excluded from its timing
            t0 = time.time()
            tr.update_rounds(train_ds, ROUNDS)
            _ = int(tr.state.step)
            d = time.time() - t0
            dt = d if dt is None else min(dt, d)
        eps = ROUNDS * train_ds.num_row / dt
        got = rmse(tr.predict_all(test_ds), test_ds.labels)
        want = golden["basicMF"]["final_rmse"]
        return {
            "examples_per_sec": round(eps),
            "vs_baseline": round(eps / golden["basicMF"]["examples_per_sec_cpu"], 2),
            "final_rmse": round(got, 5),
            "golden_rmse": want,
            "rmse_ok": abs(got - want) < 0.02,
        }

    try:
        put("basicMF", bench_basic())
    except Exception as e:  # pragma: no cover
        print(f"WARNING: basicMF bench failed: {e}", file=sys.stderr)

    # ---- neighborhoodModel / binaryClassification ------------------------
    def run_basic_like(key, train_name, test_name, extra, mtype_kw):
        tds = load_feature_text("x", text=fx(train_name))
        eds = load_feature_text("x", text=fx(test_name))
        p = [kv for kv in BASIC if kv[0] not in dict(extra)] + extra + [
            ("batch_size", "4096")
        ]
        t = make(SVDFeatureTrainer, mtype_kw, p)
        t.update_rounds(tds, ROUNDS)
        _ = int(t.state.step)
        t = make(SVDFeatureTrainer, mtype_kw, p)
        t._pack(tds)
        t0 = time.time()
        t.update_rounds(tds, ROUNDS)
        _ = int(t.state.step)
        d = time.time() - t0
        got = rmse(t.predict_all(eds), eds.labels)
        want = golden[key]["final_rmse"]
        eps = ROUNDS * tds.num_row / d
        put(key, {
            "examples_per_sec": round(eps),
            "vs_baseline": round(eps / golden[key]["examples_per_sec_cpu"], 2),
            "final_rmse": round(got, 5),
            "golden_rmse": want,
            "rmse_ok": abs(got - want) < 0.02,
        })

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
        dt = None
        for _ in range(2):
            tp = make(SVDPPFeatureTrainer, dict(format_type=1), pp)
            tp._pack_plus(pds)  # staging excluded, like basicMF
            t0 = time.time()
            tp.update_rounds(pds, ROUNDS)
            _ = int(tp.state.step)
            d = time.time() - t0
            dt = d if dt is None else min(dt, d)
        got = rmse(tp.predict_all(eds), eds.rows.labels)
        # compare like-for-like: round-40 RMSE vs the reference's round-40
        # (the reference trajectory overfits past its best ~0.9223 back to
        # 0.9371 by round 40; best-round parity is gated by the slow suite)
        want = float(golden["implicitFeedback"]["rmse_per_round"]["40"])
        eps = ROUNDS * pds.rows.num_row / dt
        return {
            "examples_per_sec": round(eps),
            "vs_baseline": round(
                eps / golden["implicitFeedback"]["examples_per_sec_cpu"], 2
            ),
            "final_rmse": round(got, 5),
            "golden_final_rmse": want,
            "rmse_ok": abs(got - want) < 0.02,
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
            tp = make(SVDPPMultiIMFBTrainer,
                      dict(format_type=1, extend_type=2), pp + extra)
            tp.update_rounds(data, 2)  # compile
            _ = int(tp.state.step)
            dt = None
            for _ in range(2):
                tp = make(SVDPPMultiIMFBTrainer,
                          dict(format_type=1, extend_type=2), pp + extra)
                tp._pack_plus(data)
                t0 = time.time()
                tp.update_rounds(data, rounds)
                _ = int(tp.state.step)
                d = time.time() - t0
                dt = d if dt is None else min(dt, d)
            return round(rounds * data.rows.num_row / dt)

        res = {"examples_per_sec": measure(
            pds, [("sort_blocks", "1"), ("rows_per_user", "8")]
        )}
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
        res["stacked_examples_per_sec"] = measure(sds, [])
        return res

    try:
        put("multiIMFB", bench_imfb())
    except Exception as e:  # pragma: no cover
        print(f"WARNING: multiIMFB bench failed: {e}", file=sys.stderr)

    # ---- pairwiseRank (PairSource + SIGMOID_RANK) --------------------------
    # Skeleton pair epochs (solvers/svdpp._train_pair_round): the packed
    # layout is epoch-invariant, so each round ships only the sampled
    # (pos_row, neg_row) planes, resampled one round ahead on a producer
    # thread; assembly + the epoch run in one Pallas dispatch.  P@20
    # parity is gated by tests/test_golden_full.py (slow suite) and was
    # confirmed on-device (scripts/bench_rank_device.py).
    def bench_rank():
        from svdfeature_tpu.data.rank import PairSource
        from svdfeature_tpu.data.registry import IteratorConfig

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

        def run(rounds):
            src = PairSource(train, IteratorConfig(), seed=10)
            tr = make(SVDPPFeatureTrainer,
                      dict(format_type=1, active_type=3), pp)
            tr.update_rounds(src, rounds)
            _ = int(tr.state.step)
            return tr, src

        run(1)  # compile
        n_pairs = PairSource(train, IteratorConfig()).epoch_dataset().rows.num_row
        dt = None
        for _ in range(2):
            t0 = time.time()
            tr, _ = run(ROUNDS)
            d = time.time() - t0
            dt = d if dt is None else min(dt, d)
        res = {
            "examples_per_sec": round(ROUNDS * n_pairs / dt),
            "pairs_per_round": n_pairs,
        }
        # reference 40-round wall time on the same 3N workload (its pair
        # counts follow the same deterministic formula,
        # apex_svd_data.cpp:812-1025)
        ref_s = golden.get("pairwiseRank", {}).get("train_seconds_40rounds_cpu")
        if ref_s:
            base = 40 * n_pairs / ref_s
            res["examples_per_sec_cpu_reference"] = round(base)
            res["vs_baseline"] = round(res["examples_per_sec"] / base, 2)
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
            ("num_factor", str(KF)), ("batch_size", str(min(1 << 19, EX // 4))),
        ]
        BR = 5
        probe = bds.slice_rows(0, 4096)
        tb = make(SVDFeatureTrainer, {}, bp)
        rmse0 = rmse(tb.predict_all(probe), probe.labels)
        tb.update_rounds(bds, 1)  # compile + warm
        _ = int(tb.state.step)
        t0 = time.time()
        tb.update_rounds(bds, BR)
        _ = int(tb.state.step)
        d = time.time() - t0
        big_eps = round(BR * EX / d)
        rmse1 = rmse(tb.predict_all(probe), probe.labels)
        res = {
            "examples_per_sec": big_eps,
            "table_rows": NU + NI,
            "write_path": "sweep" if tb.hp.sweep_table else "dedup",
            "rmse_start": round(rmse0, 5),
            "rmse_after": round(rmse1, 5),
            "learning_ok": rmse1 < rmse0,
        }
        # reference C++ binary on the same synthetic, this host's CPU
        # (golden/GOLDEN.json, regenerated by golden/provenance_run_golden.sh)
        base = golden.get("bigTable", {}).get("examples_per_sec_cpu")
        if base and not os.environ.get("BENCH_SMALL"):
            res["examples_per_sec_cpu_reference"] = base
            res["vs_baseline"] = round(big_eps / base, 2)
        return res

    try:
        put("bigTable", bench_big())
    except Exception as e:  # pragma: no cover
        print(f"WARNING: bigTable bench failed: {e}", file=sys.stderr)

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
    bench_timeout = float(os.environ.get("BENCH_TIMEOUT", "2400"))

    if RESULTS.exists():
        RESULTS.unlink()

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
    device = rows.pop("_probe", {}).get("device")
    workloads = rows

    golden = json.load(open(ROOT / "golden" / "GOLDEN.json"))
    base_eps = golden["basicMF"]["examples_per_sec_cpu"]
    basic = workloads.get("basicMF")
    big = workloads.get("bigTable", {})
    out = {
        "metric": "examples_per_sec_basicMF_40rounds",
        "value": basic["examples_per_sec"] if basic else 0,
        "unit": "examples/s",
        "vs_baseline": round(basic["examples_per_sec"] / base_eps, 2) if basic else 0,
        "tpu_unavailable": not probe_ok,
        "device": device,
        "workloads": workloads,
    }
    if basic:
        out.update(
            final_rmse=basic["final_rmse"],
            golden_rmse=basic["golden_rmse"],
            rmse_ok=basic["rmse_ok"],
        )
    if "implicitFeedback" in workloads:
        out["svdpp_examples_per_sec"] = workloads["implicitFeedback"][
            "examples_per_sec"]
    if big:
        out["bigtable_examples_per_sec"] = big.get("examples_per_sec")
        if "vs_baseline" in big:
            out["bigtable_vs_baseline"] = big["vs_baseline"]
    if incomplete:
        out["bench_incomplete"] = True
    print(json.dumps(out))


if __name__ == "__main__":
    if len(sys.argv) > 2 and sys.argv[1] == "--child":
        child_main(sys.argv[2])
    else:
        parent_main()
