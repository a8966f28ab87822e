"""Full-horizon golden gates (marked slow; run with `pytest -m slow`).

Complete 40-round RMSE trajectories for the four regression demos plus
the pairwiseRank P@20 pipeline, against the numbers regenerated from the
reference binaries (golden/GOLDEN.json; provenance
golden/provenance_run_golden.sh).  The fast suite runs shortened
horizons (tests/test_golden_e2e.py); this file is the CI-runnable proof
that nothing drifts between rounds 10 and 40.

Reference harness being mirrored: svd_feature_infer task_eval
(svd_feature_infer.cpp:243-277) and demo/pairwiseRank/eval.py.
"""

import json
import subprocess
import sys

import numpy as np
import pytest

from svdfeature_tpu.data.text import load_feature_text, load_plus_text
from svdfeature_tpu.params import SVDTypeParam, svd_type
from svdfeature_tpu.solvers.base import SVDFeatureTrainer
from svdfeature_tpu.solvers.svdpp import SVDPPFeatureTrainer
from tests.conftest import GOLDEN, read_fixture_text

pytestmark = pytest.mark.slow

BASIC = dict(
    base_score=3, learning_rate=0.005, wd_item=0.004, wd_user=0.004,
    num_item=1682, num_user=943, num_global=0, num_factor=64,
)


@pytest.fixture(scope="module")
def golden():
    return json.load(open(GOLDEN / "GOLDEN.json"))


def make_trainer(cls, mtype_kw, params):
    mt = SVDTypeParam(**mtype_kw)
    tr = cls(mt)
    for n, v in params.items():
        tr.set_param(n, str(v))
    tr.init_model()
    tr.init_trainer()
    return tr


def rmse(pred, labels):
    d = np.asarray(pred) - np.asarray(labels)
    return float(np.sqrt(np.mean(d * d)))


def trajectory(tr, train, test, labels, rounds=40):
    out = []
    for _ in range(rounds):
        tr.update_all(train)
        out.append(rmse(tr.predict_all(test), labels))
    return out


def assert_trajectory(got, want_map, tol, tail_tol=None, tail_from=20):
    """Per-round deviation bound; optionally tighter on the late rounds
    (the converged regime the reference's metrics are quoted from)."""
    for r, g in enumerate(got, start=1):
        want = want_map[str(r)] if str(r) in want_map else want_map[r]
        lim = tol if (tail_tol is None or r < tail_from) else tail_tol
        assert abs(g - want) < lim, (r, g, want, lim)


def test_basicmf_40round_trajectory(ml100k_base_text, ml100k_test_text, golden):
    train = load_feature_text("x", text=ml100k_base_text)
    test = load_feature_text("x", text=ml100k_test_text)
    tr = make_trainer(SVDFeatureTrainer, {}, BASIC)
    got = trajectory(tr, train, test, test.labels)
    assert_trajectory(got, golden["basicMF"]["rmse_per_round"], 0.003)


def test_binary_40round_trajectory(golden):
    train = load_feature_text("x", text=read_fixture_text("ml100k.base.bin.feature.gz"))
    test = load_feature_text("x", text=read_fixture_text("ml100k.test.bin.feature.gz"))
    p = dict(BASIC, base_score=0.5, active_type=2)
    tr = make_trainer(SVDFeatureTrainer, dict(active_type=2), p)
    got = trajectory(tr, train, test, test.labels)
    assert_trajectory(got, golden["binaryClassification"]["rmse_per_round"], 0.003)


def test_neighborhood_40round_trajectory(golden):
    train = load_feature_text("x", text=read_fixture_text("ml100k.base.nb.feature.gz"))
    test = load_feature_text("x", text=read_fixture_text("ml100k.test.nb.feature.gz"))
    p = dict(BASIC, num_global=6, wd_global=0.001)
    tr = make_trainer(SVDFeatureTrainer, {}, p)
    got = trajectory(tr, train, test, test.labels)
    assert_trajectory(got, golden["neighborhoodModel"]["rmse_per_round"], 0.004)


def test_implicit_feedback_40round_trajectory(golden):
    train = load_plus_text(
        "x", "y",
        text=read_fixture_text("ml100k.base.group.feature.gz"),
        feedback_text=read_fixture_text("ml100k.base.feedback.gz"),
    )
    test = load_plus_text(
        "x", "y",
        text=read_fixture_text("ml100k.test.ug.feature.gz"),
        feedback_text=read_fixture_text("ml100k.test.feedback.gz"),
    )
    p = dict(BASIC, format_type=1, num_ufeedback=1682, wd_ufeedback=0.004)
    tr = make_trainer(
        SVDPPFeatureTrainer, dict(format_type=svd_type.USER_GROUP_FORMAT), p
    )
    got = trajectory(tr, train, test, test.rows.labels)
    # batched SVD++ lags the sequential trajectory early and converges to
    # the same optimum: loose early bound, tighter from round 20 on (the
    # 0.008 tail covers the post-optimum overfitting regime, where the
    # batched run diverges by up to ~0.006; the best-round RMSE below is
    # the 0.003-gated headline metric)
    assert_trajectory(
        got, golden["implicitFeedback"]["rmse_per_round"], 0.05, tail_tol=0.008
    )
    want_best = min(
        float(v) for v in golden["implicitFeedback"]["rmse_per_round"].values()
    )
    assert abs(min(got) - want_best) < 0.003, (min(got), want_best)


def _implicit_feedback_data():
    train = load_plus_text(
        "x", "y",
        text=read_fixture_text("ml100k.base.group.feature.gz"),
        feedback_text=read_fixture_text("ml100k.base.feedback.gz"),
    )
    test = load_plus_text(
        "x", "y",
        text=read_fixture_text("ml100k.test.ug.feature.gz"),
        feedback_text=read_fixture_text("ml100k.test.feedback.gz"),
    )
    return train, test


def _read_rmse_tsv(name):
    out = {}
    for line in (GOLDEN / name).read_text().splitlines():
        r, v = line.split()
        out[int(r)] = float(v)
    return out


def _side_solver_trajectory(extend_type, rounds):
    """Drive an extend_type through the registry on the implicitFeedback
    workload — the configuration the side-solver goldens were generated
    with (reference binary, extend_type=15/2; on ML-100K both degenerate
    to plain SVD++: bilinear because the shipped binary's
    prepare_ufeedback override never binds — virtual on a non-virtual
    base, apex_svd_bilinear.h:170-181 — and multi-IMFB because DEFAULT
    blocks have stack depth 1, apex_multi_imfb.h:83-109)."""
    from svdfeature_tpu.solvers.registry import create_svd_trainer

    train, test = _implicit_feedback_data()
    p = dict(BASIC, format_type=1, num_ufeedback=1682, wd_ufeedback=0.004)
    mt = SVDTypeParam(
        format_type=svd_type.USER_GROUP_FORMAT, extend_type=extend_type
    )
    tr = create_svd_trainer(mt)
    for n, v in p.items():
        tr.set_param(n, str(v))
    tr.init_model()
    tr.init_trainer()
    return trajectory(tr, train, test, test.rows.labels, rounds=rounds)


def test_bilinear_golden_trajectory():
    """golden/bilinear.rmse.tsv: reference extend_type=15 on the
    implicitFeedback workload, 8 rounds (== the reference SVD++ run; see
    _side_solver_trajectory).  Batched-vs-sequential bound as in the
    implicitFeedback gate's early regime."""
    want = _read_rmse_tsv("bilinear.rmse.tsv")
    got = _side_solver_trajectory(15, rounds=len(want))
    assert_trajectory(got, want, 0.01)


def test_multi_imfb_golden_trajectory():
    """golden/multi_imfb.rmse.tsv: reference extend_type=2 on the
    implicitFeedback workload, 8 rounds."""
    want = _read_rmse_tsv("multi_imfb.rmse.tsv")
    got = _side_solver_trajectory(2, rounds=len(want))
    assert_trajectory(got, want, 0.01)


def test_gbrt_reg_golden_trajectory():
    """golden/gbrt_reg.rmse.tsv: reference extend_type=31 (RegGBRT) on
    the implicitFeedback workload with the recorded tree params.  The
    exact-greedy fit is deterministic, so parity is 6 decimals (the
    tolerance below is rounding headroom only)."""
    from svdfeature_tpu.solvers.registry import create_svd_trainer

    train, test = _implicit_feedback_data()
    p = dict(
        BASIC, format_type=1, num_ufeedback=1682, wd_ufeedback=0.004,
        extend_type=31, num_spec_sparse=943, learning_rate=0.3,
        min_split_loss=1, min_split_instance=100, min_child_instance=20,
        min_child_weight=5, min_split_weight=10, max_depth=5, rt_loss_type=1,
    )
    mt = SVDTypeParam()
    for n, v in p.items():
        mt.set_param(n, str(v))
    mt.decide_format()
    tr = create_svd_trainer(mt)
    for n, v in p.items():
        tr.set_param(n, str(v))
    tr.init_model()
    tr.init_trainer()
    want = _read_rmse_tsv("gbrt_reg.rmse.tsv")
    for r in range(len(want)):
        tr.set_round(r)
        tr.update_all(train)
        tr.finish_round()
        got = rmse(tr.predict_all(test), test.rows.labels)
        assert abs(got - want[r + 1]) < 5e-6, (r + 1, got, want[r + 1])


def test_pairwise_rank_p20_full(golden, tmp_path):
    """Drive the complete pairwiseRank demo pipeline (buffers -> 40-round
    train -> ranker pred) and pin P@20 + the pred.txt golden diff."""
    import pathlib
    import shutil

    demo = pathlib.Path(__file__).parent.parent / "demo" / "pairwiseRank"
    run = tmp_path
    shutil.copy(demo / "pairwiseRank.conf", run)
    import gzip

    for src, dst in [
        ("ml100k.rank.base.feature.gz", "ua.base.rank.feature"),
        ("ml100k.rank.base.feedback.gz", "ua.base.rank.feedback"),
        ("ml100k.rank.test.feature.gz", "ua.test.rank.feature"),
        ("ml100k.rank.test.feedback.gz", "ua.test.rank.feedback"),
    ]:
        with gzip.open(pathlib.Path(__file__).parent / "fixtures" / src, "rt") as f:
            (run / dst).write_text(f.read())

    env = dict(JAX_PLATFORMS="cpu", PYTHONPATH=str(pathlib.Path(__file__).parent.parent))
    import os

    env = {**os.environ, **env}

    def cli(mod, *args):
        subprocess.run(
            [sys.executable, "-m", mod, *args], cwd=run, env=env, check=True,
            stdout=subprocess.DEVNULL,
        )

    cli("svdfeature_tpu.cli.make_ugroup_buffer", "ua.base.rank.feature",
        "buffer.base.svdpp", "-fd", "ua.base.rank.feedback", "-scale_score", "5")
    cli("svdfeature_tpu.cli.make_ugroup_buffer", "ua.test.rank.feature",
        "buffer.test.svdpp", "-fd", "ua.test.rank.feedback", "-scale_score", "1",
        "-max_block", "400")
    cli("svdfeature_tpu.cli.svd_feature", "pairwiseRank.conf", "num_round=40")
    cli("svdfeature_tpu.cli.svd_feature_infer", "pairwiseRank.conf", "pred=40")

    # P@20 exactly as demo/pairwiseRank/eval.py computes it: pred.txt is
    # one rank position per positive item; hit = rank < 20, denominator
    # 943 users x 20 (eval.py:10-20)
    got_lines = (run / "pred.txt").read_text().split()
    want_lines = (GOLDEN / "pairwiseRank.pred.txt").read_text().split()
    assert len(got_lines) == len(want_lines)
    p20 = sum(1 for v in got_lines if int(v) < 20) / (943 * 20.0)
    want_p20 = golden["pairwiseRank"]["precision_at_20"]
    assert abs(p20 - want_p20) < 0.003, (p20, want_p20)
    # per-position rank equality vs the reference run is not asserted
    # (different PRNG -> different factors); the metric is the contract,
    # golden/pairwiseRank.pred.txt documents the reference output


def _stack_depth2(pds):
    """The depth-2 taxonomy transform the stacked golden was generated
    with: per user, START(user fb, first half rows) keeps the user
    context open, a DEFAULT sub-block (half fb, second half) trains at
    depth 2, END pops.  The golden buffer was written by
    data/buffer.write_plus_buffer and trained by the reference binary
    (extend_type=2) — byte-level interop is part of what this pins."""
    import numpy as np

    from svdfeature_tpu.data.csr import (
        PlusBlock, PlusDataset, TAG_END, TAG_START,
    )

    blocks = []
    for blk in pds.blocks():
        n = blk.data.num_row
        if n >= 2:
            h = n // 2
            blocks += [
                PlusBlock(blk.fb_index, blk.fb_value,
                          blk.data.slice_rows(0, h), extend_tag=TAG_START),
                PlusBlock(blk.fb_index[: max(1, len(blk.fb_index) // 2)],
                          blk.fb_value[: max(1, len(blk.fb_value) // 2)],
                          blk.data.slice_rows(h, n - h)),
                # END repeats the START list: the reference pops
                # through the POPPING block's list (apex_multi_imfb.h:173-179)
                # and its generator emits the same list on both
                # (kddcup_combine_ugroup.cpp:196-230)
                PlusBlock(blk.fb_index, blk.fb_value,
                          blk.data.slice_rows(n, 0), extend_tag=TAG_END),
            ]
        else:
            blocks.append(blk)
    return PlusDataset.from_blocks(blocks)


def test_multi_imfb_stacked_golden_trajectory():
    """golden/multi_imfb_stacked.rmse.tsv: reference extend_type=2 on a
    genuinely STACKED (depth-2 START/DEFAULT/END) variant of the
    implicitFeedback workload — the nested-context machinery itself
    (apex_multi_imfb.h:83-148), not the all-DEFAULT degenerate case."""
    from svdfeature_tpu.params import SVDTypeParam
    from svdfeature_tpu.solvers.registry import create_svd_trainer

    want = _read_rmse_tsv("multi_imfb_stacked.rmse.tsv")
    train, test = _implicit_feedback_data()
    strain = _stack_depth2(train)
    p = dict(BASIC, format_type=1, num_ufeedback=1682, wd_ufeedback=0.004)
    mt = SVDTypeParam(format_type=svd_type.USER_GROUP_FORMAT, extend_type=2)
    tr = create_svd_trainer(mt)
    for n, v in p.items():
        tr.set_param(n, str(v))
    tr.init_model()
    tr.init_trainer()
    assert not tr._plain_svdpp(strain)  # genuinely stacked
    got = trajectory(tr, strain, test, test.rows.labels, rounds=len(want))
    assert_trajectory(got, want, 0.01)
