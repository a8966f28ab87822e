"""Attach/filter iterator combinators + lite example solver + RunQueue."""

import numpy as np

from svdfeature_tpu.data.combinators import AttachedPlusSource, FilteredPlusSource
from svdfeature_tpu.data.registry import IteratorConfig, load_plus_source
from svdfeature_tpu.data.text import load_plus_text
from svdfeature_tpu.utils import RunQueue


def tiny(n_users=4, label0=1.0):
    rows, fb = [], []
    for u in range(n_users):
        for i in range(2):
            rows.append(f"{label0} 1 1 1 2:1 {u}:1 {u*2+i}:1")
        fb.append(f"2 2 {u*2}:0.7 {u*2+1}:0.7")
    return load_plus_text("x", "y", text="\n".join(rows), feedback_text="\n".join(fb))


def test_attach_interleave():
    p = tiny(4, 1.0)
    a = tiny(2, 9.0)
    out = AttachedPlusSource(p, a, attach_skip=2, attach_insert=1).materialize()
    # 4 primary blocks, attach 1 after every 2 -> p p a p p a
    assert out.num_block == 6
    tags = [out.block(i).data.labels[0] for i in range(6)]
    assert tags == [1.0, 1.0, 9.0, 1.0, 1.0, 9.0]
    extra = [out.block(i).extra_info for i in range(6)]
    assert extra == [0, 0, 1, 0, 0, 1]


def test_attach_loops_short_stream():
    p = tiny(4, 1.0)
    a = tiny(1, 9.0)  # shorter; must rewind
    out = AttachedPlusSource(p, a, attach_skip=1, attach_insert=1).materialize()
    assert out.num_block == 8
    assert sum(out.block(i).extra_info for i in range(8)) == 4


def test_filter_ranges():
    ds = tiny(2)
    out = FilteredPlusSource(ds, [(0, 2)], [(2, 3)]).materialize()
    b0 = out.block(0)
    # feedback ids 0,1 zeroed for user 0
    assert np.all(b0.fb_value == 0.0)
    b1 = out.block(1)
    assert np.all(b1.fb_value != 0.0)  # ids 2,3 not in range
    # global feature id 2 zeroed everywhere
    _, g, _, _ = out.rows.row(0)
    assert g[1][0] == 0.0


def test_registry_dtype_encoding():
    """dtype 111 = attach(text, text); dtype 201 = filter(text)
    (apex_svd_data.cpp:1313-1324)."""
    import tempfile, os

    with tempfile.TemporaryDirectory() as td:
        base = os.path.join(td, "b.txt")
        fbp = os.path.join(td, "b.fb")
        rows, fb = [], []
        for u in range(3):
            rows.append(f"1 0 1 1 {u}:1 {u}:1")
            fb.append(f"1 1 {u}:1")
        open(base, "w").write("\n".join(rows))
        open(fbp, "w").write("\n".join(fb))
        cfg = IteratorConfig()
        cfg.set_param("data_in", base)
        cfg.set_param("feedback_in", fbp)
        out = load_plus_source(111, cfg)
        assert out.num_block == 6  # 3 primary + 3 attached
        cfg2 = IteratorConfig()
        cfg2.set_param("data_in", base)
        cfg2.set_param("feedback_in", fbp)
        cfg2.set_param("filter_ufeedback", "0-1")
        out2 = load_plus_source(201, cfg2)
        assert out2.fb_value[out2.fb_index == 0].sum() == 0.0


def test_lite_solver_matches_base():
    from svdfeature_tpu.data.text import load_feature_text
    from svdfeature_tpu.params import SVDTypeParam
    from svdfeature_tpu.solvers.base import SVDFeatureTrainer
    from svdfeature_tpu.solvers.registry import create_svd_trainer

    rng = np.random.RandomState(0)
    rows = [
        f"{rng.randint(1,6)} 0 1 1 {rng.randint(0,10)}:1 {rng.randint(0,20)}:1"
        for _ in range(200)
    ]
    ds = load_feature_text("x", text="\n".join(rows))
    params = dict(num_user=10, num_item=20, num_factor=8, base_score=3,
                  learning_rate=0.01, wd_user=0.004, wd_item=0.004)

    def mk(et):
        mt = SVDTypeParam(extend_type=et)
        mt.decide_format(0)
        tr = create_svd_trainer(mt)
        for k, v in params.items():
            tr.set_param(k, str(v))
        tr.init_model()
        tr.init_trainer()
        return tr

    import svdfeature_tpu.solvers.example  # noqa: F401  (registers 99)

    t_base, t_lite = mk(0), mk(99)
    assert type(t_lite).__name__ == "SVDFeatureLiteTrainer"
    for _ in range(2):
        t_base.update_all(ds)
        t_lite.update_all(ds)
    np.testing.assert_allclose(
        np.asarray(t_base.state.w), np.asarray(t_lite.state.w), rtol=1e-5, atol=1e-7
    )


def test_runqueue():
    q = RunQueue(3)
    assert q.put(1) and q.put(2)
    assert not q.put(1)  # dedup
    assert q.get() == 1
    assert q.put(3) and q.put(4)
    assert not q.put(5)  # full (capacity 3)
    assert [q.get(), q.get(), q.get()] == [2, 3, 4]
    assert q.empty()
