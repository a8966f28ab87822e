"""Out-of-core streaming pipeline (data/streaming.py).

The contract: with examples_per_chunk a multiple of batch_size, the
streamed training trajectory is IDENTICAL to staging the whole dataset
(chunk boundaries only regroup dispatches, padding carries weight 0),
and host memory stays bounded by the prefetch depth.
"""

import numpy as np
import pytest

from svdfeature_tpu.data.buffer import write_csr_buffer
from svdfeature_tpu.data.streaming import StreamingCSRBuffer
from svdfeature_tpu.data.text import load_feature_text
from svdfeature_tpu.params import SVDTypeParam
from svdfeature_tpu.solvers.base import SVDFeatureTrainer


def make_ds(rows=700, nu=40, ni=60, seed=0):
    rng = np.random.RandomState(seed)
    lines = [
        f"{rng.randint(1, 6)} 0 1 1 {rng.randint(0, nu)}:1 {rng.randint(0, ni)}:1"
        for _ in range(rows)
    ]
    return load_feature_text("x", text="\n".join(lines))


def make_trainer(nu=40, ni=60, batch=64):
    tr = SVDFeatureTrainer(SVDTypeParam())
    for k, v in dict(
        num_user=nu, num_item=ni, num_factor=8, base_score=3,
        learning_rate=0.01, wd_user=0.004, wd_item=0.004, batch_size=batch,
    ).items():
        tr.set_param(k, str(v))
    tr.init_model()
    tr.init_trainer()
    return tr


def test_prescan_structure(tmp_path):
    ds = make_ds()
    path = str(tmp_path / "b.buffer")
    write_csr_buffer(path, ds, batch_size=100)
    src = StreamingCSRBuffer(path, examples_per_chunk=256)
    assert src.num_row == ds.num_row
    assert src.max_nnz == [1, 1, 1]
    total = sum(c.num_row for c in src.chunks())
    assert total == ds.num_row


def test_streamed_trajectory_equals_staged(tmp_path):
    ds = make_ds()
    path = str(tmp_path / "b.buffer")
    # file batch granularity 64 = solver batch size, chunk = 256 examples
    write_csr_buffer(path, ds, batch_size=64)
    src = StreamingCSRBuffer(path, examples_per_chunk=256)

    staged = make_trainer()
    for _ in range(3):
        staged.update_all(ds)
    streamed = make_trainer()
    for _ in range(3):
        streamed.update_all(src)

    np.testing.assert_allclose(
        np.asarray(staged.state.w), np.asarray(streamed.state.w), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(staged.state.b), np.asarray(streamed.state.b), atol=1e-6
    )
    assert int(staged.state.step) == int(streamed.state.step)


def test_streaming_registry_route(tmp_path):
    """streaming=1 + input_type=0 yields a StreamingCSRBuffer through the
    input registry, auto-creating the buffer from text like the reference
    factory (apex_svd_data.cpp:227-238)."""
    from svdfeature_tpu.data.registry import IteratorConfig, load_csr_source

    ds = make_ds(rows=130)
    txt = tmp_path / "data.txt"
    lines = []
    for r in range(ds.num_row):
        label, g, u, i = ds.row(r)
        lines.append(
            f"{label:g} 0 1 1 {int(u[0][0])}:{u[1][0]:g} {int(i[0][0])}:{i[1][0]:g}"
        )
    txt.write_text("\n".join(lines))
    cfg = IteratorConfig()
    cfg.set_param("streaming", "1")
    cfg.set_param("stream_chunk", "50")
    cfg.set_param("data_in", str(txt))
    cfg.set_param("buffer_feature", str(tmp_path / "auto.buffer"))
    src = load_csr_source(0, cfg)
    assert hasattr(src, "chunks")
    assert src.num_row == 130
    assert sum(c.num_row for c in src.chunks()) == 130
