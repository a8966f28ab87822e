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


# --------------------------------------------------------------------------
# user-group (SVD++) streaming
# --------------------------------------------------------------------------
def make_plus_ds(users=12, seed=3, block_max_line=10000):
    from svdfeature_tpu.data.text import load_plus_text

    rng = np.random.RandomState(seed)
    data_lines, fb_lines = [], []
    for u in range(users):
        nrows = int(rng.randint(2, 7))
        nfb = int(rng.randint(1, 5))
        fb_lines.append(
            f"{nrows} {nfb} "
            + " ".join(f"{rng.randint(0, 15)}:{rng.rand():.3f}" for _ in range(nfb))
        )
        for _ in range(nrows):
            data_lines.append(
                f"{rng.randint(1, 6)} 0 1 1 {u}:1 {rng.randint(0, 12)}:1"
            )
    return load_plus_text(
        "x", "y", text="\n".join(data_lines),
        feedback_text="\n".join(fb_lines), block_max_line=block_max_line,
    )


def make_plus_trainer(users=12, extra=None):
    from svdfeature_tpu.solvers.svdpp import SVDPPFeatureTrainer

    tr = SVDPPFeatureTrainer(SVDTypeParam(format_type=1))
    params = dict(
        num_user=users, num_item=12, num_ufeedback=15, num_factor=8,
        base_score=3, learning_rate=0.01, wd_user=0.004, wd_item=0.004,
        wd_ufeedback=0.004, users_per_batch=2,
    )
    params.update(extra or {})
    for k, v in params.items():
        tr.set_param(k, str(v))
    tr.init_model()
    tr.init_trainer()
    return tr


def test_plus_prescan_and_chunks(tmp_path):
    from svdfeature_tpu.data.buffer import write_plus_buffer
    from svdfeature_tpu.data.streaming import StreamingPlusBuffer

    # block_max_line=3 forces START/MIDDLE/END split families in the file
    ds = make_plus_ds(block_max_line=3)
    path = str(tmp_path / "p.buffer")
    write_plus_buffer(path, ds)
    src = StreamingPlusBuffer(path, blocks_per_chunk=4)
    assert src.num_block == 12  # logical blocks, families merged
    assert src.num_row == ds.rows.num_row
    # families never straddle chunks: every streamed chunk merges cleanly
    total_rows = total_blocks = 0
    from svdfeature_tpu.data.batching_plus import merge_split_blocks

    for chunk in src.chunks():
        logical = merge_split_blocks(chunk)
        assert len(logical) <= 4
        total_blocks += len(logical)
        total_rows += chunk.rows.num_row
    assert total_blocks == 12 and total_rows == ds.rows.num_row
    caps = src.plan_caps(G=2, M=1)
    assert caps["t_cap"] >= 1 and caps["c_cap"] >= 3


@pytest.mark.parametrize("split", [False, True])
def test_plus_streamed_trajectory_equals_staged(tmp_path, split):
    from svdfeature_tpu.data.buffer import write_plus_buffer
    from svdfeature_tpu.data.streaming import StreamingPlusBuffer

    ds = make_plus_ds(block_max_line=3 if split else 10000)
    path = str(tmp_path / "p.buffer")
    write_plus_buffer(path, ds)
    # 4 logical blocks per chunk = 2 batches of users_per_batch=2
    src = StreamingPlusBuffer(path, blocks_per_chunk=4)

    staged = make_plus_trainer()
    for _ in range(3):
        staged.update_all(ds)
    streamed = make_plus_trainer()
    for _ in range(3):
        streamed.update_all(src)

    np.testing.assert_allclose(
        np.asarray(staged.state.w), np.asarray(streamed.state.w), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(staged.state.b), np.asarray(streamed.state.b), atol=1e-6
    )
    assert int(staged.state.step) == int(streamed.state.step)


def test_plus_streaming_registry_route(tmp_path):
    from svdfeature_tpu.data.registry import IteratorConfig, load_plus_source

    ds = make_plus_ds()
    from svdfeature_tpu.data.buffer import write_plus_buffer

    path = str(tmp_path / "p.buffer")
    write_plus_buffer(path, ds)
    cfg = IteratorConfig()
    cfg.set_param("streaming", "1")
    cfg.set_param("stream_chunk", "4")
    cfg.set_param("buffer_feature", path)
    src = load_plus_source(0, cfg)
    assert hasattr(src, "plan_caps")
    assert src.num_block == 12


def test_plus_streamed_big_table(tmp_path, monkeypatch):
    """Streaming + big-table routing: capped chunk shapes through
    train_epoch_plus_big (reserved padding chunk included) must match the
    staged big-table run."""
    from svdfeature_tpu.data.buffer import write_plus_buffer
    from svdfeature_tpu.data.streaming import StreamingPlusBuffer
    from svdfeature_tpu.ops import embed

    monkeypatch.setattr(embed, "ONEHOT_THRESHOLD", 4)
    ds = make_plus_ds(block_max_line=3)
    path = str(tmp_path / "p.buffer")
    write_plus_buffer(path, ds)
    src = StreamingPlusBuffer(path, blocks_per_chunk=4)

    staged = make_plus_trainer()
    assert staged.hp.big_table
    for _ in range(2):
        staged.update_all(ds)
    # the staged side engages the user-carry epoch on this layout
    assert "chunk_users" in staged._pack_plus(ds)[2]
    streamed = make_plus_trainer()
    assert streamed.hp.big_table
    # ... and so does every streamed chunk (cap-stable plan shape)
    caps = src.plan_caps(2, 1)
    entry = streamed.pack_plus_chunk(next(src.chunks()), caps)
    assert "chunk_users" in entry[2]
    assert entry[2]["chunk_users"].shape[0] == entry[2]["fb_idx"].shape[0]
    for _ in range(2):
        streamed.update_all(src)

    np.testing.assert_allclose(
        np.asarray(staged.state.w), np.asarray(streamed.state.w), atol=1e-6
    )
    assert int(staged.state.step) == int(streamed.state.step)


def test_streaming_ignored_for_composite_plus_types(tmp_path):
    """Composite (filter) and rank input types materialize their inner
    source even with streaming=1 — combinators transform whole datasets."""
    from svdfeature_tpu.data.buffer import write_plus_buffer
    from svdfeature_tpu.data.csr import PlusDataset
    from svdfeature_tpu.data.registry import IteratorConfig, load_plus_source

    ds = make_plus_ds()
    path = str(tmp_path / "p.buffer")
    write_plus_buffer(path, ds)
    cfg = IteratorConfig()
    cfg.set_param("streaming", "1")
    cfg.set_param("buffer_feature", path)
    cfg.set_param("filter_ufeedback", "0-5")
    src = load_plus_source(200, cfg)  # filter wrapping BINARY_BUFFER
    assert isinstance(src, PlusDataset)


def _reorder_chunklocal(pds, span):
    """The staged equivalent of chunk-local sorting: stable size-desc
    reorder of logical blocks WITHIN each span-block window."""
    from svdfeature_tpu.data.batching_plus import merge_split_blocks
    from svdfeature_tpu.data.csr import PlusDataset

    blocks = merge_split_blocks(pds)
    out = []
    for lo in range(0, len(blocks), span):
        window = blocks[lo : lo + span]
        sizes = np.array([b.data.num_row for b in window])
        out.extend(window[int(i)] for i in np.argsort(-sizes, kind="stable"))
    return PlusDataset.from_blocks(out)


def test_sorted_streamed_plus_matches_staged_chunklocal(tmp_path):
    """sort_blocks=1 under streaming=1 sorts WITHIN each streamed chunk
    (the stream never holds the whole dataset); the trajectory equals a
    staged run on the equivalently chunk-locally-reordered dataset, and
    the cap plan mirrors the sorted layout (plan_caps sort_local)."""
    from svdfeature_tpu.data.buffer import write_plus_buffer
    from svdfeature_tpu.data.streaming import StreamingPlusBuffer

    ds = make_plus_ds()
    path = str(tmp_path / "p.buffer")
    write_plus_buffer(path, ds)
    src = StreamingPlusBuffer(path, blocks_per_chunk=4)

    staged = make_plus_trainer()  # unsorted, on the pre-reordered data
    ref_ds = _reorder_chunklocal(ds, 4)
    streamed = make_plus_trainer(extra={"sort_blocks": 1})
    for _ in range(3):
        staged.update_all(ref_ds)
        streamed.update_all(src)

    np.testing.assert_allclose(
        np.asarray(staged.state.w), np.asarray(streamed.state.w), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(staged.state.b), np.asarray(streamed.state.b), atol=1e-6
    )
    assert int(staged.state.step) == int(streamed.state.step)


def test_sorted_plan_caps_mirror_and_shrink(tmp_path):
    """plan_caps(sort_local=True) must (a) never under-provision the
    sorted chunk packs and (b) realize the sorted-packing scan-length
    win on skewed block sizes — the throughput reason sort_blocks
    exists (PERF.md: 2-3x padding cut on SVD++)."""
    from svdfeature_tpu.data.buffer import write_plus_buffer
    from svdfeature_tpu.data.csr import PlusBlock, PlusDataset
    from svdfeature_tpu.data.streaming import StreamingPlusBuffer
    from svdfeature_tpu.data.text import load_feature_text

    rng = np.random.RandomState(5)
    blocks = []
    # alternating tiny/huge blocks: file-order G=2 groups always pair a
    # huge with a tiny (max padding); sorted chunks pair like with like
    for u, n in enumerate([1, 16] * 8):
        lines = "\n".join(
            f"{rng.randint(1, 6)} 0 1 1 {u}:1 {rng.randint(0, 12)}:1"
            for _ in range(n)
        )
        data = load_feature_text("x", text=lines)
        blocks.append(PlusBlock(
            np.array([u % 15], np.uint32), np.ones(1, np.float32), data))
    ds = PlusDataset.from_blocks(blocks)
    path = str(tmp_path / "skew.buffer")
    write_plus_buffer(path, ds)
    src = StreamingPlusBuffer(path, blocks_per_chunk=8)
    plain = src.plan_caps(G=2, M=1)
    srt = src.plan_caps(G=2, M=1, sort_local=True)
    # file order: 4 groups x max 16 = 64; sorted: 16+16+1+1 = 34
    assert srt["t_cap"] < plain["t_cap"]
    # and the sorted caps really fit the sorted packs: a full round
    # packs every chunk without a cap violation
    tr = make_plus_trainer(users=16, extra={"sort_blocks": 1})
    tr.update_all(src)
    assert int(tr.state.step) > 0


def test_stacked_sorted_streamed_matches_staged(tmp_path):
    """STACKED multi-IMFB x streaming x sort_blocks: with a single
    streamed chunk the chunk-local sort IS the whole-dataset sort, so
    the streamed trajectory must equal the staged sorted run exactly
    (context snapshots ride with the reordered units)."""
    from svdfeature_tpu.data.buffer import write_plus_buffer
    from svdfeature_tpu.data.streaming import StreamingPlusBuffer

    pds = make_stacked_ds()
    path = str(tmp_path / "p.buffer")
    write_plus_buffer(path, pds)
    src = StreamingPlusBuffer(path, blocks_per_chunk=64)

    staged = make_imfb_trainer(extra={"sort_blocks": 1})
    streamed = make_imfb_trainer(extra={"sort_blocks": 1})
    for _ in range(3):
        staged.update_all(pds)
        streamed.update_all(src)
    np.testing.assert_allclose(
        np.asarray(streamed.state.w), np.asarray(staged.state.w), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(streamed.state.b), np.asarray(staged.state.b), atol=1e-6
    )


def test_stacked_sorted_streamed_multichunk(tmp_path):
    """Multi-chunk stacked stream with sort_blocks: chunk-local unit
    sort composes with open-context carry — the run stays in caps, the
    step count matches the unsorted stream's scan geometry only via the
    plan (sorted t_cap <= plain), and the model learns."""
    from svdfeature_tpu.data.buffer import write_plus_buffer
    from svdfeature_tpu.data.streaming import StreamingPlusBuffer

    pds = make_stacked_ds()
    path = str(tmp_path / "p.buffer")
    write_plus_buffer(path, pds)
    src = StreamingPlusBuffer(path, blocks_per_chunk=4)
    assert (
        src.plan_caps_imfb(2, 1, sort_local=True)["t_cap"]
        <= src.plan_caps_imfb(2, 1)["t_cap"]
    )

    tr = make_imfb_trainer(extra={"sort_blocks": 1})
    before = float(np.sqrt(np.mean(
        (tr.predict_all(pds) - pds.rows.labels) ** 2)))
    for _ in range(3):
        tr.update_all(src)
    after = float(np.sqrt(np.mean(
        (tr.predict_all(pds) - pds.rows.labels) ** 2)))
    assert np.isfinite(after) and after < before


def test_streamed_predict_matches_staged(tmp_path):
    """Bounded-memory prediction over both streaming formats equals the
    staged prediction (reference task_eval streams test sets the same
    way, svd_feature_infer.cpp:243-277)."""
    from svdfeature_tpu.data.buffer import write_plus_buffer
    from svdfeature_tpu.data.streaming import StreamingPlusBuffer

    # random-order format
    ds = make_ds(rows=300)
    path = str(tmp_path / "c.buffer")
    write_csr_buffer(path, ds, batch_size=64)
    src = StreamingCSRBuffer(path, examples_per_chunk=128)
    tr = make_trainer()
    tr.update_all(ds)
    np.testing.assert_allclose(
        tr.predict_all(ds), tr.predict_all(src), atol=1e-6
    )

    # user-group format
    pds = make_plus_ds()
    ppath = str(tmp_path / "cp.buffer")
    write_plus_buffer(ppath, pds)
    psrc = StreamingPlusBuffer(ppath, blocks_per_chunk=4)
    ptr = make_plus_trainer()
    ptr.update_all(pds)
    np.testing.assert_allclose(
        ptr.predict_all(pds), ptr.predict_all(psrc), atol=1e-6
    )


def test_update_rounds_streaming_csr(tmp_path):
    """update_rounds on a streaming source loops host-driven passes with
    the same lr schedule as the staged multi-round dispatch."""
    ds = make_ds(rows=256)
    path = str(tmp_path / "r.buffer")
    write_csr_buffer(path, ds, batch_size=64)
    src = StreamingCSRBuffer(path, examples_per_chunk=128)
    staged = make_trainer()
    staged.set_param("decay_learning_rate", "1")
    staged.set_param("decay_rate", "0.9")
    staged.update_rounds(ds, 3)
    streamed = make_trainer()
    streamed.set_param("decay_learning_rate", "1")
    streamed.set_param("decay_rate", "0.9")
    streamed.update_rounds(src, 3)
    np.testing.assert_allclose(
        np.asarray(staged.state.w), np.asarray(streamed.state.w), atol=1e-6
    )
    assert abs(staged.learning_rate - streamed.learning_rate) < 1e-12


# --------------------------------------------------------------------------
# composition: streaming x mesh, streaming x hierarchy (round-2 refusals)
# --------------------------------------------------------------------------
def _cpu_devices(n):
    import jax

    ds = jax.devices("cpu")
    return ds if len(ds) >= n else None


def test_streamed_mesh_matches_staged(tmp_path):
    """streaming=1 on a (2x2) mesh must produce the same model as the
    staged single-device trainer (the two scale features compose)."""
    if _cpu_devices(4) is None:
        pytest.skip("not enough devices")
    ds = make_ds()
    path = str(tmp_path / "b.buffer")
    write_csr_buffer(path, ds, batch_size=64)
    src = StreamingCSRBuffer(path, examples_per_chunk=256)

    staged = make_trainer()
    for _ in range(3):
        staged.update_all(ds)

    streamed = make_trainer()
    streamed.set_param("mesh_data", "2")
    streamed.set_param("mesh_model", "2")
    streamed.init_model()
    streamed.init_trainer()
    for _ in range(3):
        streamed.update_all(src)

    staged._sync_model_from_state()
    streamed._sync_model_from_state()
    np.testing.assert_allclose(
        np.asarray(streamed.model.w), np.asarray(staged.model.w),
        rtol=1e-4, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(streamed.model.b), np.asarray(staged.model.b),
        rtol=1e-4, atol=1e-5,
    )
    # streamed eval on the mesh: tables stay sharded, chunks scored sharded
    got = streamed.predict_all(src)
    want = staged.predict_all(ds)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_streamed_mesh_big_matches_staged(tmp_path):
    """streaming x mesh x big slabs: the dedup mesh path trains from a
    streamed source (all three scale axes at once)."""
    if _cpu_devices(4) is None:
        pytest.skip("not enough devices")
    ds = make_ds()
    path = str(tmp_path / "b.buffer")
    write_csr_buffer(path, ds, batch_size=64)
    src = StreamingCSRBuffer(path, examples_per_chunk=256)

    staged = make_trainer()
    for _ in range(2):
        staged.update_all(ds)

    streamed = make_trainer()
    for k, v in dict(mesh_data=2, mesh_model=2, mesh_big=1).items():
        streamed.set_param(k, str(v))
    streamed.init_model()
    streamed.init_trainer()
    assert streamed._mesh_big
    for _ in range(2):
        streamed.update_all(src)

    staged._sync_model_from_state()
    streamed._sync_model_from_state()
    np.testing.assert_allclose(
        np.asarray(streamed.model.w), np.asarray(staged.model.w),
        rtol=1e-4, atol=1e-5,
    )
    got = streamed.predict_all(src)
    want = staged.predict_all(ds)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_streamed_hierarchy_matches_staged(tmp_path):
    """streaming=1 with feature_user/feature_item side features: the
    pre-scan caps widen by the expansion factor and the trajectory equals
    the staged run (round-2 refusal removed)."""
    ds = make_ds(rows=300)
    path = str(tmp_path / "b.buffer")
    write_csr_buffer(path, ds, batch_size=64)
    src = StreamingCSRBuffer(path, examples_per_chunk=128)
    fu = tmp_path / "fu.txt"
    # user 0 -> ancestor 3 (0.5) and 5 (0.25); user 1 -> ancestor 4 (2.0)
    fu.write_text("2 3:0.5 5:0.25\n1 4:2.0\n" + "0\n" * 38)

    def run(source):
        tr = SVDFeatureTrainer(SVDTypeParam())
        for k, v in dict(
            num_user=40, num_item=60, num_factor=8, base_score=3,
            learning_rate=0.01, wd_user=0.004, wd_item=0.004, batch_size=64,
            feature_user=str(fu),
        ).items():
            tr.set_param(k, str(v))
        tr.init_model()
        tr.init_trainer()
        for _ in range(3):
            tr.update_all(source)
        return tr

    staged = run(ds)
    streamed = run(src)
    np.testing.assert_allclose(
        np.asarray(streamed.state.w), np.asarray(staged.state.w), atol=1e-6
    )
    assert int(streamed.state.step) == int(staged.state.step)
    np.testing.assert_allclose(
        streamed.predict_all(src), staged.predict_all(ds), atol=1e-6
    )


def test_plus_streamed_mesh_matches_staged(tmp_path):
    """SVD++ streaming x mesh (+ rows_per_user) parity with the staged
    single-device trainer."""
    if _cpu_devices(4) is None:
        pytest.skip("not enough devices")
    from svdfeature_tpu.data.buffer import write_plus_buffer
    from svdfeature_tpu.data.streaming import StreamingPlusBuffer

    pds = make_plus_ds()
    path = str(tmp_path / "p.buffer")
    write_plus_buffer(path, pds)
    src = StreamingPlusBuffer(path, blocks_per_chunk=4)

    staged = make_plus_trainer()
    for _ in range(3):
        staged.update_all(pds)

    streamed = make_plus_trainer(extra=dict(mesh_data=2, mesh_model=2))
    for _ in range(3):
        streamed.update_all(src)

    staged._sync_model_from_state()
    streamed._sync_model_from_state()
    np.testing.assert_allclose(
        np.asarray(streamed.model.w), np.asarray(staged.model.w),
        rtol=1e-4, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(streamed.model.b), np.asarray(staged.model.b),
        rtol=1e-4, atol=1e-5,
    )
    # sharded streamed eval
    got = streamed.predict_all(src)
    want = staged.predict_all(pds)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_plus_streamed_mesh_multirow(tmp_path):
    """SVD++ streaming x mesh x rows_per_user=2 matches the staged
    single-device multirow trainer."""
    if _cpu_devices(4) is None:
        pytest.skip("not enough devices")
    from svdfeature_tpu.data.buffer import write_plus_buffer
    from svdfeature_tpu.data.streaming import StreamingPlusBuffer

    pds = make_plus_ds()
    path = str(tmp_path / "p.buffer")
    write_plus_buffer(path, pds)
    src = StreamingPlusBuffer(path, blocks_per_chunk=4)

    staged = make_plus_trainer(extra=dict(rows_per_user=2))
    for _ in range(3):
        staged.update_all(pds)

    streamed = make_plus_trainer(
        extra=dict(rows_per_user=2, mesh_data=2, mesh_model=2)
    )
    for _ in range(3):
        streamed.update_all(src)

    staged._sync_model_from_state()
    streamed._sync_model_from_state()
    np.testing.assert_allclose(
        np.asarray(streamed.model.w), np.asarray(staged.model.w),
        rtol=1e-4, atol=1e-5,
    )


def test_stream_chunk_rounds_to_batch_multiple(tmp_path):
    """A chunk size that is not a batch_size multiple is rounded down
    (with a warning) so the streamed trajectory still equals the staged
    run — the guarantee is validated instead of silently diverging."""
    ds = make_ds()
    path = str(tmp_path / "b.buffer")
    write_csr_buffer(path, ds, batch_size=64)
    src = StreamingCSRBuffer(path, examples_per_chunk=250)  # 250 % 64 != 0

    staged = make_trainer()
    streamed = make_trainer()
    with pytest.warns(UserWarning, match="rounding to 192"):
        for _ in range(3):
            staged.update_all(ds)
            streamed.update_all(src)
    assert src.examples_per_chunk == 192
    np.testing.assert_allclose(
        np.asarray(staged.state.w), np.asarray(streamed.state.w), atol=1e-6
    )


def test_bilinear_streamed_matches_staged(tmp_path):
    """streaming=1 for the bilinear solver (filtered pool + property
    matrix packed per chunk) matches the staged trainer, single-device
    and on a (2x2) mesh."""
    from svdfeature_tpu.data.buffer import write_plus_buffer
    from svdfeature_tpu.data.streaming import StreamingPlusBuffer
    from svdfeature_tpu.solvers.bilinear import SVDBiLinearTrainer

    pds = make_plus_ds()
    path = str(tmp_path / "p.buffer")
    write_plus_buffer(path, pds)

    def run(source, extra=None):
        tr = SVDBiLinearTrainer(SVDTypeParam(format_type=1, extend_type=15))
        p = dict(
            num_user=12, num_item=30, num_factor=8, base_score=3,
            learning_rate=0.01, wd_user=0.004, wd_item=0.004,
            num_ufeedback=30, wd_ufeedback=0.004, users_per_batch=4,
            num_bi_feedback=10, wd_bi_feedback=0.01, start_ufeedback=2,
        )
        p.update(extra or {})
        for k, v in p.items():
            tr.set_param(k, str(v))
        tr.init_model()
        tr.init_trainer()
        for _ in range(3):
            tr.update_all(source)
        return tr

    staged = run(pds)
    streamed = run(StreamingPlusBuffer(path, blocks_per_chunk=4))
    staged._sync_model_from_state()
    streamed._sync_model_from_state()
    np.testing.assert_allclose(
        np.asarray(streamed.model.w), np.asarray(staged.model.w), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(streamed.W_bi), np.asarray(staged.W_bi), atol=1e-6
    )
    got = streamed.predict_all(StreamingPlusBuffer(path, blocks_per_chunk=4))
    want = staged.predict_all(pds)
    np.testing.assert_allclose(got, want, atol=1e-5)

    if _cpu_devices(4) is not None:
        meshed = run(
            StreamingPlusBuffer(path, blocks_per_chunk=4),
            dict(mesh_data=2, mesh_model=2),
        )
        meshed._sync_model_from_state()
        np.testing.assert_allclose(
            np.asarray(meshed.model.w), np.asarray(staged.model.w),
            rtol=1e-4, atol=1e-5,
        )
        got = meshed.predict_all(StreamingPlusBuffer(path, blocks_per_chunk=4))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def make_stacked_ds():
    """A genuinely stacked multi-IMFB tag stream over make_plus_ds's 12
    blocks: two START..MIDDLE..END scopes (with DEFAULT blocks nested
    inside the first) chosen so streamed chunks of 4 units cut BOTH
    scopes mid-stream — the open-context carry path is exercised."""
    from svdfeature_tpu.data.csr import (
        TAG_DEFAULT, TAG_END, TAG_MIDDLE, TAG_START,
    )

    pds = make_plus_ds()
    blocks = list(pds.blocks())
    tags = [
        TAG_START, TAG_DEFAULT, TAG_DEFAULT, TAG_MIDDLE,  # chunk 1 | scope 1 open
        TAG_END, TAG_DEFAULT, TAG_START, TAG_DEFAULT,     # chunk 2 | scope 2 open
        TAG_MIDDLE, TAG_END, TAG_DEFAULT, TAG_DEFAULT,    # chunk 3
    ]
    blocks = [
        type(b)(b.fb_index, b.fb_value, b.data, extend_tag=t)
        for b, t in zip(blocks, tags)
    ]
    return type(pds).from_blocks(blocks)


def make_imfb_trainer(extra=None):
    from svdfeature_tpu.solvers.multi_imfb import SVDPPMultiIMFBTrainer

    tr = SVDPPMultiIMFBTrainer(SVDTypeParam(format_type=1, extend_type=2))
    params = dict(
        num_user=12, num_item=12, num_factor=8, base_score=3,
        learning_rate=0.01, wd_user=0.004, wd_item=0.004,
        num_ufeedback=15, wd_ufeedback=0.004, users_per_batch=2,
    )
    params.update(extra or {})
    for k, v in params.items():
        tr.set_param(k, str(v))
    tr.init_model()
    tr.init_trainer()
    return tr


def test_imfb_stacked_streamed_matches_staged(tmp_path):
    """STACKED multi-IMFB trains out-of-core: open feedback contexts
    carry across streamed chunks (pack_imfb initial_stack) and the
    trajectory equals staging the whole dataset — the reference's
    buffer iterator feeds extend_type=2 like every solver
    (apex_buffer_loader.h:39-233 -> apex_multi_imfb.h:31-194)."""
    from svdfeature_tpu.data.buffer import write_plus_buffer
    from svdfeature_tpu.data.streaming import StreamingPlusBuffer

    pds = make_stacked_ds()
    path = str(tmp_path / "p.buffer")
    write_plus_buffer(path, pds)
    src = StreamingPlusBuffer(path, blocks_per_chunk=4)

    staged = make_imfb_trainer()
    streamed = make_imfb_trainer()
    for _ in range(3):
        staged.update_all(pds)
        streamed.update_all(src)
    np.testing.assert_allclose(
        np.asarray(streamed.state.w), np.asarray(staged.state.w), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(streamed.state.b), np.asarray(staged.state.b), atol=1e-6
    )
    # streamed eval: bounded-memory chunked scoring matches staged
    np.testing.assert_allclose(
        streamed.predict_all(src), staged.predict_all(pds), atol=1e-5
    )


def test_imfb_stacked_streamed_disable_level(tmp_path):
    """ufeedback_disable_level composes with stacked streaming (the gate
    is applied per streamed chunk from carried depths)."""
    from svdfeature_tpu.data.buffer import write_plus_buffer
    from svdfeature_tpu.data.streaming import StreamingPlusBuffer

    pds = make_stacked_ds()
    path = str(tmp_path / "p.buffer")
    write_plus_buffer(path, pds)
    src = StreamingPlusBuffer(path, blocks_per_chunk=4)

    staged = make_imfb_trainer(extra=dict(ufeedback_disable_level=1))
    streamed = make_imfb_trainer(extra=dict(ufeedback_disable_level=1))
    for _ in range(2):
        staged.update_all(pds)
        streamed.update_all(src)
    np.testing.assert_allclose(
        np.asarray(streamed.state.w), np.asarray(staged.state.w), atol=1e-6
    )


def test_imfb_stacked_streamed_mesh_matches_staged(tmp_path):
    """stacked multi-IMFB x streaming x mesh: the sharded stacked body
    trains from a streamed source with context carry."""
    if _cpu_devices(4) is None:
        pytest.skip("not enough devices")
    from svdfeature_tpu.data.buffer import write_plus_buffer
    from svdfeature_tpu.data.streaming import StreamingPlusBuffer

    pds = make_stacked_ds()
    path = str(tmp_path / "p.buffer")
    write_plus_buffer(path, pds)
    src = StreamingPlusBuffer(path, blocks_per_chunk=4)

    staged = make_imfb_trainer()
    for _ in range(2):
        staged.update_all(pds)

    meshed = make_imfb_trainer(extra=dict(mesh_data=2, mesh_model=2))
    for _ in range(2):
        meshed.update_all(src)

    staged._sync_model_from_state()
    meshed._sync_model_from_state()
    np.testing.assert_allclose(
        np.asarray(meshed.model.w), np.asarray(staged.model.w),
        rtol=1e-4, atol=1e-5,
    )
    got = meshed.predict_all(StreamingPlusBuffer(path, blocks_per_chunk=4))
    np.testing.assert_allclose(
        got, staged.predict_all(pds), rtol=1e-4, atol=1e-5
    )


def test_plus_streamed_mesh_big_matches_staged(tmp_path):
    """streaming x mesh x big slabs for the SVD++ solver
    (parallel/svdpp_mesh_big.py): all three scale axes at once on the
    user-group format."""
    if _cpu_devices(4) is None:
        pytest.skip("not enough devices")
    from svdfeature_tpu.data.buffer import write_plus_buffer
    from svdfeature_tpu.data.streaming import StreamingPlusBuffer

    ds = make_plus_ds()
    path = str(tmp_path / "p.buffer")
    write_plus_buffer(path, ds)
    src = StreamingPlusBuffer(path, blocks_per_chunk=4)

    staged = make_plus_trainer()
    for _ in range(2):
        staged.update_all(ds)

    streamed = make_plus_trainer(
        extra=dict(mesh_data=2, mesh_model=2, mesh_big=1)
    )
    assert streamed._mesh_big
    for _ in range(2):
        streamed.update_all(src)

    staged._sync_model_from_state()
    streamed._sync_model_from_state()
    np.testing.assert_allclose(
        np.asarray(streamed.model.w), np.asarray(staged.model.w),
        rtol=1e-4, atol=1e-5,
    )


def test_plan_caps_rekeyed_on_blocks_per_chunk(tmp_path):
    """Caps are re-planned when blocks_per_chunk changes between calls
    (the solver rounds it to a users_per_batch multiple mid-stream)."""
    from svdfeature_tpu.data.buffer import write_plus_buffer
    from svdfeature_tpu.data.streaming import StreamingPlusBuffer

    pds = make_plus_ds()
    path = str(tmp_path / "p.buffer")
    write_plus_buffer(path, pds)
    src = StreamingPlusBuffer(path, blocks_per_chunk=5)
    caps5 = dict(src.plan_caps(2, 1))
    imfb5 = dict(src.plan_caps_imfb(2, 1))
    src.blocks_per_chunk = 4
    caps4 = dict(src.plan_caps(2, 1))
    imfb4 = dict(src.plan_caps_imfb(2, 1))
    assert caps4 != caps5 or caps4["c_cap"] == caps5["c_cap"]
    # the re-plan actually ran (not a stale cache hit): t_cap follows
    # the 4-unit grouping
    src2 = StreamingPlusBuffer(path, blocks_per_chunk=4)
    assert caps4 == dict(src2.plan_caps(2, 1))
    assert imfb4 == dict(src2.plan_caps_imfb(2, 1))
    # M>1 shrinks the imfb scan cap by the ceil-divide like plus caps
    imfb4_m2 = dict(src2.plan_caps_imfb(2, 2))
    assert imfb4_m2["t_cap"] <= imfb4["t_cap"]
