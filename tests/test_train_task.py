"""Train-task semantics: continue= resume-from-latest and train_repeat
(svd_feature.cpp:153-174, 231-244)."""

import os

import numpy as np
import pytest

from svdfeature_tpu.model import SVDModel
from svdfeature_tpu.params import SVDTypeParam
from svdfeature_tpu.train.loop import SVDTrainTask


@pytest.fixture()
def conf(tmp_path):
    text = "\n".join(
        f"{(i % 5) + 1} 0 1 1 {i % 29}:1 {(i * 7) % 37}:1" for i in range(200)
    )
    feat = tmp_path / "train.feature"
    feat.write_text(text + "\n")
    conf = tmp_path / "t.conf"
    conf.write_text(
        f"""
input_type = 1
data_in = "{feat}"
num_user = 29
num_item = 37
num_factor = 8
base_score = 3
learning_rate = 0.01
wd_user = 0.004
wd_item = 0.004
batch_size = 32
silent = 1
"""
    )
    return str(conf)


def _load_w(path):
    with open(path, "rb") as f:
        mt = SVDTypeParam.from_bytes(f.read(4))
        return np.asarray(SVDModel.load(f, mt).w)


def test_continue_resumes_from_latest(conf, tmp_path):
    out_a = tmp_path / "a"
    SVDTrainTask().run(conf, [f"model_out_folder={out_a}", "num_round=2"])
    assert os.path.exists(out_a / "0002.model")
    assert not os.path.exists(out_a / "0003.model")
    # resume to 4 rounds
    SVDTrainTask().run(
        conf, [f"model_out_folder={out_a}", "num_round=4", "continue=1"]
    )
    assert os.path.exists(out_a / "0004.model")
    # straight 4-round run must match the resumed trajectory exactly
    out_b = tmp_path / "b"
    SVDTrainTask().run(conf, [f"model_out_folder={out_b}", "num_round=4"])
    np.testing.assert_allclose(
        _load_w(out_a / "0004.model"), _load_w(out_b / "0004.model"),
        rtol=1e-6, atol=1e-7,
    )


def test_train_repeat_runs_extra_passes(conf, tmp_path):
    out_a = tmp_path / "r1"
    out_b = tmp_path / "r2"
    SVDTrainTask().run(conf, [f"model_out_folder={out_a}", "num_round=1"])
    SVDTrainTask().run(
        conf, [f"model_out_folder={out_b}", "num_round=1", "train_repeat=2"]
    )
    wa = _load_w(out_a / "0001.model")
    wb = _load_w(out_b / "0001.model")
    # two passes move the parameters further than one
    assert not np.allclose(wa, wb, rtol=1e-6, atol=1e-7)
