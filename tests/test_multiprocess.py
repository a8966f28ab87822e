"""Multi-host bring-up test: a REAL 2-process run over a 2x2 CPU mesh.

Spawns two worker processes that jax.distributed.initialize against a
local coordinator, build the (data=2, model=2) mesh spanning both
processes, train the deterministic tiny workload, and dump their final
tables; the driver verifies both processes agree and match the
single-process 4-device mesh trajectory (the parity contract of
parallel/mesh.py).
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_mesh_matches_single(tmp_path):
    port = _free_port()
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = {
        **os.environ,
        "PYTHONPATH": root,
        "JAX_PLATFORMS": "cpu",
        "JAX_NUM_CPU_DEVICES": "2",
    }
    env.pop("XLA_FLAGS", None)
    procs = []
    outs = [str(tmp_path / f"p{i}.npz") for i in range(2)]
    for i in range(2):
        procs.append(
            subprocess.Popen(
                [
                    sys.executable,
                    os.path.join(root, "tests", "mp_worker.py"),
                    f"localhost:{port}", "2", str(i), outs[i],
                ],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
            )
        )
    logs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multiprocess workers timed out")
        logs.append(out.decode(errors="replace"))
    if any(p.returncode for p in procs):
        msg = "\n---\n".join(logs)
        if "distributed" in msg.lower() and "not" in msg.lower():
            pytest.skip(f"jax.distributed unavailable on CPU here: {msg[-500:]}")
        pytest.fail(f"worker failed:\n{msg[-3000:]}")

    a = np.load(outs[0])
    b = np.load(outs[1])
    np.testing.assert_array_equal(a["w"], b["w"])
    np.testing.assert_array_equal(a["b"], b["b"])

    # single-process truth on a local 4-device mesh (this pytest process
    # has 8 CPU devices via conftest)
    from svdfeature_tpu.data.text import load_feature_text
    from svdfeature_tpu.params import SVDTypeParam
    from svdfeature_tpu.solvers.base import SVDFeatureTrainer

    rng = np.random.RandomState(0)
    lines = [
        f"{rng.randint(1, 6)} 0 1 1 {rng.randint(0, 30)}:1 {rng.randint(0, 50)}:1"
        for _ in range(512)
    ]
    ds = load_feature_text("x", text="\n".join(lines))
    tr = SVDFeatureTrainer(SVDTypeParam())
    for k, v in dict(
        num_user=30, num_item=50, num_factor=8, base_score=3,
        learning_rate=0.01, wd_user=0.004, wd_item=0.004,
        batch_size=64, mesh_data=2, mesh_model=2, seed=7,
    ).items():
        tr.set_param(k, str(v))
    tr.init_model()
    tr.init_trainer()
    for _ in range(2):
        tr.update_all(ds)
    w1 = np.asarray(tr.state.w)
    np.testing.assert_allclose(a["w"], w1, atol=1e-6)
