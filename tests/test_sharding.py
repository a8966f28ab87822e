"""Multi-device parity: the sharded train step must match the single-device
step numerically (SURVEY.md §4: 1-device vs N-device near-equal parameter
trajectories on a CPU mesh)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from svdfeature_tpu.ops.embed import train_step
from svdfeature_tpu.parallel.mesh import (
    make_mesh,
    shard_consts,
    shard_state,
    sharded_train_step,
)
from tests.conftest import cpu_devices

import __graft_entry__ as ge


@pytest.mark.parametrize("n_data,n_model", [(1, 1), (2, 1), (1, 2), (4, 2)])
@pytest.mark.parametrize("num_global", [0, 5])
def test_sharded_step_matches_single(n_data, n_model, num_global):
    if len(cpu_devices()) < n_data * n_model:
        pytest.skip("not enough devices")
    state, batch, hp, consts = ge._toy_setup(
        batch_size=8 * max(n_data, 1), k=8, num_global=num_global
    )
    # single-device ground truth
    ref = train_step(
        jax.tree.map(jnp.copy, state), batch, jnp.float32(0.005), consts, hp
    )
    mesh = make_mesh(n_data, n_model, cpu_devices())
    sstate, n_pad = shard_state(state, mesh)
    sconsts = shard_consts(consts, mesh, n_pad)
    step = sharded_train_step(mesh, hp, n_pad)
    from jax.sharding import NamedSharding, PartitionSpec as P

    sbatch = {
        k: jax.device_put(
            v, NamedSharding(mesh, P("data") if v.ndim == 1 else P("data", None))
        )
        for k, v in batch.items()
    }
    out = step(sstate, sbatch, jnp.float32(0.005), sconsts)
    n = ref.w.shape[0]
    np.testing.assert_allclose(np.asarray(out.w)[:n], np.asarray(ref.w), rtol=2e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out.b)[:n], np.asarray(ref.b), rtol=2e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out.g), np.asarray(ref.g), rtol=2e-5, atol=1e-6)
    assert int(out.step) == int(ref.step)


@pytest.mark.parametrize("reg_method", [0, 1, 2, 3, 4, 5])
def test_multi_step_trajectory(reg_method):
    """Run several sharded steps and compare the trajectory, across every
    regularization mode (0-3 eager on the local slab, 4/5 lazy via
    sharded ref counters)."""
    import dataclasses

    if len(cpu_devices()) < 4:
        pytest.skip("not enough devices")
    state, batch, hp, consts = ge._toy_setup(batch_size=16, k=8, num_global=4)
    hp = dataclasses.replace(hp, reg_method=reg_method)
    ref = jax.tree.map(jnp.copy, state)
    lr = jnp.float32(0.01)
    for _ in range(5):
        ref = train_step(ref, batch, lr, consts, hp)
    mesh = make_mesh(2, 2, cpu_devices())
    sstate, n_pad = shard_state(state, mesh)
    sconsts = shard_consts(consts, mesh, n_pad)
    step = sharded_train_step(mesh, hp, n_pad)
    from jax.sharding import NamedSharding, PartitionSpec as P

    sbatch = {
        k: jax.device_put(
            v, NamedSharding(mesh, P("data") if v.ndim == 1 else P("data", None))
        )
        for k, v in batch.items()
    }
    for _ in range(5):
        sstate = step(sstate, sbatch, lr, sconsts)
    n = ref.w.shape[0]
    np.testing.assert_allclose(
        np.asarray(sstate.w)[:n], np.asarray(ref.w), rtol=1e-4, atol=1e-5
    )


def test_graft_entry():
    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (256,)
    assert np.isfinite(np.asarray(out)).all()


def test_trainer_mesh_config_path():
    """Config-driven multi-chip training (mesh_data/mesh_model keys) must
    produce the same model as the single-device trainer."""
    if len(cpu_devices()) < 4:
        pytest.skip("not enough devices")
    from svdfeature_tpu.data.text import load_feature_text
    from svdfeature_tpu.params import SVDTypeParam
    from svdfeature_tpu.solvers.base import SVDFeatureTrainer

    text = "\n".join(
        f"{(i % 5) + 1} 0 1 1 {i % 29}:1 {(i * 7) % 37}:1"
        for i in range(200)
    )
    ds = load_feature_text("x", text=text)
    params = dict(
        num_user=29, num_item=37, num_factor=8, base_score=3,
        learning_rate=0.01, wd_user=0.004, wd_item=0.004, batch_size=32,
    )

    def run(extra):
        mt = SVDTypeParam()
        tr = SVDFeatureTrainer(mt)
        for n, v in {**params, **extra}.items():
            tr.set_param(n, str(v))
        tr.init_model()
        tr.init_trainer()
        for _ in range(3):
            tr.update_all(ds)
        return tr

    ref = run({})
    sh = run({"mesh_data": 2, "mesh_model": 2})
    np.testing.assert_allclose(
        np.asarray(sh.predict_all(ds)), np.asarray(ref.predict_all(ds)),
        rtol=1e-4, atol=1e-5,
    )
    ref._sync_model_from_state()
    sh._sync_model_from_state()
    np.testing.assert_allclose(
        np.asarray(sh.model.w), np.asarray(ref.model.w), rtol=1e-4, atol=1e-5
    )


def test_mesh_checkpoint_resume_parity():
    """Save/load through the reference binary model format must preserve
    the multi-chip training trajectory (continue= semantics)."""
    import io

    if len(cpu_devices()) < 4:
        pytest.skip("not enough devices")
    from svdfeature_tpu.data.text import load_feature_text
    from svdfeature_tpu.params import SVDTypeParam
    from svdfeature_tpu.solvers.base import SVDFeatureTrainer

    text = "\n".join(
        f"{(i % 5) + 1} 0 1 1 {i % 29}:1 {(i * 7) % 37}:1" for i in range(200)
    )
    ds = load_feature_text("x", text=text)
    params = dict(
        num_user=29, num_item=37, num_factor=8, base_score=3,
        learning_rate=0.01, wd_user=0.004, wd_item=0.004, batch_size=32,
        mesh_data=2, mesh_model=2,
    )

    def make():
        tr = SVDFeatureTrainer(SVDTypeParam())
        for n, v in params.items():
            tr.set_param(n, str(v))
        return tr

    ref = make()
    ref.init_model()
    ref.init_trainer()
    for _ in range(3):
        ref.update_all(ds)

    # train 2, checkpoint, resume in a FRESH trainer, train 1 more
    a = make()
    a.init_model()
    a.init_trainer()
    for _ in range(2):
        a.update_all(ds)
    buf = io.BytesIO()
    a.save_model(buf)
    buf.seek(0)
    b = make()
    b.load_model(buf)
    b.init_trainer()
    b.update_all(ds)

    ref._sync_model_from_state()
    b._sync_model_from_state()
    np.testing.assert_allclose(
        np.asarray(b.model.w), np.asarray(ref.model.w), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(b.model.b), np.asarray(ref.model.b), rtol=1e-4, atol=1e-5
    )
