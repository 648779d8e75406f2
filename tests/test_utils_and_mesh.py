"""Utils + mesh helpers."""

import numpy as np

import conftest

import jax

from midi_emotion_tpu.utils import split_list, StepTimer, profiler_trace
from midi_emotion_tpu.parallel import mesh as mesh_lib


def test_split_list():
    assert split_list(list(range(10)), 3) == [[0, 1, 2], [3, 4, 5], [6, 7, 8, 9]]
    assert split_list([1, 2], 0) == [[1, 2]]


def test_step_timer():
    t = StepTimer()
    assert np.isnan(t.ms_per_step)
    t.tick()
    assert t.ms_per_step >= 0


def test_profiler_trace_noop():
    with profiler_trace(None):
        pass


def test_make_mesh_shapes():
    mesh = mesh_lib.make_mesh()
    assert mesh.shape["data"] * mesh.shape["model"] == len(jax.devices())
    mesh2 = mesh_lib.make_mesh(n_data=2, n_model=4)
    assert mesh2.shape == {"data": 2, "model": 4}


def test_param_spec_rules():
    from jax.sharding import PartitionSpec as P

    assert mesh_lib.param_spec("enc_layers_0/rga/Wq/kernel") == P(None, "model")
    assert mesh_lib.param_spec("enc_layers_3/FFN_suf/kernel") == P("model", None)
    assert mesh_lib.param_spec("embedding/embedding") == P("model", None)
    assert mesh_lib.param_spec("enc_layers_0/layernorm1/scale") == P()
    assert mesh_lib.param_spec("enc_layers_0/rga/E") == P()


def test_feasible_fallback():
    from jax.sharding import PartitionSpec as P

    mesh = mesh_lib.make_mesh(n_data=2, n_model=4)
    # 1007 not divisible by 4 -> replicate that dim
    spec = mesh_lib._feasible(P("model", None), (1007, 48), mesh)
    assert spec == P(None, None)
    spec = mesh_lib._feasible(P(None, "model"), (768, 768), mesh)
    assert spec == P(None, "model")


def test_host_local_batch_single_process():
    mesh = mesh_lib.make_mesh()
    batch = {"input": np.ones((8, 4), np.int32)}
    out = mesh_lib.host_local_batch_to_global(batch, mesh)
    assert out["input"].shape == (8, 4)
