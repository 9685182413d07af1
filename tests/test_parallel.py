"""parallel/mesh.py: multi-host bootstrap degenerate case, global mesh,
and tensor-parallel parameter placement on the virtual 8-device mesh."""
import numpy as np
import jax
import jax.numpy as jnp

from f3d_gaus_tpu.parallel import mesh as M


class TestDistributedInit:
    def test_single_process_noop(self, monkeypatch):
        """No coordinator env vars -> False, and jax.distributed is never
        touched (the single-process degenerate case)."""
        for var in ("JAX_COORDINATOR_ADDRESS", "JAX_NUM_PROCESSES",
                    "JAX_PROCESS_ID"):
            monkeypatch.delenv(var, raising=False)
        called = []
        monkeypatch.setattr(jax.distributed, "initialize",
                            lambda **kw: called.append(kw))
        assert M.distributed_init() is False
        assert called == []

    def test_env_driven_forwarding(self, monkeypatch):
        monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "10.0.0.1:8476")
        monkeypatch.setenv("JAX_NUM_PROCESSES", "4")
        monkeypatch.setenv("JAX_PROCESS_ID", "2")
        monkeypatch.setattr(M.distributed_init, "_done", False,
                            raising=False)
        called = []
        monkeypatch.setattr(jax.distributed, "initialize",
                            lambda **kw: called.append(kw))
        assert M.distributed_init() is True
        assert called == [{"coordinator_address": "10.0.0.1:8476",
                           "num_processes": 4, "process_id": 2}]
        # idempotent: second call does not re-initialize
        assert M.distributed_init() is True
        assert len(called) == 1
        M.distributed_init._done = False


class TestMeshes:
    def test_make_global_mesh(self):
        mesh = M.make_global_mesh(tile=2)
        n = len(jax.devices())
        assert mesh.shape == {"data": n // 2, "tile": 2}

    def test_make_mesh_model_axis(self):
        mesh = M.make_mesh(8, data=2, tile=2, model=2)
        assert mesh.shape == {"data": 2, "tile": 2, "model": 2}


class TestShardState:
    def test_channel_sharding_rules(self):
        mesh = M.make_mesh(8, data=2, tile=2, model=2)
        tree = {
            "conv_w": jnp.zeros((3, 3, 64, 128)),   # sharded (128 % 2 == 0)
            "norm_g": jnp.zeros((128,)),            # sharded
            "small_b": jnp.zeros((23,)),            # replicated (odd, tiny)
            "step": jnp.zeros(()),                  # replicated scalar
        }
        out = M.shard_state(mesh, tree)

        def axes(x):
            return [a for a in (x.sharding.spec or ()) if a]
        assert axes(out["conv_w"]) == ["model"]
        assert axes(out["norm_g"]) == ["model"]
        assert axes(out["small_b"]) == []
        assert axes(out["step"]) == []
        # sharded leaf actually occupies 1/2 the per-device memory
        shard_shape = out["conv_w"].sharding.shard_shape(
            out["conv_w"].shape)
        assert shard_shape == (3, 3, 64, 64)

    def test_no_model_axis_replicates(self):
        mesh = M.make_mesh(8, data=4, tile=2)
        out = M.shard_state(mesh, {"w": jnp.zeros((128,))})
        assert not [a for a in (out["w"].sharding.spec or ()) if a]
