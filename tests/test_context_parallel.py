"""Context-parallel attention tests on the 8-device virtual mesh: both the
all-gather and ring variants must match single-device attention exactly."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lumina_t2x_tpu.ops.attention import sdpa
from lumina_t2x_tpu.ops.context_parallel import (
    allgather_context_attention,
    ring_context_attention,
)
from lumina_t2x_tpu.parallel import create_mesh


def make_qkv(b=2, s=64, hq=4, hkv=4, d=16, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 3)
    q = jax.random.normal(ks[0], (b, s, hq, d))
    k = jax.random.normal(ks[1], (b, s, hkv, d))
    v = jax.random.normal(ks[2], (b, s, hkv, d))
    return q, k, v


class TestAllGatherCP:
    def test_matches_single_device(self):
        mesh = create_mesh(model_parallel_size=1)  # 8-way data axis
        q, k, v = make_qkv()
        out = allgather_context_attention(q, k, v, mesh)
        ref = sdpa(q, k, v)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    def test_with_mask(self):
        mesh = create_mesh(model_parallel_size=1)
        q, k, v = make_qkv()
        mask = jnp.zeros((2, 64), jnp.int32).at[:, :40].set(1)
        out = allgather_context_attention(q, k, v, mesh, kv_mask=mask)
        ref = sdpa(q, k, v, kv_mask=mask)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


class TestRingCP:
    def test_matches_single_device(self):
        mesh = create_mesh(model_parallel_size=1)
        q, k, v = make_qkv()
        out = ring_context_attention(q, k, v, mesh)
        ref = sdpa(q, k, v)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    def test_gqa(self):
        mesh = create_mesh(model_parallel_size=1)
        q, k, v = make_qkv(hq=8, hkv=2)
        out = ring_context_attention(q, k, v, mesh)
        ref = sdpa(q, k, v)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    def test_mask(self):
        mesh = create_mesh(model_parallel_size=1)
        q, k, v = make_qkv()
        mask = jnp.zeros((2, 64), jnp.int32).at[:, 16:56].set(1)
        out = ring_context_attention(q, k, v, mesh, kv_mask=mask)
        ref = sdpa(q, k, v, kv_mask=mask)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    def test_custom_scale(self):
        mesh = create_mesh(model_parallel_size=1)
        q, k, v = make_qkv()
        out = ring_context_attention(q, k, v, mesh, scale=0.25)
        ref = sdpa(q, k, v, scale=0.25)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    def test_jit_with_sharded_inputs(self):
        from jax.sharding import NamedSharding, PartitionSpec as P

        mesh = create_mesh(model_parallel_size=1)
        q, k, v = make_qkv()
        seq_sh = NamedSharding(mesh, P(None, "data"))
        qs = jax.device_put(q, seq_sh)
        ks = jax.device_put(k, seq_sh)
        vs = jax.device_put(v, seq_sh)
        out = jax.jit(lambda a, b, c: ring_context_attention(a, b, c, mesh))(qs, ks, vs)
        ref = sdpa(q, k, v)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


class TestModelSequenceSharding:
    def test_next_dit_seq_sharded_forward_parity(self):
        """seq_shard_axis partitions the token axis over the mesh; results
        must match the unsharded forward."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        from lumina_t2x_tpu.models.next_dit import NextDiT

        mesh = create_mesh(model_parallel_size=1)
        kw = dict(dim=32, n_layers=2, n_heads=4, multiple_of=16, cap_feat_dim=16,
                  attn_impl="xla")
        model_ref = NextDiT(**kw)
        model_cp = NextDiT(**kw, seq_shard_axis="data")
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 16, 16))
        t = jnp.full((2,), 0.5)
        cap = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 16))
        mask = jnp.ones((2, 4), jnp.int32)
        params = model_ref.init(jax.random.PRNGKey(2), x, t, cap, mask)
        ref = model_ref.apply(params, x, t, cap, mask)

        with jax.set_mesh(mesh):
            out = jax.jit(lambda p, xx: model_cp.apply(p, xx, t, cap, mask))(params, x)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
