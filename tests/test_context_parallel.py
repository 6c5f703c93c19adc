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
