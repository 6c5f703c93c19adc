"""Chunked T2I trajectory == single-program trajectory.

`build_t2i_sample_fn(..., chunked=True)` exists to bound per-device-call
execution time (relay/tunnel limits at big batches) and for progressive
preview; the contract is that slicing the jit boundary does not change the
math. Reference trajectory semantics: `lumina_next_t2i/sample.py:173-240`.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lumina_t2x_tpu.pipelines.sample_lib import build_t2i_sample_fn


def _tiny_setup():
    from lumina_t2x_tpu.models.next_dit import NextDiT

    model = NextDiT(patch_size=2, dim=32, n_layers=2, n_heads=4, multiple_of=16,
                    qk_norm=True, cap_feat_dim=16, attn_impl="xla")
    rng = jax.random.PRNGKey(0)
    x0 = jnp.zeros((2, 4, 8, 8))
    cap = jax.random.normal(jax.random.fold_in(rng, 1), (2, 8, 16))
    cap_mask = jnp.ones((2, 8), jnp.int32)
    variables = model.init(rng, x0, jnp.zeros((2,)), cap, cap_mask)
    # break the zero-init final layer so trajectories are non-trivial
    variables = jax.tree.map(
        lambda a: jnp.where(jnp.all(a == 0), 0.02 * jnp.ones_like(a), a)
        if a.ndim >= 1 else a, variables)
    return model, variables, cap, cap_mask


class TestChunkedSampler:
    @pytest.mark.parametrize("solver", ["midpoint", "euler"])
    def test_matches_single_program(self, solver):
        model, variables, cap, cap_mask = _tiny_setup()
        kw = dict(width=64, height=64, num_steps=7, solver=solver,
                  time_shifting_factor=4.0)
        rng = jax.random.PRNGKey(7)

        ref_fn = jax.jit(build_t2i_sample_fn(model, **kw))
        ref = ref_fn(variables, rng, cap, cap_mask)

        ts, init_fn, chunk_fn, finalize = build_t2i_sample_fn(
            model, chunked=True, **kw)
        assert ts.shape == (7,)
        chunk_jit = jax.jit(chunk_fn)
        z = init_fn(rng, cap)
        # 6 intervals driven as 3 + 3, slices overlapping by one point
        z = chunk_jit(variables, z, ts[0:4], cap, cap_mask)
        z = chunk_jit(variables, z, ts[3:7], cap, cap_mask)
        out = finalize(z)

        assert out.shape == ref.shape
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-5, atol=2e-6)

    def test_uneven_chunks_match(self):
        """Unequal slice lengths (the 29-interval bench grid can't split
        evenly) still reproduce the trajectory."""
        model, variables, cap, cap_mask = _tiny_setup()
        kw = dict(width=64, height=64, num_steps=6, solver="midpoint",
                  time_shifting_factor=4.0)
        rng = jax.random.PRNGKey(3)
        ref = jax.jit(build_t2i_sample_fn(model, **kw))(
            variables, rng, cap, cap_mask)

        ts, init_fn, chunk_fn, finalize = build_t2i_sample_fn(
            model, chunked=True, **kw)
        z = init_fn(rng, cap)
        z = chunk_fn(variables, z, ts[0:3], cap, cap_mask)   # 2 intervals
        z = chunk_fn(variables, z, ts[2:6], cap, cap_mask)   # 3 intervals
        np.testing.assert_allclose(np.asarray(finalize(z)), np.asarray(ref),
                                   rtol=2e-5, atol=2e-6)

    def test_adaptive_solver_rejected(self):
        model, *_ = _tiny_setup()
        with pytest.raises(ValueError, match="fixed-step"):
            build_t2i_sample_fn(model, width=64, height=64, num_steps=4,
                                solver="dopri5", chunked=True)
