"""Determinism guarantees (SURVEY.md §5 'race detection' analogues):
same seed => bit-identical training and sampling; different dp-rank streams
stay disjoint (covered in test_data); CFG dropout agrees across shards by
construction (replicated PRNG)."""

import jax
import jax.numpy as jnp
import numpy as np

from lumina_t2x_tpu.models.next_dit_imagenet import NextDiTImageNet
from lumina_t2x_tpu.pipelines.train_lib import (
    create_optimizer,
    create_train_state,
    make_train_step,
)
from lumina_t2x_tpu.transport import create_transport


def _run(seed):
    model = NextDiTImageNet(dim=32, n_layers=2, n_heads=4, multiple_of=16,
                            num_classes=4, attn_impl="xla")
    batch = {
        "x": jax.random.normal(jax.random.PRNGKey(99), (4, 4, 8, 8)),
        "y": jnp.arange(4) % 4,
    }
    cond = lambda b: {"y": b["y"]}
    opt = create_optimizer(1e-3)
    state = create_train_state(jax.random.PRNGKey(seed), model, batch, opt, cond)
    transport = create_transport("Linear", "velocity", snr_type="lognorm")
    step = jax.jit(make_train_step(model, transport, opt, cond))
    losses = []
    for _ in range(3):
        state, m = step(state, batch, jax.random.PRNGKey(seed))
        losses.append(float(m["loss"]))
    return losses, state


def test_training_bitwise_deterministic():
    l1, s1 = _run(0)
    l2, s2 = _run(0)
    assert l1 == l2
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_different_seeds_differ():
    l1, _ = _run(0)
    l2, _ = _run(1)
    assert l1 != l2


def test_sampling_deterministic():
    from lumina_t2x_tpu.pipelines.sample_lib import build_class_cond_sample_fn

    model = NextDiTImageNet(dim=32, n_layers=1, n_heads=4, multiple_of=16,
                            num_classes=4, attn_impl="xla")
    y = jnp.array([1])
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4, 8, 8)),
                           jnp.zeros((1,)), y)
    fn = jax.jit(build_class_cond_sample_fn(model, num_steps=4, latent_size=8))
    o1 = fn(variables, jax.random.PRNGKey(7), y)
    o2 = fn(variables, jax.random.PRNGKey(7), y)
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))
