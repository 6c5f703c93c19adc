"""Pure-MXU contraction-dim quantization probe (VMEM-resident Pallas loop).

The XLA-level K-sweep in head_packing_experiment.py is HBM-bound (each
(8192,K)@(K,8192) dot writes a 256 MB f32 output — times were flat ~0.64 ms
at EVERY K, i.e. bandwidth, not MXU). This kernel keeps everything in VMEM:
one grid step, an internal fori_loop of chained (M,K)@(K,N) dots with a
cheap data dependency between iterations so Mosaic cannot hoist the matmul.
Per-dot time isolates how the MXU charges for the contraction dim K — the
question that decides whether head_dim 72 (the 2B NextDiT config,
`lumina_next_t2i/models/model.py:994-995`) wastes 56/128 MXU lanes
(tile-quantized: t flat below K=128) or not (t scales with K).

Also sweeps N (output lanes) the same way for the PV-matmul side (N=72).

Drive with: python exps/mxu_k_quantum.py
"""

import functools
import os
import sys
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from lumina_t2x_tpu.core.logging import enable_compile_cache
enable_compile_cache()

M = 1024
N_DEFAULT = 1024
ITERS = 512


def _kernel(a_ref, w_ref, o_ref, *, iters):
    """Accumulate `iters` independent dots. The LHS is perturbed by the loop
    index (a scalar broadcast OFF the dot->dot critical path) so Mosaic can
    neither hoist the loop-invariant matmul nor serialize MXU passes on a
    data dependency — iterations pipeline and the timing is throughput, not
    latency (a carried a->dot->a chain measured 56 us/dot flat at every K,
    i.e. pure pipeline latency)."""

    def body(j, acc):
        # scalar arith in f32 (Mosaic has no scalar bf16 mulf), cast at the add
        pert = jax.lax.convert_element_type(j, jnp.float32) * 1e-6
        aj = (a_ref[:].astype(jnp.float32) + pert).astype(jnp.bfloat16)
        return acc + jax.lax.dot_general(aj, w_ref[:], (((1,), (0,)), ((), ())),
                                         preferred_element_type=jnp.float32)

    acc0 = jnp.zeros(o_ref.shape, jnp.float32)
    o_ref[:] = jax.lax.fori_loop(0, iters, body, acc0)


@functools.partial(jax.jit, static_argnames=("iters",))
def _run(a, w, iters):
    m, _ = a.shape
    n = w.shape[1]
    out = pl.pallas_call(
        functools.partial(_kernel, iters=iters),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.float32),
        interpret=jax.default_backend() == "cpu",
    )(a, w)
    return jnp.sum(out)


def sweep(name, shapes):
    print(f"== {name} (M={M}, {ITERS} chained in-VMEM dots, min of 3)")
    key = jax.random.PRNGKey(0)
    for k, n in shapes:
        a = jax.random.normal(key, (M, k), jnp.bfloat16)
        w = jax.random.normal(jax.random.fold_in(key, 7 * k + n), (k, n), jnp.bfloat16)
        float(_run(a, w, ITERS))  # compile
        best = float("inf")
        for r in range(3):
            a2 = a + jnp.bfloat16(1e-3 * (r + 1))
            t0 = time.perf_counter()
            float(_run(a2, w, ITERS))
            best = min(best, time.perf_counter() - t0)
        dt = best / ITERS
        tf = 2 * M * n * k / dt / 1e12
        print(f"  K={k:4d} N={n:4d}: {dt*1e6:9.2f} us/dot  {tf:7.1f} TF/s useful")


if __name__ == "__main__":
    print(f"backend: {jax.default_backend()}, devices: {jax.devices()}")
    sweep("K-sweep (N=1024)", [(k, N_DEFAULT) for k in
                               (8, 16, 32, 64, 72, 80, 96, 128, 144, 192, 256, 512)])
    sweep("N-sweep (K=1024)", [(1024, n) for n in
                               (8, 16, 32, 64, 72, 80, 96, 128, 144, 192, 256)])
