"""Head-packing falsification experiment for the D=72 MXU-lane question.

VERDICT r2 weak #1 / next-round #1: BASELINE.md derives an ~85% MFU ceiling
from head_dim 72 filling 72/128 MXU lanes in the attention contractions
(the 2B NextDiT architecture is fixed at dim 2304 / 32 heads by
`lumina_next_t2i/models/model.py:994-995`), and NOTES.md names "head-packing
two heads per MXU pass" as the untried lever. This script settles it by
measurement on the real chip:

  (a) K-sweep — time (M,K)@(K,N) bf16 dots at M=N=8192 over
      K in {8..256}. If time is FLAT below K=128 the MXU is tile-quantized
      in the contraction dim and every output element of QK^T at D=72 can
      use at most 72/128 of its MAC lanes (see tile-floor argument below);
      if time SCALES with K there is no lane waste and the 56% story is
      wrong.
  (b) equal-useful-FLOPs kernel comparison — the real flash forward at
      B2/S4096, H=32/D=72 vs H=18/D=128 (both H*D=2304, identical useful
      FLOPs and HBM bytes). The gap is exactly what head_dim 72 costs.
  (c) packed-variant measurements — the candidate packings, timed:
        block-diag QK^T for 2 heads:  (2bq,144)@(144,2bk)  [K=144 -> 2
          K-tiles, M and N doubled: 4x the MXU tiles of two separate dots]
        N-packed PV for 2 heads:      [P1;P2](2bq,bk)@[V1|V2](bk,144)
          [off-diagonal blocks P1V2/P2V1 are garbage: 2x tiles]
      Both are predicted LOSERS by tile arithmetic; measuring them is the
      falsification VERDICT asks for.

Tile-floor argument (why no packing can win if (a) is flat): an MXU pass
produces a (sublanes x 128-lane) output tile where every output element sums
up to 128 products of (LHS stream row x stationary RHS column). For QK^T,
logit s_h[i,j] = sum_{d<72} q_h[i,d] k_h[j,d] sums only 72 products — and
logits of different heads are DIFFERENT output elements, so no packing can
raise per-element lane use above 72/128. For PV, the contraction dim is bk
(large, no waste); the N=72 output tile wastes 56/128 columns, and a column
can only be useful if the SHARED LHS stream (one head's P) matches it, so
cross-head column packing computes garbage. Hence QK^T time has a hard floor
of qtiles*ktiles MXU passes per head, which the existing kernel already
issues, and the only code-level question is whether Mosaic/the MXU charge
less for K<128 or N<128 — that is measurement (a)/(b).

Drive with: python exps/head_packing_experiment.py   (TPU via the tunnel)
Timing per NOTES.md tunnel rules: scan-amortized single executions, operands
as jit args, device->host readback, min over repeats with varied inputs.
"""

import argparse
import functools
import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from lumina_t2x_tpu.core.logging import enable_compile_cache
enable_compile_cache()

N_ITER = 64


@functools.partial(jax.jit, static_argnames=("n_iter",))
def _dot_loop(q, w, n_iter):
    """Chained (M,K)@(K,N) dots: carry feeds back so iterations serialize and
    the tunnel cannot memoize; per-iter cost = one dot + one cheap slice-add."""
    k = q.shape[1]

    def body(c, _):
        out = jax.lax.dot(c, w, preferred_element_type=jnp.float32)
        c2 = (c + out[:, :k].astype(c.dtype) * jnp.bfloat16(1e-6)).astype(c.dtype)
        return c2, ()

    c, _ = jax.lax.scan(body, q, None, length=n_iter)
    return jnp.sum(c.astype(jnp.float32))


def _time(fn, *args, repeats=3):
    # compile + warm
    float(fn(*args))
    best = float("inf")
    for r in range(repeats):
        # vary the input so the relay can't return a memoized execution
        a0 = args[0] + jnp.bfloat16(1e-3 * (r + 1))
        t0 = time.perf_counter()
        float(fn(a0, *args[1:]))
        best = min(best, time.perf_counter() - t0)
    return best


def k_sweep(m=8192, n=8192, ks=(8, 16, 32, 64, 72, 80, 96, 128, 144, 192, 256)):
    print(f"== (a) K-sweep: ({m},K)@(K,{n}) bf16, {N_ITER} chained iters, min of 3")
    key = jax.random.PRNGKey(0)
    rows = []
    for k in ks:
        q = jax.random.normal(key, (m, k), jnp.bfloat16)
        w = jax.random.normal(jax.random.fold_in(key, k), (k, n), jnp.bfloat16)
        dt = _time(_dot_loop, q, w, N_ITER) / N_ITER
        tf = 2 * m * n * k / dt / 1e12
        rows.append((k, dt * 1e3, tf))
        print(f"  K={k:4d}: {dt*1e3:7.3f} ms/dot  {tf:7.1f} TF/s useful")
    return rows


def packed_variants(bq=1024, bk=2048):
    print(f"== (c) packed QK^T variants at kernel blocks bq={bq}, bk={bk}")
    key = jax.random.PRNGKey(1)
    d = 72

    # two separate heads: chain 2*N_ITER dots of (bq,72)@(72,bk)
    q = jax.random.normal(key, (bq, d), jnp.bfloat16)
    w = jax.random.normal(jax.random.fold_in(key, 1), (d, bk), jnp.bfloat16)
    t_sep = _time(_dot_loop, q, w, 2 * N_ITER) / N_ITER  # per 2-head pair
    print(f"  separate 2x (bq,72)@(72,bk):        {t_sep*1e3:7.3f} ms / head-pair")

    # block-diag packed: one (2bq,144)@(144,2bk) dot per head pair
    qp = jax.random.normal(key, (2 * bq, 2 * d), jnp.bfloat16)
    wp = jax.random.normal(jax.random.fold_in(key, 2), (2 * d, 2 * bk), jnp.bfloat16)
    t_pack = _time(_dot_loop, qp, wp, N_ITER) / N_ITER
    print(f"  block-diag (2bq,144)@(144,2bk):      {t_pack*1e3:7.3f} ms / head-pair"
          f"  ({t_pack/t_sep:.2f}x separate)")

    # N-packed PV: [P1;P2](2bq,bk)@[V1|V2](bk,144) vs 2x (bq,bk)@(bk,72)
    p = jax.random.normal(key, (bq, bk), jnp.bfloat16)
    v = jax.random.normal(jax.random.fold_in(key, 3), (bk, d), jnp.bfloat16)
    t_pv_sep = _time(_dot_loop, p, v, 2 * N_ITER) / N_ITER
    pp = jax.random.normal(key, (2 * bq, bk), jnp.bfloat16)
    vv = jax.random.normal(jax.random.fold_in(key, 4), (bk, 2 * d), jnp.bfloat16)
    t_pv_pack = _time(_dot_loop, pp, vv, N_ITER) / N_ITER
    print(f"  separate 2x PV (bq,bk)@(bk,72):      {t_pv_sep*1e3:7.3f} ms / head-pair")
    print(f"  N-packed PV (2bq,bk)@(bk,144):       {t_pv_pack*1e3:7.3f} ms / head-pair"
          f"  ({t_pv_pack/t_pv_sep:.2f}x separate)")
    return dict(qk_sep=t_sep, qk_pack=t_pack, pv_sep=t_pv_sep, pv_pack=t_pv_pack)


@functools.partial(jax.jit, static_argnames=("n_iter", "h", "d"))
def _flash_loop(q, k, v, mask, n_iter, h, d):
    from lumina_t2x_tpu.ops.flash_attention import _pick_blocks, _flash_attention_fwd_impl

    bq, bk = _pick_blocks(q.shape[1], k.shape[1], d)

    def body(c, _):
        out = _flash_attention_fwd_impl(c, k, v, mask, 1.0 / (d ** 0.5), bq, bk)
        c2 = (c + out * jnp.bfloat16(1e-6)).astype(c.dtype)
        return c2, ()

    c, _ = jax.lax.scan(body, q, None, length=n_iter)
    return jnp.sum(c.astype(jnp.float32))


def flash_equal_flops(b=2, s=4096, n_iter=8):
    print(f"== (b) flash fwd, equal useful FLOPs: B{b}/S{s} H32xD72 vs H18xD128")
    key = jax.random.PRNGKey(2)
    results = {}
    for h, d in ((32, 72), (18, 128)):
        q = jax.random.normal(key, (b, s, h, d), jnp.bfloat16)
        k = jax.random.normal(jax.random.fold_in(key, d), (b, s, h, d), jnp.bfloat16)
        v = jax.random.normal(jax.random.fold_in(key, d + 1), (b, s, h, d), jnp.bfloat16)
        mask = jnp.ones((b, s), jnp.int32)
        fn = lambda qq, kk=k, vv=v, mm=mask, hh=h, dd=d: _flash_loop(qq, kk, vv, mm, n_iter, hh, dd)
        float(fn(q))
        best = float("inf")
        for r in range(3):
            q2 = q + jnp.bfloat16(1e-3 * (r + 1))
            t0 = time.perf_counter()
            float(fn(q2))
            best = min(best, time.perf_counter() - t0)
        dt = best / n_iter
        fl = 4 * b * h * s * s * d
        print(f"  H={h:2d} D={d:3d}: {dt*1e3:8.3f} ms/call  {fl/dt/1e12:6.1f} TF/s useful")
        results[(h, d)] = dt
    r = results[(32, 72)] / results[(18, 128)]
    print(f"  D=72 costs {r:.2f}x the D=128 layout at equal useful FLOPs")
    return results


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", choices=["ksweep", "flash", "packed"], default=None)
    args = ap.parse_args()
    print(f"backend: {jax.default_backend()}, devices: {jax.devices()}")
    if args.only in (None, "ksweep"):
        k_sweep()
    if args.only in (None, "flash"):
        flash_equal_flops()
    if args.only in (None, "packed"):
        packed_variants()
