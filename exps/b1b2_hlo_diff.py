"""B>1 per-sample regression: optimized-HLO schedule diff (VERDICT r3 #8).

NOTES.md's falsification-by-parts established that the +6.8% per-row cost of
rows=4 vs rows=2 on the bare 2B forward (flash attention) is an emergent
whole-graph effect: every isolated op/kernel/block gets FASTER per-row, only
the deep stacked composition with Pallas custom calls regresses, and the
XLA-attention model does not. The profiler is unavailable through the tunnel
relay, but the compiled program text is not: `jit(...).lower(...).compile()
.as_text()` returns the post-optimization, post-scheduling HLO (TPU HLO
instruction order inside a computation IS the schedule after the sequential
scheduler runs).

This probe compiles the exact `model_fwd_sweep` program from
exps/batch_scaling_probe.py (full 2B flash, and the 1-layer d=2304 variant)
at rows 2 and 4, dumps the HLO text to exps/artifacts/b1b2_hlo/, and prints
a structural summary per program:

  - op-kind histogram of the scan/while body computation (fusion, copy,
    custom-call, transpose, convert, dynamic-slice, ...)
  - per-custom-call operand/result shapes + layouts (a layout mismatch at
    the Pallas boundary shows up as adjacent `copy`/`transpose` fusions)
  - the ordered top-level instruction sequence of the while body with
    shapes normalized (rows dim -> 'B'), so rows=2 vs rows=4 sequences can
    be diffed directly; the probe prints the first divergence point.

Drive (TPU): python exps/b1b2_hlo_diff.py [--layers full 1] [--rows 2 4]
"""

import argparse
import collections
import difflib
import json
import os
import re
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from lumina_t2x_tpu.core.logging import enable_compile_cache
enable_compile_cache()

CAP = 256
S_IMG = 128  # 1024^2 latent grid -> 4096 image tokens

ART = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "artifacts", "b1b2_hlo")


def build_compiled(n_layers, rows, attn_impl="flash"):
    from lumina_t2x_tpu.models import get_model
    from lumina_t2x_tpu.models.next_dit import NextDiT
    import functools

    if n_layers is None:
        model = get_model("NextDiT_2B_patch2", cap_feat_dim=2048, qk_norm=True,
                          dtype=jnp.bfloat16, attn_impl=attn_impl)
    else:
        model = NextDiT(patch_size=2, dim=2304, n_layers=n_layers, n_heads=32,
                        cap_feat_dim=2048, qk_norm=True, dtype=jnp.bfloat16,
                        attn_impl=attn_impl)
    rng = jax.random.PRNGKey(0)
    x0 = jax.random.normal(rng, (2, 4, S_IMG, S_IMG))
    cap0 = jax.random.normal(rng, (2, 8, 2048))
    variables = jax.jit(model.init)(jax.random.fold_in(rng, 2), x0,
                                    jnp.zeros((2,)), cap0,
                                    jnp.ones((2, 8), jnp.int32))
    variables = jax.tree.map(lambda a: a.astype(jnp.bfloat16)
                             if a.dtype == jnp.float32 else a, variables)

    # the same 8-iteration chained scan the timing probe measures
    @functools.partial(jax.jit, static_argnames=("n",))
    def fwd_loop(v, x, t, cap, mask, n):
        def body(c, _):
            out = model.apply(v, c, t, cap, mask)
            return (c + out * jnp.bfloat16(1e-6)).astype(c.dtype), ()
        c, _ = jax.lax.scan(body, x, None, length=n)
        return jnp.sum(c.astype(jnp.float32))

    x = jnp.zeros((rows, 4, S_IMG, S_IMG), jnp.bfloat16)
    t = jnp.full((rows,), 0.5, jnp.float32)
    cap = jnp.zeros((rows, CAP, 2048), jnp.bfloat16)
    mask = jnp.ones((rows, CAP), jnp.int32)
    return fwd_loop.lower(variables, x, t, cap, mask, 8).compile()


_OP_RE = re.compile(
    r"^\s*(?:ROOT\s+)?%?([\w.\-]+)\s*=\s*((?:\([^=]*?\)|\S+?))\s+([\w\-]+)\(")
_HDR_RE = re.compile(r"^(?:ENTRY\s+)?%?([\w.\-]+)\s+\(")


def parse_computations(hlo_text):
    """{computation_name: [(result_name, shape, opkind, rest_of_line)]}.

    Headers can carry tuple-typed args with nested parens/brackets, so we
    only require `name (` at line start and a trailing `{`."""
    comps, cur = {}, None
    for line in hlo_text.splitlines():
        if cur is None or not line.startswith(" "):
            m = _HDR_RE.match(line)
            if m and line.rstrip().endswith("{"):
                cur = []
                comps[m.group(1)] = cur
                continue
        if line.startswith("}"):
            cur = None
            continue
        if cur is None:
            continue
        m = _OP_RE.match(line)
        if m:
            cur.append((m.group(1), m.group(2), m.group(3), line.strip()))
    return comps


def normalize_shape(shape, rows):
    """Rows-dependent dims -> B inside the [dims] bracket only (layout/tiling
    annotations after `{` stay untouched; `2` is a legal tiling value)."""
    def fix(m):
        dims = m.group(1).split(",")
        out = []
        for d in dims:
            if d == str(rows):
                out.append("B")
            elif d == str(rows * 4096):
                out.append("B*S")
            else:
                out.append(d)
        return "[" + ",".join(out) + "]"
    return re.sub(r"\[([\d,]+)\]", fix, shape)


def summarize(tag, compiled, rows):
    text = compiled.as_text()
    os.makedirs(ART, exist_ok=True)
    path = os.path.join(ART, f"{tag}.hlo.txt")
    with open(path, "w") as f:
        f.write(text)
    comps = parse_computations(text)
    # the per-layer computation = the one holding the flash custom-calls
    # (the block scan's while body); fall back to the largest computation
    with_customs = [(n, c) for n, c in comps.items()
                    if any(op == "custom-call" for _, _, op, _ in c)]
    if with_customs:
        body_name, body = max(with_customs, key=lambda nc: len(nc[1]))
    else:
        body_name, body = max(comps.items(), key=lambda nc: len(nc[1]))
    hist = collections.Counter(op for _, _, op, _ in body)
    customs = [line for _, _, op, line in body if op == "custom-call"]
    seq = [f"{op} {normalize_shape(shape, rows)}" for _, shape, op, _ in body]
    summary = {
        "tag": tag, "rows": rows, "hlo_bytes": len(text),
        "n_computations": len(comps), "body": body_name,
        "body_ops": len(body), "op_hist": dict(hist.most_common()),
        "custom_calls": len(customs),
        "module_custom_calls": sum(
            1 for c in comps.values() for _, _, op, _ in c
            if op == "custom-call"),
    }
    print(json.dumps(summary))
    return summary, seq, customs


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--layers", nargs="+", default=["full", "1"])
    p.add_argument("--rows", type=int, nargs="+", default=[2, 4])
    p.add_argument("--attn", default="flash")
    args = p.parse_args()

    for lay in args.layers:
        n_layers = None if lay == "full" else int(lay)
        got = {}
        for rows in args.rows:
            tag = f"L{lay}_rows{rows}_{args.attn}"
            print(f"== compiling {tag}", file=sys.stderr, flush=True)
            compiled = build_compiled(n_layers, rows, args.attn)
            got[rows] = summarize(tag, compiled, rows)
        if len(got) == 2:
            (r0, (s0, seq0, cc0)), (r1, (s1, seq1, cc1)) = sorted(got.items())
            # op-kind histogram delta
            keys = set(s0["op_hist"]) | set(s1["op_hist"])
            delta = {k: (s0["op_hist"].get(k, 0), s1["op_hist"].get(k, 0))
                     for k in sorted(keys)
                     if s0["op_hist"].get(k, 0) != s1["op_hist"].get(k, 0)}
            print(json.dumps({"tag": f"L{lay}", "op_hist_delta_r2_vs_r4": delta}))
            # schedule diff on normalized sequences
            sm = difflib.SequenceMatcher(a=seq0, b=seq1, autojunk=False)
            diffs = [(op, i1, i2, j1, j2) for op, i1, i2, j1, j2
                     in sm.get_opcodes() if op != "equal"]
            print(json.dumps({"tag": f"L{lay}", "seq_len": [len(seq0), len(seq1)],
                              "n_diff_hunks": len(diffs)}))
            for op, i1, i2, j1, j2 in diffs[:12]:
                print(f"  hunk {op}: rows{r0}[{i1}:{i2}] vs rows{r1}[{j1}:{j2}]")
                for s in seq0[i1:min(i2, i1 + 4)]:
                    print(f"    r{r0}< {s[:140]}")
                for s in seq1[j1:min(j2, j1 + 4)]:
                    print(f"    r{r1}> {s[:140]}")
            with open(os.path.join(ART, f"L{lay}_custom_calls.txt"), "w") as f:
                f.write(f"== rows={r0}\n" + "\n".join(cc0)
                        + f"\n== rows={r1}\n" + "\n".join(cc1))


if __name__ == "__main__":
    main()
