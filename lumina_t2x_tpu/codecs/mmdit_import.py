"""Weight importer: diffusers `SD3Transformer2DModel` -> our MMDiT tree.

The reference loads SD3 through diffusers
(`lumina_next_t2i_mini/sample_sd3.py:33-116`). This maps the diffusers
state-dict naming (as of the SD3 release: `pos_embed.proj`,
`time_text_embed.*`, `context_embedder`, `transformer_blocks.N.{norm1,
norm1_context}.linear`, `attn.{to_q,to_k,to_v,add_q_proj,add_k_proj,
add_v_proj,norm_q,norm_k,norm_added_q,norm_added_k,to_out.0,to_add_out}`,
`ff.net.{0.proj,2}`, `ff_context.net.*`, `norm_out.linear`, `proj_out`) onto
`models/mmdit.py`.

Notes:
- diffusers' patch embedding is a Conv2d(p, stride p); our x_embedder is a
  Dense over flattened patches — the conv kernel reshapes exactly because a
  stride-p pxp conv IS a linear map on each patch. Channel ordering: our
  patchify flattens (C, ph, pw) (`models/layers.py patchify`), the conv
  kernel is (out, C, ph, pw) -> flatten to (out, C*ph*pw) -> transpose.
- diffusers' qkv biases are kept (our Dense defaults use_bias=True).
- adaLN chunk ORDER: diffusers' 6-chunk AdaLayerNormZero emits
  (shift_msa, scale_msa, gate_msa, shift_mlp, scale_mlp, gate_mlp) while our
  block splits (sx1, scx1, gx1, sx2, scx2, gx2) in the same order — direct
  copy. The 2-chunk AdaLayerNormContinuous heads differ: diffusers chunks
  (scale, shift) but our final layer / context-pre-only block split
  (shift, scale), so those two linears get their output halves SWAPPED on
  import (`_swap_scale_shift` — same fix as diffusers' own
  convert_sd3_checkpoint swap_scale_shift).
- cannot be validated against live diffusers in this environment (no
  package); the mapping is exercised by a synthetic round-trip test.
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def _lin(sd, name, bias=True):
    out = {"kernel": np.asarray(sd[f"{name}.weight"], np.float32).T}
    if bias and f"{name}.bias" in sd:
        out["bias"] = np.asarray(sd[f"{name}.bias"], np.float32)
    return out


def _swap_scale_shift(lin: Dict) -> Dict:
    """diffusers AdaLayerNormContinuous packs (scale, shift) along the output
    dim; our modules split (shift, scale) — swap the linear's out halves."""
    k = lin["kernel"]  # (in, out)
    h = k.shape[-1] // 2
    out = {"kernel": np.concatenate([k[:, h:], k[:, :h]], axis=-1)}
    if "bias" in lin:
        b = lin["bias"]
        out["bias"] = np.concatenate([b[h:], b[:h]])
    return out


def import_sd3_mmdit_weights(sd: Dict[str, np.ndarray], n_layers: int,
                             pos_embed_max_size: int = 192,
                             pos_embed_base_size: int = 64) -> Dict:
    """diffusers SD3Transformer2DModel state dict -> MMDiT flax params.

    SD3 checkpoints carry the sincos positional table as a persistent buffer
    (`pos_embed.pos_embed`, (1, max^2, D)). Our MMDiT recomputes it (it is a
    deterministic function of the grid geometry); when the buffer is present
    we VERIFY the recomputation matches it, so a convention drift (h/w half
    order, position scaling, crop origin) fails loudly at import instead of
    silently degrading samples.
    """
    params: Dict = {}

    if "pos_embed.pos_embed" in sd:
        from ..models.mmdit import sincos_pos_embed_2d

        buf = np.asarray(sd["pos_embed.pos_embed"], np.float32).reshape(
            pos_embed_max_size * pos_embed_max_size, -1)
        ours = np.asarray(sincos_pos_embed_2d(
            buf.shape[-1], pos_embed_max_size, pos_embed_max_size,
            max_size=pos_embed_max_size, base_size=pos_embed_base_size))
        err = float(np.abs(buf - ours).max())
        if err > 1e-4:
            raise ValueError(
                f"checkpoint pos_embed buffer deviates from the computed sincos "
                f"table (max abs err {err:.2e}) — positional-embedding convention "
                f"mismatch; check pos_embed_max_size/base_size "
                f"({pos_embed_max_size}/{pos_embed_base_size})")

    # patch embed conv (O, C, p, p) -> dense (C*p*p, O)
    w = np.asarray(sd["pos_embed.proj.weight"], np.float32)
    o, c, p, _ = w.shape
    params["x_embedder"] = {
        "kernel": w.reshape(o, c * p * p).T,
        "bias": np.asarray(sd["pos_embed.proj.bias"], np.float32),
    }
    params["context_embedder"] = _lin(sd, "context_embedder")
    params["t_embedder"] = {
        "mlp_0": _lin(sd, "time_text_embed.timestep_embedder.linear_1"),
        "mlp_2": _lin(sd, "time_text_embed.timestep_embedder.linear_2"),
    }
    params["pooled_hidden"] = _lin(sd, "time_text_embed.text_embedder.linear_1")
    params["pooled_in"] = _lin(sd, "time_text_embed.text_embedder.linear_2")
    params["final_adaLN"] = _swap_scale_shift(_lin(sd, "norm_out.linear"))
    params["final_linear"] = _lin(sd, "proj_out")

    for i in range(n_layers):
        pre = f"transformer_blocks.{i}"
        blk = {
            "x_adaLN": _lin(sd, f"{pre}.norm1.linear"),
            "c_adaLN": _lin(sd, f"{pre}.norm1_context.linear"),
            "x_q": _lin(sd, f"{pre}.attn.to_q"),
            "x_k": _lin(sd, f"{pre}.attn.to_k"),
            "x_v": _lin(sd, f"{pre}.attn.to_v"),
            "c_q": _lin(sd, f"{pre}.attn.add_q_proj"),
            "c_k": _lin(sd, f"{pre}.attn.add_k_proj"),
            "c_v": _lin(sd, f"{pre}.attn.add_v_proj"),
            "x_proj": _lin(sd, f"{pre}.attn.to_out.0"),
            "x_mlp_in": _lin(sd, f"{pre}.ff.net.0.proj"),
            "x_mlp_out": _lin(sd, f"{pre}.ff.net.2"),
        }
        for src, dst in (("norm_q", "x_q_norm"), ("norm_k", "x_k_norm"),
                         ("norm_added_q", "c_q_norm"), ("norm_added_k", "c_k_norm")):
            key = f"{pre}.attn.{src}.weight"
            if key in sd:
                blk[dst] = np.asarray(sd[key], np.float32)
        if f"{pre}.attn.to_add_out.weight" in sd:  # absent on the last block
            blk["c_proj"] = _lin(sd, f"{pre}.attn.to_add_out")
            blk["c_mlp_in"] = _lin(sd, f"{pre}.ff_context.net.0.proj")
            blk["c_mlp_out"] = _lin(sd, f"{pre}.ff_context.net.2")
        else:
            # context-pre-only block: norm1_context is AdaLayerNormContinuous
            # (2-chunk), which needs the same (scale, shift) -> (shift, scale)
            # half swap as the final layer
            blk["c_adaLN"] = _swap_scale_shift(blk["c_adaLN"])
        params[f"blocks_{i}"] = blk
    return params
