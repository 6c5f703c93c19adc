"""Checkpoint save/restore + interop with reference checkpoint formats.

Reference behavior covered (`SURVEY.md §2.8`, `lumina_next_t2i/train.py:332-398,613-674`):
- directory-per-step layout `<results>/checkpoints/<step:07d>/`;
- model + EMA + optimizer streams, `model_args` persistence (inference
  reconstructs the model from it, `sample.py:99`), `resume_step.txt`;
- `--auto_resume` picks the latest step dir (`train.py:332-341`);
- `--init_from` weights-only load with shape-mismatch key dropping
  (`train.py:369-397`);
- `.safetensors` release format + pth<->safetensors conversion
  (`entry_point.py:115-156`) — here: torch-checkpoint import into the JAX
  param tree (incl. stacking per-layer weights for nn.scan layouts).

TPU-native design: tensors are saved sharded via Orbax (each host writes its
shards; restore re-shards to any mesh), replacing the reference's
FSDP-consolidated rank-0 .pth files.
"""

from __future__ import annotations

import json
import logging
import os
import re
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import orbax.checkpoint as ocp
from flax import traverse_util


def checkpoint_dir(results_dir: str, step: int) -> str:
    return os.path.join(results_dir, "checkpoints", f"{step:07d}")


def save_checkpoint(results_dir: str, step: int, state, model_args: Optional[Dict] = None,
                    keep_last: int = 0):
    """Save params/EMA/opt-state (sharded) + model_args + resume_step.

    `keep_last` > 0 prunes older COMPLETE checkpoints beyond the newest
    `keep_last` after this save commits (a retention policy the reference
    lacks — at 2B each step dir is ~18 GB)."""
    path = os.path.abspath(checkpoint_dir(results_dir, step))
    os.makedirs(path, exist_ok=True)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.join(path, "model"), state.params, force=True)
    ckptr.save(os.path.join(path, "ema"), state.ema_params, force=True)
    ckptr.save(os.path.join(path, "optimizer"), state.opt_state, force=True)
    ckptr.wait_until_finished()
    if model_args is not None:
        with open(os.path.join(path, "model_args.json"), "w") as f:
            json.dump(model_args, f, indent=2, default=str)
    with open(os.path.join(path, "resume_step.txt"), "w") as f:
        f.write(str(step))
    prune_checkpoints(results_dir, keep_last)
    return path


def prune_checkpoints(results_dir: str, keep_last: int) -> list:
    """Delete all but the newest `keep_last` COMPLETE checkpoint dirs
    (those with the `resume_step.txt` marker; in-flight async saves have
    no marker yet and are never touched). No-op for keep_last <= 0 or on
    non-lead hosts (each dir is shared storage written once). Returns the
    pruned paths."""
    if keep_last <= 0 or jax.process_index() != 0:
        return []
    base = os.path.join(results_dir, "checkpoints")
    if not os.path.isdir(base):
        return []
    complete = sorted(
        (d for d in os.listdir(base)
         if re.fullmatch(r"\d{7}", d)
         and os.path.exists(os.path.join(base, d, "resume_step.txt"))),
        key=int,
    )
    import shutil

    pruned = []
    for d in complete[:-keep_last]:
        target = os.path.join(base, d)
        try:
            shutil.rmtree(target)
        except OSError as e:
            # Report but keep going: a busy NFS dir must not look "pruned"
            # (disk would silently keep filling) nor abort training.
            logging.getLogger(__name__).warning("prune failed for %s: %s", target, e)
            continue
        if os.path.exists(target):
            logging.getLogger(__name__).warning("prune incomplete for %s", target)
            continue
        pruned.append(target)
    return pruned


class AsyncCheckpointSaver:
    """Non-blocking `save_checkpoint`: training overlaps the disk write.

    At 2B the synchronous save serializes ~18 GB of train state through one
    blocking call; the reference's torch.save at `train.py:613-674` has the
    same stall. Orbax's async saver splits the work: `save()` blocks only for
    the device->host copy (after which the device buffers are free — safe
    even though the train step donates its state, train_lib.py:372), and the
    serialization to disk runs on background threads while the next steps
    execute.

    Crash-consistency: `resume_step.txt` is the completion marker
    `find_auto_resume` keys on, so it is written only at `wait()` —
    an in-flight checkpoint is invisible to auto-resume until the bytes are
    durably committed. Each stream (model/ema/optimizer) gets its own
    AsyncCheckpointer because `AsyncCheckpointer.save` finalizes any previous
    save on the SAME checkpointer first (one shared instance would serialize
    the three streams and only overlap the last).

    Usage (the trainer's `--async_save` path):
        saver = AsyncCheckpointSaver()
        saver.save(results_dir, step, state, model_args)   # returns fast
        ... more train steps ...
        saver.save(results_dir, step2, state, model_args)  # waits for #1 first
        saver.close()                                      # finalize last save
    """

    def __init__(self, keep_last: int = 0):
        self._ckptrs = {name: ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler())
                        for name in ("model", "ema", "optimizer")}
        self._pending: Optional[tuple] = None
        self.keep_last = keep_last

    def save(self, results_dir: str, step: int, state,
             model_args: Optional[Dict] = None) -> str:
        """Initiate an async save; finalizes any still-pending previous save
        first. Returns the checkpoint path (contents commit in background)."""
        self.wait()
        path = os.path.abspath(checkpoint_dir(results_dir, step))
        os.makedirs(path, exist_ok=True)
        self._ckptrs["model"].save(os.path.join(path, "model"), state.params, force=True)
        self._ckptrs["ema"].save(os.path.join(path, "ema"), state.ema_params, force=True)
        self._ckptrs["optimizer"].save(
            os.path.join(path, "optimizer"), state.opt_state, force=True)
        self._pending = (path, step, model_args)
        return path

    def wait(self) -> Optional[str]:
        """Block until the pending save is durable, then write the
        model_args/resume_step completion markers. No-op when idle."""
        if self._pending is None:
            return None
        path, step, model_args = self._pending
        for c in self._ckptrs.values():
            c.wait_until_finished()
        if model_args is not None:
            with open(os.path.join(path, "model_args.json"), "w") as f:
                json.dump(model_args, f, indent=2, default=str)
        with open(os.path.join(path, "resume_step.txt"), "w") as f:
            f.write(str(step))
        self._pending = None
        prune_checkpoints(os.path.dirname(os.path.dirname(path)), self.keep_last)
        return path

    def close(self):
        self.wait()
        for c in self._ckptrs.values():
            c.close()


def find_auto_resume(results_dir: str) -> Optional[str]:
    """Latest existing checkpoint dir (`train.py:332-341`)."""
    base = os.path.join(results_dir, "checkpoints")
    if not os.path.isdir(base):
        return None
    steps = sorted(
        (d for d in os.listdir(base) if re.fullmatch(r"\d{7}", d)), key=int
    )
    for d in reversed(steps):
        if os.path.exists(os.path.join(base, d, "resume_step.txt")):
            return os.path.join(base, d)
    return None


def _abstract_like(tree):
    """ShapeDtypeStruct template preserving each leaf's sharding."""
    return jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype, sharding=a.sharding)
        if isinstance(a, jax.Array) else a,
        tree,
    )


def load_checkpoint(path: str, state, free_placeholder: bool = True):
    """Restore a TrainState saved by save_checkpoint (same tree structure).

    Restores into abstract templates and (by default) frees the placeholder
    device buffers first: at 600M+ params the initial state plus the restored
    copy would otherwise exceed single-chip HBM (params+ema+adamw ~= 9.6GB
    each way on 16GB v5e).
    """
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    tpl_params = _abstract_like(state.params)
    tpl_ema = _abstract_like(state.ema_params)
    tpl_opt = _abstract_like(state.opt_state)
    if free_placeholder:
        for leaf in jax.tree.leaves((state.params, state.ema_params, state.opt_state)):
            if isinstance(leaf, jax.Array):
                leaf.delete()
    params = ckptr.restore(os.path.join(path, "model"), tpl_params)
    ema = ckptr.restore(os.path.join(path, "ema"), tpl_ema)
    opt = ckptr.restore(os.path.join(path, "optimizer"), tpl_opt)
    with open(os.path.join(path, "resume_step.txt")) as f:
        step = int(f.read().strip())
    return state.replace(
        step=jnp.asarray(step, jnp.int32), params=params, ema_params=ema, opt_state=opt
    )


def load_model_args(path: str) -> Dict:
    """Recorded model args of a checkpoint dir, or {} when absent (converted
    release checkpoints — `lumina convert` writes only the ema subtree; the
    reference's `model_args.pth` is likewise trainer-only)."""
    args_path = os.path.join(path, "model_args.json")
    if not os.path.exists(args_path):
        return {}
    with open(args_path) as f:
        return json.load(f)


def init_from(path: str, params, stream: str = "ema"):
    """Weights-only partial load: keys with mismatched shapes are dropped
    (`train.py:369-397`)."""
    path = os.path.abspath(path)
    ckptr = ocp.PyTreeCheckpointer()
    loaded = ckptr.restore(os.path.join(path, stream))
    flat_cur = traverse_util.flatten_dict(params, sep="/")
    flat_new = traverse_util.flatten_dict(loaded, sep="/")
    out, dropped = {}, []
    for k, v in flat_cur.items():
        if k in flat_new and tuple(flat_new[k].shape) == tuple(v.shape):
            out[k] = jnp.asarray(flat_new[k], v.dtype)
        else:
            out[k] = v
            if k in flat_new:
                dropped.append(k)
    if dropped:
        print(f"init_from: dropped {len(dropped)} shape-mismatched keys: {dropped[:8]}...")
    return traverse_util.unflatten_dict(out, sep="/")


# ---------------------------------------------------------------------------
# Torch / safetensors checkpoint import (reference release weights)
# ---------------------------------------------------------------------------

def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a reference checkpoint (.pth or .safetensors) to numpy.

    bf16 safetensors (a common release precision) have no numpy dtype, so
    those fall back to the torch loader and upcast to fp32 — the importers
    hand fp32 to flax, and the model's param_dtype decides storage."""
    if path.endswith(".safetensors"):
        try:
            from safetensors.numpy import load_file

            return load_file(path)
        except (TypeError, ValueError):
            import torch
            from safetensors.torch import load_file as load_torch

            return {k: v.float().numpy() for k, v in load_torch(path).items()}
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    return {k: v.float().numpy() for k, v in sd.items()}


def _torch_linear(flat, torch_name, has_bias=True):
    out = {"kernel": flat[f"{torch_name}.weight"].T}
    if has_bias and f"{torch_name}.bias" in flat:
        out["bias"] = flat[f"{torch_name}.bias"]
    return out


def import_next_dit_weights(state_dict: Dict[str, np.ndarray], n_layers: int,
                            scan_layers: bool = True) -> Dict[str, Any]:
    """Map a reference NextDiT state_dict (`lumina_next_t2i/models/model.py`)
    onto our flax param tree. Linear weights transpose (out,in)->(in,out);
    per-layer tensors stack on a leading axis for the nn.scan layout."""
    sd = state_dict
    params: Dict[str, Any] = {}

    params["x_embedder"] = _torch_linear(sd, "x_embedder")
    params["pad_token"] = sd["pad_token"]
    params["t_embedder"] = {
        "mlp_0": _torch_linear(sd, "t_embedder.mlp.0"),
        "mlp_2": _torch_linear(sd, "t_embedder.mlp.2"),
    }
    params["cap_embedder"] = {
        "norm": {"weight": sd["cap_embedder.0.weight"], "bias": sd["cap_embedder.0.bias"]},
        "proj": _torch_linear(sd, "cap_embedder.1"),
    }
    params["final_layer"] = {
        "linear": _torch_linear(sd, "final_layer.linear"),
        "adaLN_modulation": _torch_linear(sd, "final_layer.adaLN_modulation.1"),
    }

    def layer_params(i):
        pre = f"layers.{i}"
        p = {
            "adaLN_modulation": _torch_linear(sd, f"{pre}.adaLN_modulation.1"),
            "attention_norm1": {"weight": sd[f"{pre}.attention_norm1.weight"]},
            "attention_norm2": {"weight": sd[f"{pre}.attention_norm2.weight"]},
            "ffn_norm1": {"weight": sd[f"{pre}.ffn_norm1.weight"]},
            "ffn_norm2": {"weight": sd[f"{pre}.ffn_norm2.weight"]},
            "attention_y_norm": {"weight": sd[f"{pre}.attention_y_norm.weight"]},
            "attention": {
                "wq": _torch_linear(sd, f"{pre}.attention.wq", has_bias=False),
                "wk": _torch_linear(sd, f"{pre}.attention.wk", has_bias=False),
                "wv": _torch_linear(sd, f"{pre}.attention.wv", has_bias=False),
                "wo": _torch_linear(sd, f"{pre}.attention.wo", has_bias=False),
                "wk_y": _torch_linear(sd, f"{pre}.attention.wk_y", has_bias=False),
                "wv_y": _torch_linear(sd, f"{pre}.attention.wv_y", has_bias=False),
                "gate": sd[f"{pre}.attention.gate"],
            },
            "feed_forward": {
                "w1": _torch_linear(sd, f"{pre}.feed_forward.w1", has_bias=False),
                "w2": _torch_linear(sd, f"{pre}.feed_forward.w2", has_bias=False),
                "w3": _torch_linear(sd, f"{pre}.feed_forward.w3", has_bias=False),
            },
        }
        for norm in ("q_norm", "k_norm", "ky_norm"):
            if f"{pre}.attention.{norm}.weight" in sd:
                p["attention"][norm] = {
                    "weight": sd[f"{pre}.attention.{norm}.weight"],
                    "bias": sd[f"{pre}.attention.{norm}.bias"],
                }
        return p

    per_layer = [layer_params(i) for i in range(n_layers)]
    if scan_layers:
        stacked = jax.tree.map(lambda *xs: np.stack(xs), *per_layer)
        params["layers"] = stacked
    else:
        for i, p in enumerate(per_layer):
            params[f"layers_{i}"] = p
    return params


def next_dit_reference_state_shapes(dim: int = 2304, n_layers: int = 24,
                                    n_heads: int = 32, n_kv_heads: Optional[int] = None,
                                    in_channels: int = 4, patch_size: int = 2,
                                    cap_feat_dim: int = 2048, qk_norm: bool = True,
                                    learn_sigma: bool = True, multiple_of: int = 256,
                                    ffn_dim_multiplier: Optional[float] = None) -> Dict[str, tuple]:
    """EXACT key names and shapes of a reference NextDiT release checkpoint
    (`consolidated*.safetensors`, `lumina_next_t2i/demo.py:127-133`; modules
    `lumina_next_t2i/models/model.py:665-999` at model_parallel_size 1 —
    `freqs_cis` is a plain attribute, not a buffer, so it is absent).

    Defaults are the released 2B flagship (`NextDiT_2B_patch2` + Gemma-2B
    features + qk-norm). Pinned against the reference's own torch module in
    `tests/test_checkpoint_contract_2b.py`; `exps/rehearse_2b_contract.py`
    uses it to rehearse the full-size load contract without real weights."""
    from ..models.layers import ffn_hidden_size

    kv_dim = (n_kv_heads or n_heads) * (dim // n_heads)
    cond = min(dim, 1024)
    hidden = ffn_hidden_size(4 * dim, multiple_of, ffn_dim_multiplier)
    out_dim = patch_size * patch_size * (in_channels * 2 if learn_sigma else in_channels)
    s: Dict[str, tuple] = {
        "x_embedder.weight": (dim, patch_size * patch_size * in_channels),
        "x_embedder.bias": (dim,),
        "pad_token": (dim,),
        "t_embedder.mlp.0.weight": (cond, 256),
        "t_embedder.mlp.0.bias": (cond,),
        "t_embedder.mlp.2.weight": (cond, cond),
        "t_embedder.mlp.2.bias": (cond,),
        "cap_embedder.0.weight": (cap_feat_dim,),
        "cap_embedder.0.bias": (cap_feat_dim,),
        "cap_embedder.1.weight": (cond, cap_feat_dim),
        "cap_embedder.1.bias": (cond,),
        "final_layer.linear.weight": (out_dim, dim),
        "final_layer.linear.bias": (out_dim,),
        "final_layer.adaLN_modulation.1.weight": (dim, cond),
        "final_layer.adaLN_modulation.1.bias": (dim,),
    }
    for i in range(n_layers):
        pre = f"layers.{i}"
        s[f"{pre}.attention.wq.weight"] = (dim, dim)
        s[f"{pre}.attention.wk.weight"] = (kv_dim, dim)
        s[f"{pre}.attention.wv.weight"] = (kv_dim, dim)
        s[f"{pre}.attention.wo.weight"] = (dim, dim)
        s[f"{pre}.attention.wk_y.weight"] = (kv_dim, cap_feat_dim)
        s[f"{pre}.attention.wv_y.weight"] = (kv_dim, cap_feat_dim)
        s[f"{pre}.attention.gate"] = (n_heads,)
        if qk_norm:
            s[f"{pre}.attention.q_norm.weight"] = (dim,)
            s[f"{pre}.attention.q_norm.bias"] = (dim,)
            s[f"{pre}.attention.k_norm.weight"] = (kv_dim,)
            s[f"{pre}.attention.k_norm.bias"] = (kv_dim,)
            s[f"{pre}.attention.ky_norm.weight"] = (kv_dim,)
            s[f"{pre}.attention.ky_norm.bias"] = (kv_dim,)
        s[f"{pre}.feed_forward.w1.weight"] = (hidden, dim)
        s[f"{pre}.feed_forward.w2.weight"] = (dim, hidden)
        s[f"{pre}.feed_forward.w3.weight"] = (hidden, dim)
        for nm in ("attention_norm1", "attention_norm2", "ffn_norm1", "ffn_norm2"):
            s[f"{pre}.{nm}.weight"] = (dim,)
        s[f"{pre}.attention_y_norm.weight"] = (cap_feat_dim,)
        s[f"{pre}.adaLN_modulation.1.weight"] = (4 * dim, cond)
        s[f"{pre}.adaLN_modulation.1.bias"] = (4 * dim,)
    return s


def import_flag_dit_weights(state_dict: Dict[str, np.ndarray], n_layers: int,
                            scan_layers: bool = True) -> Dict[str, Any]:
    """Map a reference Flag-DiT (5B text) state_dict
    (`lumina_t2i/models/model.py:665-991`) onto our `models/flag_dit.py`
    tree: pre-norm blocks (single attention_norm/ffn_norm), 6-chunk adaLN,
    [eol] token. The reference's `pad_token` (list-path padding) and
    `freqs_cis` buffer have no counterpart here and are skipped."""
    sd = state_dict
    params: Dict[str, Any] = {
        "x_embedder": _torch_linear(sd, "x_embedder"),
        "eol_token": sd["eol_token"],
        "t_embedder": {
            "mlp_0": _torch_linear(sd, "t_embedder.mlp.0"),
            "mlp_2": _torch_linear(sd, "t_embedder.mlp.2"),
        },
        "cap_embedder": {
            "norm": {"weight": sd["cap_embedder.0.weight"], "bias": sd["cap_embedder.0.bias"]},
            "proj": _torch_linear(sd, "cap_embedder.1"),
        },
        "final_layer": {
            "linear": _torch_linear(sd, "final_layer.linear"),
            "adaLN_modulation": _torch_linear(sd, "final_layer.adaLN_modulation.1"),
        },
    }

    def layer_params(i):
        pre = f"layers.{i}"
        p = {
            "adaLN_modulation": _torch_linear(sd, f"{pre}.adaLN_modulation.1"),
            "attention_norm": {"weight": sd[f"{pre}.attention_norm.weight"]},
            "ffn_norm": {"weight": sd[f"{pre}.ffn_norm.weight"]},
            "attention_y_norm": {"weight": sd[f"{pre}.attention_y_norm.weight"]},
            "attention": {
                name: _torch_linear(sd, f"{pre}.attention.{name}", has_bias=False)
                for name in ("wq", "wk", "wv", "wo", "wk_y", "wv_y")
            },
            "feed_forward": {
                name: _torch_linear(sd, f"{pre}.feed_forward.{name}", has_bias=False)
                for name in ("w1", "w2", "w3")
            },
        }
        p["attention"]["gate"] = sd[f"{pre}.attention.gate"]
        for norm in ("q_norm", "k_norm", "ky_norm"):
            if f"{pre}.attention.{norm}.weight" in sd:
                p["attention"][norm] = {
                    "weight": sd[f"{pre}.attention.{norm}.weight"],
                    "bias": sd[f"{pre}.attention.{norm}.bias"],
                }
        return p

    per_layer = [layer_params(i) for i in range(n_layers)]
    if scan_layers:
        params["layers"] = jax.tree.map(lambda *xs: np.stack(xs), *per_layer)
    else:
        for i, p in enumerate(per_layer):
            params[f"layers_{i}"] = p
    return params


def import_next_dit_imagenet_weights(state_dict: Dict[str, np.ndarray], n_layers: int,
                                     scan_layers: bool = True) -> Dict[str, Any]:
    """Map a reference Next-DiT-ImageNet state_dict
    (`Next-DiT-ImageNet/models/models.py:836-1035`, SandwichNorm2 blocks)
    onto our `models/next_dit_imagenet.py` tree: 4-chunk adaLN
    (scale, tanh-gate), inner PFRMSNorm (attention_norm1/ffn_norm1) + outer
    RMSNorm (attention_norm/ffn_norm), class-label embedding table."""
    sd = state_dict
    params: Dict[str, Any] = {
        "x_embedder": _torch_linear(sd, "x_embedder"),
        "t_embedder": {
            "mlp_0": _torch_linear(sd, "t_embedder.mlp.0"),
            "mlp_2": _torch_linear(sd, "t_embedder.mlp.2"),
        },
        "y_embedder": {"embedding": sd["y_embedder.embedding_table.weight"]},
        "final_layer": {
            "linear": _torch_linear(sd, "final_layer.linear"),
            "adaLN_modulation": _torch_linear(sd, "final_layer.adaLN_modulation.1"),
        },
    }

    def layer_params(i):
        pre = f"layers.{i}"
        p = {
            "adaLN_modulation": _torch_linear(sd, f"{pre}.adaLN_modulation.1"),
            # inner norms (attention_norm1/ffn_norm1) are parameter-free
            # PFRMSNorms — nothing to import for them
            "attention_norm": {"weight": sd[f"{pre}.attention_norm.weight"]},
            "ffn_norm": {"weight": sd[f"{pre}.ffn_norm.weight"]},
            "attention": {
                name: _torch_linear(sd, f"{pre}.attention.{name}", has_bias=False)
                for name in ("wq", "wk", "wv", "wo")
            },
            "feed_forward": {
                name: _torch_linear(sd, f"{pre}.feed_forward.{name}", has_bias=False)
                for name in ("w1", "w2", "w3")
            },
        }
        for norm in ("q_norm", "k_norm"):
            if f"{pre}.attention.{norm}.weight" in sd:
                p["attention"][norm] = {
                    "weight": sd[f"{pre}.attention.{norm}.weight"],
                    "bias": sd[f"{pre}.attention.{norm}.bias"],
                }
        return p

    per_layer = [layer_params(i) for i in range(n_layers)]
    if scan_layers:
        params["layers"] = jax.tree.map(lambda *xs: np.stack(xs), *per_layer)
    else:
        for i, p in enumerate(per_layer):
            params[f"layers_{i}"] = p
    return params


def _import_moe_ffn(sd, prefix: str) -> Dict[str, Any]:
    """One reference Time/SpaceMoeLayer (`Next-DiT-MoE/models/models2.py:451-506`:
    per-expert SwiGLU modules + a bias-free gate) -> our stacked (E, ...)
    expert tensors (`models/moe.py`)."""
    experts = []
    j = 0
    while f"{prefix}.experts.{j}.w1.weight" in sd:
        experts.append(j)
        j += 1
    return {
        "w1": np.stack([sd[f"{prefix}.experts.{j}.w1.weight"].T for j in experts]),
        "w2": np.stack([sd[f"{prefix}.experts.{j}.w2.weight"].T for j in experts]),
        "w3": np.stack([sd[f"{prefix}.experts.{j}.w3.weight"].T for j in experts]),
        "gate": {"kernel": sd[f"{prefix}.gate.weight"].T},
    }


def import_next_dit_moe_weights(state_dict: Dict[str, np.ndarray], n_layers: int,
                                scan_layers: bool = True) -> Dict[str, Any]:
    """Map a reference Next-DiT-MoE state_dict onto our `models/moe.py` tree.
    Handles all three variants by key shape: `feed_forward_time` +
    `feed_forward_space` (Both, `models2.py:692-819`) or a single
    `feed_forward` (Time `models.py` / Space `models1.py`), MoE or dense."""
    sd = state_dict
    params: Dict[str, Any] = {
        "x_embedder": _torch_linear(sd, "x_embedder"),
        "t_embedder": {
            "mlp_0": _torch_linear(sd, "t_embedder.mlp.0"),
            "mlp_2": _torch_linear(sd, "t_embedder.mlp.2"),
        },
        "y_embedder": {"embedding": sd["y_embedder.embedding_table.weight"]},
        "final_layer": {
            "linear": _torch_linear(sd, "final_layer.linear"),
            "adaLN_modulation": _torch_linear(sd, "final_layer.adaLN_modulation.1"),
        },
    }

    def layer_params(i):
        pre = f"layers.{i}"
        p = {
            "adaLN_modulation": _torch_linear(sd, f"{pre}.adaLN_modulation.1"),
            "attention_norm": {"weight": sd[f"{pre}.attention_norm.weight"]},
            "attention": {
                name: _torch_linear(sd, f"{pre}.attention.{name}", has_bias=False)
                for name in ("wq", "wk", "wv", "wo")
            },
        }
        for norm in ("q_norm", "k_norm"):
            if f"{pre}.attention.{norm}.weight" in sd:
                p["attention"][norm] = {
                    "weight": sd[f"{pre}.attention.{norm}.weight"],
                    "bias": sd[f"{pre}.attention.{norm}.bias"],
                }
        if f"{pre}.feed_forward_time.gate.weight" in sd:  # Both variant
            p["ffn_norm_time"] = {"weight": sd[f"{pre}.ffn_norm_time.weight"]}
            p["ffn_norm_space"] = {"weight": sd[f"{pre}.ffn_norm_space.weight"]}
            p["feed_forward_time"] = _import_moe_ffn(sd, f"{pre}.feed_forward_time")
            p["feed_forward_space"] = _import_moe_ffn(sd, f"{pre}.feed_forward_space")
        else:
            p["ffn_norm"] = {"weight": sd[f"{pre}.ffn_norm.weight"]}
            if f"{pre}.feed_forward.gate.weight" in sd:
                p["feed_forward"] = _import_moe_ffn(sd, f"{pre}.feed_forward")
            else:
                p["feed_forward"] = {
                    name: _torch_linear(sd, f"{pre}.feed_forward.{name}", has_bias=False)
                    for name in ("w1", "w2", "w3")
                }
        return p

    per_layer = [layer_params(i) for i in range(n_layers)]
    if scan_layers:
        params["layers"] = jax.tree.map(lambda *xs: np.stack(xs), *per_layer)
    else:
        for i, p in enumerate(per_layer):
            params[f"layers_{i}"] = p
    return params


def import_flag_dit_1d_weights(state_dict: Dict[str, np.ndarray], depth: int,
                               scan_layers: bool = True) -> Dict[str, Any]:
    """Map a reference music/audio FlagDiT state_dict
    (`lumina_music/models/diffusion/flag_large_dit.py:485-659`) onto our
    `models/flag_dit_1d.py` tree (blocks share FlagDiTBlock's layout; the
    head is channel-wise: proj_in + LayerNorm/shift-scale/Linear)."""
    sd = state_dict
    params: Dict[str, Any] = {
        "proj_in": _torch_linear(sd, "proj_in"),
        "t_embedder": {
            "mlp_0": _torch_linear(sd, "t_embedder.mlp.0"),
            "mlp_2": _torch_linear(sd, "t_embedder.mlp.2"),
        },
        "cap_embedder_norm": {"weight": sd["cap_embedder.0.weight"],
                              "bias": sd["cap_embedder.0.bias"]},
        "cap_embedder_proj": _torch_linear(sd, "cap_embedder.1"),
        "final_adaLN_modulation": _torch_linear(sd, "final_layer.adaLN_modulation.1"),
        "final_linear": _torch_linear(sd, "final_layer.linear"),
    }

    def block_params(i):
        pre = f"blocks.{i}"
        p = {
            "adaLN_modulation": _torch_linear(sd, f"{pre}.adaLN_modulation.1"),
            "attention_norm": {"weight": sd[f"{pre}.attention_norm.weight"]},
            "ffn_norm": {"weight": sd[f"{pre}.ffn_norm.weight"]},
            "attention_y_norm": {"weight": sd[f"{pre}.attention_y_norm.weight"]},
            "attention": {
                name: _torch_linear(sd, f"{pre}.attention.{name}", has_bias=False)
                for name in ("wq", "wk", "wv", "wo", "wk_y", "wv_y")
            },
            "feed_forward": {
                name: _torch_linear(sd, f"{pre}.feed_forward.{name}", has_bias=False)
                for name in ("w1", "w2", "w3")
            },
        }
        p["attention"]["gate"] = sd[f"{pre}.attention.gate"]
        for norm in ("q_norm", "k_norm", "ky_norm"):
            if f"{pre}.attention.{norm}.weight" in sd:
                p["attention"][norm] = {
                    "weight": sd[f"{pre}.attention.{norm}.weight"],
                    "bias": sd[f"{pre}.attention.{norm}.bias"],
                }
        return p

    per_layer = [block_params(i) for i in range(depth)]
    if scan_layers:
        params["blocks"] = jax.tree.map(lambda *xs: np.stack(xs), *per_layer)
    else:
        for i, p in enumerate(per_layer):
            params[f"blocks_{i}"] = p
    return params


def export_next_dit_weights(params: Dict[str, Any], scan_layers: Optional[bool] = None) -> Dict[str, np.ndarray]:
    """Inverse of import_next_dit_weights: our tree -> reference-style
    state_dict (for the `lumina convert` parity, `entry_point.py:115-156`).
    scan_layers=None auto-detects whether the tree carries a stacked
    ``layers/`` subtree (scan-compiled) or per-layer ``blocks_<i>/``."""
    flat = traverse_util.flatten_dict(jax.tree.map(np.asarray, params), sep="/")
    out = {}
    if scan_layers is None:
        scan_layers = any(k.startswith("layers/") for k in flat)
        if not scan_layers and not any(k.startswith("blocks_") for k in flat):
            raise ValueError("no transformer layers found: expected a stacked "
                             "'layers/' subtree or per-layer 'blocks_<i>/' keys")

    def put_linear(torch_name, base):
        out[f"{torch_name}.weight"] = np.asarray(flat[f"{base}/kernel"]).T
        if f"{base}/bias" in flat:
            out[f"{torch_name}.bias"] = np.asarray(flat[f"{base}/bias"])

    put_linear("x_embedder", "x_embedder")
    out["pad_token"] = flat["pad_token"]
    put_linear("t_embedder.mlp.0", "t_embedder/mlp_0")
    put_linear("t_embedder.mlp.2", "t_embedder/mlp_2")
    out["cap_embedder.0.weight"] = flat["cap_embedder/norm/weight"]
    out["cap_embedder.0.bias"] = flat["cap_embedder/norm/bias"]
    put_linear("cap_embedder.1", "cap_embedder/proj")
    put_linear("final_layer.linear", "final_layer/linear")
    put_linear("final_layer.adaLN_modulation.1", "final_layer/adaLN_modulation")

    if scan_layers:
        layer_keys = [k for k in flat if k.startswith("layers/")]
        n_layers = flat["layers/adaLN_modulation/kernel"].shape[0]

        def layer_items(i):
            return {k[len("layers/"):]: flat[k][i] for k in layer_keys}
    else:
        # unscanned tree: per-layer blocks_<i>/ subtrees
        idxs = sorted({int(k.split("/", 1)[0][len("blocks_"):])
                       for k in flat if k.startswith("blocks_")})
        n_layers = len(idxs)

        def layer_items(i):
            pre = f"blocks_{i}/"
            return {k[len(pre):]: flat[k] for k in flat if k.startswith(pre)}

    for i in range(n_layers):
        for sub, arr in layer_items(i).items():
            if sub.endswith("kernel"):
                name = "layers.%d.%s" % (i, sub[: -len("/kernel")].replace("/", "."))
                # reference names adaLN linear as .1 inside Sequential
                if name.endswith("adaLN_modulation"):
                    name += ".1"
                out[f"{name}.weight"] = arr.T
            elif sub.endswith("bias"):
                name = "layers.%d.%s" % (i, sub[: -len("/bias")].replace("/", "."))
                if name.endswith("adaLN_modulation"):
                    name += ".1"
                out[f"{name}.bias"] = arr
            else:
                name = "layers.%d.%s" % (i, sub.replace("/", "."))
                out[name] = arr
    return out


def save_safetensors(state_dict: Dict[str, np.ndarray], path: str):
    from safetensors.numpy import save_file

    save_file({k: np.ascontiguousarray(v) for k, v in state_dict.items()}, path)
