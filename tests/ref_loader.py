"""Load the reference's own torch model code read-only from /root/reference
with its CUDA-only dependencies stubbed — the cross-parity recipe
(NOTES.md): identical weights into the reference module and our flax module,
outputs must match.

Each reference subrepo ships a `models` package with colliding names, so
every subrepo is imported under a unique alias package whose __path__ points
at its models/ dir (the package __init__ is intentionally NOT executed — it
may pull in unrelated heavy modules).

Stubs provided (never touched by the fp32 CPU fallback paths we drive):
- flash_attn / flash_attn.bert_padding (fp32 inputs route to SDPA),
- apex (never imported on the fallback path, present defensively),
- fairscale model-parallel layers as their world-size-1 equivalents
  (plain nn.Linear / nn.Embedding — fairscale's own semantics at mp=1),
- torch.Tensor.cuda as identity (reference hardcodes .cuda() in RoPE
  precompute).
"""

from __future__ import annotations

import importlib
import importlib.machinery
import os
import sys
import types

REFERENCE_ROOT = "/root/reference"

_stubbed = False


def _install_stubs():
    global _stubbed
    if _stubbed:
        return
    import torch
    import torch.nn as nn

    def _stub_module(name):
        mod = types.ModuleType(name)
        # a real ModuleSpec: later importlib.util.find_spec(name) calls (e.g.
        # transformers probing for apex) raise ValueError on __spec__=None
        mod.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
        return mod

    for name in ("flash_attn", "flash_attn.bert_padding", "apex", "apex.normalization"):
        sys.modules.setdefault(name, _stub_module(name))
    fa = sys.modules["flash_attn"]
    fa.flash_attn_varlen_func = None
    fa.flash_attn_func = None
    bp = sys.modules["flash_attn.bert_padding"]
    bp.index_first_axis = bp.pad_input = bp.unpad_input = None

    if "fairscale.nn.model_parallel.initialize" not in sys.modules:
        class _ColumnParallelLinear(nn.Linear):
            def __init__(self, in_features, out_features, bias=True, gather_output=True,
                         init_method=None, **kw):
                super().__init__(in_features, out_features, bias=bias)
                if init_method is not None:
                    init_method(self.weight)

        class _RowParallelLinear(nn.Linear):
            def __init__(self, in_features, out_features, bias=True, input_is_parallel=False,
                         init_method=None, **kw):
                super().__init__(in_features, out_features, bias=bias)
                if init_method is not None:
                    init_method(self.weight)

        class _ParallelEmbedding(nn.Embedding):
            def __init__(self, num_embeddings, embedding_dim, init_method=None, **kw):
                super().__init__(num_embeddings, embedding_dim)
                if init_method is not None:
                    init_method(self.weight)

        mods = {name: _stub_module(name) for name in (
            "fairscale", "fairscale.nn", "fairscale.nn.model_parallel",
            "fairscale.nn.model_parallel.initialize",
            "fairscale.nn.model_parallel.layers",
        )}
        init = mods["fairscale.nn.model_parallel.initialize"]
        init.get_model_parallel_world_size = lambda: 1
        init.get_model_parallel_rank = lambda: 0
        init.get_model_parallel_src_rank = lambda: 0
        init.get_model_parallel_group = lambda: None
        init.model_parallel_is_initialized = lambda: True
        layers = mods["fairscale.nn.model_parallel.layers"]
        layers.ColumnParallelLinear = _ColumnParallelLinear
        layers.RowParallelLinear = _RowParallelLinear
        layers.ParallelEmbedding = _ParallelEmbedding
        sys.modules.update(mods)

    if "omegaconf" not in sys.modules:
        oc = _stub_module("omegaconf")

        class _OmegaConf:  # only .load is referenced at import time
            @staticmethod
            def load(path):
                raise RuntimeError("omegaconf stub: no config loading in tests")

        oc.OmegaConf = _OmegaConf
        sys.modules["omegaconf"] = oc

    if "pytorch_lightning" not in sys.modules:
        pl = _stub_module("pytorch_lightning")
        pl.LightningModule = nn.Module
        pl.__version__ = "1.4.2"
        sys.modules["pytorch_lightning"] = pl

    torch.Tensor.cuda = lambda self, *a, **k: self
    _stubbed = True


def load_ref_module(subrepo: str, module: str = "model", pkg_subdir: str = "models"):
    """Import `/root/reference/<subrepo>/<pkg_subdir>/<module>.py` under the
    alias package `ref_<subrepo>` (dots in `module` walk subpackages, whose
    __init__ files are also skipped)."""
    import pytest

    pkg_dir = os.path.join(REFERENCE_ROOT, subrepo, pkg_subdir)
    if not os.path.isdir(pkg_dir):
        pytest.skip(f"reference mount not available: {pkg_dir}")
    _install_stubs()

    alias = "ref_" + subrepo.replace("-", "_").replace("/", "_")
    path = pkg_dir
    if alias not in sys.modules:
        pkg = types.ModuleType(alias)
        pkg.__path__ = [path]
        sys.modules[alias] = pkg
    parts = module.split(".")
    prefix = alias
    for sub in parts[:-1]:
        prefix = f"{prefix}.{sub}"
        path = os.path.join(path, sub)
        if prefix not in sys.modules:
            pkg = types.ModuleType(prefix)
            pkg.__path__ = [path]
            sys.modules[prefix] = pkg
    return importlib.import_module(f"{alias}.{module}")


def load_ref_music_module(subrepo: str, module: str):
    """Import `/root/reference/<subrepo>/models/<module>.py` with the alias
    ROOT package's __path__ ALSO pointing at models/ — the audio/music files
    use `from ..util import ...` expecting `util` to be a sibling of the
    `models` package (the subrepos are run with this flattened layout)."""
    import pytest

    pkg_dir = os.path.join(REFERENCE_ROOT, subrepo, "models")
    if not os.path.isdir(pkg_dir):
        pytest.skip(f"reference mount not available: {pkg_dir}")
    _install_stubs()
    alias = "refm_" + subrepo.replace("-", "_")
    for name in (alias, f"{alias}.models"):
        if name not in sys.modules:
            pkg = types.ModuleType(name)
            pkg.__path__ = [pkg_dir]
            sys.modules[name] = pkg
    return importlib.import_module(f"{alias}.models.{module}")


def randomize_zero_params(tmodel, seed: int = 0, std: float = 0.02):
    """Fill the reference's zero-init layers (adaLN, final projections,
    gates) with small noise so parity is meaningful everywhere."""
    import torch

    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for _, p in tmodel.named_parameters():
            if p.abs().sum() == 0:
                p.copy_(torch.randn(p.shape, generator=g) * std)
    return tmodel


def state_dict_numpy(tmodel):
    return {k: v.float().numpy() for k, v in tmodel.state_dict().items()}
