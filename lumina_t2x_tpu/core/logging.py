"""Logging / metrics / profiling.

Covers and exceeds the reference's observability (SURVEY.md §5):
- rank-0 python logging to stdout + `log.txt` (`train.py:128-146`);
- scalar metrics stream: the reference writes TensorBoard scalars
  (`train.py:287-293,577-580`); here scalars go to a `metrics.jsonl` (always)
  and TensorBoard when available;
- throughput logging (secs/step, imgs/sec) with device sync
  (`train.py:589-606`);
- `jax.profiler` trace capture — a capability the reference lacks entirely
  (it only wall-clocks with cuda.synchronize).
"""

from __future__ import annotations

import json
import logging
import os
import time
from typing import Dict, Optional

import jax


def create_logger(logging_dir: Optional[str] = None, is_lead: bool = True) -> logging.Logger:
    """stdout + log.txt logger on the lead process (`train.py:128-146`)."""
    logger = logging.getLogger("lumina")
    logger.handlers.clear()
    if is_lead:
        logger.setLevel(logging.INFO)
        fmt = logging.Formatter("[%(asctime)s] %(message)s", datefmt="%Y-%m-%d %H:%M:%S")
        sh = logging.StreamHandler()
        sh.setFormatter(fmt)
        logger.addHandler(sh)
        if logging_dir:
            os.makedirs(logging_dir, exist_ok=True)
            fh = logging.FileHandler(os.path.join(logging_dir, "log.txt"))
            fh.setFormatter(fmt)
            logger.addHandler(fh)
    else:
        logger.setLevel(logging.ERROR)
    return logger


class MetricsWriter:
    """Scalar stream -> metrics.jsonl (+ TensorBoard if importable)."""

    def __init__(self, logdir: str, is_lead: bool = True):
        self.is_lead = is_lead
        self._jsonl = None
        self._tb = None
        if is_lead:
            os.makedirs(logdir, exist_ok=True)
            self._jsonl = open(os.path.join(logdir, "metrics.jsonl"), "a")
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(logdir)
            except Exception:
                self._tb = None

    def write(self, step: int, scalars: Dict[str, float]):
        if not self.is_lead:
            return
        rec = {"step": int(step), **{k: float(v) for k, v in scalars.items()}}
        self._jsonl.write(json.dumps(rec) + "\n")
        self._jsonl.flush()
        if self._tb is not None:
            for k, v in scalars.items():
                self._tb.add_scalar(k, float(v), int(step))

    def close(self):
        if self._jsonl:
            self._jsonl.close()
        if self._tb:
            self._tb.close()


class Throughput:
    """secs/step + items/sec meter with device sync (`train.py:589-606`)."""

    def __init__(self):
        self._t0 = time.perf_counter()

    def start(self):
        self._t0 = time.perf_counter()

    def step(self, n_items: int, sync_array=None) -> Dict[str, float]:
        if sync_array is not None:
            jax.block_until_ready(sync_array)
        dt = time.perf_counter() - self._t0
        out = {"secs_per_step": dt, "items_per_sec": n_items / dt if dt > 0 else 0.0}
        self._t0 = time.perf_counter()
        return out


class ProfilerSession:
    """Context manager around jax.profiler trace capture."""

    def __init__(self, logdir: str, enabled: bool = False):
        self.logdir = logdir
        self.enabled = enabled

    def __enter__(self):
        if self.enabled:
            jax.profiler.start_trace(self.logdir)
        return self

    def __exit__(self, *exc):
        if self.enabled:
            jax.profiler.stop_trace()
        return False


def default_compile_cache_dir() -> str:
    """Durable location for the persistent XLA compilation cache.

    Order: LUMINA_JAX_CACHE_DIR env override; a `.jax_cache/` directory next
    to the repo checkout (survives host restarts — /tmp does not, which is
    how a warmed cache was lost between bench runs); /tmp fallback when the
    package is installed somewhere read-only.
    """
    env = os.environ.get("LUMINA_JAX_CACHE_DIR")
    if env:
        return env
    # core/logging.py -> core -> lumina_t2x_tpu -> repo root
    repo = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    cand = os.path.join(repo, ".jax_cache")
    try:
        os.makedirs(cand, exist_ok=True)
        probe = os.path.join(cand, ".writable")
        with open(probe, "w"):
            pass
        os.remove(probe)
        return cand
    except OSError:
        return "/tmp/lumina_jax_cache"


def enable_compile_cache(path: str | None = None):
    """Persistent XLA compilation cache — first compile of a large graph
    through a remote-compile path can take minutes; subsequent process
    launches reuse it. Call before the first jit execution."""
    import jax

    path = path or default_compile_cache_dir()
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
