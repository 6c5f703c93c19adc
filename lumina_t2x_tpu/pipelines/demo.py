"""Interactive demo serving.

Counterpart of the reference Gradio demo (`lumina_next_t2i/demo.py:61-561`).
Architecture differences are deliberate TPU idioms:

- the reference spawns one NCCL worker subprocess per GPU with
  request/response mp.Queues and an mp.Barrier (`demo.py:337-351`); on TPU a
  single process drives all chips through GSPMD, so the worker is an
  in-process object with a jitted-sampler cache keyed on the static knobs
  (resolution / steps / solver / t-shift / CFG);
- exceptions surface as a `ModelFailure` sentinel exactly like the
  reference's worker loop (`demo.py:23,246-248`);
- Gradio is optional in this environment — the UI layer is import-gated and
  the worker is fully usable headless (that is also what the tests drive).

UI controls mirror `demo.py:361-552`: caption + negative caption, resolution
dropdown incl. extrapolation modes, sampling steps (<=70, default 30),
solver {euler, midpoint, rk4}, t-shift 1-20 (default 4), CFG scale 1-20
(default 4), seed, RoPE scaling method {Time-aware, None}, scaling
watershed, proportional attention.
"""

from __future__ import annotations

import argparse
import json
import time
import traceback
from dataclasses import dataclass, field
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..utils import stable_text_seed


class ModelFailure:
    """Failure sentinel (`demo.py:23`)."""

    def __init__(self, error: str = ""):
        self.error = error


RESOLUTION_CHOICES = [
    "1024x1024", "512x2048", "2048x512", "(Extrapolation) 1664x1664",
    "(Extrapolation) 1024x2048", "(Extrapolation) 2048x1024",
]


@dataclass
class InferenceRequest:
    cap: str
    neg_cap: str = ""
    resolution: str = "1024x1024"
    num_sampling_steps: int = 30
    cfg_scale: float = 4.0
    solver: str = "midpoint"
    t_shift: float = 4.0
    seed: int = 0
    scaling_method: str = "Time-aware"
    scaling_watershed: float = 0.3
    proportional_attn: bool = True


class InferenceWorker:
    """Loads the model once; compiles one sampler per static-knob bucket.

    `infer` serializes on an internal lock: one generation owns the chip at
    a time, and the sampler-cache fill + static-max calibration (a
    process-global env-var handshake read at trace time) must not interleave
    across concurrent front-end requests (gradio threads or the HTTP
    server's pool). The compiled-sampler cache is a small LRU: its keys
    include CONTINUOUS knobs (cfg/t-shift/watershed are baked into the
    traced program), so an unbounded dict would grow one multi-minute XLA
    compile per distinct value a client ever sent.
    """

    MAX_CACHED_SAMPLERS = 8

    def __init__(self, model, variables, *, text_encode_fn=None, vae_decode_fn=None,
                 train_res: int = 1024, cap_feat_dim: int = 2048,
                 device=None, compile_lock=None):
        import threading

        self.model = model
        self.device = device
        if device is not None:
            # commit params to this worker's chip: jit then executes there
            # (uncommitted request inputs follow the committed operands)
            variables = jax.device_put(
                variables, jax.sharding.SingleDeviceSharding(device))
        self.variables = variables
        self.text_encode_fn = text_encode_fn
        self.vae_decode_fn = vae_decode_fn
        self.train_res = train_res
        self.cap_feat_dim = cap_feat_dim
        self._sampler_cache: Dict[Tuple, callable] = {}
        self._lock = threading.Lock()
        # sampler-cache fill + static-max calibration must be exclusive
        # PROCESS-wide (the calibration handshake is read at trace time);
        # WorkerPool injects one shared lock across its workers
        self._compile_lock = compile_lock or threading.Lock()

    def _resolution(self, s: str) -> Tuple[int, int]:
        s = s.split(")")[-1].strip()
        w, h = s.lower().split("x")
        return int(w), int(h)

    def _get_sampler(self, req: InferenceRequest, cap_feats=None, cap_mask=None):
        w, h = self._resolution(req.resolution)
        key = (w, h, req.num_sampling_steps, req.solver, req.cfg_scale, req.t_shift,
               req.scaling_method, req.scaling_watershed, req.proportional_attn)
        if key not in self._sampler_cache:
            # pool-wide exclusive: calibration is a process-global handshake
            # read at trace time
            with self._compile_lock:
                self._build_sampler(key, req, w, h, cap_feats, cap_mask)
        else:
            # LRU refresh
            self._sampler_cache[key] = self._sampler_cache.pop(key)
        return self._sampler_cache[key]

    def _build_sampler(self, key, req: InferenceRequest, w, h, cap_feats, cap_mask):
        from .sample_lib import (autocalibrate_flash_static_max,
                                 build_t2i_sample_fn)

        do_timeaware = req.scaling_method == "Time-aware"
        if cap_feats is not None:
            # derive the static-max flash bound before the first trace of
            # this sampler (the env is read at trace time)
            autocalibrate_flash_static_max(
                self.model, self.variables, cap_feats, cap_mask,
                width=w, height=h, cfg_scale=req.cfg_scale,
                time_shifting_factor=req.t_shift, train_res=self.train_res,
                scale_watershed=req.scaling_watershed if do_timeaware else 1.0,
                proportional_attn=req.proportional_attn,
            )
        fn = build_t2i_sample_fn(
            self.model, width=w, height=h, num_steps=req.num_sampling_steps,
            solver=req.solver, cfg_scale=req.cfg_scale,
            time_shifting_factor=req.t_shift, train_res=self.train_res,
            scale_watershed=req.scaling_watershed if do_timeaware else 1.0,
            proportional_attn=req.proportional_attn,
            # 'None' means NO RoPE scaling (reference sample.py:227-232
            # sets scale_factor=1 AND watershed=1), not all-linear
            time_aware_scaling=do_timeaware,
        )
        if len(self._sampler_cache) >= self.MAX_CACHED_SAMPLERS:
            evicted = next(iter(self._sampler_cache))
            del self._sampler_cache[evicted]
        self._sampler_cache[key] = jax.jit(fn)

    def _encode_captions(self, cap: str, neg_cap: str):
        if self.text_encode_fn is not None:
            return self.text_encode_fn([cap, neg_cap or ""])
        # headless fallback: deterministic hashed pseudo-features
        ly = 32
        feats = np.stack([
            np.random.default_rng(stable_text_seed(c)).standard_normal(
                (ly, self.cap_feat_dim)).astype(np.float32)
            for c in (cap, neg_cap or "")
        ])
        return jnp.asarray(feats), jnp.ones((2, ly), jnp.int32)

    def infer(self, req: InferenceRequest):
        """Returns dict(latents=..., image=..., metadata=...) or ModelFailure.
        Thread-safe: serialized on the worker lock (see class docstring)."""
        with self._lock:
            return self._infer_locked(req)

    def _infer_locked(self, req: InferenceRequest):
        try:
            t0 = time.time()
            cap_feats, cap_mask = self._encode_captions(req.cap, req.neg_cap)
            sampler = self._get_sampler(req, cap_feats, cap_mask)
            rng = jax.random.PRNGKey(req.seed)
            latents = sampler(self.variables, rng, cap_feats, cap_mask)
            jax.block_until_ready(latents)
            out = {"latents": np.asarray(latents), "metadata": {
                **req.__dict__, "elapsed_s": round(time.time() - t0, 3),
                **({"device": str(self.device)} if self.device is not None else {}),
            }}
            # request metadata log (`demo.py:153-166`)
            print(json.dumps(out["metadata"]))
            if self.vae_decode_fn is not None:
                img = np.asarray(self.vae_decode_fn(latents))
                out["image"] = np.clip((img + 1) / 2 * 255, 0, 255).astype(np.uint8)
            return out
        except Exception:
            return ModelFailure(traceback.format_exc())


class WorkerPool:
    """Per-device worker fan-out — the TPU-native analogue of the
    reference's one-subprocess-per-GPU pool (`demo.py:330-351`).

    The reference isolates GPUs with mp.Process + NCCL + request/response
    queues; on TPU every addressable chip lives in ONE process, so the pool
    is N `InferenceWorker`s whose params are committed to distinct devices
    (`jax.device_put` + SingleDeviceSharding). jax dispatch is async and
    thread-safe, so N front-end threads genuinely run N generations
    concurrently, one per chip. Compilation stays pool-exclusive via a
    shared compile lock (the flash static-max calibration is process-global
    state read at trace time); the persistent compile cache makes workers
    2..N's compiles disk hits.

    Dispatch is pick-first-free, falling back to round-robin blocking when
    every chip is busy.
    """

    def __init__(self, model, variables, *, devices=None, **worker_kwargs):
        import threading

        devices = list(devices if devices is not None else jax.local_devices())
        if not devices:
            raise ValueError("WorkerPool needs at least one device")
        compile_lock = threading.Lock()
        self.workers = [
            InferenceWorker(model, variables, device=d,
                            compile_lock=compile_lock, **worker_kwargs)
            for d in devices
        ]
        self._rr = 0
        self._rr_lock = threading.Lock()

    def __len__(self):
        return len(self.workers)

    @property
    def _sampler_cache(self):
        """Aggregate view for health reporting (`serve.py` /api/health)."""
        merged = {}
        for i, w in enumerate(self.workers):
            merged.update({(i, k): v for k, v in w._sampler_cache.items()})
        return merged

    def infer(self, req: InferenceRequest):
        """Route to a free worker; block round-robin when all chips busy."""
        with self._rr_lock:
            start = self._rr
            self._rr = (self._rr + 1) % len(self.workers)
        # one non-blocking sweep for an idle chip
        for off in range(len(self.workers)):
            w = self.workers[(start + off) % len(self.workers)]
            if w._lock.acquire(blocking=False):
                try:
                    return w._infer_locked(req)
                finally:
                    w._lock.release()
        # all busy: queue on the round-robin choice
        return self.workers[start].infer(req)


def result_to_image(result: dict) -> np.ndarray:
    """Worker result -> HWC uint8: decoded RGB when a VAE is attached, else
    a min-max-scaled 3-channel latent preview. Shared by the gradio submit
    handler and the HTTP server (`pipelines/serve.py`)."""
    if "image" in result:
        return result["image"][0].transpose(1, 2, 0)
    lat = result["latents"][0, :3]
    lat = (lat - lat.min()) / (np.ptp(lat) + 1e-6)
    return (lat.transpose(1, 2, 0) * 255).astype(np.uint8)


def make_submit_handler(worker: InferenceWorker, error_cls=RuntimeError):
    """The UI submit round-trip (widget values -> InferenceRequest ->
    worker.infer -> HWC uint8/float image), factored out of the Blocks
    wiring so it is drivable without gradio installed (tests exercise this
    directly; gradio only adds the widget layer on top)."""

    def on_submit(cap, neg_cap, resolution, steps, cfg, solver, t_shift, seed,
                  scaling_method, watershed, prop_attn):
        req = InferenceRequest(
            cap=cap, neg_cap=neg_cap, resolution=resolution,
            num_sampling_steps=int(steps), cfg_scale=float(cfg), solver=solver,
            t_shift=float(t_shift), seed=int(seed), scaling_method=scaling_method,
            scaling_watershed=float(watershed), proportional_attn=bool(prop_attn),
        )
        result = worker.infer(req)
        if isinstance(result, ModelFailure):
            raise error_cls(f"generation failed:\n{result.error}")
        return result_to_image(result)

    return on_submit


def build_worker(model_name: str = "NextDiT_2B_patch2", precision: str = "bf16",
                 ckpt: Optional[str] = None, debug: bool = False,
                 num_workers: int = 1):
    """Build the demo model + InferenceWorker from CLI-level options (shared
    startup of the gradio and HTTP front-ends). A checkpoint's recorded
    model_args (model name, qk_norm, cap_feat_dim) override the CLI default
    — the same model-reconstruction contract as sample.py / the reference's
    `model_args.pth` (`sample.py:99,125-128`); hardcoding would crash the
    restore on any checkpoint trained with different settings."""
    from ..core import enable_compile_cache
    from ..core.checkpoint import load_model_args
    from ..models import get_model

    enable_compile_cache()
    dtype = jnp.bfloat16 if precision == "bf16" else jnp.float32
    qk_norm, cap_feat_dim = True, 2048
    if ckpt and not debug:
        train_args = load_model_args(ckpt)
        model_name = train_args.get("model", model_name)
        qk_norm = bool(train_args.get("qk_norm", qk_norm))
        cap_feat_dim = int(train_args.get("cap_feat_dim", cap_feat_dim))
    model = get_model(model_name, cap_feat_dim=cap_feat_dim, dtype=dtype,
                      qk_norm=qk_norm)
    rng = jax.random.PRNGKey(0)
    x0 = jnp.zeros((2, 4, 32, 32))
    cap = jnp.zeros((2, 8, cap_feat_dim))
    variables = jax.jit(model.init)(
        rng, x0, jnp.zeros((2,)), cap, jnp.ones((2, 8), jnp.int32))
    if ckpt and not debug:
        import os

        import orbax.checkpoint as ocp

        variables = {"params": ocp.StandardCheckpointer().restore(
            os.path.join(os.path.abspath(ckpt), "ema"), variables["params"])}
    if num_workers != 1:
        devices = jax.local_devices()
        if num_workers > 0:  # 0 / negative = all local devices
            devices = devices[:num_workers]
        return WorkerPool(model, variables, devices=devices,
                          cap_feat_dim=cap_feat_dim)
    return InferenceWorker(model, variables, cap_feat_dim=cap_feat_dim)


def build_gradio_ui(worker: InferenceWorker):
    """Gradio Blocks UI (`demo.py:361-552`); raises ImportError without
    gradio."""
    import gradio as gr

    on_submit = make_submit_handler(worker, error_cls=gr.Error)

    with gr.Blocks() as demo:
        gr.Markdown("# Lumina-Next T2I (TPU)")
        with gr.Row():
            with gr.Column():
                cap = gr.Textbox(label="Caption")
                neg_cap = gr.Textbox(label="Negative Caption", value="")
                resolution = gr.Dropdown(RESOLUTION_CHOICES, value="1024x1024",
                                         label="Resolution")
                steps = gr.Slider(1, 70, value=30, step=1, label="Sampling steps")
                solver = gr.Dropdown(["euler", "midpoint", "rk4"], value="midpoint",
                                     label="Solver")
                t_shift = gr.Slider(1, 20, value=4, step=1, label="Time shifting factor")
                cfg = gr.Slider(1.0, 20.0, value=4.0, label="CFG scale")
                seed = gr.Number(value=0, label="Seed", precision=0)
                scaling_method = gr.Dropdown(["Time-aware", "None"], value="Time-aware",
                                             label="RoPE scaling method")
                watershed = gr.Number(value=0.3, label="Scaling watershed")
                prop_attn = gr.Checkbox(value=True, label="Proportional attention")
                submit = gr.Button("Generate")
            with gr.Column():
                output = gr.Image(label="Result")
        submit.click(on_submit,
                     [cap, neg_cap, resolution, steps, cfg, solver, t_shift, seed,
                      scaling_method, watershed, prop_attn],
                     [output])
    return demo


def main(argv=None):
    p = argparse.ArgumentParser(description="lumina-t2x-tpu demo server")
    p.add_argument("--ckpt", type=str, default=None)
    p.add_argument("--model", type=str, default="NextDiT_2B_patch2")
    p.add_argument("--precision", choices=["fp32", "bf16"], default="bf16")
    p.add_argument("--port", type=int, default=7860)
    p.add_argument("--debug", action="store_true")
    args = p.parse_args(argv)

    worker = build_worker(args.model, args.precision, args.ckpt, args.debug)
    try:
        ui = build_gradio_ui(worker)
    except ImportError:
        # no gradio in the image: fall back to the dependency-free HTTP
        # front-end (pipelines/serve.py) on the same port + worker
        from .serve import DemoApp, make_server

        print("gradio is not installed; serving the stdlib HTTP demo instead "
              f"at http://127.0.0.1:{args.port}/")
        server = make_server(DemoApp(worker, model_name=args.model), port=args.port)
        try:
            server.serve_forever()
        except KeyboardInterrupt:
            server.shutdown()
        return worker
    ui.launch(server_port=args.port)


if __name__ == "__main__":
    main()
