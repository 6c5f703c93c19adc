"""Training application.

Flag-for-flag counterpart of the reference trainers
(`lumina_next_t2i/train.py:683-756`, `Next-DiT-ImageNet/train.py`): model
registry lookup, mesh/parallel config, precision, qk-norm, checkpointing,
snr-type, auto-resume / resume / init_from, VAE selection, caption dropout.

TPU-native execution model (vs the reference's FSDP loop, `train.py:256-680`):
- one process per host, GSPMD mesh over all chips; TP via `model` axis,
  FSDP/DP via `data` axis (`--data_parallel fsdp|sdp` maps to parameter
  sharding on/off over `data`);
- the entire step (VAE-encode option, loss, backward, clip, AdamW, EMA) is a
  single jit program; micro-batch accumulation is an in-graph scan;
- `--checkpointing` maps to nn.remat on the transformer blocks.

Data sources:
  --data_path synthetic://HxW          random latents (smoke / perf runs)
  --data_path /path/to/imagenet        ImageFolder of images (class-cond)
  --data_path config.yaml              meta dataset of (image, caption) items
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import random
import socket
from typing import Dict, Iterator

import jax
import jax.numpy as jnp
import numpy as np

from ..core.checkpoint import (
    AsyncCheckpointSaver,
    find_auto_resume,
    init_from as init_from_ckpt,
    load_checkpoint,
    save_checkpoint,
)
from ..core.logging import MetricsWriter, Throughput, create_logger
from ..models import get_model
from ..parallel import create_mesh, distributed_init
from ..parallel.mesh import AXIS_DATA
from ..transport import create_transport
from .train_lib import (
    create_optimizer,
    create_train_state,
    make_sharded_train_step,
    make_train_step,
    place_state,
)


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="lumina-t2x-tpu trainer")
    p.add_argument("--model", type=str, default="NextDiT_ImageNet_600M_patch2")
    p.add_argument("--data_path", type=str, default="synthetic://32x32")
    p.add_argument("--results_dir", type=str, default="results")
    p.add_argument("--image_size", type=int, default=256,
                   help="256/512/1024 (the reference's latent-space recipes); "
                        "any patch-divisible size with --pixel_space")
    p.add_argument("--max_steps", type=int, default=100_000)
    p.add_argument("--global_batch_size", type=int, default=256)
    p.add_argument("--micro_batch_size", type=int, default=0,
                   help="0 = no accumulation; else global/micro in-graph scan")
    p.add_argument("--model_parallel_size", type=int, default=1)
    p.add_argument("--data_parallel", type=str, choices=["sdp", "fsdp"], default="fsdp")
    p.add_argument("--precision", choices=["fp32", "tf32", "fp16", "bf16"], default="bf16")
    p.add_argument("--grad_precision", choices=["fp32", "fp16", "bf16"], default="fp32")
    p.add_argument("--qk_norm", action="store_true")
    p.add_argument("--checkpointing", action="store_true", help="activation rematerialization")
    p.add_argument("--remat_policy", choices=["dots", "dots_slim", "full"], default="dots",
                   help="with --checkpointing: 'dots' keeps weight-matmul outputs "
                        "and recomputes only elementwise/attention (higher MFU); "
                        "'dots_slim' also recomputes the expanding FFN "
                        "up-projections (fits per-chip batch >= 2 at 4k tokens); "
                        "'full' recomputes the whole block (max memory savings)")
    p.add_argument("--fused_optimizer", action="store_true",
                   help="single-pass AdamW+EMA update (same math, ~half the "
                        "optimizer-phase HBM traffic); opt state keeps the "
                        "ScaleByAdamState layout")
    p.add_argument("--optimizer", choices=["adamw", "fused_adamw", "adafactor"],
                   default=None,
                   help="adamw = optax chain; fused_adamw = FusedAdamWEMA "
                        "(same as --fused_optimizer); adafactor = "
                        "FusedAdafactorEMA: factored second moments "
                        "(sublinear optimizer memory) + stochastic-rounded "
                        "bf16 stores — fits the 2B full train state on one "
                        "16 GB chip (use with --param_dtype bf16)")
    p.add_argument("--param_dtype", choices=["fp32", "bf16"], default="fp32",
                   help="parameter/EMA storage dtype. bf16 halves state "
                        "memory; pair with --optimizer adafactor, whose "
                        "stochastic rounding keeps bf16 accumulation "
                        "unbiased (plain AdamW in bf16 silently drops "
                        "sub-ulp updates)")
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--wd", type=float, default=0.0)
    p.add_argument("--grad_clip", type=float, default=2.0)
    p.add_argument("--caption_dropout_prob", type=float, default=0.1)
    p.add_argument("--class_dropout_prob", type=float, default=0.1)
    p.add_argument("--snr_type", type=str, default="uniform")
    p.add_argument("--path_type", type=str, default="Linear")
    p.add_argument("--prediction", type=str, default="velocity")
    p.add_argument("--auto_resume", action="store_true")
    p.add_argument("--resume", type=str, default=None)
    p.add_argument("--init_from", type=str, default=None)
    p.add_argument("--vae", type=str, choices=["ema", "mse", "sdxl", "sd3"], default="ema")
    p.add_argument("--vae_ckpt", type=str, default=None, help="diffusers-format VAE weights")
    p.add_argument("--pixel_space", action="store_true",
                   help="train the denoiser directly on RGB pixels (in_channels=3, "
                        "no VAE) — small-resolution class-cond datasets and "
                        "in-environment quality demos where no trained VAE exists")
    p.add_argument("--num_classes", type=int, default=None,
                   help="class-cond label-embedding size (default: the model "
                        "config's, 1000)")
    p.add_argument("--text_encoder", type=str, default=None,
                   help="HF path of the caption LM (Gemma-2B); omit for synthetic features")
    p.add_argument("--cap_feat_dim", type=int, default=2048)
    p.add_argument("--max_caption_len", type=int, default=256)
    p.add_argument("--cache_data_on_disk", action="store_true")
    p.add_argument("--pin_bucket", type=str, default=None, metavar="WxH",
                   help="force every t2i batch into one (W, H) crop bucket: "
                        "ONE compiled train program instead of one per "
                        "bucket. For perf/soak runs where remote-compile "
                        "latency (or its cache) dominates; decode/crop work "
                        "is unchanged")
    p.add_argument("--global_seed", type=int, default=0)
    p.add_argument("--num_workers", type=int, default=8)
    p.add_argument("--log_every", type=int, default=100)
    p.add_argument("--profile_steps", type=int, default=0,
                   help="capture a jax.profiler trace of N steps (starting "
                        "after the compile step) to <exp_dir>/trace")
    p.add_argument("--ckpt_every", type=int, default=50_000)
    p.add_argument("--keep_last", type=int, default=0,
                   help="prune all but the newest N complete checkpoints "
                        "(0 = keep all, the reference behavior)")
    p.add_argument("--flash_static_max", type=str, default="off",
                   help="'off' (online-max kernels), 'auto' (calibrate a "
                        "fixed softmax bound from the first batch at current "
                        "weights; re-calibrates on every resume), or a float "
                        "to pin the bound. Only acts on qk-norm models with "
                        "streaming self-attention (>1024 tokens, i.e. "
                        ">=512px training)")
    p.add_argument("--async_save", action="store_true",
                   help="overlap checkpoint serialization with training "
                        "(Orbax async save; the resume marker is written only "
                        "once the bytes are durable)")
    p.add_argument("--h2d_diet", action="store_true",
                   help="ship uint8 images + bf16 caption features host->"
                        "device and normalize/cast in-graph: ~4x smaller "
                        "per-step h2d payload. Lossless for the images (the "
                        "decode output was uint8; the affine round-trips "
                        "exactly); captions lose only sub-bf16 precision the "
                        "bf16 model never saw. Matters through transfer-"
                        "bandwidth-limited links (and bounds the axon "
                        "relay's per-transfer native leak, NOTES round-4)")
    return p.parse_args(argv)


def apply_h2d_diet(batch: Dict) -> Dict:
    """Quantize a host batch for transfer (see --h2d_diet): fp32 [-1,1]
    images -> uint8 (exact inverse of the decoder's u/127.5-1 normalize),
    fp32 caption features -> bf16. De-quantization happens in-graph
    (`encode_batch` / the model's own bf16 cast)."""
    import ml_dtypes

    out = dict(batch)
    x = batch["x"]
    if x.dtype == np.float32:
        out["x"] = np.rint((x + 1.0) * 127.5).clip(0, 255).astype(np.uint8)
    if "cap_feats" in batch and batch["cap_feats"].dtype == np.float32:
        out["cap_feats"] = batch["cap_feats"].astype(ml_dtypes.bfloat16)
    return out


def synthetic_batches(args, latent_hw: int, class_cond: bool = True,
                      num_classes: int = 1000, channels: int = 4) -> Iterator[Dict]:
    rng = np.random.default_rng(args.global_seed + jax.process_index())
    b = args.global_batch_size // jax.process_count()
    while True:
        batch = {"x": rng.standard_normal((b, channels, latent_hw, latent_hw), np.float32)}
        if class_cond:
            batch["y"] = rng.integers(0, num_classes, (b,)).astype(np.int32)
        else:
            batch["cap_feats"] = rng.standard_normal((b, 32, args.cap_feat_dim), np.float32)
            batch["cap_mask"] = np.ones((b, 32), np.int32)
        yield batch


def imagenet_batches(args, start_step: int = 0) -> Iterator[Dict]:
    from ..data.imgproc import center_crop_arr, to_latent_input
    from ..data.loader import collate_image_label, list_imagenet_folder, threaded_prefetch
    from ..data.dataset import resumable_sampler_indices
    from PIL import Image

    samples, _ = list_imagenet_folder(args.data_path)

    def fetch(idx):
        path, label = samples[idx]
        img = center_crop_arr(Image.open(path).convert("RGB"), args.image_size)
        if np.random.random() < 0.5:
            img = img.transpose(Image.FLIP_LEFT_RIGHT)
        return to_latent_input(img), label

    indices = resumable_sampler_indices(
        len(samples), args.global_batch_size, rank=jax.process_index(),
        world_size=jax.process_count(), seed=args.global_seed,
        start_step=start_step,
    )
    # each process loads its 1/process_count share of the global batch; the
    # shards assemble into a global array via form_global_batch
    per_process = args.global_batch_size // jax.process_count()
    stream = threaded_prefetch(indices, fetch, num_workers=args.num_workers)
    buf = []
    while True:
        for item in stream:
            buf.append(item)
            if len(buf) == per_process:
                yield collate_image_label(buf)
                buf = []


def t2i_batches(args, text_encoder=None, start_step: int = 0):
    """YAML meta-dataset pipeline: bucketed (image, caption) batches
    (`lumina_next_t2i/train.py:478-520`). Every yielded batch shares one
    static (H, W) bucket; caption features come from the frozen LM (or
    deterministic hashed pseudo-features when no encoder is available).

    Bucketing is CROSS-RANK CONSISTENT (`bucket_batched_global`): every rank
    walks the same global index stream and derives each item's bucket from
    metadata (annotation size keys or a PIL header read) with a per-index
    seeded top-4 draw — so multi-host ranks agree on every step's (H, W)
    and `form_global_batch` receives matching local shards. The crop
    POSITION stays randomly drawn at decode time (the reference's
    augmentation); only the bucket choice is derandomized per item.
    `start_step` fast-forwards that many emitted batches without decoding
    (resume)."""
    from ..data.dataset import MetaDataset, T2IItemProcessor, resumable_sampler_indices
    from ..data.imgproc import (center_crop, choose_bucket,
                                generate_crop_size_list, to_latent_input)
    from ..data.loader import bucket_batched_global

    num_patches = (args.image_size // 16) ** 2
    crop_size_list = generate_crop_size_list(num_patches, 16)

    dataset = MetaDataset(args.data_path, T2IItemProcessor(None),
                          cache_on_disk=args.cache_data_on_disk, rank=jax.process_index())
    # the FULL global permutation, identical on every rank (per-bucket rank
    # striding happens inside bucket_batched_global)
    indices = resumable_sampler_indices(
        len(dataset), args.global_batch_size, rank=0, world_size=1,
        seed=args.global_seed,
    )

    pinned = None
    if getattr(args, "pin_bucket", None):
        pw, ph = (int(v) for v in args.pin_bucket.lower().split("x"))
        pinned = (pw, ph)

    def bucket_of(idx):
        if pinned is not None:
            return pinned
        try:
            w, h = dataset.image_size(idx)
        except Exception:
            # unreadable item: every rank sees the same file, so the same
            # fallback bucket — decode-time error retry handles the item
            w = h = args.image_size
        return choose_bucket(w, h, crop_size_list, seed=args.global_seed, index=idx)

    # decode path: native C++ (libjpeg/libpng decode + scale-to-cover +
    # random-crop + normalize in one GIL-free pass — the role the reference
    # fills with torch DataLoader worker processes) when the toolchain is
    # available, else PIL. Both produce the same (3, ch, cw) [-1, 1] tensor.
    from ..data import native_loader as nl

    use_native = nl.native_available()

    def fetch(idx, key):
        if use_native:
            try:
                data, caption = dataset.raw_image_item(idx)
                cw, ch = key
                w, h = nl.probe_size(data)
                # random crop origin over the scaled-to-cover image, matching
                # imgproc.center_crop and the C++ scaling arithmetic
                scale = max(cw / w, ch / h)
                sw = max(int(w * scale + 0.5), cw)
                sh = max(int(h * scale + 0.5), ch)
                crop_xy = (random.randint(0, sw - cw), random.randint(0, sh - ch))
                return nl.decode_to_tensor(data, key, crop_xy), caption
            except Exception:
                pass  # unsupported container/codec: PIL fallback below
        img, caption = dataset[idx]
        return to_latent_input(center_crop(img, key)), caption

    def collate(items):
        xs = np.stack([a for a, _ in items])
        captions = [c for _, c in items]
        if text_encoder is not None:
            cap_feats, cap_mask = text_encoder.encode(
                captions, proportion_empty_prompts=args.caption_dropout_prob
            )
            cap_feats, cap_mask = np.asarray(cap_feats), np.asarray(cap_mask)
        else:
            # deterministic hashed pseudo-features: smoke/perf mode
            ly = 32
            from ..utils import stable_text_seed

            rngs = [np.random.default_rng(stable_text_seed(c)) for c in captions]
            cap_feats = np.stack(
                [r.standard_normal((ly, args.cap_feat_dim)).astype(np.float32) for r in rngs]
            )
            cap_mask = np.ones((len(captions), ly), np.int32)
        return {"x": xs, "cap_feats": cap_feats, "cap_mask": cap_mask}

    gen = bucket_batched_global(
        indices, bucket_of, args.global_batch_size,
        rank=jax.process_index(), world_size=jax.process_count(),
        fetch=fetch, collate=collate, num_workers=args.num_workers,
        skip_batches=start_step,
    )
    for _, batch in gen:
        yield batch


def main(argv=None):
    from ..core import enable_compile_cache

    enable_compile_cache()
    args = parse_args(argv)

    # -- preemption safety ---------------------------------------------------
    # Preemptible/spot TPU VMs get a SIGTERM grace window before reclaim
    # (an aux capability beyond the reference, which only has --auto_resume).
    # Registered before any slow setup so a signal during compile is caught;
    # the handler only sets a flag — the loop checkpoints at the next step
    # boundary and exits cleanly, so `--auto_resume` continues bit-exactly.
    import signal

    preempted = {"flag": False}

    def _on_sigterm(signum, frame):
        preempted["flag"] = True

    try:
        prev_handler = signal.signal(signal.SIGTERM, _on_sigterm)
    except ValueError:  # not the main thread (e.g. driven from a test runner)
        prev_handler = None

    distributed_init()
    mesh = create_mesh(args.model_parallel_size)

    exp_dir = os.path.join(args.results_dir, args.model)
    is_lead = jax.process_index() == 0
    logger = create_logger(exp_dir, is_lead)
    metrics_writer = MetricsWriter(exp_dir, is_lead)
    logger.info(f"devices={jax.device_count()} mesh={dict(mesh.shape)} host={socket.gethostname()}")

    dtype = {"bf16": jnp.bfloat16, "fp16": jnp.float16,
             "fp32": jnp.float32, "tf32": jnp.float32}[args.precision]

    dp_size = mesh.shape["data"]
    assert args.global_batch_size % dp_size == 0, (
        f"--global_batch_size {args.global_batch_size} must be divisible by the "
        f"data-parallel axis size {dp_size}"
    )

    is_class_cond = "ImageNet" in args.model or "MoE" in args.model
    latent_hw = args.image_size if args.pixel_space else args.image_size // 8

    # -- data ----------------------------------------------------------------
    # peek the resume step BEFORE building the data stream so the sampler
    # fast-forwards (`train.py:91-104,533` semantics) — the full state
    # restore below reads the same directory
    resume_dir = args.resume or (find_auto_resume(exp_dir) if args.auto_resume else None)
    resume_step = 0
    if resume_dir:
        rs_path = os.path.join(resume_dir, "resume_step.txt")
        if os.path.exists(rs_path):
            with open(rs_path) as f:
                resume_step = int(f.read().strip())

    if args.data_path.startswith("synthetic://"):
        hw = args.data_path[len("synthetic://"):]
        latent_hw = int(hw.split("x")[0]) if hw else latent_hw
        batches = synthetic_batches(args, latent_hw, class_cond=is_class_cond,
                                    channels=3 if args.pixel_space else 4)
        encode_images = False
    elif os.path.isdir(args.data_path):
        batches = imagenet_batches(args, start_step=resume_step)
        # --pixel_space: the loader's [-1, 1] CHW images feed the denoiser
        # directly; no VAE leg exists in the graph
        encode_images = not args.pixel_space
    else:  # yaml meta-dataset -> t2i training
        if args.pixel_space:
            raise SystemExit("--pixel_space supports class-cond folder or "
                             "synthetic:// data, not the yaml t2i pipeline")
        text_encoder = None
        if args.text_encoder:
            from ..codecs.text_encoders import DecoderTextEncoder

            text_encoder = DecoderTextEncoder.from_pretrained(
                args.text_encoder, dtype=dtype, max_length=args.max_caption_len
            )
            args.cap_feat_dim = text_encoder.hidden_size
        batches = t2i_batches(args, text_encoder, start_step=resume_step)
        encode_images = True
    if args.h2d_diet and (encode_images or
                          (args.pixel_space and os.path.isdir(args.data_path))):
        # quantize AFTER the loader (decode/crop unchanged); latents-only
        # synthetic streams are not image-range and never diet. Pixel-space
        # folder batches diet too: the train step dequantizes in-graph.
        batches = (apply_h2d_diet(b) for b in batches)

    # -- model (after data: the text encoder may set cap_feat_dim) -----------
    model_kwargs = dict(qk_norm=args.qk_norm, dtype=dtype, remat=args.checkpointing,
                        remat_policy=args.remat_policy,
                        param_dtype=jnp.bfloat16 if args.param_dtype == "bf16"
                        else jnp.float32)
    if is_class_cond:
        model_kwargs["class_dropout_prob"] = args.class_dropout_prob
        if args.num_classes is not None:
            model_kwargs["num_classes"] = args.num_classes
    else:
        model_kwargs["cap_feat_dim"] = args.cap_feat_dim
    if args.pixel_space:
        model_kwargs["in_channels"] = 3
    model = get_model(args.model, **model_kwargs)

    vae = vae_variables = None
    if encode_images:
        from ..codecs.vae import AutoencoderKL, load_vae

        vae = AutoencoderKL(dtype=dtype)
        if args.vae_ckpt:
            vae, vae_variables = load_vae(args.vae_ckpt, dtype=dtype)
            logger.info(f"loaded VAE weights from {args.vae_ckpt}")
        else:
            logger.warning("no --vae_ckpt: using randomly-initialized VAE (smoke mode)")
            vae_variables = vae.init(
                jax.random.PRNGKey(0),
                jnp.zeros((1, 3, args.image_size, args.image_size)), jax.random.PRNGKey(1),
            )

    cond_fn = (lambda b: {"y": b["y"]}) if is_class_cond else (
        lambda b: {"cap_feats": b["cap_feats"], "cap_mask": b["cap_mask"]}
    )

    # -- state ---------------------------------------------------------------
    transport = create_transport(args.path_type, args.prediction, snr_type=args.snr_type)
    if args.optimizer and args.fused_optimizer and args.optimizer != "fused_adamw":
        raise SystemExit(
            f"--optimizer {args.optimizer} conflicts with --fused_optimizer "
            "(which means --optimizer fused_adamw); pass one or the other")
    opt_kind = args.optimizer or ("fused_adamw" if args.fused_optimizer else "adamw")
    if opt_kind == "adafactor":
        from .train_lib import FusedAdafactorEMA

        optimizer = FusedAdafactorEMA(args.lr, weight_decay=args.wd)
    elif opt_kind == "fused_adamw":
        from .train_lib import FusedAdamWEMA

        optimizer = FusedAdamWEMA(args.lr, weight_decay=args.wd)
    else:
        optimizer = create_optimizer(args.lr, args.wd)
    first = next(batches)
    example = dict(first)
    if encode_images:
        example["x"] = np.zeros((first["x"].shape[0], 4, latent_hw, latent_hw), np.float32)
    elif example["x"].dtype != np.float32:
        # h2d-diet pixel batches are uint8 on the wire; init from float zeros
        example["x"] = np.zeros(first["x"].shape, np.float32)
    state = create_train_state(
        jax.random.PRNGKey(args.global_seed), model, example, optimizer, cond_fn
    )
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(state.params))
    logger.info(f"model={args.model} params={n_params/1e6:.1f}M")

    if resume_dir:  # computed above, before the data stream
        state = load_checkpoint(resume_dir, state)
        logger.info(f"resumed from {resume_dir} at step {int(state.step)}")
    elif args.init_from:
        loaded = init_from_ckpt(args.init_from, state.params)
        # seed the EMA stream too (the reference deep-copies the loaded
        # model into EMA): a random-init EMA would poison every early
        # checkpoint's 'ema' subtree — the stream samplers restore
        state = state.replace(params=loaded,
                              ema_params=jax.tree.map(jnp.array, loaded))
        logger.info(f"initialized weights (and EMA) from {args.init_from}")

    micro = (args.global_batch_size // args.micro_batch_size) if args.micro_batch_size else 1
    grad_dtype = {"fp32": None, "fp16": jnp.float16, "bf16": jnp.bfloat16}[args.grad_precision]
    # bandwidth-exact reduce (FSDP reduce_dtype semantics): with sdp params
    # the data-axis gradient reduce rides the wire in bf16; under fsdp the
    # params/grads are data-sharded and GSPMD's fused fp32 reduce-scatter
    # stays (see make_grad_reduce_wrapper). bf16 ONLY: an fp16 cross-shard
    # sum overflows past 65504 on early-training grad spikes (no loss
    # scaling here), and the XLA partial-manual miscompile workaround is
    # HLO-pinned for bf16 — fp16 still governs accumulation, reduce is fp32.
    reduce_wrapper = None
    if grad_dtype == jnp.bfloat16 and args.data_parallel == "sdp" \
            and mesh.shape[AXIS_DATA] > 1:
        from .train_lib import make_grad_reduce_wrapper

        reduce_wrapper = make_grad_reduce_wrapper(mesh, reduce_dtype=grad_dtype)
        logger.info(f"gradient reduce wire: {args.grad_precision} (shard_map)")
    step_fn = make_train_step(
        model, transport, optimizer, cond_fn, grad_clip=args.grad_clip,
        micro_batches=micro, grad_dtype=grad_dtype,
        grad_reduce_wrapper=reduce_wrapper,
    )
    jitted, _ = make_sharded_train_step(mesh, step_fn, state,
                                        fsdp=(args.data_parallel == "fsdp"))
    state = place_state(mesh, state, fsdp=(args.data_parallel == "fsdp"))

    if encode_images:
        from ..codecs.vae import encode_to_latent

        @jax.jit
        def encode_batch(vv, x, rng):
            if x.dtype == jnp.uint8:  # --h2d_diet: normalize in-graph
                x = x.astype(jnp.float32) / 127.5 - 1.0
            return encode_to_latent(vae, vv, x, rng, args.vae)

    # -- loop ----------------------------------------------------------------
    # GC tuning for the steady-state loop: everything allocated so far
    # (model/optimizer graphs, jit caches, dataset metadata) is long-lived —
    # freeze it out of collection, and raise gen0 so the per-step host-array
    # churn (batch stack + features, ~10^3 objects/step) doesn't trigger a
    # full scan of jax's object graph every few steps. Measured on a 1-core
    # host feeding the 600M t2i step: 39 ms/step of gc pauses without this
    # (exps/loader_fed_train.py decomposition, round 3).
    import gc

    gc.collect()
    gc.freeze()
    gc.set_threshold(20_000, 50, 50)
    rng = jax.random.PRNGKey(args.global_seed)
    meter = Throughput()
    meter.start()
    saver = AsyncCheckpointSaver(keep_last=args.keep_last) if args.async_save else None

    def _save(step_, state_):
        if saver is not None:
            return saver.save(exp_dir, step_, state_, model_args=vars(args))
        return save_checkpoint(exp_dir, step_, state_, model_args=vars(args),
                               keep_last=args.keep_last)

    # static-max flash bound: 'auto' calibrates from the first (encoded)
    # batch inside the loop below, BEFORE the train step's first call — the
    # bound is read at trace time and participates in the jit cache key
    needs_calibration = args.flash_static_max == "auto"
    if args.flash_static_max not in ("off", "auto"):
        from ..ops.flash_attention import set_flash_static_max_train

        set_flash_static_max_train(float(args.flash_static_max))
        logger.info(f"flash static-max pinned: {args.flash_static_max}")

    start_step = int(state.step)
    batch = first
    running = []
    tracing = False
    for step in range(start_step, args.max_steps):
        if preempted["flag"]:
            path = _save(step, state)
            if saver is not None:
                saver.close()
            logger.warning(f"SIGTERM: checkpointed step {step} to {path}; exiting")
            metrics_writer.close()
            if prev_handler is not None:
                signal.signal(signal.SIGTERM, prev_handler)
            return state
        if encode_images:
            batch = dict(batch)
            batch["x"] = encode_batch(vae_variables, jnp.asarray(batch["x"]),
                                      jax.random.fold_in(rng, step))
        if jax.process_count() > 1:
            from ..parallel.mesh import form_global_batch

            batch = form_global_batch(mesh, batch)
        if needs_calibration:
            needs_calibration = False
            from .train_lib import autocalibrate_flash_static_max_train

            bound = autocalibrate_flash_static_max_train(
                model, state.params, batch, cond_fn,
                rng=jax.random.fold_in(rng, 999983),
                path_sampler=transport.path_sampler)
            logger.info("flash static-max calibrated: "
                        + (f"{bound:.2f}" if bound is not None
                           else "n/a (online-max kernels kept)"))
        # trace capture (SURVEY.md §5: a capability the reference lacks):
        # skip the compile step, then profile N steps. Never trace the
        # compile step itself: with only one step total the trace would
        # measure compilation, so warn and skip instead.
        if args.profile_steps and step == start_step:
            if args.max_steps - start_step < 2:
                logger.warning("profiler: <2 steps remain after compile; skipping trace")
        elif args.profile_steps and step == start_step + 1:
            jax.profiler.start_trace(os.path.join(exp_dir, "trace"))
            tracing = True
            logger.info(f"profiler: tracing {args.profile_steps} steps")
        state, m = jitted(state, batch, rng)
        running.append(m)
        if tracing and step >= min(start_step + args.profile_steps,
                                   args.max_steps - 1):
            jax.block_until_ready(m["loss"])
            jax.profiler.stop_trace()
            tracing = False
            logger.info(f"profiler: trace written to {exp_dir}/trace")
        if (step + 1) % args.log_every == 0:
            # window mean over the FINITE losses only: a single skipped
            # (NaN/inf) step must not turn the whole window's logged loss
            # and metrics record into NaN
            window = jnp.stack([r["loss"] for r in running])
            finite = jnp.isfinite(window)
            loss = float(jnp.where(finite, window, 0.0).sum()
                         / jnp.maximum(finite.sum(), 1))
            gnorm = float(running[-1]["grad_norm"])
            n_skipped = int(sum(int(r["skipped"]) for r in running))
            if n_skipped:
                logger.warning(f"non-finite loss/grad: skipped {n_skipped} of "
                               f"the last {len(running)} updates")
            # count the steps that actually ran in this window (the first
            # window after a resume can be shorter than log_every)
            tp = meter.step(len(running) * args.global_batch_size, sync_array=m["loss"])
            logger.info(
                f"(step={step + 1:07d}) Train Loss: {loss:.4f}, "
                f"Train Grad Norm: {gnorm:.4f}, "
                f"imgs/sec: {tp['items_per_sec']:.1f}"
            )
            metrics_writer.write(step + 1, {"train/loss": loss, "train/grad_norm": gnorm,
                                            "train/imgs_per_sec": tp["items_per_sec"],
                                            "train/lr": args.lr})
            running = []
        if (step + 1) % args.ckpt_every == 0 or (step + 1) == args.max_steps:
            path = _save(step + 1, state)
            logger.info(("initiated async save to " if saver is not None
                         else "saved checkpoint to ") + path)
        batch = next(batches)

    if saver is not None:
        saver.close()
    metrics_writer.close()
    if prev_handler is not None:
        signal.signal(signal.SIGTERM, prev_handler)
    logger.info("done")
    return state


if __name__ == "__main__":
    main()
