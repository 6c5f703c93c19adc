"""Audio / music demo + generation apps.

Counterparts of `lumina_music/demo_music.py:40-392` and
`lumina_audio/demo_audio.py`: OmegaConf-style target-string model factory,
`GenSamples`-style generation (CFM sample -> 1-D VAE decode -> BigVGAN
vocoder -> wav), and the structured-caption (n2s) utility for audio
conditioning (`lumina_audio/n2s_openai.py:12-40` — an external GPT-3.5 call
in the reference; here both a pluggable LLM hook and a deterministic
rule-based fallback, since this environment has no network egress).
"""

from __future__ import annotations

import argparse
import os
import re
import wave
from typing import Callable, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

N2S_PROMPT_FORMAT = (
    "<event& time>@<event& time>@..."
    " where time is one of: all, start, mid, end"
)


def natural_to_structured(caption: str, llm_fn: Optional[Callable[[str], str]] = None) -> str:
    """Natural caption -> `<event& time>@...` structured caption.

    The reference calls GPT-3.5 (`n2s_openai.py:12-40`); pass `llm_fn` to use
    any LLM endpoint. The fallback splits on temporal conjunctions and
    assigns coarse time tags deterministically.
    """
    if llm_fn is not None:
        return llm_fn(caption)
    parts = re.split(r"\bfollowed by\b|\bthen\b|\bafter\b|,", caption.lower())
    parts = [p.strip(" .") for p in parts if p.strip(" .")]
    if not parts:
        return f"<{caption}& all>"
    if len(parts) == 1:
        return f"<{parts[0]}& all>"
    tags = ["start"] + ["mid"] * (len(parts) - 2) + ["end"]
    return "@".join(f"<{p}& {t}>" for p, t in zip(parts, tags))


class GenSamples:
    """Generation harness (`demo_music.py` GenSamples): text features ->
    CFM latents -> mel -> waveform."""

    def __init__(self, denoiser_fn, vae_decode_fn, vocoder_fn=None, *,
                 latent_channels: int = 20, latent_length: int = 256,
                 guidance_scale: float = 3.0, num_steps: int = 25,
                 scale_factor: float = 1.0):
        self.denoiser_fn = denoiser_fn
        self.vae_decode_fn = vae_decode_fn
        self.vocoder_fn = vocoder_fn
        self.latent_shape = (1, latent_channels, latent_length)
        self.guidance_scale = guidance_scale
        self.num_steps = num_steps
        self.scale_factor = scale_factor

    def gen_test_sample(self, rng, cond, uncond):
        from .audio import generate_audio

        mel, wav = generate_audio(
            rng, self.denoiser_fn, self.vae_decode_fn, self.vocoder_fn,
            cond=cond, uncond=uncond, latent_shape=self.latent_shape,
            guidance_scale=self.guidance_scale, num_steps=self.num_steps,
            scale_factor=self.scale_factor,
        )
        return np.asarray(mel), (np.asarray(wav) if wav is not None else None)


def save_wav(waveform: np.ndarray, path: str, sample_rate: int = 16000):
    """Write mono 16-bit PCM."""
    wav16 = np.clip(waveform, -1.0, 1.0)
    wav16 = (wav16 * 32767).astype(np.int16)
    with wave.open(path, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(sample_rate)
        f.writeframes(wav16.tobytes())
    return path


def build_audio_gradio_ui(gen: "GenSamples", *, task: str = "music",
                          sample_rate: int = 16000, struct_captions: bool = False,
                          text_encode_fn=None, ctx_dim: int = 1024):
    """Gradio UI for audio/music generation (`lumina_music/demo_music.py:40-392`;
    the audio variant adds a structured-caption input, `demo_audio.py`).
    Raises ImportError without gradio."""
    import gradio as gr

    def encode(prompt):
        if text_encode_fn is not None:
            return text_encode_fn([prompt]), text_encode_fn([""])
        ly = 16
        from ..utils import stable_text_seed

        cond = np.random.default_rng(stable_text_seed(prompt)).standard_normal(
            (1, ly, ctx_dim)).astype(np.float32)
        return jnp.asarray(cond), jnp.zeros((1, ly, ctx_dim))

    def on_submit(prompt, use_struct, guidance, steps, seed):
        text = natural_to_structured(prompt) if (use_struct and task == "audio") else prompt
        cond, uncond = encode(text)
        gen.guidance_scale = float(guidance)
        gen.num_steps = int(steps)
        mel, wav = gen.gen_test_sample(jax.random.PRNGKey(int(seed)), cond, uncond)
        if wav is None:
            return None, text
        return (sample_rate, wav[0]), text

    with gr.Blocks() as demo:
        gr.Markdown(f"# Lumina Text-to-{task.capitalize()} (TPU)")
        prompt = gr.Textbox(label="Prompt")
        use_struct = gr.Checkbox(value=struct_captions, label="Structured caption (audio)")
        guidance = gr.Slider(1.0, 10.0, value=3.0, label="Guidance scale")
        steps = gr.Slider(5, 100, value=25, step=1, label="Sampling steps")
        seed = gr.Number(value=0, label="Seed", precision=0)
        submit = gr.Button("Generate")
        audio_out = gr.Audio(label="Result")
        caption_out = gr.Textbox(label="Effective caption")
        submit.click(on_submit, [prompt, use_struct, guidance, steps, seed],
                     [audio_out, caption_out])
    return demo


def build_audio_stack(*, debug: bool = False, vae_ckpt: Optional[str] = None,
                      vocoder_ckpt: Optional[str] = None,
                      latent_length: int = 256, seed: int = 0,
                      ctx_dim: int = 1024):
    """(denoiser_fn, vae_decode_fn, vocoder_fn) — the shared model startup of
    the CLI, the gradio UI, and the HTTP server (`serve_audio.py`). Mirrors
    the reference's GenSamples setup (`lumina_music/demo_music.py:40-120`);
    random weights unless checkpoints are mounted."""
    from ..codecs.vae1d import AutoencoderKL1D
    from ..codecs.vocoder import VocoderBigVGAN
    from ..models.flag_dit_1d import FlagDiT1D

    hidden, depth = (64, 2) if debug else (1152, 28)
    model = FlagDiT1D(in_channels=20, context_dim=ctx_dim, hidden_size=hidden,
                      depth=depth, num_heads=4 if debug else 16, multiple_of=16)
    rng = jax.random.PRNGKey(seed)
    x0 = jnp.zeros((2, 20, latent_length))
    ctx0 = jnp.zeros((2, 8, ctx_dim))
    variables = jax.jit(model.init)(rng, x0, jnp.zeros((2,)), ctx0)

    def denoiser_fn(x, t, c):
        return model.apply(variables, x, t, c)

    if vae_ckpt:
        # real trained mel-VAE: the maa2 structural config + imported weights
        from ..codecs.vae1d import (import_autoencoder_kl_1d_weights,
                                    make_an_audio_2_vae)
        from ..core.checkpoint import load_torch_state_dict

        vae = make_an_audio_2_vae()
        vv = {"params": import_autoencoder_kl_1d_weights(
            load_torch_state_dict(vae_ckpt), ch_mult=vae.ch_mult,
            num_res_blocks=vae.num_res_blocks, attn_layers=(), down_layers=(0,))}
    else:
        vae = AutoencoderKL1D(mel_bins=80, embed_dim=20, ch=32 if debug else 128,
                              ch_mult=(1, 2), num_res_blocks=1, z_channels=20)
        vv = vae.init(jax.random.PRNGKey(1), jnp.zeros((1, 80, 16)),
                      jax.random.PRNGKey(2))
    vae_decode = lambda z: vae.apply(vv, z, method=vae.decode)  # noqa: E731

    if vocoder_ckpt:
        voc = VocoderBigVGAN.from_torch_checkpoint(vocoder_ckpt, mel_bins=80)
    else:
        voc = VocoderBigVGAN.create(
            mel_bins=80,
            **({"upsample_rates": (2, 2), "upsample_kernel_sizes": (4, 4),
                "upsample_initial_channel": 32, "resblock_kernel_sizes": (3,),
                "resblock_dilation_sizes": ((1, 3),)} if debug else {}),
        )
    return denoiser_fn, vae_decode, voc.vocode


class AudioWorker:
    """Serving-side generation worker: prompt -> (mel, wav). One generation
    owns the chip at a time (same serialization contract as the image
    `InferenceWorker`); per-request knobs re-enter jax's jit cache keyed on
    the static step count."""

    def __init__(self, denoiser_fn, vae_decode_fn, vocoder_fn, *,
                 task: str = "music", ctx_dim: int = 1024,
                 latent_length: int = 128, sample_rate: int = 16000,
                 scale_factor: float = 1.0, text_encode_fn=None,
                 llm_fn=None):
        import threading

        self.task = task
        self.ctx_dim = ctx_dim
        self.latent_length = latent_length
        self.sample_rate = sample_rate
        self.scale_factor = scale_factor
        self.text_encode_fn = text_encode_fn
        self.llm_fn = llm_fn
        self._fns = (denoiser_fn, vae_decode_fn, vocoder_fn)
        self._lock = threading.Lock()

    def _encode(self, prompt: str):
        if self.text_encode_fn is not None:
            # CFG uncond = empty-prompt features, the reference's convention
            # (`demo_music.py` gets both rows from the frozen encoder)
            feats, _ = self.text_encode_fn([prompt, ""])
            feats = jnp.asarray(feats)
            return feats[:1], feats[1:]
        ly = 16
        from ..utils import stable_text_seed

        cond = jnp.asarray(np.random.default_rng(stable_text_seed(prompt))
                           .standard_normal((1, ly, self.ctx_dim)).astype(np.float32))
        return cond, jnp.zeros((1, ly, self.ctx_dim))

    def generate(self, prompt: str, *, use_struct: bool = False,
                 guidance_scale: float = 3.0, num_steps: int = 25,
                 seed: int = 0):
        with self._lock:
            import time

            t0 = time.time()
            if use_struct and self.task == "audio":
                prompt = natural_to_structured(prompt, self.llm_fn)
            cond, uncond = self._encode(prompt)
            gen = GenSamples(*self._fns, latent_length=self.latent_length,
                             guidance_scale=guidance_scale, num_steps=num_steps,
                             scale_factor=self.scale_factor)
            mel, wav = gen.gen_test_sample(jax.random.PRNGKey(seed), cond, uncond)
            return {"mel": mel, "wav": wav, "sample_rate": self.sample_rate,
                    "metadata": {"prompt": prompt, "task": self.task,
                                 "guidance_scale": guidance_scale,
                                 "num_steps": num_steps, "seed": seed,
                                 "elapsed_s": round(time.time() - t0, 3)}}


def main(argv=None):
    from ..core import enable_compile_cache

    enable_compile_cache()
    p = argparse.ArgumentParser(description="lumina audio/music generation (TPU)")
    p.add_argument("--task", choices=["music", "audio"], default="music")
    p.add_argument("--prompt", type=str, required=True)
    p.add_argument("--output_dir", type=str, default="audio_out")
    p.add_argument("--guidance_scale", type=float, default=3.0)
    p.add_argument("--num_steps", type=int, default=25)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--latent_length", type=int, default=256)
    p.add_argument("--struct_caption", action="store_true",
                   help="audio task: convert prompt to structured caption")
    p.add_argument("--debug", action="store_true", help="random weights")
    p.add_argument("--vae_ckpt", type=str, default=None,
                   help="Make-An-Audio-2 mel-VAE torch checkpoint (maa2.ckpt, "
                        "lumina-text2music.yaml:48); loads real weights via "
                        "import_autoencoder_kl_1d_weights")
    p.add_argument("--vocoder_ckpt", type=str, default=None,
                   help="BigVGAN best_netG.pt; loads real weights via "
                        "import_bigvgan_weights")
    p.add_argument("--latent_scale_factor", type=float, default=1.0,
                   help="LDM latent scale (the trained checkpoint's "
                        "scale_factor buffer; configs use scale_by_std so it "
                        "is not 1) — decode divides latents by it "
                        "(ddpm.py:773 decode_first_stage)")
    args = p.parse_args(argv)

    denoiser_fn, vae_decode, vocode = build_audio_stack(
        debug=args.debug, vae_ckpt=args.vae_ckpt, vocoder_ckpt=args.vocoder_ckpt,
        latent_length=args.latent_length, seed=args.seed)
    worker = AudioWorker(denoiser_fn, vae_decode, vocode, task=args.task,
                         latent_length=args.latent_length // 2,
                         scale_factor=args.latent_scale_factor)
    result = worker.generate(args.prompt, use_struct=args.struct_caption,
                             guidance_scale=args.guidance_scale,
                             num_steps=args.num_steps, seed=args.seed)
    if args.struct_caption and args.task == "audio":
        print(f"structured caption: {result['metadata']['prompt']}")
    os.makedirs(args.output_dir, exist_ok=True)
    out = os.path.join(args.output_dir, "sample.wav")
    save_wav(result["wav"][0], out)
    print(f"mel {result['mel'].shape} -> {out}")
    return out


if __name__ == "__main__":
    main()
