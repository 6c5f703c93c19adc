"""Execute the gradio UI wiring with a minimal in-test shim (VERDICT r2 #5).

gradio is not installed in this image, so `demo.build_gradio_ui` and
`audio_app.build_audio_gradio_ui` (the reference's primary UX,
`lumina_next_t2i/demo.py:361-552`, `lumina_music/demo_music.py:40-392`) were
previously never executed. The shim below implements just enough of the
gradio surface (Blocks/Row/Column context managers, widgets with defaults,
Button.click binding, Error) to run the REAL builders, then fires the
recorded click handler with each widget's default value — the exact
widget->request->worker->image round-trip a browser submit performs.
"""

import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest


# ---------------------------------------------------------------------------
# minimal gradio shim
# ---------------------------------------------------------------------------


class _Widget:
    def __init__(self, *args, value=None, label=None, **kw):
        # Dropdown(choices, value=...) / Slider(lo, hi, value=...)
        self.args, self.value, self.label = args, value, label


class _Button(_Widget):
    def __init__(self, *a, **kw):
        super().__init__(*a, **kw)
        self.clicks = []

    def click(self, fn, inputs, outputs):
        self.clicks.append((fn, inputs, outputs))


class _Container:
    def __init__(self, *a, **kw):
        pass

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        return False


class _Error(Exception):
    pass


def make_gradio_shim():
    gr = types.ModuleType("gradio")
    gr.Blocks = _Container
    gr.Row = _Container
    gr.Column = _Container
    gr.Markdown = _Widget
    gr.Textbox = _Widget
    gr.Dropdown = _Widget
    gr.Slider = _Widget
    gr.Number = _Widget
    gr.Checkbox = _Widget
    gr.Image = _Widget
    gr.Audio = _Widget
    gr.Button = _Button
    gr.Error = _Error
    return gr


@pytest.fixture()
def gradio_shim(monkeypatch):
    shim = make_gradio_shim()
    monkeypatch.setitem(sys.modules, "gradio", shim)
    return shim


def _fire_default_click(button: _Button, overrides=None):
    """Invoke the recorded click handler with each input widget's default."""
    (fn, inputs, _outputs), = button.clicks
    vals = [w.value for w in inputs]
    if overrides:
        for i, w in enumerate(inputs):
            if w.label in overrides:
                vals[i] = overrides[w.label]
    return fn(*vals)


# ---------------------------------------------------------------------------
# t2i demo UI
# ---------------------------------------------------------------------------


def _tiny_worker():
    from lumina_t2x_tpu.models.next_dit import NextDiT
    from lumina_t2x_tpu.pipelines.demo import InferenceWorker

    model = NextDiT(patch_size=2, dim=32, n_layers=2, n_heads=4, multiple_of=16,
                    cap_feat_dim=16, attn_impl="xla")
    x0 = jnp.zeros((2, 4, 8, 8))
    cap = jnp.zeros((2, 4, 16))
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x0, jnp.zeros((2,)),
                                    cap, jnp.ones((2, 4), jnp.int32))
    return InferenceWorker(model, variables, train_res=64, cap_feat_dim=16)


class TestDemoUI:
    def test_build_and_submit(self, gradio_shim):
        from lumina_t2x_tpu.pipelines.demo import build_gradio_ui

        worker = _tiny_worker()
        ui = build_gradio_ui(worker)
        assert isinstance(ui, _Container)

        # the builder created exactly one wired button
        btn = _collect_buttons()
        assert len(btn) == 1 and len(btn[0].clicks) == 1

        img = _fire_default_click(btn[0], overrides={
            "Caption": "a cat", "Resolution": "64x64", "Sampling steps": 3,
            "RoPE scaling method": "None", "Proportional attention": False,
        })
        img = np.asarray(img)
        assert img.ndim == 3 and img.shape[-1] == 3  # HWC image
        assert np.isfinite(np.asarray(img, np.float32)).all()

    def test_submit_failure_raises_gr_error(self, gradio_shim):
        from lumina_t2x_tpu.pipelines.demo import build_gradio_ui

        worker = _tiny_worker()
        build_gradio_ui(worker)
        btn = _collect_buttons()[-1]
        with pytest.raises(_Error, match="generation failed"):
            _fire_default_click(btn, overrides={
                "Caption": "a cat", "Resolution": "not-a-res"})


# ---------------------------------------------------------------------------
# audio UI
# ---------------------------------------------------------------------------


class TestAudioUI:
    def _tiny_gen(self):
        """GenSamples over trivial stand-ins: the UI test exercises the
        widget->encode->CFM->decode->vocoder wiring, not codec numerics
        (those live in test_audio / test_audio_parity)."""
        from lumina_t2x_tpu.pipelines.audio_app import GenSamples

        def denoiser_fn(x, t, context):
            return -0.1 * x + 0.01 * jnp.mean(context)

        def vae_decode(z):  # (1, 20, L) -> mel (1, 80, 2L)
            return jnp.tanh(jnp.repeat(jnp.repeat(z, 4, axis=1), 2, axis=2))

        def vocode(mel):  # mel -> (1, T) waveform
            return jnp.tanh(mel.reshape(1, -1))

        return GenSamples(denoiser_fn, vae_decode, vocode, latent_length=16,
                          num_steps=3)

    def test_build_and_submit(self, gradio_shim):
        from lumina_t2x_tpu.pipelines.audio_app import build_audio_gradio_ui

        build_audio_gradio_ui(self._tiny_gen(), task="music", ctx_dim=24)
        btn = _collect_buttons()[-1]
        out, caption = _fire_default_click(btn, overrides={
            "Prompt": "soft piano", "Sampling steps": 3})
        assert caption == "soft piano"
        sr, wav = out
        assert sr == 16000
        assert np.asarray(wav).ndim == 1 and np.isfinite(np.asarray(wav)).all()

    def test_struct_caption_path(self, gradio_shim):
        """task=audio + structured-caption checkbox routes the prompt through
        natural_to_structured before encoding (`demo_audio.py` semantics)."""
        from lumina_t2x_tpu.pipelines.audio_app import build_audio_gradio_ui

        build_audio_gradio_ui(self._tiny_gen(), task="audio", ctx_dim=24,
                              struct_captions=True)
        btn = _collect_buttons()[-1]
        out, caption = _fire_default_click(btn, overrides={
            "Prompt": "rain then thunder", "Sampling steps": 3})
        assert "@" in caption and "&" in caption  # <event& time>@... format
        assert out is not None


# button registry: _Button records itself on creation so tests can find the
# builder's instances without reaching into gradio internals
_BUTTONS = []
_orig_init = _Button.__init__


def _button_init(self, *a, **kw):
    _orig_init(self, *a, **kw)
    _BUTTONS.append(self)


_Button.__init__ = _button_init


def _collect_buttons():
    return list(_BUTTONS)


@pytest.fixture(autouse=True)
def _clear_buttons():
    _BUTTONS.clear()
    yield
    _BUTTONS.clear()
