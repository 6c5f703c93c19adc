"""HTTP audio/music serving (`pipelines/serve_audio.py`): request
validation, the generate round-trip returning a playable WAV, health, and a
live-socket smoke test — the audio analogue of tests/test_serve.py (ref UX:
`lumina_music/demo_music.py:40-392`)."""

import base64
import io
import json
import urllib.request
import wave

import numpy as np
import pytest

from lumina_t2x_tpu.pipelines.audio_app import AudioWorker, build_audio_stack
from lumina_t2x_tpu.pipelines.serve import make_server
from lumina_t2x_tpu.pipelines.serve_audio import (AudioDemoApp,
                                                  parse_audio_request)


def _tiny_app(task="audio"):
    denoiser_fn, vae_decode, vocode = build_audio_stack(debug=True,
                                                        latent_length=32)
    worker = AudioWorker(denoiser_fn, vae_decode, vocode, task=task,
                         latent_length=16)
    return AudioDemoApp(worker, task=task)


_REQ = {"prompt": "rain on a tin roof", "num_steps": 2}


class TestParseAudioRequest:
    def test_defaults(self):
        kw = parse_audio_request({"prompt": "x"})
        assert kw["num_steps"] == 25 and kw["guidance_scale"] == 3.0
        assert kw["struct_caption"] is False and kw["seed"] == 0

    @pytest.mark.parametrize("bad", [
        None,
        {},                                  # missing prompt
        {"prompt": ""},
        {"prompt": "x", "steps": 3},         # unknown field
        {"prompt": "x", "num_steps": 0},
        {"prompt": "x", "num_steps": 101},   # compile-bomb guard
        {"prompt": "x", "guidance_scale": 0.5},
        {"prompt": "x", "struct_caption": "yes"},
        {"prompt": "x", "seed": None},
    ])
    def test_rejects(self, bad):
        with pytest.raises(ValueError):
            parse_audio_request(bad)


class TestAudioDemoApp:
    @pytest.fixture(scope="class")
    def app(self):
        return _tiny_app()

    def test_index_and_health(self, app):
        status, ctype, body = app.handle("GET", "/", None)
        assert status == 200 and "text/html" in ctype and b"Lumina Audio" in body
        health = json.loads(app.handle("GET", "/api/health", None)[2])
        assert health["ok"] and health["task"] == "audio"

    def test_generate_returns_playable_wav(self, app):
        status, _, body = app.handle("POST", "/api/generate",
                                     json.dumps(_REQ).encode())
        assert status == 200, body
        out = json.loads(body)
        raw = base64.b64decode(out["audio_wav_b64"])
        with wave.open(io.BytesIO(raw)) as f:
            assert f.getframerate() == out["sample_rate"]
            assert f.getnframes() > 0
            frames = np.frombuffer(f.readframes(f.getnframes()), np.int16)
        assert np.isfinite(frames).all()
        assert out["metadata"]["num_steps"] == 2

    def test_struct_caption_path(self, app):
        req = dict(_REQ, struct_caption=True)
        status, _, body = app.handle("POST", "/api/generate",
                                     json.dumps(req).encode())
        assert status == 200
        meta = json.loads(body)["metadata"]
        # n2s fallback produced a structured caption (`n2s_openai.py` format)
        assert "@" in meta["prompt"] or "&" in meta["prompt"]

    def test_validation_400_and_unknown_404(self, app):
        assert app.handle("POST", "/api/generate",
                          json.dumps({"prompt": ""}).encode())[0] == 400
        assert app.handle("GET", "/nope", None)[0] == 404

    def test_same_seed_is_deterministic(self, app):
        outs = []
        for _ in range(2):
            _, _, body = app.handle("POST", "/api/generate",
                                    json.dumps(dict(_REQ, seed=7)).encode())
            outs.append(json.loads(body)["audio_wav_b64"])
        assert outs[0] == outs[1]


class TestLiveAudioServer:
    def test_socket_round_trip(self):
        import threading

        app = _tiny_app(task="music")
        server = make_server(app, port=0)
        host, port = server.server_address[:2]
        t = threading.Thread(target=server.serve_forever, daemon=True)
        t.start()
        try:
            base = f"http://{host}:{port}"
            assert b"<html" in urllib.request.urlopen(f"{base}/", timeout=30).read(200)
            req = urllib.request.Request(
                f"{base}/api/generate", data=json.dumps(_REQ).encode(),
                headers={"Content-Type": "application/json"})
            out = json.loads(urllib.request.urlopen(req, timeout=300).read())
            assert base64.b64decode(out["audio_wav_b64"])[:4] == b"RIFF"
        finally:
            server.shutdown()
            t.join(timeout=10)
