"""HTTP demo server tests (stdlib front-end over InferenceWorker).

Covers the serving surface the reference exposes through gradio
(`lumina_next_t2i/demo.py:353-561`) — here a dependency-free HTTP app:
request validation, the generate round-trip returning a real PNG, health,
error propagation (worker ModelFailure -> 500), and a live-socket smoke test.
"""

import base64
import io
import json
import urllib.request

import jax
import jax.numpy as jnp
import pytest
from PIL import Image

from lumina_t2x_tpu.models.next_dit import NextDiT
from lumina_t2x_tpu.pipelines.demo import InferenceWorker
from lumina_t2x_tpu.pipelines.serve import DemoApp, make_server, parse_request


def _tiny_worker():
    model = NextDiT(dim=32, n_layers=2, n_heads=4, multiple_of=16,
                    cap_feat_dim=16, attn_impl="xla")
    x0 = jnp.zeros((2, 4, 8, 8))
    cap = jnp.zeros((2, 8, 16))
    variables = model.init(jax.random.PRNGKey(0), x0, jnp.zeros((2,)), cap,
                           jnp.ones((2, 8), jnp.int32))
    return InferenceWorker(model, variables, train_res=64, cap_feat_dim=16)


_REQ = {"cap": "a cat", "resolution": "64x64", "num_sampling_steps": 2,
        "solver": "euler", "scaling_method": "None", "proportional_attn": False}


class TestParseRequest:
    def test_defaults_and_coercion(self):
        req = parse_request({"cap": "x", "num_sampling_steps": "7", "seed": 3})
        assert req.num_sampling_steps == 7 and req.seed == 3
        assert req.solver == "midpoint" and req.cfg_scale == 4.0

    def test_bool_accepts_form_strings(self):
        # HTML checkboxes/JS send real booleans; "true"/"false" strings are
        # accepted too, but NOT python-truthiness ("false" must mean False)
        assert parse_request({"cap": "x", "proportional_attn": "false"}
                             ).proportional_attn is False
        assert parse_request({"cap": "x", "proportional_attn": True}
                             ).proportional_attn is True

    @pytest.mark.parametrize("bad", [
        None,
        {},                                      # missing cap
        {"cap": ""},                             # empty cap
        {"cap": "x", "steps": 3},                # unknown field (typo)
        {"cap": "x", "num_sampling_steps": 99},  # out of range
        {"cap": "x", "solver": "dopri99"},
        {"cap": "x", "cfg_scale": 0.0},
        {"cap": "x", "num_sampling_steps": "many"},
        {"cap": "x", "neg_cap": None},           # str(None) must not become "None"
        {"cap": "x", "resolution": None},
        {"cap": "x", "proportional_attn": "yes"},  # not a boolean literal
        {"cap": "x", "proportional_attn": 1},
        {"cap": "x", "seed": None},
        {"cap": "x", "cfg_scale": True},         # bool is not a number here
    ])
    def test_rejects(self, bad):
        with pytest.raises(ValueError):
            parse_request(bad)


class TestDemoApp:
    @pytest.fixture(scope="class")
    def app(self):
        return DemoApp(_tiny_worker(), model_name="tiny")

    def test_index_page(self, app):
        status, ctype, body = app.handle("GET", "/", None)
        assert status == 200 and "text/html" in ctype
        page = body.decode()
        # every API field has a control in the page
        for field in ("cap", "neg_cap", "resolution", "num_sampling_steps",
                      "cfg_scale", "solver", "t_shift", "seed",
                      "scaling_method", "scaling_watershed", "proportional_attn"):
            assert f'id="{field}"' in page

    def test_health(self, app):
        status, _, body = app.handle("GET", "/api/health", None)
        assert status == 200
        info = json.loads(body)
        assert info["ok"] and info["model"] == "tiny"

    def test_generate_returns_png(self, app):
        status, _, body = app.handle("POST", "/api/generate",
                                     json.dumps(_REQ).encode())
        assert status == 200, body
        out = json.loads(body)
        img = Image.open(io.BytesIO(base64.b64decode(out["image_png_b64"])))
        # no VAE attached -> 3-channel latent preview at latent resolution
        assert img.size == (64 // 8, 64 // 8) and img.mode == "RGB"
        assert out["metadata"]["num_sampling_steps"] == 2
        # sampler got cached under the request's static knobs
        _, _, health = app.handle("GET", "/api/health", None)
        assert json.loads(health)["compiled_samplers"] >= 1

    def test_bad_request_is_400(self, app):
        status, _, body = app.handle("POST", "/api/generate", b'{"cap": ""}')
        assert status == 400 and "cap" in json.loads(body)["error"]
        status, _, _ = app.handle("POST", "/api/generate", b"not json")
        assert status == 400

    def test_worker_failure_is_500(self, app, monkeypatch):
        from lumina_t2x_tpu.pipelines.demo import ModelFailure

        monkeypatch.setattr(app.worker, "infer",
                            lambda req: ModelFailure("boom traceback"))
        status, _, body = app.handle("POST", "/api/generate",
                                     json.dumps(_REQ).encode())
        assert status == 500
        assert "generation failed" in json.loads(body)["error"]

    def test_invalid_knobs_are_400(self, app):
        for bad in (dict(_REQ, resolution="not-a-res"),
                    dict(_REQ, resolution="8192x8192"),
                    dict(_REQ, t_shift=0),
                    dict(_REQ, scaling_watershed=0.0),
                    dict(_REQ, scaling_method="wild")):
            status, _, _ = app.handle("POST", "/api/generate",
                                      json.dumps(bad).encode())
            assert status == 400, bad

    def test_unknown_path_404(self, app):
        assert app.handle("GET", "/nope", None)[0] == 404
        assert app.handle("POST", "/", b"") [0] == 404


class TestLiveServer:
    def test_socket_round_trip(self):
        """Bind a real socket (port 0), drive index + health + generate over
        HTTP, shut down cleanly."""
        import threading

        app = DemoApp(_tiny_worker(), model_name="tiny")
        server = make_server(app, port=0)
        host, port = server.server_address[:2]
        t = threading.Thread(target=server.serve_forever, daemon=True)
        t.start()
        try:
            base = f"http://{host}:{port}"
            assert b"<html" in urllib.request.urlopen(f"{base}/", timeout=30).read(200)
            health = json.loads(urllib.request.urlopen(
                f"{base}/api/health", timeout=30).read())
            assert health["ok"]
            req = urllib.request.Request(
                f"{base}/api/generate", data=json.dumps(_REQ).encode(),
                headers={"Content-Type": "application/json"})
            out = json.loads(urllib.request.urlopen(req, timeout=300).read())
            assert base64.b64decode(out["image_png_b64"])[:4] == b"\x89PNG"
        finally:
            server.shutdown()
            t.join(timeout=10)


class TestWorkerPool:
    """Per-device fan-out (`demo.WorkerPool`) — the reference's per-GPU
    worker pool (`demo.py:330-351`) as per-chip committed params. Runs on
    the 8-device virtual CPU mesh from conftest."""

    def _pool(self, n):
        from lumina_t2x_tpu.pipelines.demo import WorkerPool

        model = NextDiT(dim=32, n_layers=2, n_heads=4, multiple_of=16,
                        cap_feat_dim=16, attn_impl="xla")
        x0 = jnp.zeros((2, 4, 8, 8))
        cap = jnp.zeros((2, 8, 16))
        variables = model.init(jax.random.PRNGKey(0), x0, jnp.zeros((2,)), cap,
                               jnp.ones((2, 8), jnp.int32))
        return WorkerPool(model, variables, devices=jax.local_devices()[:n],
                          train_res=64, cap_feat_dim=16)

    def test_params_committed_per_device(self):
        pool = self._pool(4)
        assert len(pool) == 4
        devs = set()
        for w in pool.workers:
            leaf = jax.tree.leaves(w.variables)[0]
            (d,) = leaf.devices()
            devs.add(d)
        assert len(devs) == 4

    def test_concurrent_requests_fan_out(self):
        import threading

        from lumina_t2x_tpu.pipelines.demo import InferenceRequest, ModelFailure

        pool = self._pool(3)
        reqs = [InferenceRequest(cap=f"cat {i}", resolution="64x64",
                                 num_sampling_steps=2, solver="euler",
                                 scaling_method="None", proportional_attn=False,
                                 seed=i) for i in range(6)]
        results = [None] * len(reqs)

        def run(i):
            results[i] = pool.infer(reqs[i])

        threads = [threading.Thread(target=run, args=(i,)) for i in range(len(reqs))]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=600)
        served_devices = set()
        for r in results:
            assert not isinstance(r, ModelFailure), getattr(r, "error", "")
            assert r["latents"].ndim == 4
            served_devices.add(r["metadata"]["device"])
        # 6 concurrent requests over 3 chips: more than one chip served
        assert len(served_devices) > 1

    def test_pool_health_view_and_app(self):
        pool = self._pool(2)
        app = DemoApp(pool, model_name="tiny-pool")
        status, _, body = app.handle("POST", "/api/generate",
                                     json.dumps(_REQ).encode())
        assert status == 200
        health = json.loads(app.handle("GET", "/api/health", None)[2])
        assert health["ok"] and health["compiled_samplers"] >= 1
