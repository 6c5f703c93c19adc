"""Native C++ image pipeline tests: build, decode parity vs PIL, crop
semantics, threaded throughput sanity."""

import io
import os

import numpy as np
import pytest
from PIL import Image

from lumina_t2x_tpu.data import native_loader as nl


@pytest.fixture(scope="module")
def lib_available():
    if not nl.native_available():
        pytest.skip("native toolchain unavailable")
    return True


def make_jpeg(w=64, h=48, color=(200, 30, 90)):
    img = Image.new("RGB", (w, h), color)
    buf = io.BytesIO()
    img.save(buf, format="JPEG", quality=95)
    return buf.getvalue()


def make_png(w=40, h=40, gradient=True):
    arr = np.zeros((h, w, 3), np.uint8)
    if gradient:
        arr[..., 0] = np.linspace(0, 255, w, dtype=np.uint8)[None, :]
        arr[..., 1] = np.linspace(0, 255, h, dtype=np.uint8)[:, None]
    img = Image.fromarray(arr)
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    return buf.getvalue()


class TestNative:
    def test_probe_size(self, lib_available):
        assert nl.probe_size(make_jpeg(64, 48)) == (64, 48)
        assert nl.probe_size(make_png(40, 40)) == (40, 40)

    def test_decode_jpeg_solid_color(self, lib_available):
        data = make_jpeg(64, 48, (255, 0, 0))
        out = nl.decode_to_tensor(data, (32, 32))
        assert out.shape == (3, 32, 32)
        # red channel near +1, green/blue near -1 (jpeg tolerance)
        assert out[0].mean() > 0.9
        assert out[1].mean() < -0.85

    def test_decode_png_matches_pil_pipeline(self, lib_available):
        data = make_png(64, 64)
        out = nl.decode_to_tensor(data, (32, 32))
        # PIL reference: scale-to-cover + center crop + normalize
        img = Image.open(io.BytesIO(data)).convert("RGB").resize((32, 32), Image.BILINEAR)
        ref = (np.asarray(img, np.float32) / 127.5 - 1.0).transpose(2, 0, 1)
        assert out.shape == ref.shape
        assert np.abs(out - ref).mean() < 0.1  # resamplers differ slightly

    def test_wide_crop_from_tall_image(self, lib_available):
        data = make_png(40, 80)
        out = nl.decode_to_tensor(data, (64, 32))  # wide bucket
        assert out.shape == (3, 32, 64)
        assert np.isfinite(out).all()
        assert out.min() >= -1.001 and out.max() <= 1.001

    def test_invalid_data_raises(self, lib_available):
        with pytest.raises(ValueError):
            nl.decode_to_tensor(b"not an image at all", (16, 16))
        with pytest.raises(ValueError):
            nl.probe_size(b"garbage")

    def test_processor_bucketing(self, lib_available, tmp_path):
        from lumina_t2x_tpu.data.imgproc import generate_crop_size_list

        p = tmp_path / "x.png"
        p.write_bytes(make_png(128, 64))
        proc = nl.NativeImageProcessor(generate_crop_size_list(16, 16))
        arr, bucket = proc(str(p))
        assert arr.shape == (3, bucket[1], bucket[0])
        assert bucket[0] >= bucket[1]  # wide image -> wide bucket

    def test_threaded_decode(self, lib_available):
        import concurrent.futures as futures

        data = [make_jpeg(100 + i, 80) for i in range(16)]
        with futures.ThreadPoolExecutor(8) as pool:
            outs = list(pool.map(lambda d: nl.decode_to_tensor(d, (64, 64)), data))
        assert all(o.shape == (3, 64, 64) for o in outs)
