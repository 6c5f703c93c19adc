"""Pixel-space class-conditional training/sampling + the shapes benchmark.

The reference demonstrates quality via released checkpoints and FID tables
(`Next-DiT-ImageNet/README.md:19-22`); in this zero-egress image the
in-environment equivalent is `--pixel_space` training on the procedural
shapes dataset (`data/shapes.py`) judged by a weight-free programmatic
classifier + FID (`exps/quality_demo.py` is the TPU run; these tests pin the
machinery on CPU at tiny scale).
"""

import json
import os

import numpy as np
import pytest


def _tiny_imagenet_registry():
    from lumina_t2x_tpu import models as m
    from lumina_t2x_tpu.models.next_dit_imagenet import NextDiTImageNet

    m.MODELS["NextDiT_ImageNet_600M_patch2"] = lambda **kw: NextDiTImageNet(
        **{**dict(dim=32, n_layers=2, n_heads=4, multiple_of=16, num_classes=16,
                  attn_impl="xla"), **{k: v for k, v in kw.items() if k not in ("remat",)}}
    )


class TestShapesDataset:
    def test_classifier_is_exact_on_real_renders(self):
        from lumina_t2x_tpu.data.shapes import NUM_CLASSES, classify, render

        rng = np.random.default_rng(0)
        for cid in range(NUM_CLASSES):
            for _ in range(4):
                pred, detail = classify(render(cid, rng))
                assert pred == cid, (cid, detail)

    def test_classifier_rejects_noise(self):
        from lumina_t2x_tpu.data.shapes import classify

        rng = np.random.default_rng(1)
        # pure dark noise: no foreground
        pred, _ = classify(rng.normal(25, 8, (64, 64, 3)).clip(0, 255))
        assert pred is None
        # bright uniform blob: foreground exists but matches no template well
        blob = rng.normal(25, 8, (64, 64, 3))
        blob[10:54, 22:30] = (230, 40, 40)  # thin bar, IoU < gate vs all
        pred, detail = classify(blob.clip(0, 255))
        # a thin bar bbox-normalizes to a full rectangle == square template;
        # accept either rejection or the (correct) square call — the gate
        # exists for incoherent blobs, pinned by the noise case above
        assert pred is None or detail["shape"] == "square"

    def test_imagefolder_layout(self, tmp_path):
        from lumina_t2x_tpu.data.loader import list_imagenet_folder
        from lumina_t2x_tpu.data.shapes import CLASS_NAMES, write_imagefolder

        n = write_imagefolder(str(tmp_path), n_per_class=2, size=16)
        assert n == 2 * len(CLASS_NAMES)
        samples, classes = list_imagenet_folder(str(tmp_path))
        assert len(samples) == n
        assert list(classes) == sorted(CLASS_NAMES)

    def test_faithfulness_report(self):
        from lumina_t2x_tpu.data.shapes import (NUM_CLASSES,
                                                faithfulness_report, render)

        rng = np.random.default_rng(2)
        labels = np.arange(NUM_CLASSES)
        imgs = np.stack([render(c, rng) for c in labels])
        rep = faithfulness_report(imgs, labels)
        assert rep["accuracy"] == 1.0
        assert rep["rejected_frac"] == 0.0
        assert rep["chance"] == pytest.approx(1 / 16)


class TestPixelSpacePipeline:
    def test_train_then_sample_pngs_and_fid_npz(self, tmp_path):
        """Folder -> --pixel_space trainer (h2d-diet uint8 wire) ->
        checkpoint -> sampler auto-detects pixel_space/num_classes from
        model_args -> PNGs + labeled ADM npz."""
        from lumina_t2x_tpu.data.shapes import write_imagefolder
        from lumina_t2x_tpu.pipelines.train import main as train_main
        from lumina_t2x_tpu.pipelines.sample import main as sample_main

        _tiny_imagenet_registry()
        data = tmp_path / "data"
        write_imagefolder(str(data), n_per_class=2, size=16)

        state = train_main([
            "--model", "NextDiT_ImageNet_600M_patch2",
            "--data_path", str(data),
            "--results_dir", str(tmp_path / "run"),
            "--image_size", "16",
            "--pixel_space", "--num_classes", "16",
            "--h2d_diet",
            "--global_batch_size", "8",
            "--max_steps", "2", "--log_every", "1", "--ckpt_every", "2",
            "--precision", "fp32", "--num_workers", "1",
        ])
        assert int(state.step) == 2
        ckpt = tmp_path / "run" / "NextDiT_ImageNet_600M_patch2" / "checkpoints" / "0000002"
        assert ckpt.exists()
        margs = json.loads((ckpt / "model_args.json").read_text())
        assert margs["pixel_space"] is True and margs["num_classes"] == 16

        out = tmp_path / "samples"
        manifest = sample_main([
            "--ckpt", str(ckpt),
            "--labels", "0,5",
            "--resolution", "1:16x16",
            "--num_sampling_steps", "2",
            "--image_save_path", str(out),
            "--precision", "fp32",
        ])
        pngs = sorted(p.name for p in out.glob("*.png"))
        assert len(pngs) == 2, manifest["items"]
        from PIL import Image

        img = np.asarray(Image.open(out / pngs[0]))
        assert img.shape == (16, 16, 3) and img.dtype == np.uint8

        # labeled FID npz (ADM layout: arr_0 uint8 NHWC, arr_1 labels)
        out2 = tmp_path / "fid"
        sample_main([
            "--ckpt", str(ckpt),
            "--labels", "0",
            "--resolution", "1:16x16",
            "--num_sampling_steps", "2",
            "--num_fid_samples", "4", "--batch_size", "2",
            "--image_save_path", str(out2),
            "--precision", "fp32",
        ])
        npz = list(out2.glob("samples_*.npz"))
        assert len(npz) == 1
        d = np.load(npz[0])
        assert d["arr_0"].shape == (4, 16, 16, 3) and d["arr_0"].dtype == np.uint8
        assert d["arr_1"].shape == (4,) and int(d["arr_1"].max()) < 16

    def test_pixel_space_rejects_yaml_t2i(self, tmp_path):
        from lumina_t2x_tpu.pipelines.train import main as train_main

        meta = tmp_path / "meta.yaml"
        meta.write_text("META:\n  - path: x.json\n")
        with pytest.raises(SystemExit):
            train_main([
                "--model", "NextDiT_600M_patch2",
                "--data_path", str(meta),
                "--results_dir", str(tmp_path / "run"),
                "--pixel_space",
            ])
