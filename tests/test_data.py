"""Data pipeline tests: crop-size buckets, YAML meta dataset with error
retry, resumable sampler determinism, bucket batching."""

import json
import os

import numpy as np
import pytest
from PIL import Image

from lumina_t2x_tpu.data.dataset import (
    DataBriefReportException,
    ItemProcessor,
    MetaDataset,
    T2IItemProcessor,
    resumable_sampler_indices,
)
from lumina_t2x_tpu.data.imgproc import (
    center_crop_arr,
    generate_crop_size_list,
    match_bucket,
    to_latent_input,
    var_center_crop,
)
from lumina_t2x_tpu.data.loader import (
    bucket_batched,
    collate_image_label,
    list_imagenet_folder,
    threaded_prefetch,
)


class TestImgproc:
    def test_crop_size_list_properties(self):
        # 1024px training: (1024/8/2)^2 => num_patches for 2x-patch tokens
        lst = generate_crop_size_list(64, 16, max_ratio=4.0)
        assert (128, 128) in lst  # 8x8 patches of 16
        for w, h in lst:
            assert (w // 16) * (h // 16) <= 64
            assert max(w / h, h / w) <= 4.0

    def test_crop_size_list_matches_reference_shape(self):
        """Mirror of the reference enumeration (`imgproc.py:47-58`)."""
        lst = generate_crop_size_list(4, 2)
        assert lst == [(8, 2), (6, 2), (4, 2), (4, 4), (2, 4), (2, 6), (2, 8)]

    def test_var_center_crop_output_size(self):
        img = Image.new("RGB", (300, 200))
        lst = generate_crop_size_list(64, 16)
        out = var_center_crop(img, lst)
        assert out.size in lst

    def test_match_bucket_deterministic(self):
        lst = generate_crop_size_list(64, 16)
        b = match_bucket(300, 200, lst)
        assert b in lst
        assert b == match_bucket(300, 200, lst)
        # wide image picks a wide bucket
        assert b[0] > b[1]

    def test_center_crop_arr(self):
        img = Image.new("RGB", (300, 200), (255, 0, 0))
        out = center_crop_arr(img, 64)
        assert out.size == (64, 64)

    def test_to_latent_input_range(self):
        img = Image.new("RGB", (8, 8), (255, 255, 255))
        arr = to_latent_input(img)
        assert arr.shape == (3, 8, 8)
        np.testing.assert_allclose(arr, 1.0)


class _IndexProcessor(ItemProcessor):
    def __init__(self, fail_indices=()):
        self.fail = set(fail_indices)

    def process_item(self, item, training_mode=False):
        if item["id"] in self.fail:
            raise DataBriefReportException(f"fail {item['id']}")
        return item["id"]


class TestMetaDataset:
    def _write_config(self, tmp_path, n=10, two_groups=False):
        ann = [{"id": i} for i in range(n)]
        p1 = tmp_path / "a.json"
        p1.write_text(json.dumps(ann))
        meta = [{"path": str(p1), "type": "g1"}]
        if two_groups:
            p2 = tmp_path / "b.jsonl"
            p2.write_text("\n".join(json.dumps({"id": 100 + i}) for i in range(n)))
            meta.append({"path": str(p2), "type": "g2"})
        cfg = tmp_path / "data.yaml"
        cfg.write_text(json.dumps({"META": meta}))
        return str(cfg)

    def test_basic(self, tmp_path):
        ds = MetaDataset(self._write_config(tmp_path), _IndexProcessor())
        assert len(ds) == 10
        assert ds[3] == 3

    def test_jsonl_and_groups(self, tmp_path):
        ds = MetaDataset(self._write_config(tmp_path, two_groups=True), _IndexProcessor())
        assert len(ds) == 20
        assert len(ds.groups()) == 2

    def test_error_retries_neighbor_same_group(self, tmp_path):
        ds = MetaDataset(
            self._write_config(tmp_path, two_groups=True), _IndexProcessor(fail_indices={105})
        )
        # index 15 -> item id 105 fails -> falls back to index 14 (same group)
        assert ds[15] == 104

    def test_error_at_group_start_wraps(self, tmp_path):
        ds = MetaDataset(
            self._write_config(tmp_path, two_groups=True), _IndexProcessor(fail_indices={100})
        )
        # first item of group 2 fails -> wraps to last of group 2
        assert ds[10] == 109

    def test_h5_cache(self, tmp_path):
        os.chdir(tmp_path)
        cfg = self._write_config(tmp_path)
        ds = MetaDataset(cfg, _IndexProcessor(), cache_on_disk=True, rank=0)
        assert len(ds) == 10 and ds[2] == 2
        # second construction hits the cache
        ds2 = MetaDataset(cfg, _IndexProcessor(), cache_on_disk=True, rank=1)
        assert ds2[2] == 2


class TestResumableSampler:
    def test_disjoint_ranks_cover_batch(self):
        it0 = resumable_sampler_indices(100, 8, rank=0, world_size=2, seed=1)
        it1 = resumable_sampler_indices(100, 8, rank=1, world_size=2, seed=1)
        a = [next(it0) for _ in range(4)]
        b = [next(it1) for _ in range(4)]
        assert len(set(a) & set(b)) == 0

    def test_resume_skips(self):
        full = resumable_sampler_indices(100, 8, 0, 2, seed=1, start_step=0)
        ref = [next(full) for _ in range(20)]
        resumed = resumable_sampler_indices(100, 8, 0, 2, seed=1, start_step=3)
        got = [next(resumed) for _ in range(8)]
        assert got == ref[12:20]  # 3 steps * 4 per-rank items skipped

    def test_epochs_reshuffle(self):
        it = resumable_sampler_indices(8, 8, 0, 1, seed=1)
        e0 = [next(it) for _ in range(8)]
        e1 = [next(it) for _ in range(8)]
        assert sorted(e0) == sorted(e1) == list(range(8))
        assert e0 != e1


class TestLoader:
    def test_threaded_prefetch_order(self):
        out = list(threaded_prefetch(iter(range(50)), lambda i: i * 2, num_workers=4))
        assert out == [i * 2 for i in range(50)]

    def test_bucket_batched(self):
        items = [((16, 16), i) for i in range(5)] + [((8, 32), 100 + i) for i in range(3)]
        # interleave
        stream = [items[i // 2] if i % 2 == 0 and i // 2 < 5 else None for i in range(10)]
        stream = items  # simple order
        out = list(bucket_batched(iter(stream), 2, lambda b: b))
        keys = [k for k, _ in out]
        assert all(k in ((16, 16), (8, 32)) for k in keys)
        for k, batch in out:
            assert len(batch) == 2

    def test_imagenet_folder(self, tmp_path):
        for cls in ("n01", "n02"):
            d = tmp_path / cls
            d.mkdir()
            for i in range(2):
                Image.new("RGB", (8, 8)).save(d / f"{i}.png")
        samples, classes = list_imagenet_folder(str(tmp_path))
        assert classes == ["n01", "n02"]
        assert len(samples) == 4
        assert samples[0][1] == 0 and samples[-1][1] == 1

    def test_collate(self):
        items = [(np.zeros((3, 4, 4)), 1), (np.ones((3, 4, 4)), 2)]
        batch = collate_image_label(items)
        assert batch["x"].shape == (2, 3, 4, 4)
        assert batch["y"].tolist() == [1, 2]


class TestT2IItemProcessor:
    def test_process(self, tmp_path):
        img_path = tmp_path / "x.png"
        Image.new("RGB", (8, 8)).save(img_path)
        proc = T2IItemProcessor()
        img, text = proc.process_item({"path": str(img_path), "prompt": "hello"})
        assert img.size == (8, 8) and text == "hello"

    def test_conversations_caption(self, tmp_path):
        img_path = tmp_path / "x.png"
        Image.new("RGB", (8, 8)).save(img_path)
        proc = T2IItemProcessor()
        _, text = proc.process_item(
            {"image": str(img_path), "conversations": [{"value": "q"}, {"value": "a caption"}]}
        )
        assert text == "a caption"


class TestTokenizedT2IItemProcessor:
    class _FakeTok:
        def encode(self, text, truncation=False):
            return [1] + [(ord(c) % 200) + 2 for c in text] + [2]  # bos/eos style

    def test_tokenize_and_pad(self, tmp_path):
        from lumina_t2x_tpu.data.dataset import TokenizedT2IItemProcessor

        img_path = tmp_path / "x.png"
        Image.new("RGB", (8, 8)).save(img_path)
        proc = TokenizedT2IItemProcessor(None, self._FakeTok(), max_words=16)
        img, ids, mask = proc.process_item({"path": str(img_path), "prompt": "hello"})
        assert ids.shape == (16,) and mask.shape == (16,)
        assert mask.sum() == len("hello") + 2
        assert (ids[mask.sum():] == 0).all()

    def test_truncation(self, tmp_path):
        from lumina_t2x_tpu.data.dataset import TokenizedT2IItemProcessor

        img_path = tmp_path / "x.png"
        Image.new("RGB", (8, 8)).save(img_path)
        proc = TokenizedT2IItemProcessor(None, self._FakeTok(), max_words=4)
        _, ids, mask = proc.process_item({"path": str(img_path), "prompt": "a very long caption"})
        assert ids.shape == (4,) and mask.sum() == 4

    def test_text_dropout(self, tmp_path):
        from lumina_t2x_tpu.data.dataset import TokenizedT2IItemProcessor

        img_path = tmp_path / "x.png"
        Image.new("RGB", (8, 8)).save(img_path)
        proc = TokenizedT2IItemProcessor(None, self._FakeTok(), text_dropout_prob=1.0,
                                         max_words=8)
        _, ids, mask = proc.process_item({"path": str(img_path), "prompt": "hello"},
                                         training_mode=True)
        assert mask.sum() == 2  # bos + eos only


class TestBucketBatchedGlobal:
    """Cross-rank-consistent bucketing (`loader.bucket_batched_global`):
    identical bucket-key sequences on every rank, per-bucket index striping,
    full batches only, and decode-free resume skip."""

    @staticmethod
    def _run_rank(rank, world, *, skip=0, n_items=96, gbs=8, seed=0):
        from lumina_t2x_tpu.data.loader import bucket_batched_global

        fetched = []

        def bucket_of(idx):
            return ("A", "B", "C")[idx % 3]

        def fetch(idx, key):
            fetched.append(idx)
            return (idx, key)

        def collate(items):
            return items

        gen = bucket_batched_global(
            iter(range(n_items)), bucket_of, gbs, rank=rank, world_size=world,
            fetch=fetch, collate=collate, num_workers=2, skip_batches=skip)
        return list(gen), fetched

    def test_ranks_agree_on_keys_and_stripe_indices(self):
        world = 2
        out0, _ = self._run_rank(0, world)
        out1, _ = self._run_rank(1, world)
        assert [k for k, _ in out0] == [k for k, _ in out1]
        assert len(out0) == 96 // 8
        for (k0, b0), (k1, b1) in zip(out0, out1):
            ids = sorted(i for i, _ in b0 + b1)
            # together the two ranks hold the full global batch, disjointly
            assert len(ids) == 8 and len(set(ids)) == 8
            assert all(key == k0 for _, key in b0 + b1)
            # every item in the batch maps to the batch's bucket
            assert all(("A", "B", "C")[i % 3] == k0 for i in ids)
            # each rank holds exactly its stride share
            assert len(b0) == len(b1) == 4

    def test_full_batches_only(self):
        out, _ = self._run_rank(0, 1, n_items=100, gbs=8)
        # 100 items over 3 buckets: only FULL global batches emerge; the
        # ragged per-bucket tails are never emitted as partial batches
        assert all(len(b) == 8 for _, b in out)

    def test_skip_batches_is_decode_free(self):
        full, fetched_full = self._run_rank(0, 1, skip=0)
        skipped, fetched_skip = self._run_rank(0, 1, skip=3)
        assert skipped == full[3:]
        # the skipped batches' items were never fetched
        assert len(fetched_skip) == len(fetched_full) - 3 * 8

    def test_choose_bucket_rank_invariant_and_diverse(self):
        from lumina_t2x_tpu.data.imgproc import choose_bucket, generate_crop_size_list

        crops = generate_crop_size_list(16, 16)
        picks = [choose_bucket(640, 480, crops, seed=0, index=i) for i in range(64)]
        again = [choose_bucket(640, 480, crops, seed=0, index=i) for i in range(64)]
        assert picks == again  # deterministic per (seed, index) on any rank
        assert len(set(picks)) > 1  # still an augmentation across items
        other_seed = [choose_bucket(640, 480, crops, seed=1, index=i) for i in range(64)]
        assert other_seed != picks

    def test_meta_dataset_image_size(self, tmp_path):
        import json

        import yaml
        from PIL import Image

        from lumina_t2x_tpu.data.dataset import MetaDataset, T2IItemProcessor

        img_path = tmp_path / "img.png"
        Image.new("RGB", (37, 23)).save(img_path)
        ann = [
            {"path": str(img_path), "prompt": "a"},            # header probe
            {"path": str(img_path), "width": 640, "height": 480, "prompt": "b"},
            {"path": str(img_path), "resolution": "800x600", "prompt": "c"},
        ]
        ann_path = tmp_path / "ann.json"
        ann_path.write_text(json.dumps(ann))
        cfg = tmp_path / "meta.yaml"
        cfg.write_text(yaml.safe_dump({"META": [{"path": str(ann_path)}]}))
        ds = MetaDataset(str(cfg), T2IItemProcessor(None))
        assert ds.image_size(0) == (37, 23)
        assert ds.image_size(1) == (640, 480)
        assert ds.image_size(2) == (800, 600)
        assert ds.image_size(0) == (37, 23)  # memoized path


class TestRawImageItem:
    """`MetaDataset.raw_image_item` — the byte-level accessor the native
    C++ decode path in `pipelines/train.t2i_batches` consumes."""

    def _ds(self, tmp_path):
        import json

        import yaml
        from PIL import Image

        from lumina_t2x_tpu.data.dataset import MetaDataset, T2IItemProcessor

        good = tmp_path / "img.jpg"
        Image.new("RGB", (64, 48), (200, 30, 30)).save(good, quality=90)
        ann = [
            {"path": str(good), "prompt": "a red image"},
            {"path": str(tmp_path / "missing.jpg"), "prompt": "broken"},
            {"image": str(good),
             "conversations": [{"value": "q"}, {"value": "the answer caption"}]},
        ]
        ann_path = tmp_path / "ann.json"
        ann_path.write_text(json.dumps(ann))
        cfg = tmp_path / "meta.yaml"
        cfg.write_text(yaml.safe_dump({"META": [{"path": str(ann_path)}]}))
        return MetaDataset(str(cfg), T2IItemProcessor(None)), good

    def test_bytes_and_caption(self, tmp_path):
        ds, good = self._ds(tmp_path)
        data, caption = ds.raw_image_item(0)
        assert data == good.read_bytes()
        assert caption == "a red image"
        # conversations caption key (the reference's chat-format datasets)
        _, cap2 = ds.raw_image_item(2)
        assert cap2 == "the answer caption"

    def test_failed_item_falls_back_to_neighbor(self, tmp_path):
        ds, good = self._ds(tmp_path)
        data, caption = ds.raw_image_item(1)  # missing file -> index 0
        assert data == good.read_bytes() and caption == "a red image"

    def test_native_decode_matches_bucket_shape(self, tmp_path):
        from lumina_t2x_tpu.data import native_loader as nl

        if not nl.native_available():
            import pytest

            pytest.skip("native toolchain unavailable")
        ds, _ = self._ds(tmp_path)
        data, _ = ds.raw_image_item(0)
        assert nl.probe_size(data) == (64, 48)
        arr = nl.decode_to_tensor(data, (32, 16), (0, 0))
        assert arr.shape == (3, 16, 32)
        assert float(arr.min()) >= -1.0 and float(arr.max()) <= 1.0
