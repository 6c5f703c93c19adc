"""Dataset layer: YAML-meta datasets, item processors, deterministic
resumable sampling.

Behavior parity with `lumina_next_t2i/data/dataset.py:20-189` and
`train.py:61-104`:

- `MetaDataset`: YAML config (`META: [{path, type, root, ratio}]`) over
  json/jsonl annotation lists; per-group index ranges; optional h5 disk cache
  built once by the lead process with a `ready` sentinel other processes poll
  (`dataset.py:111-155`);
- error handling: a failing item logs and substitutes a neighboring index
  within the same meta group (`dataset.py:166-186`);
- `ItemProcessor` / `T2IItemProcessor` abstraction (`train.py:61-77`);
- `resumable_sampler_indices`: infinite shuffled index stream strided by
  dp-rank, epoch-seeded, offset-corrected for resume (`train.py:91-104`).

This layer is framework-agnostic Python (no torch DataLoader); batching into
static shape buckets happens in `data/loader.py`.
"""

from __future__ import annotations

import copy
import json
import logging
import os
import random
import traceback
import warnings
from abc import ABC, abstractmethod
from pathlib import Path
from time import sleep
from typing import Iterator, List, Optional

import numpy as np
import yaml

logger = logging.getLogger(__name__)


class DataBriefReportException(Exception):
    def __init__(self, message=None):
        self.message = message

    def __str__(self):
        return f"{self.__class__}: {self.message}"


class ItemProcessor(ABC):
    @abstractmethod
    def process_item(self, data_item, training_mode=False):
        raise NotImplementedError


class T2IItemProcessor(ItemProcessor):
    """Decode (image, caption) pairs (`train.py:61-77`): image path via
    'path'/'image_url'/'image', caption from 'conversations' or
    'prompt'/'caption'."""

    def __init__(self, transform=None):
        self.transform = transform

    def process_item(self, data_item, training_mode=False):
        from PIL import Image

        for key in ("path", "image_url", "image"):
            if key in data_item:
                image = Image.open(data_item[key]).convert("RGB")
                break
        else:
            raise DataBriefReportException(f"no image path in item: {list(data_item)}")
        if "conversations" in data_item:
            text = data_item["conversations"][-1]["value"]
        else:
            text = data_item.get("prompt", data_item.get("caption", ""))
        if self.transform is not None:
            image = self.transform(image)
        return image, text


class TokenizedT2IItemProcessor(ItemProcessor):
    """Dataset-side tokenization (the lumina_t2i 5B pattern,
    `lumina_t2i/train.py:56-93`): caption -> (image, token_ids, token_mask)
    with bos/eos, fixed max_words (default 128), zero-padded (padded tokens
    are masked out downstream), and text dropout applied before tokenizing.
    """

    def __init__(self, transform, tokenizer, text_dropout_prob: float = 0.0,
                 max_words: int = 128):
        self.transform = transform
        self.tokenizer = tokenizer
        self.text_dropout_prob = text_dropout_prob
        self.max_words = max_words

    def process_item(self, data_item, training_mode=False):
        from PIL import Image

        from .data_reader import read_general

        if "conversations" in data_item:
            image = Image.open(read_general(data_item["image"])).convert("RGB")
            text = data_item["conversations"][-1]["value"]
        else:
            image = Image.open(read_general(data_item["path"])).convert("RGB")
            text = data_item.get("prompt", data_item.get("caption", ""))
        if self.transform is not None:
            image = self.transform(image)
        if training_mode and random.uniform(0.0, 1.0) < self.text_dropout_prob:
            text = ""
        ids = self.tokenizer.encode(text, truncation=False)
        token_mask = (np.arange(self.max_words) < len(ids)).astype(np.int32)
        if len(ids) < self.max_words:
            ids = ids + [0] * (self.max_words - len(ids))
        else:
            ids = ids[: self.max_words]
        return image, np.asarray(ids, np.int32), token_mask


class MetaDataset:
    """YAML-meta dataset (`dataset.py:34-189`)."""

    def __init__(self, config_path, item_processor: ItemProcessor, cache_on_disk=False,
                 rank: int = 0):
        with open(config_path) as f:
            self.config = yaml.safe_load(f)
        self.cache_on_disk = cache_on_disk
        if cache_on_disk:
            cache_dir = self._get_cache_dir(config_path)
            if rank == 0:
                self._collect_annotations_and_save_to_cache(cache_dir)
            ann, group_indice_range = self._load_annotations_from_cache(cache_dir, rank)
        else:
            ann, group_indice_range = self._collect_annotations()
        self.ann = ann
        self.group_indices = {k: list(range(v[0], v[1])) for k, v in group_indice_range.items()}
        self.item_processor = item_processor

    def __len__(self):
        return len(self.ann)

    def _collect_annotations(self):
        group_ann = {}
        for meta in self.config["META"]:
            meta_path, meta_type = meta["path"], meta.get("type", "default")
            ext = os.path.splitext(meta_path)[-1]
            if ext == ".json":
                with open(meta_path) as f:
                    meta_l = json.load(f)
            elif ext == ".jsonl":
                meta_l = []
                with open(meta_path) as f:
                    for i, line in enumerate(f):
                        try:
                            meta_l.append(json.loads(line))
                        except json.decoder.JSONDecodeError:
                            logger.error(f"Error decoding jsonl line ({i}): {line.rstrip()}")
                            raise
            else:
                raise NotImplementedError(f'Unknown meta file extension: "{ext}"')
            if "ratio" in meta:
                random.seed(0)
                meta_l = random.sample(meta_l, int(len(meta_l) * meta["ratio"]))
            if "root" in meta:
                for item in meta_l:
                    for path_key in ("path", "image_url", "image"):
                        if path_key in item:
                            item[path_key] = os.path.join(meta["root"], item[path_key])
            group_ann.setdefault(meta_type, []).extend(meta_l)

        ann = sum(list(group_ann.values()), start=[])
        group_indice_range, start = {}, 0
        for meta_type, meta_l in group_ann.items():
            group_indice_range[meta_type] = [start, start + len(meta_l)]
            start += len(meta_l)
        return ann, group_indice_range

    def _collect_annotations_and_save_to_cache(self, cache_dir):
        import h5py

        if (Path(cache_dir) / "data.h5").exists() and (Path(cache_dir) / "ready").exists():
            warnings.warn(f"Use existing h5 data cache: {cache_dir}")
            return
        Path(cache_dir).mkdir(parents=True, exist_ok=True)
        ann, group_indice_range = self._collect_annotations()
        serialized = [json.dumps(a) for a in ann]
        with h5py.File(Path(cache_dir) / "data.h5", "w") as f:
            dt = h5py.vlen_dtype(str)
            h5_ann = f.create_dataset("ann", (len(serialized),), dtype=dt)
            h5_ann[:] = serialized
            f.create_dataset("group_indice_range", data=json.dumps(group_indice_range))
        with open(Path(cache_dir) / "ready", "w") as f:
            f.write("ready")

    @staticmethod
    def _get_cache_dir(config_path):
        ident = config_path
        for ch in ("/", "\\", ".", "?", "!"):
            ident = ident.replace(ch, "-")
        return f"./accessory_data_cache/{ident}"

    @staticmethod
    def _load_annotations_from_cache(cache_dir, rank):
        import h5py

        while not (Path(cache_dir) / "ready").exists():
            assert rank != 0
            sleep(1)
        cache_file = h5py.File(Path(cache_dir) / "data.h5", "r")
        annotations = cache_file["ann"]
        group_indice_range = json.loads(cache_file["group_indice_range"].asstr()[()])
        return annotations, group_indice_range

    def get_item_func(self, index):
        data_item = self.ann[index]
        data_item = json.loads(data_item) if self.cache_on_disk else copy.deepcopy(data_item)
        return self.item_processor.process_item(data_item, training_mode=True)

    def __getitem__(self, index):
        try:
            return self.get_item_func(index)
        except Exception as e:
            if isinstance(e, DataBriefReportException):
                logger.info(str(e))
            else:
                logger.info(
                    f"Item {index} errored, annotation:\n{self.ann[index]}\n"
                    f"Error:\n{traceback.format_exc()}"
                )
            for indices in self.group_indices.values():
                if indices[0] <= index <= indices[-1]:
                    new_index = indices[-1] if index == indices[0] else index - 1
                    return self[new_index]
            raise RuntimeError

    def groups(self):
        return list(self.group_indices.values())


def resumable_sampler_indices(
    dataset_len: int,
    global_batch_size: int,
    rank: int,
    world_size: int,
    seed: int = 0,
    start_step: int = 0,
) -> Iterator[int]:
    """Deterministic resumable infinite index stream (`train.py:91-104`):
    epoch-seeded shuffles, strided by dp-rank, fast-forwarded by
    `start_step * global_batch_size / world_size` items on resume."""
    per_rank = global_batch_size // world_size
    skip = start_step * per_rank
    epoch = 0
    epoch_len = dataset_len - dataset_len % global_batch_size  # drop ragged tail
    while True:
        g = np.random.default_rng(seed + epoch)
        perm = g.permutation(dataset_len)[:epoch_len]
        local = perm[rank::world_size]
        for idx in local:
            if skip > 0:
                skip -= 1
                continue
            yield int(idx)
        epoch += 1
