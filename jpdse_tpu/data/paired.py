"""Paired (image, label, instance) dataset base — the CTUDataset analog
(ctu/data/ctu_dataset.py:22-139).

Pure numpy/PIL host-side: natural-sorted paths with a pairing sanity check
(:36-49), one shared random parameter set so image / label / instance get the
identical crop + flip (:91-116), bicubic image / nearest id-map resampling,
255->num_labels unknown remap (:104-105), and an optional external-codec
round trip (the reference did this per step inside the model,
pix2pixHD_model.py:362-368 — here it's a pipeline stage).
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Tuple

import numpy as np
from PIL import Image

from jpdse_tpu.codecs.bridge import compress_for_model
from jpdse_tpu.config import Config
from jpdse_tpu.data.transforms import (
    apply_transform,
    image_to_normalized,
    instance_to_array,
    label_to_array,
    sample_params,
)
from jpdse_tpu.utils.misc import natural_sort, tensor2im


class PairedDataset:
    """Base class; subclasses implement get_paths / paths_match."""

    def __init__(self, cfg: Config):
        self.cfg = cfg
        label_paths, image_paths, instance_paths = self.get_paths(cfg)
        natural_sort(label_paths)
        natural_sort(image_paths)
        if not cfg.model.no_instance:
            natural_sort(instance_paths)
        n = cfg.data.max_dataset_size
        label_paths, image_paths, instance_paths = (
            label_paths[:n],
            image_paths[:n],
            instance_paths[:n],
        )
        if not cfg.data.no_pairing_check:
            for p1, p2 in zip(label_paths, image_paths):
                if not self.paths_match(p1, p2):
                    raise ValueError(
                        f"label/image pair {p1}, {p2} do not look paired; "
                        "use data.no_pairing_check to bypass"
                    )
        self.label_paths = label_paths
        self.image_paths = image_paths
        self.instance_paths = instance_paths
        # data.cache_images: memoize the decoded+resized (pre-flip,
        # pre-normalize) arrays per index. Only valid when the geometric
        # transform is deterministic (no random crop): 'fixed' and 'none'.
        self._cache: Dict[int, Tuple] = {}
        # base-codec round trips memoized per (index, flip) — deterministic
        # under cached preprocessing, and the in-process HEVC encode costs
        # ~1.3s per 1024x512 image on this 1-CPU host (it would otherwise
        # run per sample per training step)
        self._comp_cache: Dict[Tuple[int, bool], Tuple] = {}
        self._cache_enabled = cfg.data.cache_images and (
            cfg.data.preprocess.preprocess_mode in ("fixed", "none")
        )
        if cfg.data.cache_images and not self._cache_enabled:
            print(
                f"note: cache_images ignored for random-crop preprocess mode "
                f"{cfg.data.preprocess.preprocess_mode!r}"
            )

    # -- subclass hooks --------------------------------------------------
    def get_paths(self, cfg: Config) -> Tuple[List[str], List[str], List[str]]:
        raise NotImplementedError

    def paths_match(self, path1: str, path2: str) -> bool:
        f1 = os.path.splitext(os.path.basename(path1))[0]
        f2 = os.path.splitext(os.path.basename(path2))[0]
        return f1 == f2

    def postprocess(self, sample: Dict) -> Dict:
        return sample

    # ---------------------------------------------------------------------
    def __len__(self) -> int:
        return len(self.image_paths)

    def _load_triplet(self, index: int):
        image_path = self.image_paths[index]
        label_img = instance_img = None
        if not self.cfg.model.no_label:
            label_path = self.label_paths[index]
            if not self.paths_match(label_path, image_path):
                raise ValueError(f"label {label_path} / image {image_path} mismatch")
            label_img = Image.open(label_path)
        if not self.cfg.model.no_instance:
            instance_path = self.instance_paths[index]
            if not self.paths_match(instance_path, image_path):
                raise ValueError(f"instance {instance_path} / image {image_path} mismatch")
            instance_img = Image.open(instance_path)
        return Image.open(image_path), label_img, instance_img, image_path

    def _resized_arrays(self, index: int):
        """Decoded + geometrically-transformed (pre-flip, pre-normalize)
        arrays: (uint8 image HWC, label ids, instance ids, path). Memoized
        when cache_images is on (deterministic transforms only)."""
        cached = self._cache.get(index)
        if cached is not None:
            return cached
        cfg = self.cfg
        image, label, instance, image_path = self._load_triplet(index)
        pp = cfg.data.preprocess
        noflip = {"crop_pos": (0, 0), "flip": False}
        orig_size = image.size  # sample_params must see the ORIGINAL size so
        # the rng stream matches the uncached path bit-for-bit
        image_arr = np.asarray(
            apply_transform(image.convert("RGB"), pp, noflip, Image.BICUBIC, False),
            np.uint8,
        )
        label_arr = inst_arr = None
        if label is not None:
            label_arr = label_to_array(
                apply_transform(label, pp, noflip, Image.NEAREST, False),
                cfg.data.num_labels,
            )
        if instance is not None:
            inst_arr = instance_to_array(
                apply_transform(instance, pp, noflip, Image.NEAREST, False)
            )
        out = (image_arr, label_arr, inst_arr, image_path, orig_size)
        if self._cache_enabled:
            self._cache[index] = out
        return out

    def __getitem__(
        self,
        index: int,
        rng: Optional[np.random.Generator] = None,
        meta_only: bool = False,
    ) -> Dict:
        cfg = self.cfg
        rng = rng if rng is not None else np.random.default_rng()
        pp = cfg.data.preprocess
        is_train = cfg.is_train

        if meta_only:
            # Device-cache replay (data/device_cache.py): draw the SAME
            # seeded augmentation params the host path would, but return only
            # (index, flip, path) — the pixels are already resident on device.
            if not self._cache_enabled:
                raise ValueError("meta_only requires cache_images")
            _, _, _, image_path, orig_size = self._resized_arrays(index)
            params = sample_params(pp, orig_size, rng, cfg.data.no_flip)
            return {
                "index": np.int32(index),
                "flip": np.bool_(is_train and params["flip"]),
                "path": image_path,
            }

        if self._cache_enabled:
            # deterministic decode+resize memoized; flip + normalize per call
            image_u8, label_arr, inst_arr, image_path, orig_size = (
                self._resized_arrays(index)
            )
            params = sample_params(pp, orig_size, rng, cfg.data.no_flip)
            flip = is_train and params["flip"]
            if flip:
                image_u8 = image_u8[:, ::-1]
            mean = np.asarray(cfg.data.normalize_mean, np.float32)
            std = np.asarray(cfg.data.normalize_std, np.float32)
            image_arr = (image_u8.astype(np.float32) / 255.0 - mean) / std
            sample: Dict = {"image": image_arr, "path": image_path}
            if label_arr is not None:
                sample["label"] = label_arr[:, ::-1].copy() if flip else label_arr
            if inst_arr is not None:
                sample["instance"] = inst_arr[:, ::-1].copy() if flip else inst_arr
        else:
            image, label, instance, image_path = self._load_triplet(index)
            params = sample_params(pp, image.size, rng, cfg.data.no_flip)

            image = image.convert("RGB")
            image_t = apply_transform(image, pp, params, Image.BICUBIC, is_train)
            image_arr = image_to_normalized(
                image_t, cfg.data.normalize_mean, cfg.data.normalize_std
            )

            sample = {"image": image_arr, "path": image_path}

            if label is not None:
                label_t = apply_transform(label, pp, params, Image.NEAREST, is_train)
                sample["label"] = label_to_array(label_t, cfg.data.num_labels)
            if instance is not None:
                inst_t = apply_transform(instance, pp, params, Image.NEAREST, is_train)
                sample["instance"] = instance_to_array(inst_t)

        if cfg.codec.use_compressed:
            # external base codec round trip on the *transformed* image
            # (pix2pixHD_model.py:324-359); the exact bitstreams ride along so
            # the deploy encoder (trainer.compress) can embed them in .jpds
            # side info without re-encoding
            if self._cache_enabled:
                compressed, nbytes, streams, eff_ext = self._compressed_arrays(
                    index, flip
                )
            else:
                img_u8 = tensor2im(
                    image_arr, cfg.data.normalize_mean, cfg.data.normalize_std
                )
                compressed, nbytes, streams, eff_ext = compress_for_model(
                    img_u8,
                    cfg.codec.ext,
                    cfg.codec.quality,
                    cfg.data.normalize_mean,
                    cfg.data.normalize_std,
                    return_streams=True,
                )
            sample["compressed"] = compressed
            sample["base_codec_bytes"] = nbytes
            sample["base_codec_streams"] = streams
            sample["base_codec_ext"] = eff_ext

        return self.postprocess(sample)

    def _compressed_arrays(self, index: int, flip: bool):
        """Memoized base-codec round trip of the cached (resized) sample at
        the given flip: (normalized float32 (H, W, 3*len(quality)), total
        bytes, bitstreams, effective ext). Bit-identical to the inline path:
        normalize(flip(cached u8)) -> tensor2im -> compress_for_model, the
        exact op sequence __getitem__ performs."""
        key = (index, bool(flip))
        hit = self._comp_cache.get(key)
        if hit is not None:
            return hit
        cfg = self.cfg
        image_u8 = self._resized_arrays(index)[0]
        if flip:
            image_u8 = image_u8[:, ::-1]
        mean = np.asarray(cfg.data.normalize_mean, np.float32)
        std = np.asarray(cfg.data.normalize_std, np.float32)
        image_arr = (image_u8.astype(np.float32) / 255.0 - mean) / std
        img_u8 = tensor2im(
            image_arr, cfg.data.normalize_mean, cfg.data.normalize_std
        )
        out = compress_for_model(
            img_u8,
            cfg.codec.ext,
            cfg.codec.quality,
            cfg.data.normalize_mean,
            cfg.data.normalize_std,
            return_streams=True,
        )
        self._comp_cache[key] = out
        return out
