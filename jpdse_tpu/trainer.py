"""Trainer orchestration — the framework's equivalent of the reference trainer
protocol (ctu/trainers/base_trainer.py:25-87 + pix2pixHD_trainer.py:11-176):
``step`` / ``get_eval_loss`` / ``get_img`` / ``get_code`` / ``get_eval_rate``
/ ``save`` / ``load`` / ``scheduler_step``, built on the jitted step functions
and a single train-state PyTree.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from jpdse_tpu.config import Config
from jpdse_tpu.models import SemanticCodec, build_discriminator, prepare_inputs
from jpdse_tpu.models.vgg import init_vgg19
from jpdse_tpu.train.checkpoint import restore_checkpoint, save_checkpoint
from jpdse_tpu.train.schedule import ReduceLROnPlateau
from jpdse_tpu.train.state import GANTrainState, create_train_state, set_lr
from jpdse_tpu.train.step import (
    make_codes_fn,
    make_eval_step,
    make_infer_fn,
    make_rate_fn,
    make_shaped_codes_fn,
    make_train_step,
)

DEVICE_KEYS = ("label", "instance", "image", "compressed")


def device_batch(batch: Dict) -> Dict:
    """Strip host-only fields; jit moves arrays on call."""
    return {k: batch[k] for k in DEVICE_KEYS if k in batch}


class Trainer:
    def __init__(self, cfg: Config, mode: str = "train", sample_batch: Optional[Dict] = None):
        if cfg.optim.fp16 and cfg.model.compute_dtype == "float32":
            # the reference's apex-AMP flag; the TPU analog is bf16 compute
            cfg.model.compute_dtype = "bfloat16"
        cfg.validate()  # fail with a clean message before any tracing
        self.cfg = cfg
        self.mode = mode
        self.codec = SemanticCodec(cfg)
        self.start_epoch = 0
        self.sched: Optional[ReduceLROnPlateau] = None

        # multi-chip: build the (data, spatial) mesh when the config asks for
        # one (--data_axis / --spatial_axis); params replicate, batches shard,
        # XLA inserts the collectives (grad psums over 'data', conv halo
        # exchanges over 'spatial'). Under a multi-process run (jax.distributed
        # initialized at entry — platform.init_distributed) the mesh grows a
        # leading 'dcn' axis spanning hosts: only the gradient psum crosses
        # DCN, everything else stays on ICI.
        from jpdse_tpu.parallel.mesh import mesh_from_config

        self._multihost = jax.process_count() > 1
        self._shard_spatial = cfg.parallel.spatial_axis > 1
        if self._multihost:
            from jpdse_tpu.parallel import distributed as dist

            self.mesh = dist.make_dcn_mesh(
                cfg.parallel.data_axis, max(1, cfg.parallel.spatial_axis)
            )
            print(
                f"multi-host mesh: dcn={self.mesh.shape['dcn']} x "
                f"data={self.mesh.shape['data']} x "
                f"spatial={self.mesh.shape['spatial']} "
                f"(process {jax.process_index()}/{jax.process_count()}; "
                f"batch_size is per-host)"
            )
        else:
            self.mesh = mesh_from_config(cfg.parallel)
            if self.mesh is not None:
                print(
                    f"device mesh: data={self.mesh.shape['data']} x "
                    f"spatial={self.mesh.shape['spatial']}"
                )
        if self.mesh is not None:
            if mode == "train" and cfg.data.batch_size % self.mesh.shape["data"]:
                raise ValueError(
                    f"batch_size {cfg.data.batch_size} not divisible by "
                    f"data_axis {self.mesh.shape['data']}"
                )

        if sample_batch is None:
            sample_batch = self._synthetic_batch()
        sample_batch = device_batch(sample_batch)

        rngs = {
            "params": jax.random.PRNGKey(cfg.optim.seed or 0),
            "binarize": jax.random.PRNGKey(1),
            "dropout": jax.random.PRNGKey(2),
        }
        inputs = prepare_inputs(
            cfg,
            sample_batch.get("label"),
            sample_batch.get("instance"),
            sample_batch["image"],
            sample_batch.get("compressed"),
        )
        # local_devices: under multi-host, jax.devices()[0] belongs to
        # process 0 and is NOT addressable from other processes
        with jax.default_device(jax.local_devices()[0]):
            variables = self.codec.init(rngs, inputs, method=SemanticCodec.decode)
        params_g = variables["params"]
        # non-param collections (BatchNorm running stats under --norm batch)
        mstate_g = {k: v for k, v in variables.items() if k != "params"}

        self.disc = build_discriminator(cfg)
        params_d = None
        mstate_d = {}
        if mode == "train":
            fake_shape = list(sample_batch["image"].shape)
            fake_shape[-1] = cfg.data.num_out_channels
            d_in_c = cfg.netD_input_nc
            d_in = jnp.zeros(fake_shape[:3] + [d_in_c], jnp.float32)
            vars_d = self.disc.init(jax.random.PRNGKey(3), d_in)
            params_d = vars_d["params"]
            mstate_d = {k: v for k, v in vars_d.items() if k != "params"}
        else:
            params_d = {}

        pool_shape = None
        if cfg.model.pool_size > 0:
            h, w = sample_batch["image"].shape[1:3]
            pool_shape = (h, w, cfg.netD_input_nc)
        self.state = create_train_state(
            cfg, params_g, params_d, pool_shape, mstate_g, mstate_d
        )
        self.state = self._replicate_state(self.state)

        vgg_apply = None
        if mode == "train" and not cfg.loss.no_vgg_loss:
            vgg_model, vgg_vars = init_vgg19(0, cfg.loss.vgg_weights_path)
            if cfg.optim.vgg_bf16:
                # opt-in bf16 perceptual trunk (optim.vgg_bf16): weights cast
                # once here, module computes in bf16; the slice L1s still
                # reduce fp32 (losses.vgg_loss)
                from jpdse_tpu.models.vgg import Vgg19Features

                vgg_model = Vgg19Features(dtype=jnp.bfloat16)
                vgg_vars = jax.tree.map(
                    lambda a: a.astype(jnp.bfloat16), vgg_vars
                )
            vgg_apply = lambda x: vgg_model.apply(vgg_vars, x)  # noqa: E731
        self._vgg_apply = vgg_apply
        self._global_frozen = (
            mode == "train"
            and cfg.model.netG == "local"
            and cfg.model.niter_fix_global > 0
        )
        self._train_step = (
            make_train_step(
                cfg, self.codec, self.disc, vgg_apply,
                freeze_global=self._global_frozen,
            )
            if mode == "train"
            else None
        )
        self._eval_step = make_eval_step(cfg, self.codec)
        self._infer = make_infer_fn(cfg, self.codec)
        self._codes = make_codes_fn(cfg, self.codec)
        self._codes_shaped = make_shaped_codes_fn(cfg, self.codec)
        self._rate = make_rate_fn(cfg, self.codec)
        self._decode_codes = None  # built lazily by decompress()
        self._rng = jax.random.PRNGKey(cfg.optim.seed or 0)
        # the fast path is built LAZILY on first use (_fast property): it
        # fetches the whole params tree to host, which must happen once, on
        # the final (loaded) weights — not at __init__ where load() would
        # immediately invalidate it (and device->host is ~100KB/s on the
        # axon relay)
        self._fast_built = False
        self._fast_codec = None

        if mode == "train" and cfg.optim.schedule_lr:
            self.sched = ReduceLROnPlateau(
                lr=cfg.optim.lr,
                factor=cfg.optim.lr_decay_factor,
                patience=cfg.optim.lr_decay_patience,
            )

    # ------------------------------------------------------------------
    @property
    def _fast(self):
        """--fast_inference: route deterministic eval through the
        space-to-depth optimized codec (models/fast_codec.py; measured 33.6
        vs 24.3 MP/s/chip at batch 8 on v5e). Numerically equivalent up to
        bf16 reassociation. Falls back to the standard path for unsupported
        configs (grouped/pooled encoders, batch norm; netG 'global' and
        'local' are both covered).
        Under a device mesh the transformed weights replicate and batches
        shard exactly like the standard path — the fast codec is pure jit,
        so GSPMD inserts the cross-shard InstanceNorm reductions and conv
        halos (multi-chip serving rides the fast path too; sharded ==
        single-device pinned in tests/test_parallel.py). Built lazily on
        first use so the one params-to-host fetch happens on the final
        (loaded) weights."""
        if self._fast_built:
            return self._fast_codec
        self._fast_built = True
        if not (self.cfg.model.fast_inference and self.mode != "train"):
            return None
        try:
            from jpdse_tpu.models.fast_codec import FastCodec

            host_params = jax.tree.map(np.asarray, self.state.params_g)
            self._fast_codec = FastCodec(
                self.cfg, host_params, sharded=self.mesh is not None
            )
            if self.mesh is not None:
                from jpdse_tpu.parallel.mesh import replicated

                self._fast_codec.weights = jax.device_put(
                    self._fast_codec.weights, replicated(self.mesh)
                )
            print("fast inference path enabled (space-to-depth codec)")
        except (ValueError, KeyError) as e:
            # KeyError: a structurally unexpected params tree (e.g. after a
            # partial cross-phase restore) must also fall back, not crash eval
            print(f"fast_inference unavailable for this config "
                  f"({type(e).__name__}: {e}); using the standard path")
        return self._fast_codec

    def _shaped_codes(self, batch: Dict) -> List:
        if self._fast is not None:
            return self._fast.get_codes_shaped(self._place(batch))
        return self._codes_shaped(self.state.params_g, self._mg(), self._place(batch))

    def _replicate_state(self, state):
        if self.mesh is None:
            return state
        from jpdse_tpu.parallel.mesh import replicated

        return jax.device_put(state, replicated(self.mesh))

    def _place(self, batch: Dict, local_is_shard: bool = False) -> Dict:
        """Strip host fields and place onto the device(s). Idempotent:
        already-placed arrays are passed through (device_put no-ops on a
        matching placement), so prefetch_to_device pre-placing via this
        function costs nothing at step time. ``local_is_shard`` (multi-host
        only): True for train batches (each host feeds a disjoint rank
        shard → concatenated over 'dcn'), False for eval batches (every
        host holds the same unsharded batch → fully replicated so outputs
        stay locally fetchable)."""
        b = device_batch(batch)
        if self._multihost:
            from jpdse_tpu.parallel.distributed import make_global_batch_flexible

            return make_global_batch_flexible(
                b, self.mesh, self._shard_spatial, local_is_shard=local_is_shard
            )
        if self.mesh is not None:
            from jpdse_tpu.parallel.mesh import shard_batch_flexible

            return shard_batch_flexible(b, self.mesh, self._shard_spatial)
        return {
            k: v if isinstance(v, jax.Array) else jax.device_put(np.asarray(v))
            for k, v in b.items()
        }

    def _synthetic_batch(self) -> Dict:
        cfg = self.cfg
        pp = cfg.data.preprocess
        if pp.preprocess_mode == "fixed":
            w = pp.crop_size
            h = round(pp.crop_size / pp.aspect_ratio)
        else:
            w = h = pp.crop_size
        b = cfg.data.batch_size
        batch = {"image": np.zeros((b, h, w, 3), np.float32)}
        if not cfg.model.no_label:
            batch["label"] = np.zeros((b, h, w), np.float32)
        if not cfg.model.no_instance:
            batch["instance"] = np.zeros((b, h, w), np.int32)
        if cfg.codec.use_compressed:
            c = 3 * len(cfg.codec.quality)
            batch["compressed"] = np.zeros((b, h, w, c), np.float32)
        return batch

    # -- trainer protocol ------------------------------------------------
    def step_async(self, batch: Dict):
        """One G+D update, WITHOUT synchronizing on the metrics: returns an
        opaque handle for :meth:`fetch_metrics`. The metrics ride as one
        stacked device array (a single fetch round trip instead of one per
        scalar), and the caller may delay the fetch by a step so the device
        runs ahead — on the TPU relay each host fetch costs ~0.2s of round
        trip, and the reference-style fetch-every-scalar-every-step loop
        measured 2.4s wall per 0.8s compute step (round-3 fix)."""
        self._rng, sub = jax.random.split(self._rng)
        self.state, metrics = self._train_step(
            self.state, self._place(batch, local_is_shard=True), sub
        )
        keys = sorted(metrics)
        return keys, jnp.stack([metrics[k] for k in keys])

    @staticmethod
    def fetch_metrics(handle) -> Dict[str, float]:
        keys, arr = handle
        vals = np.asarray(arr)
        return {k: float(v) for k, v in zip(keys, vals)}

    def step(self, batch: Dict) -> Dict[str, float]:
        """One G+D update; returns the loss dict (pix2pixHD_trainer.py:42-85)."""
        return self.fetch_metrics(self.step_async(batch))

    def get_eval_loss(self, batch: Dict) -> float:
        return float(
            self._eval_step(self.state.params_g, self._mg(), self._place(batch))
        )

    def get_img(self, batch: Dict) -> np.ndarray:
        if self._fast is not None:
            return np.asarray(self._fast.decode(self._place(batch)))
        return np.asarray(
            self._infer(self.state.params_g, self._mg(), self._place(batch))
        )

    def get_code(self, batch: Dict) -> np.ndarray:
        """Concatenated binary codes (pix2pixHD_trainer.py:100-103)."""
        if self._fast is not None:
            codes = self._fast.get_codes(self._place(batch))
        else:
            codes = self._codes(self.state.params_g, self._mg(), self._place(batch))
        if not codes:
            raise ValueError("no binarized module in this configuration")
        return np.concatenate([np.asarray(c) for c in codes], axis=-1)

    def get_code_and_contexts(
        self, batch: Dict
    ) -> Tuple[np.ndarray, np.ndarray, List[Tuple[int, int, int]]]:
        """(codes, contexts, shapes): concatenated flat binary codes
        (B, n_bits), the per-bit context ids (n_bits,) for the range coder's
        per-channel adaptive models, and the per-code (h, w, c) shapes the
        spatial-context coder needs. Both context schemes are fully derivable
        from config + image shape, so the decoder reconstructs them without
        side info."""
        from jpdse_tpu.codec_io import contexts_for_shapes

        shaped = self._shaped_codes(batch)
        if not shaped:
            raise ValueError("no binarized module in this configuration")
        shaped = [np.asarray(c) for c in shaped]
        flats = [c.reshape(c.shape[0], -1) for c in shaped]
        shapes = [c.shape[1:] for c in shaped]
        ctxs = contexts_for_shapes(shapes)
        return np.concatenate(flats, axis=-1), ctxs, shapes

    def _side_requirements(self):
        """See codec_io.side_requirements."""
        from jpdse_tpu import codec_io

        return codec_io.side_requirements(self.cfg)

    def compress(self, batch: Dict) -> List[bytes]:
        """Per-image .jpds bitstreams (codec_io format): binarized modules ->
        entropy-coded codes; raw branches (the reference's flagship phase-2
        recipe: raw semantics + base-codec visuals) -> v2 side-info sections
        (lossless label/instance PNGs + the base codec's own payload). The
        deploy-time encoder; every byte a receiver needs is in the file."""
        from jpdse_tpu import codec_io

        cfg = self.cfg
        need_label, need_inst, need_base = self._side_requirements()
        shaped = self._shaped_codes(batch) if cfg.has_binary_codes else []
        shaped = [np.asarray(c) for c in shaped]
        if not shaped and not (need_label or need_base):
            raise ValueError(
                "nothing to pack: no binarized module and no side info in "
                "this configuration"
            )
        if need_base and "base_codec_streams" not in batch:
            raise ValueError(
                "use_compressed batch lacks base_codec_streams — load data "
                "through the framework loader (data/paired.py)"
            )
        h, w = batch["image"].shape[1:3]

        sem_f = cfg.codec.sem_downsample

        def pack_one(j: int) -> bytes:
            side = codec_io.SideInfo()
            if need_label:
                # raw ids: codec_io.encode_idmap codes them losslessly
                # (a uint8 pre-cast would silently wrap >255-class label sets).
                # Reduced-rate semantics ship the small map; unpack restores
                # full resolution with the training-matched nearest kernel.
                side.label = codec_io.downsample_ids(
                    np.asarray(batch["label"][j]).astype(np.int32), sem_f
                )
            if need_inst:
                side.instance = codec_io.downsample_ids(
                    np.asarray(batch["instance"][j]).astype(np.int32), sem_f
                )
            if need_base:
                side.base_ext = batch["base_codec_ext"][j]
                side.base_payloads = list(batch["base_codec_streams"][j])
            return codec_io.pack(
                [c[j] for c in shaped], (h, w),
                side if not side.empty() else None,
            )

        b = batch["image"].shape[0]
        if b == 1:
            return [pack_one(0)]
        # the packing hot spots — the C range coder (ctypes) and PNG encode
        # (PIL) — both release the GIL, so images pack concurrently across
        # host cores (the serial coder is ~50 Mbit/s/core: ~11 ms per
        # flagship 256-Kbit code, which would otherwise stack per image
        # behind one batched device call)
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=min(8, b)) as ex:
            return list(ex.map(pack_one, range(b)))

    def _side_batch_from(self, bs) -> Optional[Dict]:
        """Reconstruct a loader-shaped batch dict from .jpds side info."""
        cfg, m = self.cfg, self.cfg.model
        need_label, need_inst, need_base = self._side_requirements()
        if not (need_label or need_inst or need_base):
            return None
        H, W = bs.image_hw
        side_batch: Dict = {"image": np.zeros((1, H, W, 3), np.float32)}
        if need_label:
            if bs.side.label is None:
                raise ValueError(
                    "bitstream lacks the label map this configuration needs"
                )
            side_batch["label"] = bs.side.label.astype(np.float32)[None]
        if need_inst:
            if bs.side.instance is None:
                raise ValueError(
                    "bitstream lacks the instance map this configuration needs"
                )
            side_batch["instance"] = bs.side.instance.astype(np.int32)[None]
        if need_base:
            if not bs.side.base_payloads:
                raise ValueError(
                    "bitstream lacks the base-codec payload this "
                    "configuration needs"
                )
            from jpdse_tpu.codecs.bridge import decode_bytes, normalize_decoded

            arrs = [
                normalize_decoded(
                    decode_bytes(p, bs.side.base_ext),
                    cfg.data.normalize_mean, cfg.data.normalize_std,
                )
                for p in bs.side.base_payloads
            ]
            side_batch["compressed"] = np.concatenate(arrs, axis=-1)[None]
        return side_batch

    def decompress(self, data: bytes) -> np.ndarray:
        """Decode one .jpds bitstream back to an image (H, W, C), using only
        the bitstream + model parameters. The deploy-time decoder."""
        from jpdse_tpu import codec_io

        bs = codec_io.unpack_full(data)
        codes = [jnp.asarray(c) for c in bs.codes]
        side_batch = self._side_batch_from(bs)
        if not codes:
            # all-raw configuration (e.g. the reference's phase-2 flagship):
            # the side info IS the bitstream; run the full decode path
            if side_batch is None:
                raise ValueError("empty bitstream: no codes and no side info")
            if self._fast is not None:
                return np.asarray(self._fast.decode(side_batch)[0])
            return np.asarray(
                self._infer(self.state.params_g, self._mg(), self._place(side_batch))[0]
            )
        if self._fast is not None:
            return np.asarray(self._fast.decode_from_codes(codes, side_batch)[0])
        if self._decode_codes is None:
            from jpdse_tpu.train.step import make_decode_from_codes_fn

            self._decode_codes = make_decode_from_codes_fn(self.cfg, self.codec)
        img = self._decode_codes(self.state.params_g, self._mg(), codes, side_batch)
        return np.asarray(img[0])

    def get_eval_rate(self, batch: Dict) -> Tuple[float, float]:
        """(shannon_bpp, actual_bpp) averaged over the batch, summed over
        codes (pix2pixHD_model.py:468-492). Computed fully on-device in one
        jitted call — a single two-scalar host fetch, not a per-code-per-image
        fetch loop."""
        s, a = self._rate(self.state.params_g, self._mg(), self._place(batch))
        return float(s), float(a)

    def _mg(self) -> Dict:
        return self.state.mstate_g if self.state.mstate_g is not None else {}

    def maybe_unfreeze_global(self, epoch: int):
        """After niter_fix_global epochs of enhancer-only training, also start
        fine-tuning the global trunk (update_fixed_params,
        pix2pixHD_model.py:795-804)."""
        if self._global_frozen and epoch >= self.cfg.model.niter_fix_global:
            print("------------ now also finetuning global generator -----------")
            self._global_frozen = False
            self._train_step = make_train_step(
                self.cfg, self.codec, self.disc, self._vgg_apply, freeze_global=False
            )

    def scheduler_step(self, val_loss: float):
        if self.sched is not None:
            new_lr = self.sched.step(val_loss)
            self.state = set_lr(self.state, new_lr)

    def save(self, epoch: int, val_loss: float):
        self.state = self.state.replace(
            best_val_loss=jnp.asarray(val_loss, jnp.float32)
        )
        meta = {}
        if self.sched is not None:
            meta["scheduler"] = self.sched.state_dict()
        # Under multi-host, EVERY process must call save — Orbax runs its own
        # cross-process barriers inside save(); the primary host writes.
        # save_checkpoint's to_host() materializes the replicated global
        # arrays on each host (fully-replicated arrays fetch locally).
        save_checkpoint(self.cfg.save_dir, self.state, epoch, meta)
        print(f"\ncheckpoint saved to {self.cfg.save_dir}\n")

    def save_latest(self, epoch: int):
        """Crash/watchdog resume point: the EXACT current state, saved
        unconditionally to save_dir/latest. Best-val gating (the reference's
        checkpoint semantics, train.py:129) is untouched — `latest` exists
        only so an interrupted run resumes losslessly; model selection still
        reads the best-val checkpoint in save_dir itself."""
        meta = {"latest": True}
        if self.sched is not None:
            meta["scheduler"] = self.sched.state_dict()
        latest_dir = os.path.join(self.cfg.save_dir, "latest")
        save_checkpoint(latest_dir, self.state, epoch, meta)
        print(f"\nlatest-state checkpoint saved to {latest_dir}\n")

    @staticmethod
    def _meta_epoch(ckpt_dir: str) -> int:
        from jpdse_tpu.train.checkpoint import META_FILE

        try:
            with open(os.path.join(ckpt_dir, META_FILE)) as f:
                import json

                return int(json.load(f).get("epoch", -1))
        except (OSError, ValueError):
            return -1

    def load(self):
        ckpt_dir = self.cfg.checkpoints_dir or self.cfg.save_dir
        # Same-directory resume (checkpoints_dir == save_dir, the chunked /
        # watchdog-restart case): continue from `latest` when it is newer
        # than the best-val checkpoint. Cross-phase warm starts (different
        # directory) keep the reference semantics: load the saved best.
        if (
            self.mode == "train"
            and self.cfg.save_dir
            and os.path.abspath(ckpt_dir) == os.path.abspath(self.cfg.save_dir)
        ):
            latest = os.path.join(ckpt_dir, "latest")
            if self._meta_epoch(latest) > self._meta_epoch(ckpt_dir):
                print("resuming from latest-state checkpoint (newer than best-val)")
                ckpt_dir = latest
        self.state, meta = restore_checkpoint(
            ckpt_dir, self.state, restore_opt=(self.mode == "train")
        )
        self.state = self._replicate_state(self.state)
        # invalidate any fast path built on pre-load weights
        self._fast_built = False
        self._fast_codec = None
        if self.mode == "train":
            self.start_epoch = int(meta.get("epoch", -1)) + 1
            if self.sched is not None and "scheduler" in meta:
                self.sched.load_state_dict(meta["scheduler"])
                self.state = set_lr(self.state, self.sched.lr)
        print(f"checkpoint loaded; starting from epoch {self.start_epoch + 1}")

    @property
    def current_lr(self) -> float:
        from jpdse_tpu.train.state import get_lr

        return get_lr(self.state)

    @property
    def best_val_loss(self) -> float:
        return float(self.state.best_val_loss)

    @property
    def steps_taken(self) -> int:
        return int(self.state.steps_taken)
