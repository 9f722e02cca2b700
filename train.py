#!/usr/bin/env python
"""Training entry point — same surface as the reference train.py:1-149:
epoch loop with per-batch trainer.step, periodic validation capped at
MAX_VAL_SIZE=30, ReduceLROnPlateau on val loss, best-val-gated checkpointing
(or --always_save), loss_log.txt, and an HTML gallery of reconstructions.

Example (the reference's phase-2 BPG recipe, scripts/pix2pixHD_bpg_train.sh):
  python train.py --dataset cityscapes --root_dir /data/cityscapes \\
    --model pix2pixHD --no_label_encoding --no_feat_encoding \\
    --no_generator_binarization --use_compressed --ext bpg --quality 33 \\
    --preprocess_mode fixed --load_size 1024 --crop_size 1024 \\
    --normalize_std '1.,1.,1.' --seed 1234 --save_dir runs/bpg33 --always_save
"""

import os
import time

import numpy as np

from jpdse_tpu.platform import honor_jax_platforms_env, init_distributed

honor_jax_platforms_env()
init_distributed()  # no-op unless a multi-process run is configured

from jpdse_tpu.cli import parse_config, print_config
from jpdse_tpu.config import derive_eval_config
from jpdse_tpu.data import create_dataloader
from jpdse_tpu.trainer import Trainer
from jpdse_tpu.utils.logging import MetricsLogger
from jpdse_tpu.utils.misc import count_params
from jpdse_tpu.utils.visualizer import HTMLGallery, Visualizer

MAX_VAL_SIZE = 30  # reference train.py:16


def host_rss_gb() -> float:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS"):
                return int(line.split()[1]) / 1048576
    return 0.0


def log(msg: str, log_file=None):
    print(msg)
    if log_file:
        with open(log_file, "a") as f:
            print(msg, file=f)


def validate(trainer, val_loader, log_file, cfg):
    print("\nvalidating...\n")
    total, n = 0.0, 0
    start = time.time()
    for i, batch in enumerate(val_loader):
        if i == MAX_VAL_SIZE:
            break
        loss = trainer.get_eval_loss(batch)
        total += loss
        n += 1
        end = time.time()
        print(
            f"batch {i + 1}/{len(val_loader)}, distortion ({cfg.loss.distortion_loss_fn}) "
            f"{loss:.4f}, batch processing time (s) {end - start:.4f}"
        )
        start = time.time()
    avg = total / max(n, 1)
    log(
        f"val set avg distortion ({cfg.loss.distortion_loss_fn}) {avg:.4f}", log_file
    )
    return avg


def dump_reconstructions(trainer, val_loader, cfg, gallery, visualizer, is_main=True):
    """Under multi-host, EVERY process must run this (the jitted decode is a
    collective over the global mesh); only the main process writes files."""
    print("\nsaving reconstructed val images...\n")
    # None = the reference's behavior: dump every image of the (<=30-batch)
    # val pass, reference train.py:129-147; an int caps dumped IMAGES
    limit = cfg.max_recon_dump
    n_dumped = 0
    for i, batch in enumerate(val_loader):
        if i == MAX_VAL_SIZE or (limit is not None and n_dumped >= limit):
            break
        n_dumped += batch["image"].shape[0]
        recon = trainer.get_img(batch)
        if not is_main:
            continue
        for j in range(recon.shape[0]):
            visuals = {}
            if not cfg.model.no_label:
                visuals["label"] = batch["label"][j]
            visuals["image"] = batch["image"][j]
            visuals["reconstructed_image"] = recon[j]
            visualizer.save_images(gallery, visuals, batch["path"][j])
        gallery.save()


def _run_epoch(trainer, loader, cfg, epoch, metrics_log, log_file, dev_cache=None):
    from jpdse_tpu.data.prefetch import prefetch_to_device

    # double-buffer host->device transfers (train batches are per-host rank
    # shards under multi-host — concatenated over 'dcn' by trainer._place).
    # With a device-resident dataset cache the loader yields (index, flip)
    # meta batches and assembly happens on device — zero pixel H2D per step.
    if dev_cache is not None:
        place = lambda b: trainer._place(dev_cache.place(b), local_is_shard=True)
    else:
        place = lambda b: trainer._place(b, local_is_shard=True)
    batches = prefetch_to_device(loader, size=2, place_fn=place)
    # metrics are fetched one step LATE so the device runs ahead of the
    # host's fetch round trips (trainer.step_async); steps are counted
    # host-side so logging never synchronizes on device state
    steps0 = trainer.steps_taken
    n_batches = len(loader)
    pending = None
    # the fetch in flush() blocks until step i's device compute is done, so
    # successive flush completions are one true step apart: log THAT as the
    # batch time (host load + dispatch + device compute), not the
    # dispatch-only interval, which under async stepping measures ~0
    t_prev = time.time()

    def flush(pending_item):
        nonlocal t_prev
        i, handle = pending_item
        metrics = trainer.fetch_metrics(handle)
        now = time.time()
        dt, t_prev = now - t_prev, now
        metrics_log.log(steps0 + i + 1, metrics, epoch=epoch)
        print(
            "g_gan: {G_GAN:.4f}, g_gan_feat_match: {G_GAN_Feat:.4f}, "
            "g_vgg: {G_VGG:.4f}, g_distortion: {G_Distortion:.4f}, "
            "d_real: {D_real:.4f}, d_fake: {D_fake:.4f}".format(**metrics)
        )
        log(
            f"epoch {epoch + 1}/{trainer.start_epoch + cfg.optim.num_epochs}, "
            f"batch {i + 1}/{n_batches}, distortion "
            f"({cfg.loss.distortion_loss_fn}) {metrics['G_Distortion']:.4f}, "
            f"batch processing time (s) {dt:.4f}",
            log_file,
        )

    for i, batch in enumerate(batches):
        handle = trainer.step_async(batch)
        if pending is not None:
            flush(pending)
        pending = (i, handle)
    if pending is not None:
        flush(pending)


def main():
    cfg = parse_config(is_train=True)
    val_cfg = derive_eval_config(cfg, mode="val")
    print("\ntrain options:\n")
    print_config(cfg)

    if cfg.optim.seed is not None:
        np.random.seed(cfg.optim.seed)

    # multi-host: host-side artifacts (opt.json, galleries, logs) are written
    # by process 0 only; trainer.save guards itself
    import jax

    is_main = jax.process_index() == 0

    if cfg.save_dir and is_main:
        os.makedirs(cfg.save_dir, exist_ok=True)
        cfg.save(os.path.join(cfg.save_dir, "opt.json"))

    loader = create_dataloader(cfg)
    val_loader = create_dataloader(val_cfg)
    visualizer = Visualizer(cfg)
    web_dir = os.path.join(cfg.save_dir, "train_visualizations")
    gallery = HTMLGallery(web_dir, "visualizations")

    sample_batch = next(iter(val_loader))
    trainer = Trainer(cfg, mode="train", sample_batch=sample_batch)
    n_params = count_params(trainer.state.params_g)
    print(f"# trainable params at initialization: {n_params}")

    log_file = (
        os.path.join(cfg.save_dir, "loss_log.txt")
        if cfg.save_dir and is_main
        else None
    )
    metrics_log = MetricsLogger(cfg.save_dir if is_main else None)

    from jpdse_tpu.data.device_cache import maybe_device_cache, maybe_val_cache

    dev_cache = maybe_device_cache(loader, cfg, mesh=trainer.mesh)
    if dev_cache is not None:
        loader.meta_only = True
    # device-resident val batches (same opt-in): every validate / dump pass
    # otherwise re-uploads the val set through the relay client, which leaks
    # each upload's host copy (~125MB/min measured at val_interval=25)
    val_batches = (
        maybe_val_cache(val_loader, cfg, mesh=trainer.mesh, cap=MAX_VAL_SIZE)
        or val_loader
    )

    if cfg.load_model:
        trainer.load()
        # validate to confirm the load (reference train.py:51-76)
        validate(trainer, val_batches, log_file, cfg)

    from jpdse_tpu.utils.profiling import trace

    profiled_first_epoch = False
    for epoch in range(trainer.start_epoch, trainer.start_epoch + cfg.optim.num_epochs):
        trainer.maybe_unfreeze_global(epoch)
        loader.set_epoch(epoch)
        start = time.time()
        # capture a jax.profiler trace of the first trained epoch when asked
        profile_ctx = (
            trace(cfg.profile_dir)
            if (cfg.profile_dir and not profiled_first_epoch)
            else trace(None)
        )
        profiled_first_epoch = True
        with profile_ctx:
            _run_epoch(
                trainer, loader, cfg, epoch, metrics_log, log_file, dev_cache
            )

        saved_this_epoch = False
        if not (epoch + 1) % cfg.optim.val_interval:
            avg = validate(trainer, val_batches, log_file, cfg)
            if cfg.optim.schedule_lr:
                trainer.scheduler_step(avg)
            metrics_log.log(
                trainer.steps_taken,
                {"avg_val_distortion": avg, "lr": trainer.current_lr},
                epoch=epoch,
            )
            if cfg.always_save or (avg < trainer.best_val_loss and cfg.save_dir):
                dump_reconstructions(
                    trainer, val_batches, cfg, gallery, visualizer, is_main
                )
                log("saving model...", log_file)
                trainer.save(epoch, avg)
                saved_this_epoch = True

        if (
            cfg.optim.latest_interval
            and cfg.save_dir
            and not saved_this_epoch
            and not (epoch + 1) % cfg.optim.latest_interval
        ):
            # bound crash/stall rework under best-val-gated checkpointing;
            # every process reaches this deterministically, so the Orbax
            # save barriers line up under multi-host too
            trainer.save_latest(epoch)
            saved_this_epoch = True

        if (
            cfg.optim.max_host_rss_gb
            and cfg.save_dir
            and jax.process_count() == 1  # per-process RSS decision + exit
            # would desync a multi-host run's collectives; multi-host leak
            # mitigation is the device cache / external orchestration
            and host_rss_gb() > cfg.optim.max_host_rss_gb
        ):
            # The TPU-relay client leaks host memory per upload
            # (data/device_cache.py docstring); for configs the device cache
            # can't cover, chunk the run: save the exact state and exit 75
            # so a wrapper loop restarts the process, which resumes from
            # save_dir/latest losslessly (trainer.load prefers it). Skip the
            # save when this epoch already wrote one (best-val or
            # latest_interval): either serves as the resume point, and a
            # full-state save costs ~70-80s through the relay.
            log(
                f"host RSS {host_rss_gb():.1f}GB > --max_host_rss_gb "
                f"{cfg.optim.max_host_rss_gb}; saving latest state and "
                f"exiting 75 for a wrapper restart",
                log_file,
            )
            if not saved_this_epoch:
                trainer.save_latest(epoch)
            raise SystemExit(75)

    if jax.process_count() > 1:
        # keep fast processes alive until process 0 finishes its host-side
        # writes (galleries, Orbax) — otherwise the early exit trips the
        # jax.distributed shutdown barrier
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("jpdse_train_end")


if __name__ == "__main__":
    main()
