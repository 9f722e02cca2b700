"""Typed configuration layer.

Replaces the reference's three-way argparse composition (base flags at
ctu/parsers/base_parser.py:33-130, ~50 model flags at
ctu/models/pix2pixHD_model.py:22-102, dataset-injected defaults at
ctu/data/cityscapes_dataset.py:16-30 etc.) with nested dataclasses, a JSON
round-trip replacing opt.pkl (base_parser.py:163-176), and a train->val/test
derivation replacing ``trainopt2testopt`` (ctu/parsers/__init__.py:4-34).

The knob surface is kept 1:1 with the reference (same names, same defaults,
same semantics) so that every reference training recipe — e.g.
scripts/pix2pixHD_bpg_train.sh — maps directly onto this config.
"""

from __future__ import annotations

import copy
import dataclasses
import json
import os
from dataclasses import dataclass, field
from typing import Any, List, Optional, Tuple


def _tuple3(x) -> Tuple[float, float, float]:
    if isinstance(x, str):
        parts = [float(p) for p in x.split(",")]
    else:
        parts = [float(p) for p in x]
    if len(parts) == 1:
        parts = parts * 3
    assert len(parts) == 3, f"expected 3 values, got {parts}"
    return tuple(parts)  # type: ignore[return-value]


@dataclass
class PreprocessConfig:
    """Resize/crop/flip pipeline knobs (base_parser.py:66-92)."""

    preprocess_mode: str = "scale_width_and_crop"  # see choices in reference
    load_size: int = 1024
    crop_size: int = 512
    aspect_ratio: float = 2.0

    VALID_MODES = (
        "resize_and_crop",
        "crop",
        "scale_width",
        "scale_width_and_crop",
        "scale_shortside",
        "scale_shortside_and_crop",
        "fixed",
        "none",
    )

    def __post_init__(self):
        if self.preprocess_mode not in self.VALID_MODES:
            raise ValueError(f"invalid preprocess_mode {self.preprocess_mode}")


@dataclass
class DataConfig:
    """Data layer knobs (base_parser.py:37-59, 66-92)."""

    root_dir: str = ""
    dataset: str = "cityscapes"  # ade20k | cityscapes | coco | custom | clic
    num_workers: int = 4
    max_dataset_size: int = 2**62
    num_labels: int = 182
    contain_dontcare_label: bool = False
    num_out_channels: int = 3
    no_flip: bool = False
    normalize_mean: Tuple[float, float, float] = (0.5, 0.5, 0.5)
    normalize_std: Tuple[float, float, float] = (0.5, 0.5, 0.5)
    use_gt_semantics: bool = True
    no_pairing_check: bool = False
    batch_size: int = 1
    # cache decoded+resized samples in memory (deterministic 'fixed'/'none'
    # preprocessing only — flip/normalize/codec still run per call). For
    # many-epoch training on a small set this removes the PIL decode+resize
    # from every epoch (this box has 1 CPU; a 2048x1024 PNG decode+bicubic
    # costs ~1s, comparable to a whole TPU train step).
    cache_images: bool = False
    # hold the cached training set ON DEVICE and assemble batches there
    # (gather + flip in one tiny jit): zero per-step H2D pixel transfers.
    # Auto-applies only when it is bit-identical to the host path —
    # cache_images active, single device/process, set fits HBM
    # (data/device_cache.py; use_compressed stores both flip variants of
    # the base-codec output) — and matters doubly on the TPU relay,
    # whose client leaks the host copy of every upload (~23MB/step at
    # flagship shapes; measured round 3, probe in that module's docstring).
    device_cache: bool = True
    preprocess: PreprocessConfig = field(default_factory=PreprocessConfig)
    val_preprocess: PreprocessConfig = field(
        default_factory=lambda: PreprocessConfig("none", 1024, 512, 2.0)
    )
    test_preprocess: PreprocessConfig = field(
        default_factory=lambda: PreprocessConfig("none", 1024, 512, 2.0)
    )
    # test-time noise injection (base_parser.py:95-99)
    add_noise: bool = False
    noise_distribution: str = "normal_poisson"
    noise_std: float = 0.05
    noise_mean: float = 0.0
    poisson_lambda: float = 0.01

    def __post_init__(self):
        self.normalize_mean = _tuple3(self.normalize_mean)
        self.normalize_std = _tuple3(self.normalize_std)

    @property
    def semantic_nc(self) -> int:
        """Channels of the one-hot label map (pix2pixHD_model.py:379-380)."""
        return self.num_labels + 1 if self.contain_dontcare_label else self.num_labels


def _fp_field(default, env: str, help_: str):
    return field(default=default, metadata={"env": env, "help": help_})


@dataclass
class FastPathConfig:
    """Fast-inference-path variant knobs (models/fast_codec.py).

    Every measured fast-path variant is reachable here, so it round-trips
    through opt.json and shows up in ``--help``. Each field also has a
    ``JPDSE_*`` env override (same value spellings) that takes precedence
    when the variable is set — the mechanism on-chip A/B sweeps use;
    :meth:`resolved` applies the overrides. Defaults are the measured
    winners on v5e (full ledger: PERF.md); per-field notes quote the key
    numbers so ``--help`` documents why each default is what it is.
    """

    s2d_e2e: bool = _fp_field(
        False, "JPDSE_S2D_E2E",
        "assemble trunk inputs in the s2d domain end-to-end (no d2s/pad/s2d "
        "between stages). Measured 36.32 vs 38.33 MP/s at batch 24 — the "
        "interleave stitch + s2d one-hot cost more than the relayouts they "
        "remove; default off. Global netG, unsharded only.")
    head_pallas: str = _fp_field(
        "0", "JPDSE_HEAD_PALLAS",
        "'1': head 7x7 conv via the VMEM-im2col Pallas kernel for K-starved "
        "heads (s2d input channels >= 64); 'force': also for tiny heads. "
        "Measured regression (netG front 23.9 vs 20.7 ms at batch 8 — XLA's "
        "windowed conv emitter wins); default '0'.")
    head_fold: bool = _fp_field(
        False, "JPDSE_HEAD_FOLD",
        "explicit K-alignment tap folds for the head convs (ops/s2d.py "
        "fold_w_taps/fold_hw_taps). Measured regressions everywhere (netG "
        "front 27.0 vs 20.8, netE 26.8 vs 7.0 ms): XLA already folds taps "
        "into the MXU K dimension without the relayout; default off.")
    tail_split: bool = _fp_field(
        True, "JPDSE_TAIL_SPLIT",
        "tap-split N-starved tail convs into a 1x1 matmul + fused shift-add "
        "(12 of 128 output lanes -> 192). Measured win: netG fast back "
        "19.37 vs 22.28 ms at batch 8; default on.")
    tail_wgroup: int = _fp_field(
        2, "JPDSE_TAIL_WGROUP",
        "width taps kept per split group in the 'w' tail split (1 = widest "
        "N, 2 = half the intermediate HBM traffic). Measured: 11.75 (2) vs "
        "12.50 ms (1) for the netE4label tail; default 2.")
    fused_realign: str = _fp_field(
        "auto", "JPDSE_FUSED_REALIGN",
        "grid re-alignment (s2d(pad3(d2s(x)))) before 7x7 tails: 'auto' = "
        "Pallas one-pass kernel on TPU (5.03 vs 8.05 ms composition; "
        "netE4label back 27.4 -> 17.5), '0' = jnp composition (the only "
        "sharded-safe form, auto-selected under a mesh), 'xla'/'1' = "
        "slice-concat re-expression (15.2 ms, measured negative).")
    front_realign: str = _fp_field(
        "0", "JPDSE_FRONT_REALIGN",
        "one-pass pad3+s2d entry into the head conv: 'pallas'/'auto' = "
        "Pallas kernel. Measured 2.3x regression (48.1 vs 20.7 ms netG "
        "front — it breaks XLA's pad-into-conv producer fusion); default "
        "'0' (jnp pad + s2d).")
    norm_shift: bool = _fp_field(
        False, "JPDSE_NORM_SHIFT",
        "sample-shifted variance in the s2d InstanceNorm for pathological "
        "|mean|/std inputs. Measured 32.0 vs 33.9 MP/s (breaks the stats-"
        "pass fusion) and unneeded at trunk conditioning (~1e-12 relative "
        "error); default off.")

    VALID = {
        "head_pallas": ("0", "1", "force"),
        "fused_realign": ("auto", "0", "1", "xla", "pallas"),
        "front_realign": ("0", "auto", "pallas"),
    }

    def resolved(self) -> "FastPathConfig":
        """Copy with JPDSE_* env overrides applied (env beats config when
        set — the A/B sweep mechanism; resolution happens once, at
        FastCodec construction, never at trace time)."""
        out = copy.copy(self)
        for f in dataclasses.fields(self):
            env = f.metadata.get("env")
            if not env or env not in os.environ:
                continue
            raw = os.environ[env]
            cur = getattr(self, f.name)
            if isinstance(cur, bool):
                setattr(out, f.name, raw == "1")
            elif isinstance(cur, int):
                setattr(out, f.name, int(raw))
            else:
                setattr(out, f.name, raw)
        return out

    def validate(self, check_combos: bool = True):
        """Domain checks always; combo checks only for config-sourced values
        (``check_combos=False`` is used by FastCodec on the env-RESOLVED
        copy, where invalid combos defer with a warning instead of raising —
        an env sweep shouldn't abort a run the config itself allows)."""
        for name, valid in self.VALID.items():
            if getattr(self, name) not in valid:
                raise ValueError(
                    f"model.fast.{name} must be one of {valid}, "
                    f"got {getattr(self, name)!r}")
        if self.tail_wgroup < 1:
            raise ValueError("model.fast.tail_wgroup must be >= 1")
        if not check_combos:
            return
        if self.s2d_e2e and self.head_pallas == "force":
            # the VMEM head kernel manages its own fine-domain producer;
            # combining it with the s2d-e2e assembly would round-trip every
            # trunk input through depth_to_space and back (a net regression).
            # head_pallas='1' is allowed: whether the kernel is actually
            # selected depends on channel widths, and FastCodec defers
            # s2d_e2e at runtime only when it is (models/fast_codec.py).
            raise ValueError(
                "model.fast.s2d_e2e cannot be combined with "
                "head_pallas='force' (the VMEM head kernel requires the "
                "fine-domain producer s2d_e2e eliminates)")


@dataclass
class ModelConfig:
    """Architecture knobs (pix2pixHD_model.py:24-101)."""

    model: str = "pix2pixHD"
    # discriminator
    num_D: int = 2
    n_layers_D: int = 3
    ndf: int = 64
    no_lsgan: bool = False
    pool_size: int = 0
    # semantics plumbing
    no_instance: bool = False
    no_label: bool = False
    sem_masking: bool = False
    binary_mask: bool = False
    netE_groups: int = 1
    inst_wise_pool: bool = False
    max_instance_id: int = 40960  # static upper bound for segment ops (TPU static shapes)
    norm: str = "instance"  # instance | batch | identity
    use_dropout: bool = False
    # I/O channels
    input_nc: int = 3
    zero_sem: bool = False
    zero_ins: bool = False
    zero_vis: bool = False
    # generator
    netG: str = "global"  # global | local
    ngf: int = 64
    n_downsample_global: int = 4
    n_blocks_global: int = 9
    n_blocks_local: int = 3
    n_local_enhancers: int = 1
    niter_fix_global: int = 0
    # visual-feature encoder
    no_feat_encoding: bool = False
    no_feat: bool = False
    feat_num: int = 3
    n_downsample_E: int = 4
    nef: int = 64
    use_netE_output: bool = False
    # label encoder
    no_label_encoding: bool = False
    label_encoder_out_channels: int = 36
    n_downsample_E4label: int = 4
    ne4lf: int = 64
    # binarizers
    no_encoder_binarization: bool = False
    encoder_binarizer_out_channels: int = 128
    no_label_encoder_binarization: bool = False
    label_encoder_binarizer_out_channels: int = 128
    no_generator_binarization: bool = False
    bin_generator_before_res: bool = False
    generator_binarizer_out_channels: int = 128
    # precision: compute dtype for the nets ("float32" | "bfloat16")
    compute_dtype: str = "float32"
    # fuse InstanceNorm(+ReLU)(+residual) into one Pallas pass
    # (ops/pallas/instance_norm.py; numerically identical jnp fallback
    # off-TPU). Default OFF: measured on v5e (1024x512 bf16 decode, batch 8)
    # it is a consistent ~3% regression (23.5 vs 24.3 MP/s A/B in one
    # session) — XLA already fuses the norm chain into the conv epilogues,
    # and the Pallas call boundary breaks those fusions. Kept as a
    # config-selectable kernel (and as the template for ops where XLA's
    # fusion is insufficient).
    fused_instance_norm: bool = False
    # compute ConvTranspose2d(3,2,1,op=1) as 4 dense per-phase convs + one
    # depth-to-space instead of an input-dilated conv. Exact (golden-tested)
    # but measured SLOWER on v5e (19.8 vs 24.3 MP/s decode A/B): XLA already
    # lowers lhs-dilated convs efficiently, and the depth-to-space relayout
    # costs more than the skipped zero-MACs. Default off; kept as a
    # documented measurement and for backends where dilated convs are weak.
    phase_deconv: bool = False
    # route deterministic inference (get_img / get_code / compress) through
    # the space-to-depth optimized path (models/fast_codec.py — the measured
    # production default of bench.py: 33.6 vs 24.3 MP/s/chip at batch 8).
    # Eval-only; numerically equivalent up to bf16 reassociation
    # (tests/test_fast_codec.py); requires the global/ungrouped/instance-norm
    # family and a single device (falls back to the standard path otherwise).
    fast_inference: bool = False
    # fast-path variant knobs (every field env-overridable for A/B sweeps)
    fast: FastPathConfig = field(default_factory=FastPathConfig)


@dataclass
class LossConfig:
    """Objective knobs (pix2pixHD_model.py:40-50, base_parser.py:127)."""

    lambda_feat: float = 10.0
    lambda_distortion: float = 10.0
    anneal_lambda: bool = False
    anneal_interval: int = 5000
    anneal_factor: float = 5.0
    match_raw_feat: bool = False
    no_gan_feat_loss: bool = False
    no_vgg_loss: bool = False
    no_distortion_loss: bool = False
    no_g_gan_loss: bool = False
    no_d_gan_loss: bool = False
    distortion_loss_fn: str = "l1"  # l1 | mse
    vgg_weights_path: Optional[str] = None  # converted VGG19 weights (.npz)


@dataclass
class OptimConfig:
    """Training/optimization knobs (base_parser.py:110-126)."""

    num_epochs: int = 100
    val_interval: int = 1
    beta1: float = 0.5
    beta2: float = 0.999
    lr: float = 0.0002
    schedule_lr: bool = False
    lr_decay_factor: float = 0.1
    lr_decay_patience: int = 5
    seed: Optional[int] = None
    fp16: bool = False  # reference apex AMP analog; here: bf16 compute
    # rematerialize the generator forward in the backward pass
    # (jax.checkpoint): trades ~1/3 more FLOPs for O(depth) less activation
    # HBM — enables large-batch / high-res training on one chip
    remat: bool = False
    # remat granularity. "block": nn.remat around every conv/res/deconv block
    # (generator.py setup) — lowest peak memory, the only way batch >= 4 fits
    # at 1024x512 (measured 1.735 MP/s at batch 4; whole-decode remat OOMs).
    # "decode": one jax.checkpoint around the whole decode — slightly faster
    # when the batch already fits (measured 1.805 vs 1.667 MP/s at batch 2)
    # but holds every decode residual at once during its backward.
    remat_granularity: str = "block"  # block | decode
    # evaluate the VGG perceptual loss N images at a time (lax.map):
    # mathematically identical (mean of equal-chunk means), but the fp32 VGG
    # activations — the peak-memory driver of the GAN step — only ever exist
    # for one chunk. 0 = whole batch at once.
    vgg_chunk: int = 0
    # train the generator through the space-to-depth re-expression
    # (models/fast_train.py): the s2d weight transforms run differentiably
    # inside the jitted step, so the G forward AND backward execute in the
    # MXU-friendly s2d domain while the parameter tree / optimizer /
    # checkpoints stay standard-layout. Eligible configs: the flagship
    # recipe family (global netG, no decode-path binarizers, instance norm
    # — fast_train_ineligible_reason lists the gates; make_train_step
    # raises with the gate for ineligible configs). Value-equal to the
    # standard step within bf16 reassociation (pinned by
    # tests/test_fast_train.py); measured numbers in PERF.md round-5.
    fast_train: bool = False
    # run the VGG19 perceptual trunk in bf16 (weights + activations; the
    # per-slice L1 losses still reduce in fp32, train/losses.py vgg_loss).
    # A throughput/memory lever for the train step — the two VGG passes are
    # fp32 by default (reference parity) and sit on the MXU at half the
    # bf16 rate. Changes the loss value at ~1e-3 relative (bf16 features),
    # so it is opt-in; measured numbers in PERF.md round-5.
    vgg_bf16: bool = False
    # save an exact `latest` resume point (save_dir/latest, not best-val
    # gated) every N epochs, bounding the rework a crash/relay-stall can
    # cause under best-val-gated checkpointing (GAN-phase val wobbles for
    # hundreds of epochs without improving, so the best checkpoint can be
    # arbitrarily old). A full-state save costs ~70-80s through the relay
    # at flagship scale — choose N for a few % overhead. 0 disables.
    latest_interval: int = 0
    # watchdog: if host RSS exceeds this many GB at an epoch boundary, save a
    # "latest" checkpoint (save_dir/latest, exact state, not best-val gated)
    # and exit with code 75 (EX_TEMPFAIL) so a wrapper can restart the
    # process and resume losslessly. Guards long runs against the TPU-relay
    # client's per-upload host-memory leak (data/device_cache.py docstring)
    # in configs the device cache can't cover. 0 disables.
    max_host_rss_gb: float = 0.0


@dataclass
class CodecConfig:
    """External base-codec bridge knobs (pix2pixHD_model.py:57-59)."""

    use_compressed: bool = False
    ext: str = "jpg"  # jpg | j2k | bpg | webp | heif (in-process HEVC intra) | avif
    quality: Tuple[int, ...] = (100,)
    # Reduced-rate semantics (round-5; motivated by the round-4 ablation:
    # the semantics *mechanism* helps at equal input but its 0.060 bpp side
    # info is overpriced at matched rate). Ship the label/instance maps at
    # 1/f resolution: training degrades them with the same nearest
    # down-then-up the .jpds path uses (ops/semantics.degrade_ids;
    # codec_io downsample_ids at pack, upsample at unpack), so train and
    # deploy see identical blocky maps. Measured on the bundled 1024x512
    # maps: f=2 cuts the derived-instance side info 0.0608 -> ~0.02 bpp
    # class, f=4 further (exact numbers in BASELINE.md once trained).
    sem_downsample: int = 1

    def __post_init__(self):
        if isinstance(self.quality, str):
            self.quality = tuple(int(q) for q in self.quality.split(","))
        elif isinstance(self.quality, int):
            self.quality = (self.quality,)
        else:
            self.quality = tuple(int(q) for q in self.quality)


@dataclass
class ParallelConfig:
    """Device-mesh knobs — the reference has no distributed support
    (base_parser.py:236 raises on multi-GPU); here DP + spatial sharding are
    first-class.

    Multi-host: when the entry points detect a multi-process run
    (platform.init_distributed via JPDSE_COORDINATOR/JPDSE_NUM_PROCESSES/
    JPDSE_PROCESS_ID, or JPDSE_MULTIHOST=1 on TPU pods), the trainer builds
    a (dcn, data, spatial) mesh automatically — 'dcn' spans processes, and
    data_axis/spatial_axis below subdivide each host's local devices.
    batch_size is then per-host; loaders feed disjoint rank-strided shards."""

    data_axis: int = -1  # -1: use all remaining (local) devices on data
    spatial_axis: int = 1  # H-axis sharding factor (halo-exchange convs)


@dataclass
class Config:
    """Top-level run configuration."""

    mode: str = "train"  # train | val | test
    is_train: bool = True
    save_dir: str = "./checkpoints"
    checkpoints_dir: Optional[str] = None
    always_save: bool = False
    load_model: bool = False
    do_not_get_codes: bool = False
    display_winsize: int = 512
    # cap the number of reconstruction IMAGES dumped to the HTML gallery
    # per save (None = reference behavior: every image of the val pass,
    # itself capped at 30 batches — reference train.py:16,129-147). On the
    # TPU relay a device->host image fetch runs ~1 min (100KB/s); capping
    # keeps best-val saves cheap.
    max_recon_dump: Optional[int] = None
    tf_log: bool = False  # kept for CLI parity; logging is always-on here
    profile_dir: Optional[str] = None  # jax.profiler trace output (xprof)

    data: DataConfig = field(default_factory=DataConfig)
    model: ModelConfig = field(default_factory=ModelConfig)
    loss: LossConfig = field(default_factory=LossConfig)
    optim: OptimConfig = field(default_factory=OptimConfig)
    codec: CodecConfig = field(default_factory=CodecConfig)
    parallel: ParallelConfig = field(default_factory=ParallelConfig)

    def validate(self):
        """Model-construction-time consistency checks. Not run at construction
        (the reference's *defaults* violate them too; it checks at
        Pix2PixHDModel.__init__, pix2pixHD_model.py:107-108)."""
        m, c = self.model, self.codec
        # binarize encoders XOR generator (pix2pixHD_model.py:107-108)
        enc_bin = (not m.no_feat_encoding and not m.no_encoder_binarization) or (
            not m.no_label_encoding and not m.no_label_encoder_binarization
        )
        if enc_bin and not m.no_generator_binarization:
            raise ValueError(
                "Binarize the encoders *or* the generator, not both "
                "(reference pix2pixHD_model.py:107-108)."
            )
        if m.sem_masking and (m.no_feat or m.no_label):
            raise ValueError("sem_masking requires features and labels (pix2pixHD_model.py:115)")
        if len(c.quality) > 1 and not m.sem_masking:
            raise ValueError("per-channel quality list requires sem_masking (pix2pixHD_model.py:342-343)")
        if c.sem_downsample not in (1, 2, 4, 8):
            raise ValueError(
                f"codec.sem_downsample must be 1, 2, 4 or 8, got "
                f"{c.sem_downsample!r}"
            )
        m.fast.validate()
        if self.optim.remat_granularity not in ("block", "decode"):
            # a typo here would otherwise silently disable generator remat
            # while remat=True still checkpoints D/VGG — surfacing as an
            # unexplained OOM instead of a config error
            raise ValueError(
                f"optim.remat_granularity must be 'block' or 'decode', "
                f"got {self.optim.remat_granularity!r}"
            )

    # ------------------------------------------------------------------
    # channel arithmetic (pix2pixHD_model.py:117-183)
    # ------------------------------------------------------------------
    @property
    def semantics_nc(self) -> int:
        m, d = self.model, self.data
        if m.no_label:
            return 0
        if m.no_label_encoding:
            return d.semantic_nc
        return m.label_encoder_out_channels

    @property
    def netG_input_nc(self) -> int:
        m, d = self.model, self.data
        nc = self.semantics_nc
        if m.no_label_encoding and not m.no_instance:
            nc += 1  # edge map rides along un-encoded (pix2pixHD_model.py:129-133)
        if not m.no_feat:
            nc += m.input_nc if m.no_feat_encoding else m.feat_num
        if m.sem_masking:
            if not m.no_feat_encoding:
                nc = m.feat_num
            else:
                n_sem = d.num_labels + 1 if not m.no_instance else d.num_labels
                nc = m.input_nc * n_sem
        return nc

    @property
    def netD_input_nc(self) -> int:
        m = self.model
        nc = self.semantics_nc + self.data.num_out_channels
        if not m.no_instance and m.no_label_encoding:
            nc += 1
        return nc

    @property
    def netE_input_nc(self) -> int:
        m, d = self.model, self.data
        if m.sem_masking:
            n_sem = d.num_labels + 1 if not m.no_instance else d.num_labels
            return n_sem * m.input_nc
        return m.input_nc

    @property
    def netE4label_input_nc(self) -> int:
        m, d = self.model, self.data
        return d.semantic_nc + (0 if m.no_instance else 1)

    @property
    def has_binary_codes(self) -> bool:
        """Whether any module produces a binary bottleneck code."""
        m = self.model
        return (
            (self.use_netE4label and not m.no_label_encoder_binarization)
            or (self.use_netE and not m.no_encoder_binarization)
            or (not m.no_generator_binarization)
        )

    @property
    def use_netE(self) -> bool:
        m = self.model
        return (not m.no_feat) and (not m.no_feat_encoding)

    @property
    def use_netE4label(self) -> bool:
        m = self.model
        return (not m.no_label) and (not m.no_label_encoding) and (not m.sem_masking)

    # ------------------------------------------------------------------
    # serialization (replaces opt.pkl/opt.txt, base_parser.py:163-205)
    # ------------------------------------------------------------------
    def to_dict(self) -> dict:
        return dataclasses.asdict(self)

    def to_json(self, indent: int = 2) -> str:
        return json.dumps(self.to_dict(), indent=indent, sort_keys=True)

    def save(self, path: str):
        with open(path, "w") as f:
            f.write(self.to_json())

    @classmethod
    def from_dict(cls, d: dict) -> "Config":
        return _dataclass_from_dict(cls, d)

    @classmethod
    def load(cls, path: str) -> "Config":
        with open(path) as f:
            return cls.from_dict(json.load(f))

    def replace(self, **kwargs) -> "Config":
        return dataclasses.replace(self, **kwargs)


def _dataclass_from_dict(cls, d: dict):
    """Recursively build nested dataclasses, tolerating unknown keys
    (mirrors the reference's graceful opt-file reload, base_parser.py:192-200)."""
    if not dataclasses.is_dataclass(cls):
        return d
    kwargs = {}
    fields = {f.name: f for f in dataclasses.fields(cls)}
    for k, v in d.items():
        if k not in fields:
            continue  # forward/backward compat: ignore unknown keys
        f = fields[k]
        ftype = f.type if isinstance(f.type, type) else None
        default = f.default_factory() if f.default_factory is not dataclasses.MISSING else None  # type: ignore[misc]
        target = ftype or type(default)
        if dataclasses.is_dataclass(target) and isinstance(v, dict):
            kwargs[k] = _dataclass_from_dict(target, v)
        else:
            kwargs[k] = v
    return cls(**kwargs)


# nested-dataclass types keyed by field name, for from_dict reconstruction
_NESTED = {
    "data": DataConfig,
    "model": ModelConfig,
    "loss": LossConfig,
    "optim": OptimConfig,
    "codec": CodecConfig,
    "parallel": ParallelConfig,
    "fast": FastPathConfig,
    "preprocess": PreprocessConfig,
    "val_preprocess": PreprocessConfig,
    "test_preprocess": PreprocessConfig,
}


def derive_eval_config(cfg: Config, mode: str = "val") -> Config:
    """Train config -> val/test config (replaces trainopt2testopt,
    ctu/parsers/__init__.py:4-34): swap in the per-mode preprocessing block and
    force batch_size=1."""
    if mode not in ("val", "test"):
        raise ValueError(f'mode must be "val" or "test", got {mode}')
    new = copy.deepcopy(cfg)
    new.mode = mode
    new.is_train = False
    src = cfg.data.val_preprocess if mode == "val" else cfg.data.test_preprocess
    new.data.preprocess = copy.deepcopy(src)
    new.data.batch_size = 1
    return new


# ----------------------------------------------------------------------
# dataset defaults (the reference lets each dataset inject parser defaults;
# here each dataset name maps to a dict of config overrides)
# ----------------------------------------------------------------------
DATASET_DEFAULTS = {
    # cityscapes_dataset.py:16-30
    "cityscapes": {
        "data.preprocess.preprocess_mode": "fixed",
        "data.preprocess.load_size": 512,
        "data.preprocess.crop_size": 512,
        "data.preprocess.aspect_ratio": 2.0,
        "data.num_labels": 35,
    },
    # ade20k_dataset.py:21-29
    "ade20k": {
        "data.preprocess.preprocess_mode": "fixed",
        "data.preprocess.load_size": 512,
        "data.preprocess.crop_size": 512,
        "data.num_labels": 150,
        "data.contain_dontcare_label": True,
    },
    # clic_dataset.py:15-21
    "clic": {
        "data.preprocess.preprocess_mode": "none",
        "data.num_labels": 54,
    },
    # custom_dataset.py:12-20 (image-only folders, no semantics)
    "custom": {
        "data.preprocess.preprocess_mode": "fixed",
        "data.preprocess.load_size": 512,
        "data.preprocess.crop_size": 512,
        "data.preprocess.aspect_ratio": 2.0,
        "data.normalize_mean": (0.0, 0.0, 0.0),
        "data.normalize_std": (1.0, 1.0, 1.0),
        "model.no_label": True,
        "model.no_instance": True,
    },
}


def set_by_path(cfg: Config, dotted: str, value: Any):
    """Set a nested config field by dotted path, e.g. 'data.num_labels'."""
    obj = cfg
    parts = dotted.split(".")
    for p in parts[:-1]:
        obj = getattr(obj, p)
    if not hasattr(obj, parts[-1]):
        raise AttributeError(f"no config field {dotted}")
    setattr(obj, parts[-1], value)


def get_by_path(cfg: Config, dotted: str) -> Any:
    obj = cfg
    for p in dotted.split("."):
        obj = getattr(obj, p)
    return obj


def apply_dataset_defaults(cfg: Config, explicitly_set: Optional[List[str]] = None) -> Config:
    """Apply per-dataset default overrides, skipping fields the user set
    explicitly (mirrors parser.set_defaults semantics)."""
    explicitly_set = set(explicitly_set or [])
    for dotted, value in DATASET_DEFAULTS.get(cfg.data.dataset, {}).items():
        if dotted not in explicitly_set:
            set_by_path(cfg, dotted, value)
    return cfg
