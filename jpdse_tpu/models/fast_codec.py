"""Optimized inference path: the trained codec re-expressed with
space-to-depth layers at the high-resolution ends.

Takes a trained ``SemanticCodec`` parameter PyTree and builds a functionally
identical deterministic decode (and code-extraction) pass where the
bandwidth/utilization-bound full-resolution layers — head 7x7 conv, first
stride-2 downsample, last ConvTranspose, tail 7x7 conv — run in the
space-to-depth domain (see ops/s2d.py for the exact weight transforms; all
are verified bit-near-exact in tests/test_fast_codec.py). Mid-trunk layers
(>=128 channels at <=1/4 resolution) already saturate the MXU and run
unchanged.

Supports the GlobalGenerator / Encoder family (netG 'global') and the
LocalEnhancer pyramid (netG 'local' — each enhancer's full-resolution
downsample/upsample stacks reuse the same s2d transforms, where they matter
most: those stacks run at 2x the global trunk's resolution). No grouped
convs, no instance-wise pooling; anything else falls back to the standard
module.

This module holds the input ASSEMBLY + variant selection (``FastCodec``);
the transformed trunk forwards live in models/fast_trunk.py.

NOTE: pass **host** (numpy / CPU-backend) params. The constructor reads every
weight with np.asarray to run the transforms; device-resident params would
force a full device->host transfer first (prohibitive over the axon relay,
whose downloads run ~100KB/s).
"""

from __future__ import annotations

from typing import Dict, List, Optional

import jax
import jax.numpy as jnp

from jpdse_tpu.config import Config
from jpdse_tpu.models.codec import prepare_inputs
# _FastTrunk/_FastLocalG re-exported for existing importers
# (tools/bench_fast_stages.py, tests/test_pallas_head_conv.py, ...)
from jpdse_tpu.models.fast_trunk import _FastLocalG, _FastTrunk  # noqa: F401
from jpdse_tpu.ops.semantics import instance_edges
from jpdse_tpu.ops.s2d import s2d_concat_interleave, space_to_depth


class FastCodec:
    """Optimized deterministic inference over trained SemanticCodec params.

    Usage (weights are an explicit PyTree so jit serializes no constants):
        fast = FastCodec(cfg, host_params)
        out = jax.jit(fast.decode_fn)(fast.weights, batch)
    ``decode(batch)`` is the convenience form (jits internally).
    """

    def __init__(self, cfg: Config, params_g: Dict, dtype=None,
                 sharded: bool = False):
        m = cfg.model
        # decode_from_codes_fn indexes codes[0] as the netE4label code, which
        # is only safe under the validated invariant that encoders and
        # generator are never binarized together (Config.validate)
        cfg.validate()
        if (
            m.netG not in ("global", "local") or m.netE_groups != 1
            or m.inst_wise_pool or m.sem_masking or m.norm != "instance"
        ):
            raise ValueError(
                "FastCodec supports the global/local ungrouped instance-norm "
                "configurations; other configs use SemanticCodec"
            )
        self.cfg = cfg
        # fast-path variant knobs: config fields with env overrides applied
        # (config.FastPathConfig.resolved — resolution happens HERE, once;
        # no trace-time env reads). Domain-checked; invalid combos from env
        # sweeps defer below with a warning rather than raising.
        fp = m.fast.resolved()
        fp.validate(check_combos=False)
        self.fp = fp
        dtype = dtype or (
            jnp.bfloat16 if m.compute_dtype == "bfloat16" else jnp.float32
        )
        g_bin = "none"
        if not m.no_generator_binarization:
            g_bin = "before_res" if m.bin_generator_before_res else "after_res"
        if m.netG == "local":
            # local enhancers never binarize (codec.py raises), so the
            # encode/decode_from_code trunk surface is not needed here
            self.netG = _FastLocalG(params_g["netG"], m, dtype,
                                    sharded=sharded, fp=fp)
        else:
            self.netG = _FastTrunk(
                params_g["netG"], m.n_downsample_global, m.n_blocks_global,
                g_bin, dtype, sharded=sharded, fp=fp,
            )
        self.netE = None
        if cfg.use_netE:
            self.netE = _FastTrunk(
                params_g["netE"], m.n_downsample_E, 0,
                "mid" if not m.no_encoder_binarization else "none", dtype,
                sharded=sharded, fp=fp,
            )
        self.netE4label = None
        if cfg.use_netE4label:
            self.netE4label = _FastTrunk(
                params_g["netE4label"], m.n_downsample_E4label, 0,
                "mid" if not m.no_label_encoder_binarization else "none", dtype,
                sharded=sharded, fp=fp,
            )
        self.weights = {"netG": self.netG.weights}
        if self.netE is not None:
            self.weights["netE"] = self.netE.weights
        if self.netE4label is not None:
            self.weights["netE4label"] = self.netE4label.weights
        # s2d end-to-end mode (fast.s2d_e2e / JPDSE_S2D_E2E): assemble the trunk inputs
        # directly in the s2d domain (one-hot of the s2d'd label map, s2d'd
        # edge/visual channels, upstream tails kept pre-depth_to_space) and
        # enter each front through the one-pass pad-3 re-alignment
        # (_FastTrunk.front_s2d) — eliminating every full-resolution
        # pad+relayout producer copy between stages. MEASURED NEGATIVE
        # (PERF.md round-3c): 36.32 vs 38.33 MP/s/chip at the bench
        # default — the s2d-domain assembly's own movement (interleave
        # stitch, 140-channel one-hot) costs more than the relayouts it
        # removes, so the mode stays env-opt-in. Bit-exact: the head
        # convs consume the identical tensors (s2d_concat_interleave
        # restores the global (sub, c) layout, so the trunk weights are
        # unchanged and both front paths stay valid). Global trunks only
        # (the LocalEnhancer pyramid needs the fine input for its
        # avg-pool levels); the sharded path keeps the fine assembly whose
        # d2s/pad/s2d ops GSPMD partitions with automatic halo exchanges.
        # (sem_downsample: the s2d-domain assembly builds one-hot/edges from
        # the RAW maps — it has no degrade step, so the mode defers to the
        # fine-domain assembly, whose prepare_inputs degrades correctly)
        self.s2d_e2e = (
            fp.s2d_e2e and m.netG == "global" and not sharded
            and cfg.codec.sem_downsample == 1
        )
        if self.s2d_e2e and any(
            t.head_fold == "pallas"
            for t in (self.netG, self.netE, self.netE4label)
            if t is not None
        ):
            # the VMEM head kernel's front_s2d fallback would round-trip
            # every trunk input through depth_to_space and back — combining
            # the modes inverts the e2e saving into a net regression, so
            # the e2e assembly defers to the kernel request. Gated on the
            # EFFECTIVE per-trunk decision (head_fold == 'pallas'), not the
            # raw head_pallas knob: with head_pallas='1' and every head
            # below the c4>=64 bar, the trunks keep the XLA conv and
            # s2d_e2e stays usable. (The config-level force pair is
            # rejected earlier, in Config.validate.)
            print(
                "[fast_codec] s2d_e2e (JPDSE_S2D_E2E) disabled: the pallas "
                "head kernel manages its own (fine-domain) producer — "
                "combining them would add d2s/s2d round trips"
            )
            self.s2d_e2e = False
        self._jit_decode = None
        self._jit_codes_shaped = None
        self._jit_decode_codes = None

    def _inputs(self, batch: Dict[str, jax.Array]) -> Dict[str, jax.Array]:
        # cast visuals to the compute dtype BEFORE preprocessing: the one-hot
        # scatter and the 40-channel concat then run in bf16 (the 0/1 one-hot
        # and edge values are exact in bf16, and the image cast happens in
        # front() anyway — bit-identical output, ~half the HBM traffic on the
        # full-resolution input assembly)
        dt = self.netG.dtype
        comp = batch.get("compressed")
        return prepare_inputs(
            self.cfg, batch.get("label"), batch.get("instance"),
            batch["image"].astype(dt),
            comp.astype(dt) if comp is not None else None,
        )

    def _vis(self, inputs):
        if self.cfg.codec.use_compressed:
            return inputs["compressed_img"]
        return inputs["real_image"]

    def _concat(self, weights: Dict, inputs) -> jax.Array:
        """The generator's input (label features ++ visual features)."""
        m = self.cfg.model
        input_label = inputs["input_label"]
        if self.netE4label is not None:
            input_label = self.netE4label(weights["netE4label"], input_label)
        feat = None
        if not m.no_feat:
            vis = self._vis(inputs)
            feat = self.netE(weights["netE"], vis) if self.netE is not None else vis
        if feat is None:
            return input_label
        if input_label is None:
            return feat
        return jnp.concatenate([input_label, feat.astype(input_label.dtype)], axis=-1)

    # -- s2d-e2e input assembly (see the __init__ note) -------------------
    def _label_comps_s2d(self, batch: Dict[str, jax.Array]) -> List[jax.Array]:
        """The semantic input (one-hot label ++ edge map) as per-component
        s2d tensors, built IN the s2d domain. Bit-exact vs
        ``space_to_depth(prepare_semantics(...))`` after interleaving:
        one-hot is elementwise so it commutes with the s2d permutation, and
        the edge map is a 1-channel relayout."""
        m, dt = self.cfg.model, self.netG.dtype
        comps = []
        if not m.no_label:
            lab = batch["label"]
            if lab.ndim == 3:
                lab = lab[..., None]
            lab4 = space_to_depth(lab.astype(jnp.int32))
            nc = self.cfg.data.semantic_nc
            oh = jax.nn.one_hot(jnp.clip(lab4, 0, nc - 1), nc, dtype=dt)
            comps.append(oh.reshape(oh.shape[0], oh.shape[1], oh.shape[2], 4 * nc))
        if not m.no_instance:
            comps.append(
                space_to_depth(instance_edges(batch["instance"], dtype=dt))
            )
        return comps

    def _vis_s2d(self, batch: Dict[str, jax.Array]) -> jax.Array:
        vis = (
            batch["compressed"]
            if self.cfg.codec.use_compressed
            else batch["image"]
        )
        return space_to_depth(vis.astype(self.netG.dtype))

    def _g_input_s2d(
        self, weights: Dict, batch: Dict[str, jax.Array]
    ) -> List[jax.Array]:
        """netG's input (label features ++ visual features) as per-component
        s2d tensors — upstream trunks entered via front_s2d and exited
        pre-depth_to_space (the s2d-e2e form of :meth:`_concat`)."""
        m = self.cfg.model
        comps = self._label_comps_s2d(batch)
        if comps and self.netE4label is not None:
            x = s2d_concat_interleave(comps)
            comps = [
                self.netE4label(
                    weights["netE4label"], x, x_is_s2d=True, keep_s2d=True
                )
            ]
        if not m.no_feat:
            v = self._vis_s2d(batch)
            if self.netE is not None:
                v = self.netE(weights["netE"], v, x_is_s2d=True, keep_s2d=True)
            comps.append(v)
        return comps

    def decode_fn(self, weights: Dict, batch: Dict[str, jax.Array]) -> jax.Array:
        """Pure function of (weights, batch) — jit this."""
        if self.s2d_e2e:
            comps = self._g_input_s2d(weights, batch)
            return self.netG(
                weights["netG"], s2d_concat_interleave(comps), x_is_s2d=True
            )
        inputs = self._inputs(batch)
        return self.netG(weights["netG"], self._concat(weights, inputs))

    def decode(self, batch: Dict[str, jax.Array]) -> jax.Array:
        if self._jit_decode is None:
            self._jit_decode = jax.jit(self.decode_fn)
        return self._jit_decode(self.weights, batch)

    def codes_shaped_fn(self, weights: Dict, batch: Dict[str, jax.Array]) -> List[jax.Array]:
        """Binary codes in native (B, h, w, C) {0,1} layout, in the same order
        as SemanticCodec.get_codes_shaped (netE4label, netE, G-bottleneck)."""
        m = self.cfg.model
        codes = []

        def to01(c):
            return (c + 1.0) / 2.0

        if self.s2d_e2e:
            if self.netE4label is not None and not m.no_label_encoder_binarization:
                x = s2d_concat_interleave(self._label_comps_s2d(batch))
                codes.append(
                    to01(self.netE4label.encode(
                        weights["netE4label"], x, x_is_s2d=True))
                )
            if self.netE is not None and not m.no_encoder_binarization:
                codes.append(to01(self.netE.encode(
                    weights["netE"], self._vis_s2d(batch), x_is_s2d=True)))
            if not m.no_generator_binarization:
                concat = s2d_concat_interleave(self._g_input_s2d(weights, batch))
                codes.append(to01(self.netG.encode(
                    weights["netG"], concat, x_is_s2d=True)))
            return codes

        inputs = self._inputs(batch)
        if self.netE4label is not None and not m.no_label_encoder_binarization:
            codes.append(
                to01(self.netE4label.encode(weights["netE4label"], inputs["input_label"]))
            )
        if self.netE is not None and not m.no_encoder_binarization:
            codes.append(to01(self.netE.encode(weights["netE"], self._vis(inputs))))
        if not m.no_generator_binarization:
            concat = self._concat(weights, inputs)
            codes.append(to01(self.netG.encode(weights["netG"], concat)))
        return codes

    def get_codes(self, batch: Dict[str, jax.Array]) -> List[jax.Array]:
        return [
            c.reshape(c.shape[0], -1) for c in self.get_codes_shaped(batch)
        ]

    def get_codes_shaped(self, batch: Dict[str, jax.Array]) -> List[jax.Array]:
        if self._jit_codes_shaped is None:
            self._jit_codes_shaped = jax.jit(self.codes_shaped_fn)
        return self._jit_codes_shaped(self.weights, batch)

    def decode_from_codes_fn(
        self,
        weights: Dict,
        codes: List[jax.Array],
        side_batch: Optional[Dict[str, jax.Array]] = None,
    ) -> jax.Array:
        """Deploy-time decoder from the bitstream content alone ((B, h, w, C)
        {0,1} codes in get_codes_shaped order, plus the .jpds side-info
        sections as a loader-shaped batch for raw branches) — mirrors
        SemanticCodec.decode_from_codes with the s2d-optimized trunks."""
        m = self.cfg.model
        if not m.no_generator_binarization:
            return self.netG.decode_from_code(
                weights["netG"], codes[0] * 2.0 - 1.0
            )
        if self.s2d_e2e:
            return self._decode_from_codes_s2d(weights, codes, side_batch)
        side_inputs = None
        if side_batch is not None:
            if side_batch.get("label") is None:
                # shared no-label assembly (train/step.py raw_side_inputs):
                # one definition for both .jpds decoders. (Instance ids
                # without a label can't reach FastCodec — that needs
                # inst_wise_pool, rejected in __init__ — the shared helper
                # passes them through regardless.)
                from jpdse_tpu.train.step import raw_side_inputs

                side_inputs = raw_side_inputs(side_batch, dtype=self.netG.dtype)
            else:
                side_inputs = self._inputs(side_batch)

        def need_side(what):
            if side_inputs is None:
                raise ValueError(
                    f"decode_from_codes: {what} must ride as .jpds side info "
                    "for this configuration"
                )

        i = 0
        input_label = None
        if self.netE4label is not None and not m.no_label_encoder_binarization:
            input_label = self.netE4label.decode_from_code(
                weights["netE4label"], codes[i] * 2.0 - 1.0
            )
            i += 1
        elif not m.no_label:
            need_side("raw semantics")
            input_label = side_inputs["input_label"]
            if self.netE4label is not None:
                input_label = self.netE4label(weights["netE4label"], input_label)
        feat = None
        if not m.no_feat:
            if self.netE is not None and not m.no_encoder_binarization:
                feat = self.netE.decode_from_code(
                    weights["netE"], codes[i] * 2.0 - 1.0
                )
                i += 1  # keep the index math in lockstep with codec.py
            else:
                need_side("visual features (base-codec payload)")
                feat = self._vis(side_inputs)
                if self.netE is not None:
                    feat = self.netE(weights["netE"], feat)
        if feat is None:
            concat = input_label
        elif input_label is None:
            concat = feat
        else:
            concat = jnp.concatenate(
                [input_label, feat.astype(input_label.dtype)], axis=-1
            )
        return self.netG(weights["netG"], concat)

    def _decode_from_codes_s2d(
        self,
        weights: Dict,
        codes: List[jax.Array],
        side_batch: Optional[Dict[str, jax.Array]],
    ) -> jax.Array:
        """s2d-e2e deploy decoder (generator-unbinarized configs): code-fed
        trunks exit pre-depth_to_space, raw side info assembles directly in
        the s2d domain, and netG enters via front_s2d — the same boundary
        elimination as decode_fn, from the bitstream content alone."""
        m = self.cfg.model

        def need_side(what):
            if side_batch is None:
                raise ValueError(
                    f"decode_from_codes: {what} must ride as .jpds side info "
                    "for this configuration"
                )

        i = 0
        comps: List[jax.Array] = []
        if self.netE4label is not None and not m.no_label_encoder_binarization:
            comps.append(
                self.netE4label.decode_from_code(
                    weights["netE4label"], codes[i] * 2.0 - 1.0, keep_s2d=True
                )
            )
            i += 1
        elif not m.no_label:
            need_side("raw semantics")
            label_comps = self._label_comps_s2d(side_batch)
            if self.netE4label is not None:
                comps.append(
                    self.netE4label(
                        weights["netE4label"],
                        s2d_concat_interleave(label_comps),
                        x_is_s2d=True,
                        keep_s2d=True,
                    )
                )
            else:
                comps.extend(label_comps)
        if not m.no_feat:
            if self.netE is not None and not m.no_encoder_binarization:
                comps.append(
                    self.netE.decode_from_code(
                        weights["netE"], codes[i] * 2.0 - 1.0, keep_s2d=True
                    )
                )
                i += 1  # keep the index math in lockstep with codec.py
            else:
                need_side("visual features (base-codec payload)")
                v = self._vis_s2d(side_batch)
                if self.netE is not None:
                    v = self.netE(weights["netE"], v, x_is_s2d=True, keep_s2d=True)
                comps.append(v)
        return self.netG(
            weights["netG"], s2d_concat_interleave(comps), x_is_s2d=True
        )

    def decode_from_codes(
        self, codes: List[jax.Array], side_batch: Optional[Dict] = None
    ) -> jax.Array:
        if self._jit_decode_codes is None:
            self._jit_decode_codes = jax.jit(self.decode_from_codes_fn)
        return self._jit_decode_codes(self.weights, codes, side_batch)
