"""Deformable DETR head: multi-level projections, (optionally separate
per-frame) deformable encoder, refinement decoder, two-stage proposals,
track-query injection.

Parity targets:
  * /root/reference/src/trackformer/models/deformable_detr.py:29-283
    (input projections + GroupNorm :56-79, focal class bias :83-90,
    multi-frame feature assembly :149-221, per-layer box head with
    inverse-sigmoid reference refinement :229-248)
  * /root/reference/src/trackformer/models/deformable_transformer.py:133-255
    (flatten + valid ratios, separate encoders, track-query concat
    :202-230, two-stage :181-194)

Design notes (TPU-first):
  * the decoder loop runs here so refinement and output heads share the same
    flax submodules (the reference wires this with module back-references);
  * `outputs_coord[l]` doubles as the refined reference for layer l+1 under
    box refinement — computed once, not twice as in the reference;
  * the multi-frame "separate encoder" runs the SAME encoder module over the
    prev-level and cur-level token halves, and the memory halves are
    concatenated [cur, prev] exactly as the reference does (:173).
"""
from __future__ import annotations

import math
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.losses import inverse_sigmoid
from ..structures import FrameBatch, Targets
from .backbone import Backbone, downsample_mask
from .deformable_transformer import (
    DeformableDecoderLayer, DeformableEncoder, decoder_reference_input,
    gen_encoder_output_proposals, get_valid_ratio, proposal_pos_embed)
from .detr import MLP
from .position_encoding import (sine_position_encoding,
                                sine_position_encoding_3d)


def focal_class_bias_init(prior_prob: float = 0.01):
    bias_value = -math.log((1 - prior_prob) / prior_prob)

    def init(key, shape, dtype=jnp.float32):
        return jnp.full(shape, bias_value, dtype)
    return init


def bbox_head_bias_init(wh_bias: float):
    def init(key, shape, dtype=jnp.float32):
        b = jnp.zeros(shape, dtype)
        return b.at[2:].set(wh_bias)
    return init


class _DecoderScanBody(nn.Module):
    """One decoder layer (shared-head / no-refine form) for nn.scan:
    reference points never change, so the reference input is broadcast and
    the carry is just the query tensor. ys = per-layer hidden states."""
    d_model: int
    n_levels: int
    n_heads: int
    n_points: int
    dim_feedforward: int
    dropout: float
    dtype: Any
    attention: str
    spatial_shapes: tuple
    deterministic: bool

    @nn.compact
    def __call__(self, tgt, query_pos, ref_input, memory, mask_flat,
                 tgt_key_pad, src_pos):
        out = DeformableDecoderLayer(
            self.d_model, self.n_levels, self.n_heads, self.n_points,
            self.dim_feedforward, self.dropout, self.dtype,
            attention=self.attention, name="layer")(
                tgt, query_pos, ref_input, memory, self.spatial_shapes,
                mask_flat, tgt_key_pad, self.deterministic, src_pos=src_pos)
        return out, out


class _DecoderScanBodyRefine(nn.Module):
    """One decoder layer + its (per-layer) class/box heads for nn.scan under
    box refinement.

    lax.scan needs a shape-invariant carry, but the reference's refinement
    loop starts from 2-d (x, y) reference points and switches to 4-d boxes
    after the first layer (deformable_transformer.py:389-414). The carry is
    therefore always 4-d; on the first step (scanned `is_first` flag) the
    2-d sampling semantics are reproduced exactly by a synthetic
    wh = 2 * n_points / (H, W): the 4-d sampling formula
    `ref_xy + offsets / p * wh * 0.5` then reduces to the 2-d formula
    `ref_xy + offsets / (H, W)` (see MSDeformAttnModule), and the
    first-step refinement adds inverse_sigmoid only to the xy components.
    """
    d_model: int
    n_levels: int
    n_heads: int
    n_points: int
    dim_feedforward: int
    dropout: float
    dtype: Any
    attention: str
    num_classes: int
    wh_bias: float
    spatial_shapes: tuple
    deterministic: bool
    started_2dim: bool

    @nn.compact
    def __call__(self, carry, is_first, query_pos, memory, mask_flat,
                 tgt_key_pad, src_pos, valid_ratios):
        out_t, ref = carry  # ref: (B, Q, 4) in sigmoid space
        ri = decoder_reference_input(ref, valid_ratios)  # (B, Q, L, 4)
        if self.started_2dim:
            ri_xy = ref[:, :, None, :2] * valid_ratios[:, None]
            wh_fake = 2.0 * self.n_points / jnp.asarray(
                list(self.spatial_shapes), jnp.float32)  # (L, 2) = (h, w)
            wh_fake = jnp.broadcast_to(wh_fake[None, None], ri_xy.shape)
            ri = jnp.where(is_first,
                           jnp.concatenate([ri_xy, wh_fake], -1), ri)
        out_t = DeformableDecoderLayer(
            self.d_model, self.n_levels, self.n_heads, self.n_points,
            self.dim_feedforward, self.dropout, self.dtype,
            attention=self.attention, name="layer")(
                out_t, query_pos, ri, memory, self.spatial_shapes,
                mask_flat, tgt_key_pad, self.deterministic, src_pos=src_pos)
        cls_i = nn.Dense(self.num_classes + 1, dtype=self.dtype,
                         bias_init=focal_class_bias_init(),
                         name="class_embed")(out_t).astype(jnp.float32)
        tmp = MLP(self.d_model, 4, 3, dtype=self.dtype, last_zero_init=True,
                  last_bias_init=bbox_head_bias_init(self.wh_bias),
                  name="bbox_embed")(out_t).astype(jnp.float32)
        inv = inverse_sigmoid(ref)
        tmp4 = tmp + inv
        if self.started_2dim:
            tmp4 = jnp.where(is_first, tmp.at[..., :2].add(inv[..., :2]),
                             tmp4)
        coord_i = jax.nn.sigmoid(tmp4)
        new_ref = jax.lax.stop_gradient(coord_i)
        return (out_t, new_ref), (cls_i, coord_i, out_t)


class ScanDecoder(nn.Module):
    """lax.scan over decoder layers (opt-in `tpu.scan_layers`): one traced
    layer body instead of `num_layers` unrolled copies, ~6x smaller HLO.
    Per-layer params are stacked on a leading axis (checkpoint bridge:
    utils/checkpoint.py). Returns (hs, cls, coord) stacks; cls/coord are
    None without box refinement (the caller applies its shared heads)."""
    d_model: int
    n_levels: int
    num_layers: int
    n_heads: int
    n_points: int
    dim_feedforward: int
    dropout: float
    dtype: Any
    attention: str
    num_classes: int
    wh_bias: float
    with_box_refine: bool
    remat: bool = False

    @nn.compact
    def __call__(self, tgt, query_pos, reference_points, memory,
                 spatial_shapes, valid_ratios, mask_flat=None,
                 tgt_key_pad=None, deterministic=True, src_pos=None):
        shapes = tuple(spatial_shapes)
        if self.with_box_refine:
            started2 = reference_points.shape[-1] == 2
            ref4 = (jnp.concatenate(
                [reference_points, jnp.zeros_like(reference_points)], -1)
                if started2 else reference_points)
            body_cls = (nn.remat(_DecoderScanBodyRefine) if self.remat
                        else _DecoderScanBodyRefine)
            body = nn.scan(
                body_cls,
                variable_axes={"params": 0},
                split_rngs={"params": True, "dropout": True},
                in_axes=(0,) + (nn.broadcast,) * 6, out_axes=0,
                length=self.num_layers)(
                    self.d_model, self.n_levels, self.n_heads,
                    self.n_points, self.dim_feedforward, self.dropout,
                    self.dtype, self.attention, self.num_classes,
                    self.wh_bias, shapes, deterministic, started2,
                    name="layers")
            is_first = jnp.arange(self.num_layers) == 0
            (_, _), (cls, coord, hs) = body(
                (tgt, ref4), is_first[:, None, None, None], query_pos,
                memory, mask_flat, tgt_key_pad, src_pos, valid_ratios)
            return hs, cls, coord
        ri = decoder_reference_input(reference_points, valid_ratios)
        body_cls = (nn.remat(_DecoderScanBody) if self.remat
                    else _DecoderScanBody)
        body = nn.scan(
            body_cls,
            variable_axes={"params": 0},
            split_rngs={"params": True, "dropout": True},
            in_axes=nn.broadcast, out_axes=0,
            length=self.num_layers)(
                self.d_model, self.n_levels, self.n_heads, self.n_points,
                self.dim_feedforward, self.dropout, self.dtype,
                self.attention, shapes, deterministic, name="layers")
        _, hs = body(tgt, query_pos, ri, memory, mask_flat, tgt_key_pad,
                     src_pos)
        return hs, None, None


class InputProj(nn.Module):
    """1x1 (or 3x3 stride-2 for extra levels) conv + GroupNorm(32)."""
    hidden_dim: int
    stride2: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        if self.stride2:
            x = nn.Conv(self.hidden_dim, (3, 3), strides=(2, 2),
                        padding=[(1, 1), (1, 1)], dtype=self.dtype,
                        kernel_init=nn.initializers.xavier_uniform(),
                        name="conv")(x)
        else:
            x = nn.Conv(self.hidden_dim, (1, 1), dtype=self.dtype,
                        kernel_init=nn.initializers.xavier_uniform(),
                        name="conv")(x)
        return nn.GroupNorm(num_groups=32, dtype=self.dtype, name="norm")(x)


class DeformableDETR(nn.Module):
    num_classes: int  # head classes (factory passes dataset classes - 1 w/ focal)
    num_queries: int = 300
    hidden_dim: int = 256
    nheads: int = 8
    enc_layers: int = 6
    dec_layers: int = 6
    dim_feedforward: int = 1024
    dropout: float = 0.1
    num_feature_levels: int = 4
    dec_n_points: int = 4
    enc_n_points: int = 4
    with_box_refine: bool = False
    two_stage: bool = False
    multi_frame_attention: bool = False
    multi_frame_encoding: bool = True
    multi_frame_attention_separate_encoder: bool = True
    merge_frame_features: bool = False
    overflow_boxes: bool = False
    backbone_name: str = "resnet50"
    dilation: bool = False
    aux_loss: bool = True
    dtype: Any = jnp.float32
    remat: bool = False
    # 'msda' = exact deformable attention (reference parity);
    # 'windowed' = TPU-fast shifted-window encoder (see windowed_encoder.py)
    encoder_attention: str = "msda"
    # window side (tokens) for the windowed encoder; ablatable via
    # `tpu.encoder_window` (fast-vs-exact agreement studies)
    encoder_window: int = 8
    # decoder cross-attention: 'msda' (parity) | 'dense' (full attention —
    # cheaper than gathers on the MXU at DETR query counts)
    decoder_attention: str = "msda"
    # lax.scan over encoder/decoder layers (opt-in `tpu.scan_layers`):
    # identical numerics, ~6x smaller HLO -> far faster compiles for the
    # exact-MSDA mode. Per-layer params are stacked (utils/checkpoint.py
    # bridges the two layouts).
    scan_layers: bool = False
    # Opt-in `tpu.cached_prev_memory`: in multi-frame separate-encoder mode,
    # encode only the CURRENT frame and reuse the previous step's encoded
    # memory as the prev half — halves encoder cost at inference. Requires
    # frame-symmetric token encoding (shared level embeds + frame-0 pos for
    # both halves); frame identity is restored AFTER the encoder by a
    # learned per-frame embedding added to the memory, so the cached half
    # is frame-agnostic and exactly reusable.
    cached_prev_memory: bool = False

    @property
    def total_levels(self) -> int:
        return self.num_feature_levels * (2 if self.multi_frame_attention else 1)

    @property
    def _cached_mode(self) -> bool:
        return (self.cached_prev_memory and self.multi_frame_attention
                and self.multi_frame_attention_separate_encoder
                and not self.merge_frame_features)

    def setup(self):
        self.backbone = Backbone(self.backbone_name, self.dilation,
                                 return_interm_layers=True, dtype=self.dtype)
        n_backbone_levels = min(3, self.num_feature_levels)
        projs = [InputProj(self.hidden_dim, dtype=self.dtype)
                 for _ in range(n_backbone_levels)]
        for _ in range(self.num_feature_levels - n_backbone_levels):
            projs.append(InputProj(self.hidden_dim, stride2=True,
                                   dtype=self.dtype))
        self.input_proj = projs

        if self.merge_frame_features:
            self.merge_features = [
                nn.Conv(self.hidden_dim, (1, 1), dtype=self.dtype)
                for _ in range(self.num_feature_levels)]

        self.level_embed = self.param(
            "level_embed", nn.initializers.normal(1.0),
            (self.total_levels, self.hidden_dim))
        if self._cached_mode:
            self.frame_embed = self.param(
                "frame_embed", nn.initializers.normal(1.0),
                (2, self.hidden_dim))

        enc_levels = (self.total_levels // 2
                      if (self.multi_frame_attention
                          and self.multi_frame_attention_separate_encoder)
                      else self.total_levels)
        if self.encoder_attention == "windowed":
            from .windowed_encoder import WindowedEncoder
            self.encoder = WindowedEncoder(
                self.hidden_dim, self.enc_layers, self.nheads,
                self.dim_feedforward, self.dropout,
                window=self.encoder_window, dtype=self.dtype)
        else:
            self.encoder = DeformableEncoder(
                self.hidden_dim, enc_levels, self.enc_layers, self.nheads,
                self.enc_n_points, self.dim_feedforward, self.dropout,
                self.dtype, self.remat, scan_layers=self.scan_layers)

        if not self.scan_layers:
            self.decoder_layers = [
                DeformableDecoderLayer(self.hidden_dim, self.total_levels,
                                       self.nheads, self.dec_n_points,
                                       self.dim_feedforward, self.dropout,
                                       self.dtype,
                                       attention=self.decoder_attention)
                for _ in range(self.dec_layers)]

        num_pred = self.dec_layers + (1 if self.two_stage else 0)
        wh_bias = 0.0 if self.two_stage else -2.0
        if self.scan_layers:
            self.dec_scan = ScanDecoder(
                self.hidden_dim, self.total_levels, self.dec_layers,
                self.nheads, self.dec_n_points, self.dim_feedforward,
                self.dropout, self.dtype, self.decoder_attention,
                self.num_classes, wh_bias, self.with_box_refine, self.remat)
        if self.scan_layers and self.with_box_refine:
            # per-layer heads live inside the scan body; only the two-stage
            # encoder-proposal head (unrolled index num_pred-1) is separate
            if self.two_stage:
                self.enc_class_embed = nn.Dense(
                    self.num_classes + 1, dtype=self.dtype,
                    bias_init=focal_class_bias_init())
                self.enc_bbox_embed = MLP(
                    self.hidden_dim, 4, 3, dtype=self.dtype,
                    last_zero_init=True,
                    last_bias_init=bbox_head_bias_init(wh_bias))
        elif self.with_box_refine:
            self.class_embed = [
                nn.Dense(self.num_classes + 1, dtype=self.dtype,
                         bias_init=focal_class_bias_init())
                for _ in range(num_pred)]
            self.bbox_embed = [
                MLP(self.hidden_dim, 4, 3, dtype=self.dtype,
                    last_zero_init=True,
                    last_bias_init=bbox_head_bias_init(wh_bias))
                for _ in range(num_pred)]
        else:
            shared_cls = nn.Dense(self.num_classes + 1, dtype=self.dtype,
                                  bias_init=focal_class_bias_init())
            shared_box = MLP(self.hidden_dim, 4, 3, dtype=self.dtype,
                             last_zero_init=True,
                             last_bias_init=bbox_head_bias_init(wh_bias))
            self.class_embed = [shared_cls] * num_pred
            self.bbox_embed = [shared_box] * num_pred

        if self.two_stage:
            self.enc_output = nn.Dense(self.hidden_dim, dtype=self.dtype)
            self.enc_output_norm = nn.LayerNorm(dtype=self.dtype)
            self.pos_trans = nn.Dense(self.hidden_dim * 2, dtype=self.dtype)
            self.pos_trans_norm = nn.LayerNorm(dtype=self.dtype)
        else:
            self.query_embed = self.param(
                "query_embed", nn.initializers.normal(1.0),
                (self.num_queries, self.hidden_dim * 2))
            self.reference_points = nn.Dense(
                2, dtype=self.dtype,
                kernel_init=nn.initializers.xavier_uniform())

    def _level_pos(self, mask, frame_idx):
        if self.multi_frame_attention and self.multi_frame_encoding:
            pos = sine_position_encoding_3d(mask, self.hidden_dim // 3,
                                            num_frames=2, dtype=self.dtype)
            return pos[:, frame_idx]
        return sine_position_encoding(mask, self.hidden_dim // 2,
                                      dtype=self.dtype)

    def _project_frame(self, frame_feats, frame_masks, prev_feats, batch_mask,
                       frame_idx):
        """Project one frame's backbone levels to hidden_dim + extra levels.

        Mirrors deformable_detr.py:165-221 including merge_frame_features.
        """
        srcs, masks, poses = [], [], []
        n_bb = len(frame_feats)
        for l in range(n_bb):
            src = self.input_proj[l](frame_feats[l])
            if self.merge_frame_features:
                prev_src = self.input_proj[l](prev_feats[l])
                src = self.merge_features[l](
                    jnp.concatenate([src, prev_src], axis=-1))
            srcs.append(src)
            masks.append(frame_masks[l])
            poses.append(self._level_pos(frame_masks[l], frame_idx))
        for l in range(n_bb, self.num_feature_levels):
            if l == n_bb:
                src = self.input_proj[l](frame_feats[-1])
                if self.merge_frame_features:
                    prev_src = self.input_proj[l](prev_feats[-1])
                    src = self.merge_features[l](
                        jnp.concatenate([src, prev_src], axis=-1))
            else:
                src = self.input_proj[l](srcs[-1])
            mask = downsample_mask(batch_mask, src.shape[1:3])
            srcs.append(src)
            masks.append(mask)
            poses.append(self._level_pos(mask, frame_idx))
        return srcs, masks, poses

    def _decoder_unrolled(self, tgt, query_pos, reference_points, memory,
                          spatial_shapes, valid_ratios, mask_flat,
                          tgt_key_pad, deterministic, pos_flat):
        out_t = tgt
        outputs_classes, outputs_coords, hs_list = [], [], []
        for i, layer in enumerate(self.decoder_layers):
            ref_input = decoder_reference_input(reference_points,
                                                valid_ratios)
            out_t = layer(out_t, query_pos, ref_input, memory,
                          spatial_shapes, mask_flat, tgt_key_pad,
                          deterministic, src_pos=pos_flat)
            cls_i = self.class_embed[i](out_t).astype(jnp.float32)
            tmp = self.bbox_embed[i](out_t).astype(jnp.float32)
            if reference_points.shape[-1] == 4:
                tmp = tmp + inverse_sigmoid(reference_points)
            else:
                tmp = tmp.at[..., :2].add(inverse_sigmoid(reference_points))
            coord_i = jax.nn.sigmoid(tmp)
            if self.with_box_refine:
                reference_points = jax.lax.stop_gradient(coord_i)
            outputs_classes.append(cls_i)
            outputs_coords.append(coord_i)
            hs_list.append(out_t)
        return outputs_classes, outputs_coords, hs_list

    def __call__(self, batch: FrameBatch, targets: Optional[Targets] = None,
                 prev_features=None, deterministic: bool = True):
        features, feat_masks = self.backbone(batch)
        feature_pairs = list(zip(features, feat_masks))

        cur3 = features[-3:]
        cur3_masks = feat_masks[-3:]
        if prev_features is None:
            prev3 = cur3
            prev3_masks = cur3_masks
        else:
            prev_pairs = prev_features[-3:]
            prev3 = [p[0] for p in prev_pairs]
            prev3_masks = [p[1] for p in prev_pairs]

        b = batch.batch_size
        c = self.hidden_dim

        if self._cached_mode:
            # encode ONLY the current frame, frame-symmetrically (frame-0
            # pos + first-half level embeds for both halves); reuse the
            # previous step's cached memory as the prev half and restore
            # frame identity with a post-encoder frame embedding
            srcs, masks, poses = self._project_frame(cur3, cur3_masks, prev3,
                                                     batch.mask, 0)
            half_shapes = tuple((s.shape[1], s.shape[2]) for s in srcs)
            spatial_shapes = half_shapes * 2
            src_flat_h = jnp.concatenate(
                [s.reshape(b, -1, c) for s in srcs], axis=1)
            mask_half = jnp.concatenate(
                [m.reshape(b, -1) for m in masks], axis=1)
            pos_half = jnp.concatenate(
                [(p.reshape(b, -1, c)
                  + self.level_embed[i][None, None].astype(self.dtype))
                 for i, p in enumerate(poses)], axis=1)
            vr_half = jnp.stack([get_valid_ratio(m) for m in masks], axis=1)
            if self.encoder_attention == "windowed":
                poses_wl = [
                    (p + self.level_embed[i][None, None, None].astype(
                        self.dtype)) for i, p in enumerate(poses)]
                cur_memory = self.encoder(srcs, masks, poses_wl,
                                          deterministic)
            else:
                cur_memory = self.encoder(src_flat_h, half_shapes, vr_half,
                                          pos_half, mask_half, deterministic)
            if prev_features is not None:
                prev_memory = prev_features[-1][0].astype(cur_memory.dtype)
            else:
                prev_memory = cur_memory
            fe = self.frame_embed.astype(self.dtype)
            memory = jnp.concatenate(
                [cur_memory + fe[1][None, None],
                 prev_memory + fe[0][None, None]], axis=1)
            mask_flat = jnp.concatenate([mask_half, mask_half], axis=1)
            pos_flat = jnp.concatenate([pos_half, pos_half], axis=1)
            valid_ratios = jnp.concatenate([vr_half, vr_half], axis=1)
            feature_pairs = feature_pairs + [(cur_memory, mask_half)]
            return self._decode(batch, targets, deterministic, memory,
                                spatial_shapes, mask_flat, pos_flat,
                                valid_ratios, feature_pairs)

        if self.multi_frame_attention:
            frame_sets = [(prev3, prev3_masks, 0), (cur3, cur3_masks, 1)]
        else:
            frame_sets = [(cur3, cur3_masks, 0)]

        srcs, masks, poses = [], [], []
        for feats_f, masks_f, fidx in frame_sets:
            s, m, p = self._project_frame(feats_f, masks_f, prev3,
                                          batch.mask, fidx)
            srcs += s
            masks += m
            poses += p

        # flatten levels (deformable_transformer.py:136-157)
        spatial_shapes = tuple((s.shape[1], s.shape[2]) for s in srcs)
        src_flat = jnp.concatenate(
            [s.reshape(b, -1, c) for s in srcs], axis=1)
        mask_flat = jnp.concatenate([m.reshape(b, -1) for m in masks], axis=1)
        pos_flat = jnp.concatenate(
            [(p.reshape(b, -1, c) + self.level_embed[i][None, None].astype(
                self.dtype)) for i, p in enumerate(poses)], axis=1)
        valid_ratios = jnp.stack([get_valid_ratio(m) for m in masks], axis=1)

        # encoder (optionally one pass per frame with shared weights)
        if self.encoder_attention == "windowed":
            poses_wl = [
                (p + self.level_embed[i][None, None, None].astype(self.dtype))
                for i, p in enumerate(poses)]
            if (self.multi_frame_attention
                    and self.multi_frame_attention_separate_encoder):
                half = len(srcs) // 2
                prev_memory = self.encoder(srcs[:half], masks[:half],
                                           poses_wl[:half], deterministic)
                cur_memory = self.encoder(srcs[half:], masks[half:],
                                          poses_wl[half:], deterministic)
                memory = jnp.concatenate([cur_memory, prev_memory], axis=1)
            else:
                memory = self.encoder(srcs, masks, poses_wl, deterministic)
        elif (self.multi_frame_attention
                and self.multi_frame_attention_separate_encoder):
            half_tokens = src_flat.shape[1] // 2
            half_levels = self.total_levels // 2
            prev_memory = self.encoder(
                src_flat[:, :half_tokens], spatial_shapes[:half_levels],
                valid_ratios[:, :half_levels], pos_flat[:, :half_tokens],
                mask_flat[:, :half_tokens], deterministic)
            cur_memory = self.encoder(
                src_flat[:, half_tokens:], spatial_shapes[half_levels:],
                valid_ratios[:, half_levels:], pos_flat[:, half_tokens:],
                mask_flat[:, half_tokens:], deterministic)
            memory = jnp.concatenate([cur_memory, prev_memory], axis=1)
        else:
            memory = self.encoder(src_flat, spatial_shapes, valid_ratios,
                                  pos_flat, mask_flat, deterministic)

        return self._decode(batch, targets, deterministic, memory,
                            spatial_shapes, mask_flat, pos_flat,
                            valid_ratios, feature_pairs)

    def _decode(self, batch, targets, deterministic, memory, spatial_shapes,
                mask_flat, pos_flat, valid_ratios, feature_pairs):
        b = batch.batch_size
        c = self.hidden_dim
        # decoder inputs
        enc_outputs = None
        if self.two_stage:
            out_mem, out_props = gen_encoder_output_proposals(
                memory, mask_flat, spatial_shapes)
            out_mem = self.enc_output_norm(self.enc_output(out_mem))
            if self.scan_layers and self.with_box_refine:
                enc_cls_head, enc_box_head = (self.enc_class_embed,
                                              self.enc_bbox_embed)
            else:
                enc_cls_head, enc_box_head = (self.class_embed[-1],
                                              self.bbox_embed[-1])
            enc_logits = enc_cls_head(out_mem).astype(jnp.float32)
            enc_coords_unact = (enc_box_head(out_mem).astype(jnp.float32)
                                + out_props)
            topk = self.num_queries
            _, topk_idx = jax.lax.top_k(enc_logits[..., 0], topk)
            topk_coords = jnp.take_along_axis(
                enc_coords_unact, topk_idx[..., None], axis=1)
            topk_coords = jax.lax.stop_gradient(topk_coords)
            reference_points = jax.nn.sigmoid(topk_coords)
            pos_trans_out = self.pos_trans_norm(self.pos_trans(
                proposal_pos_embed(topk_coords).astype(self.dtype)))
            query_pos, tgt = jnp.split(pos_trans_out, 2, axis=-1)
            query_valid = jnp.ones((b, topk), bool)
            tgt_key_pad = None
            enc_outputs = {"pred_logits": enc_logits,
                           "pred_boxes": jax.nn.sigmoid(enc_coords_unact)}
        else:
            qe = self.query_embed.astype(self.dtype)
            query_pos = jnp.broadcast_to(qe[None, :, :c], (b,) + qe[:, :c].shape)
            tgt = jnp.broadcast_to(qe[None, :, c:], (b,) + qe[:, c:].shape)
            reference_points = jax.nn.sigmoid(
                self.reference_points(query_pos).astype(jnp.float32))
            query_valid = jnp.ones((b, self.num_queries), bool)
            tgt_key_pad = None

            if targets is not None and targets.tq_hs_embeds is not None:
                # track-query injection (deformable_transformer.py:202-230)
                k = targets.tq_hs_embeds.shape[1]
                prev_pos = jnp.zeros((b, k, c), self.dtype)
                prev_tgt = targets.tq_hs_embeds.astype(self.dtype)
                query_pos = jnp.concatenate([prev_pos, query_pos], axis=1)
                tgt = jnp.concatenate([prev_tgt, tgt], axis=1)
                reference_points = jnp.concatenate(
                    [targets.tq_boxes[..., :2].astype(jnp.float32),
                     reference_points], axis=1)
                query_valid = jnp.concatenate(
                    [targets.tq_valid, query_valid], axis=1)
                tgt_key_pad = ~query_valid

        # decoder with iterative refinement; heads shared with refinement
        if self.scan_layers:
            hs_stack, cls_stack, coord_stack = self.dec_scan(
                tgt, query_pos, reference_points, memory, spatial_shapes,
                valid_ratios, mask_flat, tgt_key_pad, deterministic,
                pos_flat)
            if cls_stack is None:  # shared heads (no box refinement)
                cls_stack = self.class_embed[0](hs_stack).astype(jnp.float32)
                tmp = self.bbox_embed[0](hs_stack).astype(jnp.float32)
                if reference_points.shape[-1] == 4:
                    tmp = tmp + inverse_sigmoid(reference_points)[None]
                else:
                    tmp = tmp.at[..., :2].add(
                        inverse_sigmoid(reference_points)[None])
                coord_stack = jax.nn.sigmoid(tmp)
            outputs_classes = [cls_stack[i] for i in range(self.dec_layers)]
            outputs_coords = [coord_stack[i] for i in range(self.dec_layers)]
            hs_list = [hs_stack[i] for i in range(self.dec_layers)]
        else:
            outputs_classes, outputs_coords, hs_list = self._decoder_unrolled(
                tgt, query_pos, reference_points, memory, spatial_shapes,
                valid_ratios, mask_flat, tgt_key_pad, deterministic,
                pos_flat)

        hs = jnp.stack(hs_list)
        out = {
            "pred_logits": outputs_classes[-1],
            "pred_boxes": outputs_coords[-1],
            "hs_embed": hs[-1].astype(jnp.float32),
            "query_valid": query_valid,
        }
        if self.aux_loss:
            out["aux_outputs"] = [
                {"pred_logits": outputs_classes[i],
                 "pred_boxes": outputs_coords[i],
                 "query_valid": query_valid}
                for i in range(self.dec_layers - 1)]
        if enc_outputs is not None:
            out["enc_outputs"] = enc_outputs

        # per-level memory maps (deformable_detr.py:261-271)
        memory_slices = []
        offset = 0
        for (h, w) in spatial_shapes:
            memory_slices.append(
                memory[:, offset:offset + h * w].reshape(b, h, w, c))
            offset += h * w

        return out, targets, feature_pairs, memory_slices, hs
