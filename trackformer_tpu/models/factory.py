"""Model factory: config namespace -> (model, criterion cfg, postprocessors,
tracking cfg).

Parity target: /root/reference/src/trackformer/models/__init__.py:16-130 —
dataset->num_classes mapping (:17-26), the 8-way class selection over
{DETR, DeformableDETR} x {plain, Segm} x {plain, Tracking} (:48-83), the
criterion weight dict incl. aux/enc entries (:85-117) and postprocessor
selection (:120-128).

Here the "mixins" are composition, not inheritance: tracking behavior is the
`tracking_train_forward` orchestration (models/tracking.py) and segmentation
is a head flag on the flax module, so a single factory returns one flax
module + pure-function companions.
"""
from __future__ import annotations

from typing import Any, Dict, Tuple

import jax.numpy as jnp

from .criterion import CriterionConfig
from .deformable_detr import DeformableDETR
from .detr import DETR
from .matcher import MatcherConfig
from .postprocess import postprocess_sigmoid, postprocess_softmax
from .segmentation import DeformableDETRSegm, DETRSegm
from .tracking import TrackingConfig

DATASET_NUM_CLASSES = {
    "coco": 91,
    "coco_panoptic": 250,
    "coco_person": 20,
    "mot": 20,
    "mot_crowdhuman": 20,
    "crowdhuman": 20,
    "mot_coco_person": 20,
}


def num_classes_for(dataset: str) -> int:
    try:
        return DATASET_NUM_CLASSES[dataset]
    except KeyError:
        raise NotImplementedError(f"dataset {dataset!r}")


def build_model(args) -> Tuple[Any, CriterionConfig, Dict, TrackingConfig]:
    num_classes = num_classes_for(args.dataset)
    # focal-loss models drop the softmax no-object slot from the head width
    # (reference models/__init__.py:34)
    head_classes = num_classes - 1 if args.focal_loss else num_classes

    tpu_cfg = getattr(args, "tpu", None)
    dtype = jnp.bfloat16 if (tpu_cfg is not None and getattr(
        tpu_cfg, "compute_dtype", "float32") == "bfloat16") else jnp.float32
    remat = bool(getattr(tpu_cfg, "remat", False)) if tpu_cfg else False

    common = dict(
        num_classes=head_classes,
        num_queries=args.num_queries,
        hidden_dim=args.hidden_dim,
        nheads=args.nheads,
        enc_layers=args.enc_layers,
        dec_layers=args.dec_layers,
        dim_feedforward=args.dim_feedforward,
        dropout=args.dropout,
        backbone_name=args.backbone,
        dilation=args.dilation,
        aux_loss=args.aux_loss,
        dtype=dtype,
    )

    if args.deformable:
        kwargs = dict(
            common,
            num_feature_levels=args.num_feature_levels,
            dec_n_points=args.dec_n_points,
            enc_n_points=args.enc_n_points,
            with_box_refine=args.with_box_refine,
            two_stage=args.two_stage,
            multi_frame_attention=args.multi_frame_attention,
            multi_frame_encoding=args.multi_frame_encoding,
            multi_frame_attention_separate_encoder=(
                args.multi_frame_attention_separate_encoder),
            merge_frame_features=args.merge_frame_features,
            overflow_boxes=args.overflow_boxes,
            remat=remat,
            encoder_attention=(getattr(tpu_cfg, "encoder_attention", "msda")
                               if tpu_cfg else "msda"),
            encoder_window=int(getattr(tpu_cfg, "encoder_window", 8)
                               if tpu_cfg else 8),
            decoder_attention=(getattr(tpu_cfg, "decoder_attention", "msda")
                               if tpu_cfg else "msda"),
            scan_layers=bool(getattr(tpu_cfg, "scan_layers", False)
                             if tpu_cfg else False),
            cached_prev_memory=bool(
                getattr(tpu_cfg, "cached_prev_memory", False)
                if tpu_cfg else False),
        )
        model = (DeformableDETRSegm(**kwargs, freeze_detr=args.freeze_detr)
                 if args.masks else DeformableDETR(**kwargs))
    else:
        kwargs = dict(
            common,
            pre_norm=args.pre_norm,
            overflow_boxes=args.overflow_boxes,
            track_attention=args.track_attention,
        )
        model = (DETRSegm(**kwargs, freeze_detr=args.freeze_detr)
                 if args.masks else DETR(**kwargs))

    matcher_cfg = MatcherConfig(
        cost_class=args.set_cost_class,
        cost_bbox=args.set_cost_bbox,
        cost_giou=args.set_cost_giou,
        focal_loss=args.focal_loss,
        focal_alpha=args.focal_alpha,
        focal_gamma=args.focal_gamma,
    )

    weight_dict = {
        "loss_ce": args.cls_loss_coef,
        "loss_bbox": args.bbox_loss_coef,
        "loss_giou": args.giou_loss_coef,
    }
    if args.masks:
        weight_dict["loss_mask"] = args.mask_loss_coef
        weight_dict["loss_dice"] = args.dice_loss_coef
    if args.aux_loss:
        aux = {}
        for i in range(args.dec_layers - 1):
            aux.update({f"{k}_{i}": v for k, v in weight_dict.items()})
        if args.two_stage:
            aux.update({f"{k}_enc": v for k, v in weight_dict.items()})
        weight_dict.update(aux)

    losses = ("labels", "boxes", "cardinality")
    if args.masks:
        losses = losses + ("masks",)

    criterion_cfg = CriterionConfig(
        num_classes=num_classes,
        matcher=matcher_cfg,
        weight_dict=weight_dict,
        eos_coef=args.eos_coef,
        focal_loss=args.focal_loss,
        focal_alpha=args.focal_alpha,
        focal_gamma=args.focal_gamma,
        tracking=args.tracking,
        track_query_false_positive_eos_weight=(
            args.track_query_false_positive_eos_weight),
        losses=losses,
    )

    postprocessors = {
        "bbox": postprocess_sigmoid if args.focal_loss else postprocess_softmax}
    if args.masks:
        from .segmentation import postprocess_segm
        postprocessors["segm"] = postprocess_segm
        if args.dataset == "coco_panoptic":
            # things are categories 1..90 (reference models/__init__.py:124)
            import functools
            from .panoptic import postprocess_panoptic
            is_thing_map = {i: i <= 90 for i in range(250)}
            postprocessors["panoptic"] = functools.partial(
                postprocess_panoptic, is_thing_map=is_thing_map,
                threshold=0.85)

    tracking_cfg = TrackingConfig(
        false_positive_prob=args.track_query_false_positive_prob,
        false_negative_prob=args.track_query_false_negative_prob,
        backprop_prev_frame=args.track_backprop_prev_frame,
        matcher=matcher_cfg,
    )
    return model, criterion_cfg, postprocessors, tracking_cfg
