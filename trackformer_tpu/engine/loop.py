"""Epoch loops: training and evaluation.

Parity target: /root/reference/src/trackformer/engine.py —
`train_one_epoch` (:101-175 incl. the non-finite loss abort :142-145),
`evaluate` (:178-357) combining loss logging, COCO detection eval via
`make_results` (:24-98), and the in-process tracking eval that re-enters the
track CLI with the live model (:283-337).
"""
from __future__ import annotations

import math
import sys
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..models.criterion import compute_losses
from ..utils.metrics import MetricLogger


def train_one_epoch(train_step, state, loader, device_put, epoch: int,
                    rng, weight_dict: Dict[str, float],
                    vis=None, print_freq: int = 50, debug: bool = False,
                    profile_dir: str = "", profile_steps: int = 8):
    """One training epoch. With `profile_dir` set (tpu.profile_dir), a
    `jax.profiler` trace of steps [2, 2+profile_steps) — skipping the
    compile step — is dumped there in TensorBoard/XPlane format with
    per-step StepTraceAnnotation markers: the TPU-native replacement for
    the reference's `torch.cuda.max_memory_allocated` meter (SURVEY §5;
    reference util/misc.py:206-247)."""
    logger = MetricLogger(print_freq, vis=vis, debug=debug)
    header = f"Epoch: [{epoch}]"
    tracing = False
    for step, pack in enumerate(logger.log_every(loader, header)):
        if profile_dir and step == 2:
            jax.profiler.start_trace(profile_dir)
            tracing = True
        with jax.profiler.StepTraceAnnotation("train", step_num=step):
            pack = device_put(pack)
            state, metrics = train_step(state, pack, rng)
            loss_value = float(metrics["loss"])
        if tracing and step >= 2 + profile_steps - 1:
            jax.profiler.stop_trace()
            tracing = False
            print(f"profiler trace written to {profile_dir}")
        if not math.isfinite(loss_value):
            if tracing:
                jax.profiler.stop_trace()
            print(f"Loss is {loss_value}, stopping training")
            print({k: float(v) for k, v in metrics.items()})
            sys.exit(1)
        logger.update(**{k: float(v) for k, v in metrics.items()
                         if not k.startswith("_")})
    if tracing:  # epoch shorter than the trace window
        jax.profiler.stop_trace()
    return state, {k: m.global_avg for k, m in logger.meters.items()}


def make_results(outputs: Dict, targets, postprocess,
                 num_object_queries: int, postprocess_segm=None,
                 batch=None) -> Dict[int, dict]:
    """Model outputs -> per-image detection dicts at original resolution
    (reference engine.py:24-98). Only object-query slots feed detection
    eval. With `postprocess_segm` + `batch`, per-image masks are cropped to
    the valid region, rescaled to the original size and RLE-encoded for
    segm AP (reference PostProcessSegm, detr_segmentation.py:219-253)."""
    res = postprocess(outputs, jnp.asarray(targets.orig_size))
    out = {}
    boxes = np.asarray(res["boxes"])[:, -num_object_queries:]
    scores = np.asarray(res["scores"])[:, -num_object_queries:]
    labels = np.asarray(res["labels"])[:, -num_object_queries:]
    image_ids = np.asarray(targets.image_id)
    for i, img_id in enumerate(image_ids):
        out[int(img_id)] = {
            "boxes": boxes[i],
            "scores": scores[i],
            "labels": labels[i] + 1,  # back to 1-based category ids
        }
    if postprocess_segm is not None and batch is not None \
            and "pred_masks" in outputs:
        from PIL import Image

        from ..utils import rle
        pad_hw = batch.images.shape[1:3]
        segm = postprocess_segm({}, outputs, pad_hw, return_probs=True)
        probs = np.asarray(segm["masks"])[:, -num_object_queries:]
        sizes = np.asarray(targets.size)
        origs = np.asarray(targets.orig_size)
        for i, img_id in enumerate(image_ids):
            h_i, w_i = int(sizes[i, 0]), int(sizes[i, 1])
            oh, ow = int(origs[i, 0]), int(origs[i, 1])
            rles = []
            for q in range(probs.shape[1]):
                m = probs[i, q, :h_i, :w_i]
                if (oh, ow) != (h_i, w_i):
                    m = np.asarray(Image.fromarray(m).resize(
                        (ow, oh), Image.BILINEAR))
                rles.append(rle.encode_mask(m > 0.5))
            out[int(img_id)]["masks"] = rles
    return out


def evaluate(model, params, criterion_cfg, postprocessors, loader,
             device_put, gt_dataset, args, vis=None,
             obj_detector_model=None) -> Dict:
    from ..datasets.coco_eval import CocoEvaluator

    logger = MetricLogger(args.vis_and_log_interval,
                          debug=getattr(args, "debug", False))
    with_masks = getattr(args, "masks", False)
    iou_types = ("bbox", "segm") if with_masks else ("bbox",)
    evaluator = CocoEvaluator(gt_dataset, iou_types)

    # panoptic eval (reference engine.py:193-200, 244-280)
    panoptic_evaluator = None
    if "panoptic" in postprocessors and hasattr(gt_dataset, "ann_file"):
        from ..datasets.panoptic_eval import PanopticEvaluator
        import os.path as osp
        panoptic_evaluator = PanopticEvaluator(
            str(gt_dataset.ann_file), str(gt_dataset.ann_folder),
            output_dir=osp.join(getattr(args, "output_dir", None) or ".",
                                "panoptic_eval"))

    @jax.jit
    def eval_step(params, batch, targets):
        out, tgts, _, _, _ = model.apply(params, batch, targets,
                                         deterministic=True)
        losses = compute_losses(out, tgts, criterion_cfg)
        return out, losses

    for pack in logger.log_every(loader, "Test:"):
        pack = device_put(pack)
        out, losses = eval_step(params, pack["batch"], pack["targets"])
        logger.update(**{k: float(v) for k, v in losses.items()
                         if k in criterion_cfg.weight_dict
                         or k in ("class_error", "cardinality_error")})
        evaluator.update(make_results(
            out, pack["targets"], postprocessors["bbox"], args.num_queries,
            postprocess_segm=postprocessors.get("segm") if with_masks
            else None,
            batch=pack["batch"]))
        if panoptic_evaluator is not None:
            targets = pack["targets"]
            obj_out = {k: np.asarray(out[k])[:, -args.num_queries:]
                       for k in ("pred_logits", "pred_masks")}
            preds = postprocessors["panoptic"](
                obj_out, processed_sizes=np.asarray(targets.size).tolist(),
                target_sizes=np.asarray(targets.orig_size).tolist())
            for p, img_id in zip(preds, np.asarray(targets.image_id)):
                p["image_id"] = int(img_id)
            panoptic_evaluator.update(preds)

    evaluator.synchronize_between_processes()
    coco_stats = evaluator.summarize()
    stats = {k: m.global_avg for k, m in logger.meters.items()}
    stats["coco_eval_bbox"] = coco_stats["bbox"]
    stats["AP"] = coco_stats["bbox"][0]
    stats["AP50"] = coco_stats["bbox"][1]
    if "segm" in coco_stats:
        stats["coco_eval_masks"] = coco_stats["segm"]
        stats["AP_masks"] = coco_stats["segm"][0]
    if panoptic_evaluator is not None:
        panoptic_evaluator.synchronize_between_processes()
        pq = panoptic_evaluator.summarize()
        stats["PQ_all"] = pq["PQ"]
        stats["SQ_all"] = pq["SQ"]
        stats["RQ_all"] = pq["RQ"]

    if getattr(args, "tracking", False) and getattr(args, "tracking_eval",
                                                    False):
        from ..cli import track as track_cli
        print("TRACK SEQS (in-process tracking eval)")
        summary = track_cli.main(
            ["with",
             f"dataset_name={getattr(args, 'val_track_dataset', 'MOT17-TRAIN-ALL')}",
             f"data_root_dir={getattr(args, 'data_root_dir', 'data')}",
             "frame_range.start=0.5",
             "output_dir=null"],
            obj_detector_model=obj_detector_model)
        if summary and "OVERALL" in summary:
            stats["MOTA"] = summary["OVERALL"]["mota"]
            stats["IDF1"] = summary["OVERALL"]["idf1"]
    return stats
