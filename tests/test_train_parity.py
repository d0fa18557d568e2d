"""One complete training forward + criterion vs the torch reference
(VERDICT r3 item 5): converted weights, identical images and targets ->
the full SetCriterion loss dict (final + aux + enc, focal path, num_boxes
normalization) must match scalar for scalar.

Reference: SetCriterion (/root/reference/src/trackformer/models/detr.py:382-441),
criterion construction (/root/reference/src/trackformer/models/__init__.py:85-117).
"""
import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import torch

sys.path.insert(0, str(Path(__file__).parent))
sys.path.insert(0, str(Path(__file__).parent.parent / "tools"))

from ref_loader import load_reference  # noqa: E402
from test_forward_parity import (SMALL, build_reference_model,  # noqa: E402
                                 convert_into, make_args)

from trackformer_tpu.models import build_model  # noqa: E402
from trackformer_tpu.models.criterion import compute_losses  # noqa: E402
from trackformer_tpu.structures import FrameBatch, empty_targets  # noqa: E402

H, W = 96, 128
B = 2
MAX_OBJ = 5


def build_reference_criterion(ns, args, num_classes):
    """Mirror reference models/__init__.py:85-117 (non-mask path)."""
    matcher = ns.matcher.HungarianMatcher(
        cost_class=args.set_cost_class, cost_bbox=args.set_cost_bbox,
        cost_giou=args.set_cost_giou, focal_loss=args.focal_loss,
        focal_alpha=args.focal_alpha, focal_gamma=args.focal_gamma)
    weight_dict = {"loss_ce": args.cls_loss_coef,
                   "loss_bbox": args.bbox_loss_coef,
                   "loss_giou": args.giou_loss_coef}
    if args.aux_loss:
        aux = {}
        for i in range(args.dec_layers - 1):
            aux.update({k + f"_{i}": v for k, v in weight_dict.items()})
        if args.two_stage:
            aux.update({k + "_enc": v for k, v in weight_dict.items()})
        weight_dict.update(aux)
    criterion = ns.detr.SetCriterion(
        num_classes - 1 if args.focal_loss else num_classes,
        matcher=matcher,
        weight_dict=weight_dict,
        eos_coef=args.eos_coef,
        losses=["labels", "boxes", "cardinality"],
        focal_loss=args.focal_loss,
        focal_alpha=args.focal_alpha,
        focal_gamma=args.focal_gamma,
        tracking=args.tracking,
        track_query_false_positive_eos_weight=(
            args.track_query_false_positive_eos_weight),
    )
    return criterion, weight_dict


def make_scene(seed):
    rng = np.random.default_rng(seed)
    imgs = rng.standard_normal((B, 3, H, W)).astype(np.float32)
    boxes, labels, valid = (np.zeros((B, MAX_OBJ, 4), np.float32),
                            np.zeros((B, MAX_OBJ), np.int64),
                            np.zeros((B, MAX_OBJ), bool))
    counts = [3, 1]
    for i in range(B):
        n = counts[i]
        cx, cy = rng.uniform(0.25, 0.75, (2, n))
        bw, bh = rng.uniform(0.1, 0.3, (2, n))
        boxes[i, :n] = np.stack([cx, cy, bw, bh], -1)
        labels[i, :n] = rng.integers(0, 3, n)
        valid[i, :n] = True
    return imgs, boxes, labels, valid, counts


def run_loss_pair(named, over, dataset="mot", num_classes=20, seed=11):
    ns = load_reference()
    args = make_args(named, {**over, "dataset": dataset})
    torch.manual_seed(seed)
    ref_model = build_reference_model(ns, args, num_classes)
    ref_crit, weight_dict = build_reference_criterion(ns, args, num_classes)
    ref_crit.eval()

    imgs, boxes, labels, valid, counts = make_scene(seed)

    jax_model, crit_cfg, _, _ = build_model(args)
    batch = FrameBatch.from_images(
        jnp.asarray(imgs.transpose(0, 2, 3, 1)),
        jnp.array([[H, W]] * B))
    params = convert_into(ref_model, jax_model, batch)

    targets_t = [
        {"labels": torch.from_numpy(labels[i, :counts[i]].copy()),
         "boxes": torch.from_numpy(boxes[i, :counts[i]].copy())}
        for i in range(B)]
    targets_j = empty_targets(B, MAX_OBJ).replace(
        valid=jnp.asarray(valid), labels=jnp.asarray(labels.astype(np.int32)),
        boxes=jnp.asarray(boxes))

    with torch.no_grad():
        samples = ns.misc.nested_tensor_from_tensor_list(
            [torch.from_numpy(im) for im in imgs])
        ref_out, *_ = ref_model(samples)
        ref_losses = ref_crit(ref_out, targets_t)

    out, *_ = jax_model.apply(params, batch, targets_j)
    losses = compute_losses(out, targets_j, crit_cfg)
    return ref_losses, losses, weight_dict


def assert_loss_match(ref_losses, losses, weight_dict, atol=2e-4):
    compared = 0
    for key, ref_val in sorted(ref_losses.items()):
        if key.startswith("class_error") or key.startswith("loss_ce_unm"):
            continue  # logging-only; ours drops aux class_error by design
        assert key in losses, f"missing loss key {key} (have {sorted(losses)})"
        ours = float(losses[key])
        ref = float(ref_val)
        assert abs(ours - ref) < atol + 1e-3 * abs(ref), \
            f"{key}: ours {ours:.6f} vs reference {ref:.6f}"
        compared += 1
    assert compared >= 8, f"only {compared} loss terms compared"
    # weighted total as the train step would reduce it
    tot_ref = sum(float(ref_losses[k]) * w for k, w in weight_dict.items()
                  if k in ref_losses)
    tot_ours = sum(float(losses[k]) * w for k, w in weight_dict.items()
                   if k in losses)
    assert abs(tot_ours - tot_ref) < 5 * atol + 1e-3 * abs(tot_ref), \
        f"weighted total: {tot_ours:.6f} vs {tot_ref:.6f}"


def test_deformable_focal_loss_parity():
    """Deformable DETR + focal loss + aux losses: full criterion parity."""
    ref_losses, losses, wd = run_loss_pair(
        ["deformable"], {"aux_loss": True, "nheads": 8, "num_queries": 12})
    assert any(k.endswith("_0") for k in ref_losses), "aux losses missing"
    assert_loss_match(ref_losses, losses, wd)


def test_deformable_two_stage_enc_loss_parity():
    """Two-stage adds the _enc (binary-class proposal) loss family."""
    # hidden_dim 256: the reference's get_proposal_pos_embed hardcodes 128
    # pos feats, so its two-stage only shape-checks at d_model 256
    ref_losses, losses, wd = run_loss_pair(
        ["deformable"],
        {"aux_loss": True, "two_stage": True, "with_box_refine": True,
         "nheads": 8, "num_queries": 12, "hidden_dim": 256},
        seed=13)
    assert any(k.endswith("_enc") for k in ref_losses), "enc losses missing"
    assert_loss_match(ref_losses, losses, wd)


def test_vanilla_ce_loss_parity():
    """Vanilla DETR cross-entropy path (eos_coef weighting)."""
    ref_losses, losses, wd = run_loss_pair([], {"aux_loss": True}, seed=17)
    assert_loss_match(ref_losses, losses, wd)
