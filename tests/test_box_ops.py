import jax.numpy as jnp
import numpy as np
import pytest

from trackformer_tpu.ops import box_ops


def random_boxes(rng, n):
    cx = rng.uniform(0.2, 0.8, n)
    cy = rng.uniform(0.2, 0.8, n)
    w = rng.uniform(0.05, 0.3, n)
    h = rng.uniform(0.05, 0.3, n)
    return np.stack([cx, cy, w, h], -1).astype(np.float32)


def test_cxcywh_roundtrip():
    rng = np.random.RandomState(0)
    b = random_boxes(rng, 16)
    back = box_ops.box_xyxy_to_cxcywh(box_ops.box_cxcywh_to_xyxy(jnp.array(b)))
    np.testing.assert_allclose(np.asarray(back), b, rtol=1e-5, atol=1e-6)


def test_iou_matches_manual():
    a = jnp.array([[0.0, 0.0, 2.0, 2.0]])
    b = jnp.array([[1.0, 1.0, 3.0, 3.0], [5.0, 5.0, 6.0, 6.0]])
    iou, union = box_ops.box_iou(a, b)
    np.testing.assert_allclose(np.asarray(iou), [[1.0 / 7.0, 0.0]], atol=1e-6)


def test_giou_identity_and_disjoint():
    a = jnp.array([[0.0, 0.0, 1.0, 1.0]])
    giou_same = box_ops.generalized_box_iou(a, a)
    np.testing.assert_allclose(np.asarray(giou_same), [[1.0]], atol=1e-5)
    b = jnp.array([[2.0, 0.0, 3.0, 1.0]])
    # IoU 0; enclosing box area 3, union 2 -> giou = -1/3
    giou_d = box_ops.generalized_box_iou(a, b)
    np.testing.assert_allclose(np.asarray(giou_d), [[-1.0 / 3.0]], atol=1e-4)


def test_elementwise_giou_matches_pairwise_diag():
    rng = np.random.RandomState(1)
    a = box_ops.box_cxcywh_to_xyxy(jnp.array(random_boxes(rng, 8)))
    b = box_ops.box_cxcywh_to_xyxy(jnp.array(random_boxes(rng, 8)))
    full = box_ops.generalized_box_iou(a, b)
    diag = box_ops.elementwise_generalized_box_iou(a, b)
    np.testing.assert_allclose(np.diag(np.asarray(full)), np.asarray(diag),
                               rtol=1e-4, atol=1e-5)


def test_giou_vs_torchvision():
    torchvision = pytest.importorskip("torchvision")
    import torch
    rng = np.random.RandomState(2)
    a = np.asarray(box_ops.box_cxcywh_to_xyxy(jnp.array(random_boxes(rng, 12))))
    b = np.asarray(box_ops.box_cxcywh_to_xyxy(jnp.array(random_boxes(rng, 7))))
    ours = np.asarray(box_ops.generalized_box_iou(jnp.array(a), jnp.array(b)))
    theirs = torchvision.ops.generalized_box_iou(
        torch.tensor(a), torch.tensor(b)).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)


def test_masks_to_boxes():
    masks = np.zeros((2, 8, 8), np.float32)
    masks[0, 2:5, 3:7] = 1
    boxes = np.asarray(box_ops.masks_to_boxes(jnp.array(masks)))
    np.testing.assert_allclose(boxes[0], [3, 2, 7, 5])
    np.testing.assert_allclose(boxes[1], [0, 0, 0, 0])
