"""tpu.scan_layers equivalence: the lax.scan encoder/decoder must match the
unrolled model bit-for-bit (same weights via the checkpoint scan bridge),
including the box-refinement 2-d -> 4-d reference-point transition that the
scan carry emulates (models/deformable_detr.py _DecoderScanBodyRefine)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from trackformer_tpu.models import build_model
from trackformer_tpu.structures import FrameBatch, empty_targets
from trackformer_tpu.utils.checkpoint import (bridge_scan_layout,
                                              flatten_params,
                                              unflatten_params)
from trackformer_tpu.utils.config import load_config, nested_namespace

TINY = {"enc_layers": 2, "dec_layers": 3, "hidden_dim": 96, "nheads": 4,
        "dim_feedforward": 128, "num_queries": 10, "dataset": "mot"}


def build(named, over, scan):
    cfg = load_config("train.yaml", named,
                      {**TINY, **(over or {}), "tpu.scan_layers": scan})
    cfg["tpu"]["compute_dtype"] = "float32"
    cfg["tpu"]["remat"] = False
    args = nested_namespace(cfg)
    model, _, _, _ = build_model(args)
    return args, model


def run_pair(named, over=None, with_tq=False):
    args, unrolled = build(named, over, scan=False)
    _, scanned = build(named, over, scan=True)
    rng = jax.random.PRNGKey(0)
    batch = FrameBatch.from_images(
        jax.random.normal(rng, (2, 64, 96, 3)), jnp.array([[60, 90]] * 2))
    targets = None
    if with_tq:
        targets = empty_targets(2, 1).with_track_queries(
            jax.random.normal(jax.random.PRNGKey(3),
                              (2, 4, args.hidden_dim)) * 0.1,
            jnp.full((2, 4, 4), 0.5), jnp.ones((2, 4), bool))
    params_u = unrolled.init(rng, batch, targets)
    shapes_s = jax.eval_shape(lambda: scanned.init(rng, batch, targets))
    flat_s = bridge_scan_layout(flatten_params(params_u),
                                flatten_params(shapes_s), verbose=False)
    params_s = unflatten_params(flat_s)
    assert (set(flatten_params(params_s))
            == set(flatten_params(shapes_s))), "bridged keys mismatch"

    out_u = unrolled.apply(params_u, batch, targets, deterministic=True)[0]
    out_s = scanned.apply(params_s, batch, targets, deterministic=True)[0]
    return params_u, params_s, out_u, out_s, (unrolled, scanned, batch,
                                              targets)


def assert_outputs_close(out_u, out_s, atol=1e-4):
    np.testing.assert_allclose(out_u["pred_logits"], out_s["pred_logits"],
                               atol=atol, rtol=1e-4)
    np.testing.assert_allclose(out_u["pred_boxes"], out_s["pred_boxes"],
                               atol=atol, rtol=1e-4)
    for au, as_ in zip(out_u.get("aux_outputs", []),
                       out_s.get("aux_outputs", [])):
        np.testing.assert_allclose(au["pred_logits"], as_["pred_logits"],
                                   atol=atol, rtol=1e-4)
        np.testing.assert_allclose(au["pred_boxes"], as_["pred_boxes"],
                                   atol=atol, rtol=1e-4)
    np.testing.assert_allclose(out_u["hs_embed"], out_s["hs_embed"],
                               atol=atol, rtol=1e-4)


def test_scan_box_refine_matches_unrolled():
    _, _, out_u, out_s, _ = run_pair(["deformable"])
    assert len(out_s["aux_outputs"]) == TINY["dec_layers"] - 1
    assert_outputs_close(out_u, out_s)


def test_scan_two_stage_matches_unrolled():
    _, _, out_u, out_s, _ = run_pair(["deformable"], {"two_stage": True})
    np.testing.assert_allclose(out_u["enc_outputs"]["pred_logits"],
                               out_s["enc_outputs"]["pred_logits"],
                               atol=1e-4, rtol=1e-4)
    assert_outputs_close(out_u, out_s)


def test_scan_no_refine_matches_unrolled():
    _, _, out_u, out_s, _ = run_pair(["deformable"],
                                     {"with_box_refine": False})
    assert_outputs_close(out_u, out_s)


def test_scan_multiframe_track_queries_matches_unrolled():
    _, _, out_u, out_s, _ = run_pair(["deformable", "tracking",
                                      "multi_frame"], with_tq=True)
    assert_outputs_close(out_u, out_s)


def test_scan_gradients_match_unrolled():
    params_u, params_s, _, _, (unrolled, scanned, batch, targets) = \
        run_pair(["deformable"])

    def loss(model, params):
        out = model.apply(params, batch, targets, deterministic=True)[0]
        terms = [jnp.mean(out["pred_logits"] ** 2),
                 jnp.mean(out["pred_boxes"])]
        terms += [jnp.mean(a["pred_boxes"]) for a in out["aux_outputs"]]
        return sum(terms)

    gu = jax.grad(lambda p: loss(unrolled, p))(params_u)
    gs = jax.grad(lambda p: loss(scanned, p))(params_s)
    flat_u = flatten_params(gu)
    # map unrolled grads into the scan layout and compare leaf-by-leaf
    flat_bridge = bridge_scan_layout(flat_u, flatten_params(gs),
                                     verbose=False)
    flat_s = flatten_params(gs)
    assert set(flat_bridge) == set(flat_s)
    for k in flat_s:
        np.testing.assert_allclose(
            flat_bridge[k], flat_s[k], atol=2e-4, rtol=1e-3,
            err_msg=f"grad mismatch at {k}")


def test_scan_bridge_round_trip():
    _, scanned = build(["deformable"], None, scan=True)
    _, unrolled = build(["deformable"], None, scan=False)
    rng = jax.random.PRNGKey(1)
    batch = FrameBatch.from_images(
        jax.random.normal(rng, (1, 64, 96, 3)), jnp.array([[60, 90]]))
    params_s = scanned.init(rng, batch)
    shapes_u = jax.eval_shape(lambda: unrolled.init(rng, batch))
    flat_u = bridge_scan_layout(flatten_params(params_s),
                                flatten_params(shapes_u), verbose=False)
    assert set(flat_u) == set(flatten_params(shapes_u))
    shapes_s = jax.eval_shape(lambda: scanned.init(rng, batch))
    flat_back = bridge_scan_layout(flat_u, flatten_params(shapes_s),
                                   verbose=False)
    orig = flatten_params(params_s)
    assert set(flat_back) == set(orig)
    for k in orig:
        np.testing.assert_array_equal(flat_back[k], orig[k])
