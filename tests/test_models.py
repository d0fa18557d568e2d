"""Forward smoke tests for every model family (8-way factory matrix plus
encoder modes), tiny configs on CPU."""
import jax
import jax.numpy as jnp

from trackformer_tpu.models import build_model
from trackformer_tpu.structures import FrameBatch, empty_targets
from trackformer_tpu.utils.config import load_config, nested_namespace

TINY = {"enc_layers": 1, "dec_layers": 2, "hidden_dim": 96, "nheads": 4,
        "dim_feedforward": 128, "num_queries": 10, "dataset": "mot"}


def run(named, over=None, with_tq=False):
    cfg = load_config("train.yaml", named, {**TINY, **(over or {})})
    cfg["tpu"]["compute_dtype"] = "float32"
    args = nested_namespace(cfg)
    model, crit_cfg, post, track_cfg = build_model(args)
    rng = jax.random.PRNGKey(0)
    batch = FrameBatch.from_images(
        jax.random.normal(rng, (1, 64, 96, 3)), jnp.array([[60, 90]]))
    targets = None
    if with_tq:
        targets = empty_targets(1, 1).with_track_queries(
            jnp.zeros((1, 4, args.hidden_dim)),
            jnp.full((1, 4, 4), 0.5), jnp.ones((1, 4), bool))
    params = jax.jit(model.init)(rng, batch, targets)
    out = jax.jit(lambda p: model.apply(p, batch, targets,
                                        deterministic=True)[0])(params)
    return args, out


def test_detr_plain():
    args, out = run([])
    assert out["pred_logits"].shape == (1, 10, 21)
    assert out["pred_boxes"].shape == (1, 10, 4)


def test_detr_pre_norm_track_attention():
    _, out = run([], {"pre_norm": True, "track_attention": True},
                 with_tq=True)
    assert out["pred_logits"].shape == (1, 14, 21)


def test_deformable_box_refine():
    _, out = run(["deformable"], {"num_queries": 10})
    assert out["pred_logits"].shape == (1, 10, 20)  # focal: C classes
    assert len(out["aux_outputs"]) == 1


def test_deformable_two_stage():
    _, out = run(["deformable"], {"two_stage": True, "num_queries": 10})
    assert "enc_outputs" in out


def test_deformable_multiframe_track_queries():
    _, out = run(["deformable", "tracking", "multi_frame"],
                 {"num_queries": 10, "hidden_dim": 96, "nheads": 4},
                 with_tq=True)
    assert out["pred_logits"].shape == (1, 14, 20)
    assert bool(jnp.all(jnp.isfinite(out["pred_logits"])))


def test_windowed_encoder_mode():
    _, out = run(["deformable", "tracking", "multi_frame"],
                 {"num_queries": 10, "tpu.encoder_attention": "windowed"},
                 with_tq=True)
    assert out["pred_logits"].shape == (1, 14, 20)
    assert bool(jnp.all(jnp.isfinite(out["pred_logits"])))


def test_segm_masks():
    _, out = run([], {"masks": True, "hidden_dim": 128, "nheads": 8})
    assert out["pred_masks"].shape[:2] == (1, 10)


def test_dense_decoder_mode():
    _, out = run(["deformable", "tracking", "multi_frame"],
                 {"num_queries": 10, "tpu.encoder_attention": "windowed",
                  "tpu.decoder_attention": "dense"}, with_tq=True)
    assert out["pred_logits"].shape == (1, 14, 20)
    assert bool(jnp.all(jnp.isfinite(out["pred_logits"])))
