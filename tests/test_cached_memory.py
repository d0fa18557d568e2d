"""tpu.cached_prev_memory: the model encodes only the current frame and
reuses the previous step's encoded memory as the prev half (post-encoder
frame embedding restores frame identity)."""
import jax
import jax.numpy as jnp
import numpy as np

from trackformer_tpu.engine import TrainState, make_optimizer, make_train_step
from trackformer_tpu.models import build_model
from trackformer_tpu.structures import FrameBatch, empty_targets
from trackformer_tpu.utils.config import load_config, nested_namespace

TINY = {"enc_layers": 2, "dec_layers": 2, "hidden_dim": 96, "nheads": 4,
        "dim_feedforward": 128, "num_queries": 10, "dataset": "mot"}


def build(over=None, enc="windowed"):
    cfg = load_config("train.yaml", ["deformable", "tracking", "multi_frame"],
                      {**TINY, **(over or {}),
                       "tpu.encoder_attention": enc,
                       "tpu.cached_prev_memory": True})
    cfg["tpu"]["compute_dtype"] = "float32"
    cfg["tpu"]["remat"] = False
    args = nested_namespace(cfg)
    model, crit_cfg, post, track_cfg = build_model(args)
    return args, model, crit_cfg, post


def test_first_frame_cache_self_consistency():
    """forward(B, prev=None) falls back to prev=cur; forward(B, feats(B))
    must be IDENTICAL — proving the cached slot is exactly what the prev
    half would recompute."""
    args, model, _, _ = build()
    rng = jax.random.PRNGKey(0)
    batch = FrameBatch.from_images(
        jax.random.normal(rng, (1, 64, 96, 3)), jnp.array([[60, 90]]))
    params = model.init(rng, batch)
    out0, _, feats0, _, _ = model.apply(params, batch, None,
                                        deterministic=True)
    out1, _, _, _, _ = model.apply(params, batch, None, feats0,
                                   deterministic=True)
    np.testing.assert_allclose(out0["pred_logits"], out1["pred_logits"],
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(out0["pred_boxes"], out1["pred_boxes"],
                               atol=1e-5, rtol=1e-5)


def test_cached_memory_distinguishes_frames():
    """With a DIFFERENT previous frame the output must change (the cached
    half genuinely feeds the decoder)."""
    args, model, _, _ = build()
    rng = jax.random.PRNGKey(0)
    a = FrameBatch.from_images(
        jax.random.normal(jax.random.PRNGKey(1), (1, 64, 96, 3)),
        jnp.array([[60, 90]]))
    bb = FrameBatch.from_images(
        jax.random.normal(jax.random.PRNGKey(2), (1, 64, 96, 3)),
        jnp.array([[60, 90]]))
    params = model.init(rng, a)
    _, _, feats_a, _, _ = model.apply(params, a, None, deterministic=True)
    out_ba, _, _, _, _ = model.apply(params, bb, None, feats_a,
                                     deterministic=True)
    out_bb, _, _, _, _ = model.apply(params, bb, None, None,
                                     deterministic=True)
    assert not np.allclose(out_ba["pred_logits"], out_bb["pred_logits"],
                           atol=1e-5)


def test_cached_memory_msda_encoder():
    """The cache works with the exact-MSDA encoder too."""
    args, model, _, _ = build(enc="msda")
    rng = jax.random.PRNGKey(0)
    batch = FrameBatch.from_images(
        jax.random.normal(rng, (1, 64, 96, 3)), jnp.array([[60, 90]]))
    params = model.init(rng, batch)
    out0, _, feats0, _, _ = model.apply(params, batch, None,
                                        deterministic=True)
    out1, _, _, _, _ = model.apply(params, batch, None, feats0,
                                   deterministic=True)
    np.testing.assert_allclose(out0["pred_logits"], out1["pred_logits"],
                               atol=1e-5, rtol=1e-5)


def test_cached_memory_track_queries_and_learning():
    """Track-query injection works and a single batch overfits."""
    args, model, crit_cfg, _ = build({"aux_loss": False, "dropout": 0.0,
                                      "lr": 5e-4, "lr_backbone": 5e-4})
    rng = jax.random.PRNGKey(0)
    batch = FrameBatch.from_images(
        jax.random.normal(rng, (1, 64, 96, 3)), jnp.array([[64, 96]]))
    targets = empty_targets(1, 3).replace(
        valid=jnp.array([[True, True, False]]),
        labels=jnp.zeros((1, 3), jnp.int32),
        track_ids=jnp.array([[1, 2, -1]], jnp.int32),
        boxes=jnp.array([[[0.3, 0.4, 0.2, 0.3],
                          [0.7, 0.6, 0.15, 0.2],
                          [0, 0, 0, 0]]], jnp.float32))

    params = jax.jit(model.init)(rng, batch)
    args.lr_drop_steps = 100000
    opt = make_optimizer(args, params)
    state = TrainState.create(params, opt)
    step = jax.jit(make_train_step(model, crit_cfg, opt, tracking=False))
    pack = {"batch": batch, "targets": targets}
    losses = []
    for i in range(60):
        state, metrics = step(state, pack, jax.random.PRNGKey(1))
        losses.append(float(metrics["loss"]))
    first, last = np.mean(losses[:5]), np.mean(losses[-5:])
    assert np.isfinite(losses).all()
    assert last < 0.6 * first, (first, last)
