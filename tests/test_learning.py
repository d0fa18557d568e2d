"""End-to-end learning sanity: overfitting a single tiny batch must drive
the set-prediction loss down (catches sign/matching/gradient bugs that
formula-level unit tests can't)."""
import jax
import jax.numpy as jnp
import numpy as np

from trackformer_tpu.engine import TrainState, make_optimizer, make_train_step
from trackformer_tpu.models import build_model
from trackformer_tpu.structures import FrameBatch, empty_targets
from trackformer_tpu.utils.config import load_config, nested_namespace


def test_single_batch_overfit():
    cfg = load_config("train.yaml", [], {
        "enc_layers": 1, "dec_layers": 1, "hidden_dim": 64, "nheads": 4,
        "dim_feedforward": 64, "num_queries": 6, "dataset": "mot",
        "aux_loss": False, "lr": 5e-4, "lr_backbone": 5e-4,
        "dropout": 0.0})
    cfg["tpu"]["compute_dtype"] = "float32"
    args = nested_namespace(cfg)
    model, crit_cfg, _, _ = build_model(args)

    rng = jax.random.PRNGKey(0)
    batch = FrameBatch.from_images(
        jax.random.normal(rng, (1, 64, 96, 3)), jnp.array([[64, 96]]))
    targets = empty_targets(1, 3).replace(
        valid=jnp.array([[True, True, False]]),
        labels=jnp.zeros((1, 3), jnp.int32),
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
    first = np.mean(losses[:5])
    last = np.mean(losses[-5:])
    assert np.isfinite(losses).all()
    assert last < 0.5 * first, (first, last, losses[::10])


def test_tpu_fast_mode_overfit():
    """The windowed-encoder + dense-decoder variant must also learn."""
    cfg = load_config("train.yaml", ["deformable"], {
        "enc_layers": 1, "dec_layers": 1, "hidden_dim": 96, "nheads": 4,
        "dim_feedforward": 96, "num_queries": 6, "dataset": "mot",
        "aux_loss": False, "lr": 5e-4, "lr_backbone": 5e-4, "dropout": 0.0,
        "with_box_refine": True,
        "tpu.encoder_attention": "windowed",
        "tpu.decoder_attention": "dense"})
    cfg["tpu"]["compute_dtype"] = "float32"
    args = nested_namespace(cfg)
    model, crit_cfg, _, _ = build_model(args)

    rng = jax.random.PRNGKey(0)
    batch = FrameBatch.from_images(
        jax.random.normal(rng, (1, 64, 96, 3)), jnp.array([[64, 96]]))
    targets = empty_targets(1, 3).replace(
        valid=jnp.array([[True, True, False]]),
        labels=jnp.zeros((1, 3), jnp.int32),
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
    for _ in range(60):
        state, metrics = step(state, pack, jax.random.PRNGKey(1))
        losses.append(float(metrics["loss"]))
    first, last = np.mean(losses[:5]), np.mean(losses[-5:])
    assert np.isfinite(losses).all()
    assert last < 0.6 * first, (first, last, losses[::10])


def test_lr_warmup_scales_early_updates():
    """tpu.lr_warmup_steps linearly ramps every param group's update size
    (the windowed-encoder depth-collapse stabilizer; reference has no
    warmup so 0 stays the default)."""
    import optax
    from types import SimpleNamespace as NS

    args = NS(lr=4e-4, lr_backbone=4e-4, lr_linear_proj_mult=0.1,
              weight_decay=1e-4, clip_max_norm=0.1, lr_drop_steps=[400],
              tpu=NS(lr_warmup_steps=50))
    params = {"params": {"transformer": {"w": jnp.ones((4, 4))}}}
    opt = make_optimizer(args, params)
    st = opt.init(params)
    g = jax.tree.map(jnp.ones_like, params)
    mags = []
    for _ in range(50):
        u, st = opt.update(g, st, params)
        mags.append(float(jnp.abs(jax.tree.leaves(u)[0]).mean()))
    # step 0 is 1/50 of full lr; step 49 full lr; monotone ramp
    assert mags[0] < 0.03 * mags[-1], (mags[0], mags[-1])
    assert all(b >= a for a, b in zip(mags, mags[1:])), mags[:5]

    # warmup off (default 0): first update already full-size
    args0 = NS(lr=4e-4, lr_backbone=4e-4, lr_linear_proj_mult=0.1,
               weight_decay=1e-4, clip_max_norm=0.1, lr_drop_steps=[400],
               tpu=NS(lr_warmup_steps=0))
    opt0 = make_optimizer(args0, params)
    st0 = opt0.init(params)
    u0, _ = opt0.update(g, st0, params)
    assert abs(float(jnp.abs(jax.tree.leaves(u0)[0]).mean())
               - mags[-1]) < 1e-6
