"""Compile-time check: flagship exact-MSDA 2-frame train step with
tpu.scan_layers. Round-1 note: the unrolled version took >1h via the
remote compiler."""
import sys, time
import jax, jax.numpy as jnp
import numpy as np
sys.path.insert(0, "/root/repo")

from trackformer_tpu.engine import TrainState, make_optimizer, make_train_step
from trackformer_tpu.models import build_model
from trackformer_tpu.structures import FrameBatch, empty_targets
from trackformer_tpu.utils.config import load_config, nested_namespace

SCAN = len(sys.argv) < 2 or sys.argv[1] != "unrolled"
cfg = load_config("train.yaml", ["deformable", "tracking", "multi_frame"],
                  {"tpu.encoder_attention": "msda",
                   "tpu.decoder_attention": "msda",
                   "tpu.scan_layers": SCAN})
args = nested_namespace(cfg)
model, crit_cfg, _, track_cfg = build_model(args)
print(f"scan_layers={SCAN}", flush=True)

b, h, w = 2, 608, 1088
rng = jax.random.PRNGKey(0)
batch = FrameBatch.from_images(
    jax.random.normal(jax.random.PRNGKey(2), (b, h, w, 3)),
    jnp.tile(jnp.array([[600, 1080]], jnp.int32), (b, 1)))
t = 20
targets = empty_targets(b, t).replace(
    valid=jnp.tile((jnp.arange(t) < 8)[None], (b, 1)),
    track_ids=jnp.tile(jnp.arange(t, dtype=jnp.int32)[None], (b, 1)),
    boxes=jnp.clip(jax.random.uniform(rng, (b, t, 4)), 0.2, 0.6))

t0 = time.perf_counter()
params = jax.jit(model.init)(rng, batch)
jax.block_until_ready(params)
print(f"init: {time.perf_counter()-t0:.0f}s", flush=True)

opt = make_optimizer(args, params)
state = TrainState.create(params, opt)
step = jax.jit(make_train_step(model, crit_cfg, opt, track_cfg,
                               tracking=True))
pack = {"batch": batch, "targets": targets,
        "prev_batch": batch, "prev_targets": targets}

t0 = time.perf_counter()
state, metrics = step(state, pack, jax.random.PRNGKey(1))
loss = float(metrics["loss"])
dt = time.perf_counter() - t0
print(f"train step compile+run: {dt:.0f}s  loss={loss:.3f}", flush=True)

t0 = time.perf_counter()
state, metrics = step(state, pack, jax.random.PRNGKey(2))
float(metrics["loss"])
print(f"steady step: {time.perf_counter()-t0:.2f}s", flush=True)
