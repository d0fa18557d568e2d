"""Micro-bench the windowed-encoder small-op fusions on the live chip.

Measures the full WindowedEncoder forward (6 shared-weight layers +
cross-level fusion, flagship geometry 800x1344 / 288 dim / bf16) for the
four combinations of

  * WINDOW_FUSION_IMPL: perlevel | batched   (models/windowed_encoder.py)
  * ATTN_QK_FUSED:      0 | 1                (models/attention.py)

Numerics are equivalent across all four (tests/test_models.py::
test_fused_smallops_equivalence), so this is a pure latency comparison.
Chained-K timing with ONE final readback (the axon tunnel does not
synchronize through block_until_ready — CLAUDE.md timing rule).

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_window_fusion.py
"""
from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from trackformer_tpu.models import attention as att
    from trackformer_tpu.models import windowed_encoder as we

    b, c = 1, 288
    # R50 ladder at the MOT17 800x1344 bucket
    shapes = [(100, 168), (50, 84), (25, 42), (13, 21)]
    rng = jax.random.PRNGKey(0)
    keys = jax.random.split(rng, 2 * len(shapes))
    srcs = [jax.random.normal(keys[i], (b, h, w, c), jnp.bfloat16)
            for i, (h, w) in enumerate(shapes)]
    poses = [jax.random.normal(keys[len(shapes) + i], (b, h, w, c),
                               jnp.bfloat16)
             for i, (h, w) in enumerate(shapes)]
    masks = [jnp.zeros((b, h, w), bool) for h, w in shapes]

    enc = we.WindowedEncoder(c, num_layers=6, nheads=8, dim_feedforward=1024,
                             window=8, dtype=jnp.bfloat16)
    params = jax.jit(enc.init)(jax.random.PRNGKey(1), srcs, masks, poses)

    K = 20
    results = {}
    for fusion in ("perlevel", "batched"):
        for qk in (False, True):
            we.FUSION_IMPL, att.QK_FUSED = fusion, qk

            @jax.jit
            def chain(p, s0):
                def body(i, s):
                    out = enc.apply(p, s, masks, poses)
                    # feed back so iterations serialize; re-split levels
                    off, ns = 0, []
                    for (h, w) in shapes:
                        n = h * w
                        ns.append(out[:, off:off + n].reshape(b, h, w, c))
                        off += n
                    return ns
                s = s0
                for i in range(K):
                    s = body(i, s)
                return s[0]

            np.asarray(chain(params, srcs)[0, 0, 0])  # compile + warm
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                np.asarray(chain(params, srcs)[0, 0, 0])
                best = min(best, time.perf_counter() - t0)
            ms = best / K * 1e3
            results[f"{fusion}+qk{int(qk)}"] = ms
            print(f"{fusion:9s} qk_fused={int(qk)}: {ms:7.2f} ms/pass",
                  flush=True)
    bestk = min(results, key=results.get)
    print(f"winner: {bestk} ({results[bestk]:.2f} ms)")


if __name__ == "__main__":
    main()
