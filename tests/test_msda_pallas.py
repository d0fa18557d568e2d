"""Pallas MSDA kernel (experimental) vs the production XLA path."""
import jax.numpy as jnp
import numpy as np

from trackformer_tpu.ops.msda import ms_deform_attn
from trackformer_tpu.ops.msda_pallas import ms_deform_attn_pallas

SHAPES = ((6, 4), (3, 2))


def test_pallas_matches_xla_interpret():
    rng = np.random.RandomState(0)
    n, m, d, lq, p = 2, 2, 8, 5, 3
    s = sum(h * w for h, w in SHAPES)
    value = jnp.array(rng.randn(n, s, m, d), jnp.float32)
    loc = jnp.array(rng.uniform(-0.1, 1.1, (n, lq, m, len(SHAPES), p, 2)),
                    jnp.float32)
    attn = jnp.array(rng.rand(n, lq, m, len(SHAPES), p), jnp.float32)
    ref = np.asarray(ms_deform_attn(value, SHAPES, loc, attn))
    out = np.asarray(ms_deform_attn_pallas(value, SHAPES, loc, attn,
                                           interpret=True))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)
