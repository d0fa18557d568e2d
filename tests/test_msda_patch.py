"""Fused patch-walk MSDA kernel (ops/msda_patch.py, "v5") vs the naive
per-point reference — forward, gradients, out-of-bounds corners, bf16,
static permutation properties, and routing through ms_deform_attn.

Reference semantics: ms_deform_attn_core_pytorch
(/root/reference/src/trackformer/models/ops/functions/ms_deform_attn_func.py:34-54).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from trackformer_tpu.ops import msda
from trackformer_tpu.ops.msda import ms_deform_attn, ms_deform_attn_reference
from trackformer_tpu.ops.msda_patch import (_msda_patch_fwd,
                                            _msda_patch_v6_fwd, msda_patch,
                                            msda_patch_v6, snake_bucket_perm)

SHAPES = ((9, 13), (5, 7), (3, 4))
S = sum(h * w for h, w in SHAPES)
N, M, D, P = 2, 2, 4, 4
LQ = S  # encoder self-pattern


def make_inputs(seed=0, oob=False, clustered=False):
    rng = np.random.default_rng(seed)
    value = rng.standard_normal((N, S, M, D)).astype(np.float32)
    if clustered:
        # samples near each query's own grid position (the encoder regime
        # the walk rectangles are tight for)
        pos = []
        for h, w in SHAPES:
            yy, xx = np.mgrid[0:h, 0:w]
            pos.append(np.stack([(xx.ravel() + 0.5) / w,
                                 (yy.ravel() + 0.5) / h], -1))
        pos = np.concatenate(pos)  # (S, 2)
        loc = pos[None, :, None, None, None, :] + rng.normal(
            0, 0.03, (N, LQ, M, len(SHAPES), P, 2))
        loc = loc.astype(np.float32)
    else:
        lo, hi = (-0.4, 1.4) if oob else (0.0, 1.0)
        loc = rng.uniform(lo, hi, (N, LQ, M, len(SHAPES), P, 2)) \
            .astype(np.float32)
    attn = rng.uniform(0.1, 1.0, (N, LQ, M, len(SHAPES), P)) \
        .astype(np.float32)
    attn /= attn.sum(axis=(-2, -1), keepdims=True)
    return jnp.asarray(value), jnp.asarray(loc), jnp.asarray(attn)


@pytest.mark.parametrize("case", ["uniform", "oob", "clustered"])
def test_forward_matches_reference(case):
    value, loc, attn = make_inputs(oob=case == "oob",
                                   clustered=case == "clustered")
    got = _msda_patch_fwd(value, SHAPES, loc, attn, tq=64, interpret=True)
    want = ms_deform_attn_reference(value, SHAPES, loc, attn)
    np.testing.assert_allclose(
        np.asarray(got).reshape(N, LQ, M * D), np.asarray(want),
        atol=2e-5, rtol=1e-5)


def test_forward_non_divisible_tile():
    # Lq = 152 not a multiple of tq=48: padded queries must not contribute
    value, loc, attn = make_inputs(seed=5, oob=True)
    got = _msda_patch_fwd(value, SHAPES, loc, attn, tq=48, interpret=True)
    want = ms_deform_attn_reference(value, SHAPES, loc, attn)
    np.testing.assert_allclose(
        np.asarray(got).reshape(N, LQ, M * D), np.asarray(want),
        atol=2e-5, rtol=1e-5)


def test_bf16_value():
    value, loc, attn = make_inputs(seed=2, clustered=True)
    got = msda_patch(value.astype(jnp.bfloat16), SHAPES, loc, attn, True)
    want = ms_deform_attn_reference(value, SHAPES, loc, attn)
    np.testing.assert_allclose(
        np.asarray(got, np.float32).reshape(N, LQ, M * D), np.asarray(want),
        atol=3e-2, rtol=3e-2)


def test_gradients_match_reference():
    value, loc, attn = make_inputs(seed=3, oob=True)

    def f_kernel(v, lo, a):
        return jnp.sum(jnp.sin(msda_patch(v, SHAPES, lo, a, True)))

    def f_ref(v, lo, a):
        return jnp.sum(jnp.sin(
            ms_deform_attn_reference(v, SHAPES, lo, a)
            .reshape(N, LQ, M, D)))

    gk = jax.grad(f_kernel, argnums=(0, 1, 2))(value, loc, attn)
    gr = jax.grad(f_ref, argnums=(0, 1, 2))(value, loc, attn)
    for k, r in zip(gk, gr):
        np.testing.assert_allclose(np.asarray(k), np.asarray(r),
                                   atol=2e-4, rtol=1e-4)


def test_snake_perm_is_permutation_and_local():
    perm, inv = snake_bucket_perm(SHAPES)
    assert sorted(perm.tolist()) == list(range(S))
    np.testing.assert_array_equal(perm[inv], np.arange(S))
    # locality: consecutive sorted level-0 tokens stay within one bucket
    # row of each other in image space (snake order, no raster wrap jumps)
    h0, w0 = SHAPES[0]
    pos = np.full((S, 2), -1.0)
    off = 0
    for h, w in SHAPES:
        yy, xx = np.mgrid[0:h, 0:w]
        pos[off:off + h * w, 0] = (yy.ravel() + 0.5) / h * h0
        pos[off:off + h * w, 1] = (xx.ravel() + 0.5) / w * w0
        off += h * w
    ys = pos[perm, 0]
    assert np.all(np.abs(np.diff(ys)) <= 2 * 8 + 1), "y jumps exceed buckets"


@pytest.mark.parametrize("case", ["uniform", "oob", "clustered"])
def test_v6_forward_matches_reference(case):
    value, loc, attn = make_inputs(oob=case == "oob",
                                   clustered=case == "clustered")
    got = _msda_patch_v6_fwd(value, SHAPES, loc, attn, tq=64, ph=4, pw=8,
                             interpret=True)
    want = ms_deform_attn_reference(value, SHAPES, loc, attn)
    np.testing.assert_allclose(
        np.asarray(got).reshape(N, LQ, M * D), np.asarray(want),
        atol=2e-5, rtol=1e-5)


def test_v6_non_divisible_tile_and_deep_ring():
    # Lq = 152 not a multiple of tq=48; NSLOTS=3 exercises the deep DMA ring
    value, loc, attn = make_inputs(seed=5, oob=True)
    got = _msda_patch_v6_fwd(value, SHAPES, loc, attn, tq=48, ph=4, pw=8,
                             nslots=3, interpret=True)
    want = ms_deform_attn_reference(value, SHAPES, loc, attn)
    np.testing.assert_allclose(
        np.asarray(got).reshape(N, LQ, M * D), np.asarray(want),
        atol=2e-5, rtol=1e-5)


def test_v6_gradients_match_reference():
    value, loc, attn = make_inputs(seed=3, clustered=True)

    def f_kernel(v, lo, a):
        return jnp.sum(jnp.sin(msda_patch_v6(v, SHAPES, lo, a, True)))

    def f_ref(v, lo, a):
        return jnp.sum(jnp.sin(
            ms_deform_attn_reference(v, SHAPES, lo, a)
            .reshape(N, LQ, M, D)))

    gk = jax.grad(f_kernel, argnums=(0, 1, 2))(value, loc, attn)
    gr = jax.grad(f_ref, argnums=(0, 1, 2))(value, loc, attn)
    for k, r in zip(gk, gr):
        np.testing.assert_allclose(np.asarray(k), np.asarray(r),
                                   atol=2e-4, rtol=1e-4)


def test_routed_through_ms_deform_attn():
    value, loc, attn = make_inputs(seed=4, clustered=True)
    old = msda.PALLAS_SKIP_IMPL, msda.PALLAS_V2_MIN_QUERIES
    msda.PALLAS_SKIP_IMPL, msda.PALLAS_V2_MIN_QUERIES = "v5", LQ
    ms_deform_attn.clear_cache()
    try:
        got = ms_deform_attn(value, SHAPES, loc, attn, pallas_dense=True,
                             dense_cell_budget=0)
    finally:
        msda.PALLAS_SKIP_IMPL, msda.PALLAS_V2_MIN_QUERIES = old
        ms_deform_attn.clear_cache()
    want = ms_deform_attn_reference(value, SHAPES, loc, attn)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=1e-5)
