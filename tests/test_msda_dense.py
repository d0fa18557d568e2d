"""Pallas dense separable-bilinear MSDA kernel (ops/msda_dense.py) vs the
naive per-point reference — forward, gradients, padding edges, and routing
through the ms_deform_attn hybrid.

Reference semantics: ms_deform_attn_core_pytorch
(/root/reference/src/trackformer/models/ops/functions/ms_deform_attn_func.py:34-54).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from trackformer_tpu.ops.msda import ms_deform_attn, ms_deform_attn_reference
from trackformer_tpu.ops.msda_dense import (_level_out_gather,
                                            dense_level_pallas,
                                            dense_level_pallas_v2,
                                            dense_level_pallas_v3)

SHAPES = ((9, 13), (5, 7))
S = sum(h * w for h, w in SHAPES)
N, M, D, LQ, P = 2, 2, 4, 37, 4


def make_inputs(seed=0, oob=False):
    rng = np.random.default_rng(seed)
    value = rng.standard_normal((N, S, M, D)).astype(np.float32)
    lo, hi = (-0.4, 1.4) if oob else (0.0, 1.0)
    loc = rng.uniform(lo, hi, (N, LQ, M, len(SHAPES), P, 2)) \
        .astype(np.float32)
    attn = rng.uniform(0.1, 1.0, (N, LQ, M, len(SHAPES), P)) \
        .astype(np.float32)
    attn /= attn.sum(axis=(-2, -1), keepdims=True)
    return jnp.asarray(value), jnp.asarray(loc), jnp.asarray(attn)


def level_slices(value):
    out, off = [], 0
    for h, w in SHAPES:
        out.append(value[:, off:off + h * w])
        off += h * w
    return out


@pytest.mark.parametrize("oob", [False, True])
@pytest.mark.parametrize("lvl", [0, 1])
def test_pallas_level_matches_reference(lvl, oob):
    value, loc, attn = make_inputs(oob=oob)
    h, w = SHAPES[lvl]
    got = dense_level_pallas(level_slices(value)[lvl], loc[:, :, :, lvl],
                             attn[:, :, :, lvl], h, w, True)
    # reference: zero the other level's attention so only `lvl` contributes
    attn_only = attn.at[:, :, :, 1 - lvl].set(0.0)
    want = ms_deform_attn_reference(value, SHAPES, loc, attn_only)
    np.testing.assert_allclose(
        np.asarray(got).reshape(N, LQ, M * D), np.asarray(want),
        atol=2e-5, rtol=1e-5)


def test_pallas_level_matches_gather_formulation():
    value, loc, attn = make_inputs(seed=3, oob=True)
    h, w = SHAPES[0]
    v0 = level_slices(value)[0]
    got = dense_level_pallas(v0, loc[:, :, :, 0], attn[:, :, :, 0], h, w,
                             True)
    want = _level_out_gather(v0, loc[:, :, :, 0], attn[:, :, :, 0], h, w)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=1e-5)


def test_pallas_level_gradients():
    """custom_vjp backward (XLA gather formulation) must agree with the
    gradient of the naive reference."""
    value, loc, attn = make_inputs(seed=5, oob=True)
    h, w = SHAPES[0]
    v0 = level_slices(value)[0]
    l0, a0 = loc[:, :, :, 0], attn[:, :, :, 0]

    def f_pallas(v, l, a):
        return jnp.sum(dense_level_pallas(v, l, a, h, w, True) ** 2)

    def f_ref(v, l, a):
        return jnp.sum(_level_out_gather(v, l, a, h, w) ** 2)

    g_pallas = jax.grad(f_pallas, argnums=(0, 1, 2))(v0, l0, a0)
    g_ref = jax.grad(f_ref, argnums=(0, 1, 2))(v0, l0, a0)
    for gp, gr, name in zip(g_pallas, g_ref, ("value", "loc", "attn")):
        np.testing.assert_allclose(np.asarray(gp), np.asarray(gr),
                                   atol=1e-4, rtol=1e-4, err_msg=name)


def test_hybrid_routing_with_pallas_enabled():
    """ms_deform_attn(pallas_dense=True) must be numerically identical to
    the pure XLA paths regardless of which levels it routes to Pallas."""
    value, loc, attn = make_inputs(seed=7, oob=True)
    base = ms_deform_attn(value, SHAPES, loc, attn, pallas_dense=False)
    # force the pallas path to take every level over a tiny dense budget
    got = ms_deform_attn(value, SHAPES, loc, attn, dense_cell_budget=1,
                         pallas_dense=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(base),
                               atol=2e-5, rtol=1e-5)


def test_hybrid_routing_v4_forward_and_grads():
    """PALLAS_SKIP_IMPL='v4' (hoisted shared perm + x-chunk walk) must be
    numerically identical to the XLA path and its custom VJP (gather
    formulation, float0 perm cotangent) must match reference grads."""
    from trackformer_tpu.ops import msda as msda_mod
    value, loc, attn = make_inputs(seed=61, oob=True)
    base = ms_deform_attn(value, SHAPES, loc, attn, pallas_dense=False)
    saved = (msda_mod.PALLAS_SKIP_IMPL, msda_mod.PALLAS_V2_MIN_QUERIES,
             msda_mod.PALLAS_V4_CW)
    try:
        msda_mod.PALLAS_SKIP_IMPL = "v4"
        msda_mod.PALLAS_V2_MIN_QUERIES = 1
        msda_mod.PALLAS_V4_CW = 64
        ms_deform_attn.clear_cache()
        got = ms_deform_attn(value, SHAPES, loc, attn, dense_cell_budget=1,
                             pallas_dense=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(base),
                                   atol=2e-5, rtol=1e-5)

        def f(fn_kwargs):
            def inner(v, l, a):
                return jnp.sum(ms_deform_attn(
                    v, SHAPES, l, a, **fn_kwargs) ** 2)
            return inner

        g_v4 = jax.grad(f(dict(dense_cell_budget=1, pallas_dense=True)),
                        argnums=(0, 1, 2))(value, loc, attn)
        g_ref = jax.grad(f(dict(pallas_dense=False)),
                         argnums=(0, 1, 2))(value, loc, attn)
        for gp, gr, name in zip(g_v4, g_ref, ("value", "loc", "attn")):
            np.testing.assert_allclose(np.asarray(gp), np.asarray(gr),
                                       atol=1e-4, rtol=1e-4, err_msg=name)
    finally:
        (msda_mod.PALLAS_SKIP_IMPL, msda_mod.PALLAS_V2_MIN_QUERIES,
         msda_mod.PALLAS_V4_CW) = saved
        ms_deform_attn.clear_cache()


@pytest.mark.parametrize("oob", [False, True])
@pytest.mark.parametrize("lvl", [0, 1])
def test_pallas_v2_matches_reference(lvl, oob):
    """Block-skipping variant: identical numerics incl. OOB points (whose
    contributions land in skipped tiles must be exactly preserved)."""
    value, loc, attn = make_inputs(seed=13, oob=oob)
    h, w = SHAPES[lvl]
    got = dense_level_pallas_v2(level_slices(value)[lvl], loc[:, :, :, lvl],
                                attn[:, :, :, lvl], h, w, True)
    want = _level_out_gather(level_slices(value)[lvl], loc[:, :, :, lvl],
                             attn[:, :, :, lvl], h, w)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=1e-5)


@pytest.mark.parametrize("oob", [False, True])
@pytest.mark.parametrize("lvl", [0, 1])
def test_pallas_v3_matches_reference(lvl, oob):
    """Sorted + x-windowed variant: the query permutation must invert
    exactly and the window fallback must preserve OOB contributions."""
    value, loc, attn = make_inputs(seed=29, oob=oob)
    h, w = SHAPES[lvl]
    got = dense_level_pallas_v3(level_slices(value)[lvl], loc[:, :, :, lvl],
                                attn[:, :, :, lvl], h, w, True)
    want = _level_out_gather(level_slices(value)[lvl], loc[:, :, :, lvl],
                             attn[:, :, :, lvl], h, w)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=1e-5)


@pytest.mark.parametrize("oob", [False, True])
@pytest.mark.parametrize("lvl", [0, 1])
def test_pallas_v4_matches_reference(lvl, oob):
    """Compacted-grid variant: the dynamic [lo, hi] walk + manual DMA must
    reproduce the gather numerics exactly, incl. OOB points whose corners
    land outside every s-tile (empty walks)."""
    from trackformer_tpu.ops.msda_dense import dense_level_pallas_v4
    value, loc, attn = make_inputs(seed=41, oob=oob)
    h, w = SHAPES[lvl]
    got = dense_level_pallas_v4(level_slices(value)[lvl], loc[:, :, :, lvl],
                                attn[:, :, :, lvl], h, w, True)
    want = _level_out_gather(level_slices(value)[lvl], loc[:, :, :, lvl],
                             attn[:, :, :, lvl], h, w)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=1e-5)


@pytest.mark.parametrize("cw", [None, 8, 64])
def test_pallas_v4_small_tiles_ranges(cw):
    """Multi-row-tile regime with clustered queries: each q-tile walks a
    short proper subrange (and with cw set, a multi-chunk x-walk whose
    chunk-straddling hat supports must not double count); compare against
    the gather formulation."""
    from trackformer_tpu.ops.msda_dense import _dense_level_pallas_v4_fwd
    rng = np.random.default_rng(43)
    h, w = 12, 9
    lq, m, d, p = 50, 2, 4, 4
    value = jnp.asarray(rng.standard_normal((1, h * w, m, d)), jnp.float32)
    base = (np.arange(lq) % (h * w))
    by = (base // w + 0.5) / h
    bx = (base % w + 0.5) / w
    loc = np.stack([bx, by], -1)[None, :, None, None, :] \
        + rng.normal(0, 0.03, (1, lq, m, p, 2))
    loc = jnp.asarray(loc, jnp.float32)
    attn = jnp.asarray(rng.uniform(0.1, 1.0, (1, lq, m, p)), jnp.float32)
    got = _dense_level_pallas_v4_fwd(value, loc, attn, h, w, tq=8,
                                     rows_per_tile=2, cw=cw, interpret=True)
    want = _level_out_gather(value, loc, attn, h, w)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=1e-5)


def test_pallas_v4_wide_spread_multichunk():
    """Queries spread across the full width force multi-chunk x-walks and
    full-height y-walks simultaneously; exactness must hold."""
    from trackformer_tpu.ops.msda_dense import _dense_level_pallas_v4_fwd
    rng = np.random.default_rng(47)
    h, w = 7, 150  # wp = 256: several 64-wide chunks, zero-padded tail
    lq, m, d, p = 33, 2, 4, 4
    value = jnp.asarray(rng.standard_normal((1, h * w, m, d)), jnp.float32)
    loc = jnp.asarray(rng.uniform(-0.2, 1.2, (1, lq, m, p, 2)), jnp.float32)
    attn = jnp.asarray(rng.uniform(0.1, 1.0, (1, lq, m, p)), jnp.float32)
    got = _dense_level_pallas_v4_fwd(value, loc, attn, h, w, tq=16,
                                     rows_per_tile=2, cw=64, interpret=True)
    want = _level_out_gather(value, loc, attn, h, w)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=1e-5)


def test_pallas_v4_sorted_chunked():
    """spatial_sort_perm + x-chunk walk: sorted tiling must invert exactly
    and chunk ownership must stay exact under the permutation."""
    from trackformer_tpu.ops.msda_dense import (_dense_level_pallas_v4_fwd,
                                                spatial_sort_perm)
    rng = np.random.default_rng(53)
    h, w = 10, 140  # wp = 256
    lq, m, d, p = 60, 2, 4, 4
    value = jnp.asarray(rng.standard_normal((1, h * w, m, d)), jnp.float32)
    base = (np.arange(lq) * 37) % (h * w)  # scrambled raster positions
    by = (base // w + 0.5) / h
    bx = (base % w + 0.5) / w
    loc = np.stack([bx, by], -1)[None, :, None, None, :] \
        + rng.normal(0, 0.02, (1, lq, m, p, 2))
    loc = jnp.asarray(loc, jnp.float32)
    attn = jnp.asarray(rng.uniform(0.1, 1.0, (1, lq, m, p)), jnp.float32)
    perm = spatial_sort_perm(loc, h, w)
    got = _dense_level_pallas_v4_fwd(value, loc, attn, h, w, tq=16,
                                     rows_per_tile=2, cw=64, perm=perm,
                                     interpret=True)
    want = _level_out_gather(value, loc, attn, h, w)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=1e-5)


def test_pallas_v3_window_paths():
    """Tiny cw forces a mix of windowed and full-fallback q-tiles on a
    wide level; both paths must agree with the gather formulation."""
    from trackformer_tpu.ops.msda_dense import _dense_level_pallas_v3_fwd
    rng = np.random.default_rng(31)
    h, w = 9, 200  # wp = 256 > cw: window machinery active
    lq, m, d, p = 70, 2, 4, 4
    value = jnp.asarray(rng.standard_normal((1, h * w, m, d)), jnp.float32)
    base = np.arange(lq) % (h * w)
    by = (base // w + 0.5) / h
    bx = (base % w + 0.5) / w
    # half the queries tight (fit cw), half spread wide (fallback)
    spread = np.where(np.arange(lq)[None, :, None, None, None] % 2 == 0,
                      0.02, 0.4)
    loc = np.stack([bx, by], -1)[None, :, None, None, :] \
        + rng.normal(0, 1, (1, lq, m, p, 2)) * spread
    loc = jnp.asarray(loc, jnp.float32)
    attn = jnp.asarray(rng.uniform(0.1, 1.0, (1, lq, m, p)), jnp.float32)
    got = _dense_level_pallas_v3_fwd(value, loc, attn, h, w, tq=16,
                                     rows_per_tile=2, cw=128,
                                     interpret=True)
    want = _level_out_gather(value, loc, attn, h, w)
    np.testing.assert_allclose(np.asarray(got).reshape(1, lq, m, d),
                               np.asarray(want), atol=2e-5, rtol=1e-5)


def test_pallas_v2_small_tiles_skipping():
    """Force several row-tiles (rows_per_tile=2) with clustered queries so
    real skipping happens, and compare against the gather formulation."""
    from trackformer_tpu.ops.msda_dense import _dense_level_pallas_v2_fwd
    rng = np.random.default_rng(17)
    h, w = 12, 9
    lq, m, d, p = 50, 2, 4, 4
    value = jnp.asarray(rng.standard_normal((1, h * w, m, d)), jnp.float32)
    # clustered: each query samples near its own raster position
    base = (np.arange(lq) % (h * w))
    by = (base // w + 0.5) / h
    bx = (base % w + 0.5) / w
    loc = np.stack([bx, by], -1)[None, :, None, None, :] \
        + rng.normal(0, 0.03, (1, lq, m, p, 2))
    loc = jnp.asarray(loc, jnp.float32)
    attn = jnp.asarray(rng.uniform(0.1, 1.0, (1, lq, m, p)), jnp.float32)
    got = _dense_level_pallas_v2_fwd(value, loc, attn, h, w, tq=8,
                                     rows_per_tile=2, interpret=True)
    want = _level_out_gather(value, loc, attn, h, w)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=1e-5)


def test_pallas_tile_padding_edges():
    """Lq and C not multiples of the tile sizes: padded queries must not
    leak into real outputs and padded cells must contribute zero."""
    rng = np.random.default_rng(11)
    h, w = 17, 19  # C = 323, far from 512-multiples
    lq = 130       # not a multiple of 256
    value = jnp.asarray(rng.standard_normal((1, h * w, 1, 8)), jnp.float32)
    loc = jnp.asarray(rng.uniform(-0.2, 1.2, (1, lq, 1, P, 2)), jnp.float32)
    attn = jnp.asarray(rng.uniform(0.1, 1.0, (1, lq, 1, P)), jnp.float32)
    got = dense_level_pallas(value, loc, attn, h, w, True)
    want = _level_out_gather(value, loc, attn, h, w)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=1e-5)
