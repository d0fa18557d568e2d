"""MSDA core-op numerics, following the reference op-test methodology
(/root/reference/src/trackformer/models/ops/test.py:23-95): compare the
optimized op against an independent grid_sample implementation (torch CPU)
for forward values and against jnp autodiff gradients for the backward.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from trackformer_tpu.ops.msda import ms_deform_attn, ms_deform_attn_reference

SHAPES = ((6, 4), (3, 2))
N, M, D, LQ, P = 2, 4, 8, 5, 3


def make_inputs(seed=0, dtype=np.float32):
    rng = np.random.RandomState(seed)
    s = sum(h * w for h, w in SHAPES)
    value = rng.randn(N, s, M, D).astype(dtype) * 0.01
    # locations mostly inside, some outside [0,1] to test zero padding
    loc = rng.uniform(-0.2, 1.2, (N, LQ, M, len(SHAPES), P, 2)).astype(dtype)
    attn = rng.rand(N, LQ, M, len(SHAPES), P).astype(dtype) + 1e-5
    attn = attn / attn.sum(axis=(3, 4), keepdims=True)
    return value, loc, attn


def torch_msda(value, shapes, loc, attn):
    """Independent torch grid_sample check, mirroring the published spec of
    multi-scale deformable attention (Zhu et al., Deformable DETR)."""
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    value = torch.tensor(value)
    loc = torch.tensor(loc)
    attn = torch.tensor(attn)
    n, s, m, d = value.shape
    _, lq, _, l, p, _ = loc.shape
    out = torch.zeros(n, lq, m, d)
    offset = 0
    for lid, (h, w) in enumerate(shapes):
        v = value[:, offset:offset + h * w]  # n, hw, m, d
        v = v.permute(0, 2, 3, 1).reshape(n * m, d, h, w)
        grid = 2 * loc[:, :, :, lid] - 1  # n, lq, m, p, 2
        grid = grid.permute(0, 2, 1, 3, 4).reshape(n * m, lq, p, 2)
        sampled = F.grid_sample(v, grid, mode="bilinear",
                                padding_mode="zeros", align_corners=False)
        # n*m, d, lq, p
        wgt = attn[:, :, :, lid].permute(0, 2, 1, 3).reshape(n * m, 1, lq, p)
        out += (sampled * wgt).sum(-1).reshape(n, m, d, lq).permute(0, 3, 1, 2)
        offset += h * w
    return out.reshape(n, lq, m * d).numpy()


def test_forward_matches_torch_grid_sample():
    value, loc, attn = make_inputs()
    ours = np.asarray(ms_deform_attn(jnp.array(value), SHAPES,
                                     jnp.array(loc), jnp.array(attn)))
    theirs = torch_msda(value, SHAPES, loc, attn)
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-6)


def test_forward_matches_naive_reference():
    value, loc, attn = make_inputs(seed=3)
    fast = np.asarray(ms_deform_attn(jnp.array(value), SHAPES,
                                     jnp.array(loc), jnp.array(attn)))
    ref = np.asarray(ms_deform_attn_reference(jnp.array(value), SHAPES,
                                              jnp.array(loc), jnp.array(attn)))
    np.testing.assert_allclose(fast, ref, rtol=1e-4, atol=1e-6)


def test_gradients_match_torch():
    torch = pytest.importorskip("torch")
    value, loc, attn = make_inputs(seed=1)

    def loss_jax(v, lo, a):
        return jnp.sum(ms_deform_attn(v, SHAPES, lo, a) ** 2)

    gv, gl, ga = jax.grad(loss_jax, argnums=(0, 1, 2))(
        jnp.array(value), jnp.array(loc), jnp.array(attn))

    tv = torch.tensor(value, requires_grad=True)
    tl = torch.tensor(loc, requires_grad=True)
    ta = torch.tensor(attn, requires_grad=True)
    import torch.nn.functional as F

    n, s, m, d = tv.shape
    _, lq, _, l, p, _ = tl.shape
    out = torch.zeros(n, lq, m, d, dtype=tv.dtype)
    offset = 0
    for lid, (h, w) in enumerate(SHAPES):
        v = tv[:, offset:offset + h * w].permute(0, 2, 3, 1).reshape(n * m, d, h, w)
        grid = (2 * tl[:, :, :, lid] - 1).permute(0, 2, 1, 3, 4).reshape(n * m, lq, p, 2)
        sampled = F.grid_sample(v, grid, mode="bilinear",
                                padding_mode="zeros", align_corners=False)
        wgt = ta[:, :, :, lid].permute(0, 2, 1, 3).reshape(n * m, 1, lq, p)
        out = out + (sampled * wgt).sum(-1).reshape(n, m, d, lq).permute(0, 3, 1, 2)
        offset += h * w
    torch.sum(out.reshape(n, lq, m * d) ** 2).backward()

    np.testing.assert_allclose(np.asarray(gv), tv.grad.numpy(), rtol=1e-3, atol=1e-7)
    np.testing.assert_allclose(np.asarray(ga), ta.grad.numpy(), rtol=1e-3, atol=1e-7)
    # location grads: torch grid_sample produces non-zero grads at exact cell
    # boundaries differently; tolerate tiny absolute slack
    np.testing.assert_allclose(np.asarray(gl), tl.grad.numpy(), rtol=1e-3, atol=1e-5)


def test_zero_outside_unit_square():
    value, loc, attn = make_inputs(seed=2)
    loc = np.full_like(loc, 5.0)  # all samples far outside
    out = np.asarray(ms_deform_attn(jnp.array(value), SHAPES,
                                    jnp.array(loc), jnp.array(attn)))
    np.testing.assert_allclose(out, 0.0, atol=1e-7)


def test_dense_and_gather_paths_identical():
    """The hybrid op's two executions (dense separable-bilinear matmul vs
    flat row-gather) must agree exactly, forward and backward, including
    out-of-bounds sampling locations (make_inputs draws in [-0.2, 1.2])."""
    value, loc, attn = make_inputs(seed=7)
    args = (jnp.array(value), jnp.array(loc), jnp.array(attn))

    def run(budget, v, l, a):
        return ms_deform_attn(v, SHAPES, l, a, dense_cell_budget=budget)

    dense = run(10**9, *args)   # every level dense
    gather = run(0, *args)      # every level gathered
    # split: level 1 dense, level 0 gathered with a COMPACT (level-0-only)
    # table (budget is batch-aware: N*Lq*M*cells)
    mixed = run(N * LQ * M * SHAPES[1][0] * SHAPES[1][1], *args)
    np.testing.assert_allclose(np.asarray(dense), np.asarray(gather),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(mixed), np.asarray(gather),
                               rtol=1e-5, atol=1e-6)

    def loss(budget, v, l, a):
        return jnp.sum(run(budget, v, l, a) ** 2)

    g_dense = jax.grad(loss, argnums=(1, 2, 3))(10**9, *args)
    g_gather = jax.grad(loss, argnums=(1, 2, 3))(0, *args)
    for gd, gg in zip(g_dense, g_gather):
        np.testing.assert_allclose(np.asarray(gd), np.asarray(gg),
                                   rtol=1e-4, atol=1e-6)


def test_gather_sort_and_compact_paths_exact():
    """The round-5 gather-path options — COMPACT per-level tables and
    snake-bucket query SORT (pure permutations) — must not change numerics
    in any combination, forward and backward."""
    from trackformer_tpu.ops import msda

    value, loc, attn = make_inputs(seed=11)
    args = (jnp.array(value), jnp.array(loc), jnp.array(attn))
    split_budget = N * LQ * M * SHAPES[1][0] * SHAPES[1][1]

    def run(v, l, a):
        # level 0 gathered (compact-eligible), level 1 dense
        return ms_deform_attn(v, SHAPES, l, a,
                              dense_cell_budget=split_budget)

    def loss(v, l, a):
        return jnp.sum(run(v, l, a) ** 2)

    base_sort, base_comp = msda.MSDA_GATHER_SORT, msda.MSDA_GATHER_COMPACT
    results, grads = {}, {}
    try:
        for sort in ("0", "1"):
            for comp in (False, True):
                msda.MSDA_GATHER_SORT = sort
                msda.MSDA_GATHER_COMPACT = comp
                ms_deform_attn.clear_cache()
                results[(sort, comp)] = np.asarray(run(*args))
                grads[(sort, comp)] = jax.grad(
                    loss, argnums=(0, 1, 2))(*args)
    finally:
        msda.MSDA_GATHER_SORT = base_sort
        msda.MSDA_GATHER_COMPACT = base_comp
        ms_deform_attn.clear_cache()

    ref = results[("0", False)]
    for key, got in results.items():
        np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-7,
                                   err_msg=str(key))
    gref = grads[("0", False)]
    for key, g in grads.items():
        for a, b in zip(g, gref):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-7,
                                       err_msg=str(key))


def test_decoder_skip_path_exact():
    """The round-5 decoder block-skip route (v4p with a caller-supplied
    spatial sort for small scattered query sets) must match the gather
    path exactly, forward and backward, including out-of-bounds points."""
    from trackformer_tpu.ops import msda

    value, loc, attn = make_inputs(seed=13)
    args = (jnp.array(value), jnp.array(loc), jnp.array(attn))

    def run(pallas, v, l, a):
        return ms_deform_attn(v, SHAPES, l, a, dense_cell_budget=0,
                              pallas_dense=pallas)

    def loss(pallas, v, l, a):
        return jnp.sum(run(pallas, v, l, a) ** 2)

    base_v1 = msda.PALLAS_DENSE_MAX_CELLS
    try:
        # kill the v1 route so BOTH levels land on dec_skip (Lq < 4096)
        msda.PALLAS_DENSE_MAX_CELLS = 0
        ms_deform_attn.clear_cache()
        got = np.asarray(run(True, *args))
        g_skip = jax.grad(loss, argnums=(1, 2, 3))(True, *args)
    finally:
        msda.PALLAS_DENSE_MAX_CELLS = base_v1
        ms_deform_attn.clear_cache()
    ref = np.asarray(run(False, *args))
    g_ref = jax.grad(loss, argnums=(1, 2, 3))(False, *args)
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)
    for a, b in zip(g_skip, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)
