"""Fused windowed-encoder-layer Pallas kernel (ops/window_attn.py) vs the
module path (MultiHeadAttention + LayerNorm/Dense chain) — identical
parameter trees and numerics, window-count padding, key-padding masks.

Reference counterpart of the layer being fused: the encoder hot loop at
/root/reference/src/trackformer/models/deformable_transformer.py:300-327
(TPU-fast windowed mode replaces it; see models/windowed_encoder.py).
"""
import jax
import jax.numpy as jnp
import numpy as np

from trackformer_tpu.models import windowed_encoder as we


def _mk_inputs(b=2, c=32, shapes=((10, 14), (5, 7), (3, 4))):
    rng = jax.random.PRNGKey(0)
    keys = jax.random.split(rng, 2 * len(shapes))
    srcs = [jax.random.normal(keys[i], (b, h, w, c))
            for i, (h, w) in enumerate(shapes)]
    poses = [jax.random.normal(keys[len(shapes) + i], (b, h, w, c))
             for i, (h, w) in enumerate(shapes)]
    masks = []
    for h, w in shapes:
        m = jnp.zeros((b, h, w), bool)
        m = m.at[1, h - max(1, h // 4):, :].set(True)
        m = m.at[1, :, w - max(1, w // 4):].set(True)
        masks.append(m)
    return srcs, masks, poses


def _run_both(**enc_kw):
    srcs, masks, poses = _mk_inputs()
    enc = we.WindowedEncoder(32, num_layers=2, nheads=4, dim_feedforward=64,
                             window=8, **enc_kw)
    prev = we.ATTN_IMPL
    try:
        we.ATTN_IMPL = "module"
        params = enc.init(jax.random.PRNGKey(1), srcs, masks, poses)
        out_mod = enc.apply(params, srcs, masks, poses)
        we.ATTN_IMPL = "fused"
        params_f = enc.init(jax.random.PRNGKey(1), srcs, masks, poses)
        out_fus = enc.apply(params, srcs, masks, poses)
    finally:
        we.ATTN_IMPL = prev
    return params, params_f, out_mod, out_fus


def test_param_tree_identical():
    params, params_f, _, _ = _run_both()
    flat_m = jax.tree_util.tree_flatten_with_path(params)[0]
    flat_f = jax.tree_util.tree_flatten_with_path(params_f)[0]
    keys_m = [jax.tree_util.keystr(k) for k, _ in flat_m]
    keys_f = [jax.tree_util.keystr(k) for k, _ in flat_f]
    assert keys_m == keys_f
    for (_, a), (_, b) in zip(flat_m, flat_f):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_fused_layer_matches_module():
    _, _, out_mod, out_fus = _run_both()
    assert out_mod.shape == out_fus.shape
    np.testing.assert_allclose(np.asarray(out_fus), np.asarray(out_mod),
                               atol=2e-5, rtol=1e-4)


def test_fused_layer_matches_module_gather_layout():
    prev = we.GATHER_LAYOUT
    try:
        we.GATHER_LAYOUT = True
        _, _, out_mod, out_fus = _run_both()
    finally:
        we.GATHER_LAYOUT = prev
    np.testing.assert_allclose(np.asarray(out_fus), np.asarray(out_mod),
                               atol=2e-5, rtol=1e-4)


def test_fused_layer_bf16():
    srcs, masks, poses = _mk_inputs()
    enc = we.WindowedEncoder(32, num_layers=1, nheads=4, dim_feedforward=64,
                             window=8, dtype=jnp.bfloat16)
    prev = we.ATTN_IMPL
    try:
        we.ATTN_IMPL = "module"
        params = enc.init(jax.random.PRNGKey(1), srcs, masks, poses)
        out_mod = enc.apply(params, srcs, masks, poses)
        we.ATTN_IMPL = "fused"
        out_fus = enc.apply(params, srcs, masks, poses)
    finally:
        we.ATTN_IMPL = prev
    np.testing.assert_allclose(
        np.asarray(out_fus, np.float32), np.asarray(out_mod, np.float32),
        atol=5e-2, rtol=5e-2)


def test_fused_kernel_window_isolation():
    """Tokens in one window must not see another window's keys even though
    GW windows share one kernel tile: perturbing window 1's tokens leaves
    window 0's outputs bit-unchanged (same tile, cross-window masked)."""
    from trackformer_tpu.ops.window_attn import fused_window_layer

    rng = jax.random.PRNGKey(3)
    nw, ws, c, nh, ff = 6, 16, 32, 4, 48
    k1, k2, k3 = jax.random.split(rng, 3)
    xw = jax.random.normal(k1, (nw, ws, c))
    pw = jax.random.normal(k2, (nw, ws, c))
    kp = jnp.zeros((nw, ws), bool).at[2, 10:].set(True)
    wkeys = jax.random.split(k3, 8)
    weights = {
        "q_kernel": jax.random.normal(wkeys[0], (c, c)) * 0.1,
        "k_kernel": jax.random.normal(wkeys[1], (c, c)) * 0.1,
        "v_kernel": jax.random.normal(wkeys[2], (c, c)) * 0.1,
        "out_kernel": jax.random.normal(wkeys[3], (c, c)) * 0.1,
        "q_bias": jnp.zeros(c), "k_bias": jnp.zeros(c),
        "v_bias": jnp.zeros(c), "out_bias": jnp.zeros(c),
        "norm1_scale": jnp.ones(c), "norm1_bias": jnp.zeros(c),
        "norm2_scale": jnp.ones(c), "norm2_bias": jnp.zeros(c),
        "linear1_kernel": jax.random.normal(wkeys[4], (c, ff)) * 0.1,
        "linear1_bias": jnp.zeros(ff),
        "linear2_kernel": jax.random.normal(wkeys[5], (ff, c)) * 0.1,
        "linear2_bias": jnp.zeros(c),
    }
    out0 = fused_window_layer(xw, pw, kp, weights, nh, gw=4, interpret=True)
    xw2 = xw.at[1].add(3.0)
    out1 = fused_window_layer(xw2, pw, kp, weights, nh, gw=4, interpret=True)
    np.testing.assert_array_equal(np.asarray(out0[0]), np.asarray(out1[0]))
    assert np.abs(np.asarray(out1[1] - out0[1])).max() > 1e-3
    # nw=6 is not a multiple of gw=4: padded windows must not leak either
    np.testing.assert_array_equal(np.asarray(out0[4:]),
                                  np.asarray(out1[4:]))
