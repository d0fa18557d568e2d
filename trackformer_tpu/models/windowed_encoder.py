"""TPU-fast encoder: shifted-window dense self-attention over all levels.

Motivation (measured on TPU v5e, see bench notes): exact multi-scale
deformable attention is gather-bound — XLA's gather tops out near the
random-access roofline (~30 ms per encoder layer pass at MOT17 scale), which
no amount of kernel work meaningfully beats on this hardware. The TPU-native
answer for the ENCODER (where queries == all tokens) is windowed dense
attention on the MXU: 8x8 token windows, alternating half-window shifts for
cross-window flow (Swin-style), plus a top-down cross-level fusion so levels
still exchange information (MSDA's L-axis sampling).

Performance shape (v5e, measured): a per-level loop of small attention calls
is LATENCY-bound, not FLOP-bound — 6 layers x 4 levels of separate
(n_win, 64, C) attentions ran ~32 ms/pass at MOT17 scale. This version
therefore (a) shares layer weights across levels (as the reference MSDA
encoder does — ms_deform_attn.py has one value_proj for all levels) and
(b) concatenates every level's windows into ONE (sum n_win, win^2, C)
attention call per layer, and runs the FFN on the flat (B, S, C) token
tensor in one pass — a handful of large MXU ops instead of dozens of tiny
ones.

Opt-in via `tpu.encoder_attention: windowed` (default remains `msda` for
semantic parity with the reference). The decoder keeps exact MSDA — its
query count is tiny, so the gather cost is negligible there.

TRAINING NOTE (round-4 bisection): this stack is post-norm (attention/FFN
LayerNorms after the residual adds, plus one CrossLevelFusion LayerNorm per
layer). At 6 layers it trains ONLY with LR warmup (`tpu.lr_warmup_steps`,
set in cfgs/tpu_fast.yaml): without warmup the first few hundred AdamW
steps at lr 4e-4 push the decoder into ignoring the still-noisy encoder
memory, after which the encoder output collapses to an input-independent
constant (measured: cross-scene prediction std exactly 0, encoder spatial
deviation 0.02 vs the exact arm's 7-23). Four layers merely underfit;
bf16/remat/window-size/resolution were all ruled out by ablation probes
(tools/agree_probe.py, AGREEMENT.json).
"""
from __future__ import annotations

import functools
import os
from typing import Any, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .attention import MultiHeadAttention
from .fused_params import DenseParams, LayerNormParams

# Windowed-layout strategy. "0" (default): per-level roll/pad/
# reshape-transpose chains (window_partition/window_merge). "1": ONE
# precomputed token-permutation row-gather into the windowed layout and one
# inverse gather back per layer — the roll, pad and 6-d transpose fold into
# a static index vector, replacing ~10 small layout ops per level per layer
# with 2 gathers of ~S rows (~0.06 ms each at flagship scale per the
# measured 360M rows/s row-gather rate, vs latency-bound transpose chains).
# Numerics are identical (pure permutation; padded slots masked as before).
# Module-level so bench.py can A/B both layouts on the live chip and route
# the winner; read at trace time.
GATHER_LAYOUT = os.environ.get("WINDOW_GATHER_LAYOUT", "0") == "1"

# Cross-level fusion strategy. "perlevel" (default): per-level resize +
# nn.Dense + nn.LayerNorm modules (6 matmuls + 4 norms + 6 resizes per
# fusion at 4 levels — each individually latency-bound). "batched": the
# identical math as TWO static row-gathers (each token's up/down nearest-
# resize neighbor index is a compile-time constant) + ONE stacked matmul
# over all levels + ONE flat layer-norm with per-token (per-level)
# scale/shift. Parameter tree is identical (fused_params.py), numerics agree
# to float reassociation (tests/test_models.py::test_fused_smallops_
# equivalence). Module-level so bench.py can A/B both on the live chip.
FUSION_IMPL = os.environ.get("WINDOW_FUSION_IMPL", "perlevel")

# Attention-layer strategy. "module": MultiHeadAttention +
# nn.LayerNorm/nn.Dense chain (one fused attention call over all levels'
# windows, ~20 XLA ops per layer — each latency-bound at this scale).
# "fused": the ENTIRE layer body (qkv, windowed attention, out proj,
# residual+LN, FFN, residual+LN) as ONE Pallas kernel over tiles of GW
# windows (ops/window_attn.py) — identical parameter tree (fused_params)
# and numerics (tests/test_window_attn.py). Deterministic/dropout-0 path
# only; training with dropout keeps the module path. "auto" (default,
# round 5): fused for DETERMINISTIC batch>=4 calls on TPU, module
# otherwise — measured v5e at flagship scale (tools/bench_encoder_pieces):
# the module path's f32 logits + d_head=36 MXU padding stop scaling with
# batch (attention core 0.37 ms at B=1 but 7.58 at B=8), so the VMEM
# kernel wins big at B=8 (full 6-layer encoder 70.45 vs 95.93 ms) while
# the module path stays ahead at B=1 (5.6 vs 6.7, PLAN.md r4). The kernel
# is forward-only (no VJP), hence never on training paths. Module-level so
# bench.py can A/B all three on the live chip and route the winner.
ATTN_IMPL = os.environ.get("WINDOW_ATTN_IMPL", "auto")


def _pad_hw(x: jnp.ndarray, win: int) -> Tuple[jnp.ndarray, int, int]:
    b, h, w, c = x.shape
    ph = (-h) % win
    pw = (-w) % win
    if ph or pw:
        x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
    return x, h + ph, w + pw


def window_partition(x: jnp.ndarray, win: int) -> jnp.ndarray:
    """(B, H, W, C) -> (B * nWin, win*win, C)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // win, win, w // win, win, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, win * win, c)


def window_merge(x: jnp.ndarray, b: int, h: int, w: int, win: int):
    c = x.shape[-1]
    x = x.reshape(b, h // win, w // win, win, win, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h, w, c)


def window_context(poses: List[jnp.ndarray], masks: List[jnp.ndarray],
                   win: int, shift: bool, dtype):
    """Window layout of positions + key-padding for one shift parity.

    Positions and masks are layer-invariant, so the encoder computes this
    ONCE per parity (2 layouts for 6 layers) instead of per layer — the
    per-level roll/pad/partition chains are pure small-op latency.
    """
    sh = win // 2 if shift else 0
    pw_all, kp_all = [], []
    for p, m in zip(poses, masks):
        b, h0, w0, _ = p.shape
        if sh:
            p = jnp.roll(p, (-sh, -sh), axis=(1, 2))
        p, hp, wp = _pad_hw(p, win)
        mf = m[..., None].astype(jnp.float32)
        if sh:
            mf = jnp.roll(mf, (-sh, -sh), axis=(1, 2))
        mf = jnp.pad(mf, ((0, 0), (0, hp - h0), (0, wp - w0), (0, 0)),
                     constant_values=1.0)
        kp_all.append(window_partition(mf, win)[..., 0] > 0.5)
        pw_all.append(window_partition(p.astype(dtype), win))
    pw = jnp.concatenate(pw_all, axis=0)
    kp = jnp.concatenate(kp_all, axis=0)
    # fully-padded windows would make softmax degenerate; un-mask them
    all_pad = jnp.all(kp, axis=1, keepdims=True)
    return pw, kp & ~all_pad


def _token_perm(shapes: Sequence[Tuple[int, int]], win: int, shift: bool):
    """Static (numpy) windowing permutation for one shift parity.

    Returns
      tok (NW, win*win) int32 — for every window slot, the flat token index
        it reads, or S (one past the end: a zero dummy row) for pad slots;
        encodes roll(-sh) -> pad-to-multiple -> window partition exactly as
        `window_partition` does, for all levels concatenated.
      inv (S,) int32 — for every flat token, its (window, slot) position in
        the windowed layout (each real token appears in exactly one window
        per parity, so the map is a bijection onto the non-pad slots).
    """
    sh = win // 2 if shift else 0
    s_total = sum(h * w for h, w in shapes)
    blocks = []
    base = 0
    for h, w in shapes:
        ids = np.arange(h * w, dtype=np.int64).reshape(h, w) + base
        if sh:
            ids = np.roll(ids, (-sh, -sh), axis=(0, 1))
        hp, wp = h + (-h) % win, w + (-w) % win
        idp = np.full((hp, wp), s_total, np.int64)
        idp[:h, :w] = ids
        blocks.append(idp.reshape(hp // win, win, wp // win, win)
                      .transpose(0, 2, 1, 3).reshape(-1, win * win))
        base += h * w
    tok = np.concatenate(blocks, axis=0)
    flat = tok.reshape(-1)
    real = flat < s_total
    inv = np.empty(s_total, np.int64)
    inv[flat[real]] = np.nonzero(real)[0]
    return tok.astype(np.int32), inv.astype(np.int32)


def gather_window_context(poses: List[jnp.ndarray], masks: List[jnp.ndarray],
                          win: int, shift: bool, dtype):
    """window_context twin for the gather layout: positions/key-padding in
    (B*NW, win*win) order via the same token permutation the layer uses
    (batch-major windows, vs level-major in `window_context` — a pure
    relabeling of the attention batch axis)."""
    b = poses[0].shape[0]
    shapes = [p.shape[1:3] for p in poses]
    c = poses[0].shape[-1]
    tok, inv = _token_perm(shapes, win, shift)
    tok_j = jnp.asarray(tok)

    flat_p = jnp.concatenate(
        [p.reshape(b, -1, c) for p in poses] + [jnp.zeros((b, 1, c),
                                                          poses[0].dtype)],
        axis=1)
    pw = jnp.take(flat_p, tok_j.reshape(-1), axis=1).reshape(
        -1, win * win, c).astype(dtype)

    flat_m = jnp.concatenate(
        [m.reshape(b, -1) for m in masks] + [jnp.ones((b, 1), bool)], axis=1)
    kp = jnp.take(flat_m, tok_j.reshape(-1), axis=1).reshape(-1, win * win)
    all_pad = jnp.all(kp, axis=1, keepdims=True)
    return pw, kp & ~all_pad, tok_j, jnp.asarray(inv)


class _AttnParams(nn.Module):
    """Parameter tree of MultiHeadAttention (q/k/v/out projections) without
    the compute — lets the fused Pallas layer (ops/window_attn.py) share
    checkpoints with the module path (same scope/leaf names + init RNG
    folding; see fused_params.py)."""
    d_model: int

    @nn.compact
    def __call__(self):
        out = {}
        for nm in ("q", "k", "v", "out"):
            kern, bias = DenseParams(self.d_model, self.d_model,
                                     name=f"{nm}_proj")()
            out[f"{nm}_kernel"] = kern
            out[f"{nm}_bias"] = bias
        return out


class WindowedEncoderLayer(nn.Module):
    """One shared-weight layer over ALL levels: single fused attention call
    on the concatenation of every level's windows, FFN on flat tokens."""
    d_model: int
    nheads: int = 8
    dim_feedforward: int = 1024
    dropout: float = 0.1
    window: int = 8
    shift: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, levels: List[jnp.ndarray], poses: List[jnp.ndarray],
                 masks: List[jnp.ndarray], deterministic: bool = True,
                 ctx=None) -> List[jnp.ndarray]:
        win = self.window
        sh = win // 2 if self.shift else 0
        b = levels[0].shape[0]
        shapes = [x.shape for x in levels]
        if GATHER_LAYOUT:
            if ctx is None:
                ctx = gather_window_context(poses, masks, win, self.shift,
                                            self.dtype)
            pw, kp, tok, inv = ctx
            flat = jnp.concatenate(
                [x.reshape(b, -1, self.d_model) for x in levels] +
                [jnp.zeros((b, 1, self.d_model), levels[0].dtype)], axis=1)
            xw = jnp.take(flat, tok.reshape(-1), axis=1).reshape(
                -1, win * win, self.d_model)
        else:
            if ctx is None:
                ctx = window_context(poses, masks, win, self.shift,
                                     self.dtype)
            pw, kp = ctx

            xw_all, meta = [], []
            for s, x in zip(shapes, levels):
                if sh:
                    x = jnp.roll(x, (-sh, -sh), axis=(1, 2))
                x, hp, wp = _pad_hw(x, win)
                xw_all.append(window_partition(x, win))
                meta.append((b, s[1], s[2], hp, wp, xw_all[-1].shape[0]))

            xw = jnp.concatenate(xw_all, axis=0)   # (sum_nwin, win^2, C)

        from ..ops.msda import _on_tpu
        use_fused = (
            (ATTN_IMPL == "fused" and (deterministic or self.dropout == 0.0))
            or (ATTN_IMPL == "auto" and deterministic and _on_tpu()
                and levels[0].shape[0] >= 4))
        if use_fused:
            from ..ops.window_attn import fused_window_layer

            ap = _AttnParams(self.d_model, name="self_attn")()
            g1, b1n = LayerNormParams(self.d_model, name="norm1")()
            k1, bb1 = DenseParams(self.dim_feedforward, self.d_model,
                                  name="linear1")()
            k2, bb2 = DenseParams(self.d_model, self.dim_feedforward,
                                  name="linear2")()
            g2, b2n = LayerNormParams(self.d_model, name="norm2")()
            weights = dict(ap, norm1_scale=g1, norm1_bias=b1n,
                           linear1_kernel=k1, linear1_bias=bb1,
                           linear2_kernel=k2, linear2_bias=bb2,
                           norm2_scale=g2, norm2_bias=b2n)
            x = fused_window_layer(xw, pw, kp, weights, self.nheads,
                                   interpret=not _on_tpu())
        else:
            q = xw + pw
            attn = MultiHeadAttention(self.d_model, self.nheads,
                                      self.dropout, self.dtype,
                                      name="self_attn")(
                q, q, xw, kp, deterministic)

            # residual + norm + FFN directly in the WINDOWED layout: every
            # op here is per-token, so values for real tokens are identical
            # to the flat formulation, and staying windowed drops the two
            # spatial<->flat concat/reshape chains per layer (measured
            # latency-bound, PLAN.md lever 2); padded window slots compute
            # garbage that the merge slice below discards
            drop = nn.Dropout(self.dropout)
            x = nn.LayerNorm(dtype=self.dtype, name="norm1")(
                xw + drop(attn, deterministic=deterministic))
            ffn = nn.Dense(self.d_model, dtype=self.dtype, name="linear2")(
                drop(nn.relu(nn.Dense(self.dim_feedforward,
                                      dtype=self.dtype,
                                      name="linear1")(x)),
                     deterministic=deterministic))
            x = nn.LayerNorm(dtype=self.dtype, name="norm2")(
                x + drop(ffn, deterministic=deterministic))

        out_levels = []
        off = 0
        if GATHER_LAYOUT:
            merged = jnp.take(x.reshape(b, -1, self.d_model), inv, axis=1)
            for s in shapes:
                n = s[1] * s[2]
                out_levels.append(merged[:, off:off + n].reshape(s))
                off += n
            return out_levels
        for bb, h0, w0, hp, wp, n in meta:
            a = x[off:off + n]
            off += n
            a = window_merge(a, bb, hp, wp, win)[:, :h0, :w0]
            if sh:
                a = jnp.roll(a, (sh, sh), axis=(1, 2))
            out_levels.append(a)
        return out_levels


def _nearest_resize(x: jnp.ndarray, shape) -> jnp.ndarray:
    """jax.image.resize(..., "nearest") with cheap exact-factor-2 paths.

    Backbone level ladders are exact /2 except where an odd size rounds up
    (e.g. 25 -> 13); for the exact case nearest-resize is literally a
    strided slice (down; nearest picks index 2i+1) or a 2x repeat (up) —
    verified equal numerically — which lower to slice/broadcast instead of
    the general gather, shaving per-layer fusion latency."""
    b, ho, wo, c = shape
    _, hi, wi, _ = x.shape
    if hi == 2 * ho and wi == 2 * wo:
        return x[:, 1::2, 1::2, :]
    if 2 * hi == ho and 2 * wi == wo:
        return jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
    return jax.image.resize(x, shape, "nearest")


def _nearest_idx(n_out: int, n_in: int) -> np.ndarray:
    """Source index per output position for 1-D nearest resize, matching
    `_nearest_resize` (incl. its exact-factor-2 fast paths and
    jax.image.resize's half-pixel-center floor rule for the general case);
    equality with the jax op is asserted in
    tests/test_models.py::test_nearest_idx_matches_resize."""
    if n_in == 2 * n_out:
        return np.arange(n_out) * 2 + 1
    if 2 * n_in == n_out:
        return np.arange(n_out) // 2
    return np.floor((np.arange(n_out) + 0.5) * n_in / n_out).astype(np.int64)


@functools.lru_cache(maxsize=None)
def _fusion_index_maps(hw: Tuple[Tuple[int, int], ...]):
    """Static flat-token index maps for the batched cross-level fusion.

    For the concatenated level-major token order (total S tokens):
      up (S,)    — flat index of each token's nearest-resize source in the
                   NEXT (coarser) level, or S (a zero dummy row) at the last
                   level;
      down (S,)  — same for the PREVIOUS (finer) level, dummy at level 0;
      lid (S,)   — each token's level id.
    """
    sizes = [h * w for h, w in hw]
    starts = np.concatenate([[0], np.cumsum(sizes)])
    s_total = int(starts[-1])
    up = np.full(s_total, s_total, np.int64)
    down = np.full(s_total, s_total, np.int64)
    for i, (h, w) in enumerate(hw):
        sl = slice(starts[i], starts[i + 1])
        if i + 1 < len(hw):
            hi, wi = hw[i + 1]
            r, c = _nearest_idx(h, hi), _nearest_idx(w, wi)
            up[sl] = (starts[i + 1] + r[:, None] * wi + c[None, :]).reshape(-1)
        if i > 0:
            hi, wi = hw[i - 1]
            r, c = _nearest_idx(h, hi), _nearest_idx(w, wi)
            down[sl] = (starts[i - 1] + r[:, None] * wi
                        + c[None, :]).reshape(-1)
    lid = np.concatenate([np.full(sz, i, np.int64)
                          for i, sz in enumerate(sizes)])
    return (up.astype(np.int32), down.astype(np.int32), lid.astype(np.int32))


class CrossLevelFusion(nn.Module):
    """Top-down + bottom-up level mixing (stands in for MSDA's cross-level
    sampling): each level receives resized, 1x1-projected neighbors."""
    d_model: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, levels: List[jnp.ndarray]) -> List[jnp.ndarray]:
        if FUSION_IMPL == "batched" and len(levels) > 1:
            return self._batched(levels)
        out = []
        for i, x in enumerate(levels):
            acc = x
            if i + 1 < len(levels):
                up = _nearest_resize(levels[i + 1], x.shape)
                acc = acc + nn.Dense(self.d_model, dtype=self.dtype,
                                     name=f"up_{i}")(up)
            if i > 0:
                down = _nearest_resize(levels[i - 1], x.shape)
                acc = acc + nn.Dense(self.d_model, dtype=self.dtype,
                                     name=f"down_{i}")(down)
            out.append(nn.LayerNorm(dtype=self.dtype, name=f"norm_{i}")(acc))
        return out

    def _batched(self, levels: List[jnp.ndarray]) -> List[jnp.ndarray]:
        """Same math, same params, fewer/larger ops: neighbor pick-up as two
        static row-gathers, all levels' up+down projections as one stacked
        (L, 2C, C) matmul with a per-token level select, and one flat
        layer-norm with per-token scale/shift. The extra (L-1)/L of the
        stacked matmul's FLOPs is ~0.1 ms at flagship scale — the point is
        replacing ~16 latency-bound small ops per fusion with ~5 large ones."""
        n_lvl, c = len(levels), self.d_model
        shapes = [x.shape for x in levels]
        up_i, down_i, lid = _fusion_index_maps(
            tuple((s[1], s[2]) for s in shapes))
        b = shapes[0][0]

        flat = jnp.concatenate([x.reshape(b, -1, c) for x in levels], axis=1)
        flatz = jnp.concatenate(
            [flat, jnp.zeros((b, 1, c), flat.dtype)], axis=1)
        up_in = jnp.take(flatz, jnp.asarray(up_i), axis=1)
        down_in = jnp.take(flatz, jnp.asarray(down_i), axis=1)
        cat = jnp.concatenate([up_in, down_in], axis=-1).astype(self.dtype)

        zk = jnp.zeros((c, c), jnp.float32)
        zb = jnp.zeros((c,), jnp.float32)
        ws, bs, gs, betas = [], [], [], []
        for i in range(n_lvl):
            ku, bu = ((DenseParams(c, c, name=f"up_{i}")())
                      if i + 1 < n_lvl else (zk, zb))
            kd, bd = ((DenseParams(c, c, name=f"down_{i}")())
                      if i > 0 else (zk, zb))
            ws.append(jnp.concatenate([ku, kd], axis=0))
            bs.append(bu + bd)
            s_, b_ = LayerNormParams(c, name=f"norm_{i}")()
            gs.append(s_)
            betas.append(b_)
        w = jnp.stack(ws).astype(self.dtype)            # (L, 2C, C)
        bias = jnp.stack(bs)                            # (L, C) f32
        lid_j = jnp.asarray(lid)

        proj = jnp.einsum("bsc,lcd->bsld", cat, w)      # (B, S, L, C)
        sel = jnp.take_along_axis(
            proj, lid_j[None, :, None, None].astype(jnp.int32), axis=2
        )[:, :, 0]
        acc = (flat.astype(self.dtype) + sel
               + jnp.take(bias, lid_j, axis=0).astype(self.dtype))

        # LayerNorm with per-token (per-level) scale/shift; stats in f32
        # with E[x^2]-E[x]^2 and eps 1e-6, exactly as nn.LayerNorm
        x32 = acc.astype(jnp.float32)
        mean = jnp.mean(x32, axis=-1, keepdims=True)
        var = jnp.mean(x32 * x32, axis=-1, keepdims=True) - mean * mean
        y = (x32 - mean) * jax.lax.rsqrt(var + 1e-6)
        g_tok = jnp.take(jnp.stack(gs), lid_j, axis=0)
        b_tok = jnp.take(jnp.stack(betas), lid_j, axis=0)
        out_flat = (y * g_tok + b_tok).astype(self.dtype)

        out, off = [], 0
        for s in shapes:
            n = s[1] * s[2]
            out.append(out_flat[:, off:off + n].reshape(s[0], s[1], s[2], c))
            off += n
        return out


class WindowedEncoder(nn.Module):
    """Drop-in encoder over per-level maps; returns flattened memory in the
    same token order as the deformable encoder."""
    d_model: int
    num_layers: int = 6
    nheads: int = 8
    dim_feedforward: int = 1024
    dropout: float = 0.1
    window: int = 8
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, srcs: Sequence[jnp.ndarray],
                 masks: Sequence[jnp.ndarray],
                 poses: Sequence[jnp.ndarray],
                 deterministic: bool = True) -> jnp.ndarray:
        levels = list(srcs)
        make_ctx = gather_window_context if GATHER_LAYOUT else window_context
        ctxs = {
            shift: make_ctx(list(poses), list(masks), self.window,
                            shift, self.dtype)
            for shift in ({bool(li % 2) for li in range(self.num_layers)})}
        for li in range(self.num_layers):
            levels = WindowedEncoderLayer(
                self.d_model, self.nheads, self.dim_feedforward,
                self.dropout, self.window, shift=bool(li % 2),
                dtype=self.dtype, name=f"layer_{li}")(
                    levels, list(poses), list(masks), deterministic,
                    ctx=ctxs[bool(li % 2)])
            levels = CrossLevelFusion(self.d_model, dtype=self.dtype,
                                      name=f"fuse_{li}")(levels)
        b = levels[0].shape[0]
        return jnp.concatenate(
            [x.reshape(b, -1, self.d_model) for x in levels], axis=1)
