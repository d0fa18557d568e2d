"""Exact linear-sum-assignment (Hungarian) solver, jittable on TPU.

The reference calls scipy's `linear_sum_assignment` on CPU from inside the
training step (/root/reference/src/trackformer/models/matcher.py:127), which
forces a device→host sync per matcher call. Here the shortest-augmenting-path
algorithm (the same one scipy implements) is expressed with `lax.while_loop`
/ `lax.fori_loop` over fixed-shape state so matching runs on-device inside
the jitted train step and vmaps over the batch.

Conventions:
  * cost: (R, C) float32 with R <= C (callers orient the matrix; the matcher
    wrapper handles transposition).
  * Forbidden edges are encoded as large finite costs (use `BIG`), NOT inf.
  * Returns col4row (R,) int32 — the column assigned to each row. With padded
    rows (constant cost) the assignment of real rows is unaffected, because a
    constant row contributes the same total regardless of its column.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

# Large finite stand-in for infinity; small enough to keep f32 arithmetic
# exact relative to real cost magnitudes (|cost| <~ 1e4).
BIG = 1e8
_INF = 3e38  # plain float: no device constant at import time


@jax.jit
def hungarian(cost: jnp.ndarray) -> jnp.ndarray:
    """Solve min-cost assignment for cost (R, C), R <= C. Returns col4row (R,)."""
    r, c = cost.shape
    assert r <= c, f"hungarian requires R <= C, got {cost.shape}"
    cost = cost.astype(jnp.float32)

    def run_row(cur_row, state):
        u, v, row4col, col4row = state

        # --- Dijkstra from cur_row to the nearest unassigned column. ---
        dij_init = dict(
            i=cur_row,
            min_val=jnp.float32(0.0),
            shortest=jnp.full((c,), _INF, jnp.float32),
            path=jnp.full((c,), -1, jnp.int32),
            sr=jnp.zeros((r,), jnp.bool_),
            sc=jnp.zeros((c,), jnp.bool_),
            sink=jnp.int32(-1),
        )

        def dij_cond(s):
            return s["sink"] < 0

        def dij_body(s):
            i = s["i"]
            sr = s["sr"].at[i].set(True)
            cand = s["min_val"] + jax.lax.dynamic_index_in_dim(
                cost, i, axis=0, keepdims=False) - u[i] - v
            upd = (~s["sc"]) & (cand < s["shortest"])
            shortest = jnp.where(upd, cand, s["shortest"])
            path = jnp.where(upd, i, s["path"])
            masked = jnp.where(s["sc"], _INF, shortest)
            j = jnp.argmin(masked).astype(jnp.int32)
            min_val = masked[j]
            sc = s["sc"].at[j].set(True)
            rj = row4col[j]
            found = rj < 0
            return dict(
                i=jnp.where(found, i, rj),
                min_val=min_val,
                shortest=shortest,
                path=path,
                sr=sr,
                sc=sc,
                sink=jnp.where(found, j, jnp.int32(-1)),
            )

        s = jax.lax.while_loop(dij_cond, dij_body, dij_init)
        min_val, shortest, path, sr, sc, sink = (
            s["min_val"], s["shortest"], s["path"], s["sr"], s["sc"], s["sink"])

        # --- Update dual potentials. ---
        u = u.at[cur_row].add(min_val)
        others = sr & (jnp.arange(r) != cur_row)
        # shortest[col4row[i]] is valid wherever others is True (those rows
        # are assigned); clamp index for padded -1 entries.
        delta_u = min_val - shortest[jnp.clip(col4row, 0, c - 1)]
        u = jnp.where(others, u + delta_u, u)
        v = jnp.where(sc, v - (min_val - shortest), v)

        # --- Augment along the alternating path back to cur_row. ---
        aug_init = (row4col, col4row, sink, jnp.bool_(True))

        def aug_cond(t):
            return t[3]

        def aug_body(t):
            row4col_, col4row_, sink_, _ = t
            i = path[sink_]
            row4col_ = row4col_.at[sink_].set(i)
            next_sink = col4row_[i]
            col4row_ = col4row_.at[i].set(sink_)
            return (row4col_, col4row_, next_sink, i != cur_row)

        row4col, col4row, _, _ = jax.lax.while_loop(aug_cond, aug_body, aug_init)
        return (u, v, row4col, col4row)

    init = (
        jnp.zeros((r,), jnp.float32),
        jnp.zeros((c,), jnp.float32),
        jnp.full((c,), -1, jnp.int32),
        jnp.full((r,), -1, jnp.int32),
    )
    _, _, _, col4row = jax.lax.fori_loop(0, r, run_row, init)
    return col4row


@functools.partial(jax.jit)
def hungarian_batched(costs: jnp.ndarray) -> jnp.ndarray:
    """vmapped solver for (B, R, C) -> (B, R)."""
    return jax.vmap(hungarian)(costs)


@jax.jit
def hungarian_rect(cost: jnp.ndarray) -> jnp.ndarray:
    """Rectangular solve for any (R, C): returns (R,) col per row, -1 for
    rows left unassigned when R > C (scipy matches min(R, C) pairs)."""
    r, c = cost.shape
    if r <= c:
        return hungarian(cost)
    row4col = hungarian(cost.T)  # (C,) row assigned to each column
    out = jnp.full((r,), -1, jnp.int32)
    return out.at[row4col].set(jnp.arange(c, dtype=jnp.int32))
