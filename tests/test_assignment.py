import jax.numpy as jnp
import numpy as np
import pytest
from scipy.optimize import linear_sum_assignment

from trackformer_tpu.ops.assignment import BIG, hungarian, hungarian_batched


def total_cost(cost, col4row):
    return float(sum(cost[i, j] for i, j in enumerate(col4row)))


@pytest.mark.parametrize("seed", range(8))
@pytest.mark.parametrize("shape", [(5, 5), (7, 12), (1, 4), (20, 33), (64, 64)])
def test_matches_scipy_optimum(seed, shape):
    rng = np.random.RandomState(seed)
    cost = rng.randn(*shape).astype(np.float32) * 10
    ours = np.asarray(hungarian(jnp.array(cost)))
    rows, cols = linear_sum_assignment(cost)
    assert len(set(ours.tolist())) == shape[0], "assignment must be 1-to-1"
    np.testing.assert_allclose(
        total_cost(cost, ours),
        cost[rows, cols].sum(),
        rtol=1e-5, atol=1e-4)


def test_forbidden_edges_and_pinning():
    # mimic track-query pinning (/root/reference/src/trackformer/models/matcher.py:108-125):
    # row 0 pinned to col 2 via -1 with BIG elsewhere
    cost = np.full((3, 5), 1.0, np.float32)
    cost[0, :] = BIG
    cost[:, 2] = BIG
    cost[0, 2] = -1.0
    cost[1, 0] = -5.0
    cost[2, 4] = -7.0
    ours = np.asarray(hungarian(jnp.array(cost)))
    assert ours[0] == 2
    assert ours[1] == 0
    assert ours[2] == 4


def test_batched_matches_single():
    rng = np.random.RandomState(0)
    costs = rng.randn(4, 6, 9).astype(np.float32)
    batched = np.asarray(hungarian_batched(jnp.array(costs)))
    for b in range(4):
        rows, cols = linear_sum_assignment(costs[b])
        np.testing.assert_allclose(
            total_cost(costs[b], batched[b]),
            costs[b][rows, cols].sum(), rtol=1e-5, atol=1e-4)


def test_constant_padded_rows_do_not_disturb():
    rng = np.random.RandomState(3)
    real = rng.randn(4, 10).astype(np.float32)
    padded = np.concatenate([real, np.zeros((3, 10), np.float32)], axis=0)
    ours_real = np.asarray(hungarian(jnp.array(real)))
    ours_pad = np.asarray(hungarian(jnp.array(padded)))
    assert total_cost(real, ours_real) == pytest.approx(
        sum(real[i, j] for i, j in enumerate(ours_pad[:4])), abs=1e-3)
