"""Hungarian solver parity vs scipy (SURVEY.md hard part #2)."""

import jax.numpy as jnp
import numpy as np
import pytest
from scipy.optimize import linear_sum_assignment

from pairnet_tpu.ops.hungarian import batched_hungarian, hungarian


def _total(cost, row2col):
    r2c = np.asarray(row2col)
    rows = np.nonzero(r2c >= 0)[0]
    return float(cost[rows, r2c[rows]].sum())


@pytest.mark.parametrize("n,m", [(5, 5), (8, 13), (13, 8), (1, 4), (4, 1), (100, 64)])
def test_matches_scipy_cost(n, m):
    rng = np.random.default_rng(0)
    for trial in range(4):
        cost = rng.normal(size=(n, m)).astype(np.float32) * 10
        row2col, col2row = hungarian(jnp.asarray(cost))
        ri, ci = linear_sum_assignment(cost)
        expected = float(cost[ri, ci].sum())
        got = _total(cost, row2col)
        assert got == pytest.approx(expected, abs=1e-3), (n, m, trial)
        # consistency of the inverse map
        r2c = np.asarray(row2col)
        c2r = np.asarray(col2row)
        for r, c in enumerate(r2c):
            if c >= 0:
                assert c2r[c] == r
        assert (r2c >= 0).sum() == min(n, m)


def test_padding_does_not_perturb():
    """Optimal assignment on the valid submatrix is unchanged by padding."""
    rng = np.random.default_rng(1)
    n, m = 16, 32
    n_valid_cols = 7
    cost = rng.normal(size=(n, m)).astype(np.float32)
    col_mask = np.zeros(m, bool)
    col_mask[:n_valid_cols] = True

    row2col, col2row = hungarian(jnp.asarray(cost), col_mask=jnp.asarray(col_mask))
    ri, ci = linear_sum_assignment(cost[:, :n_valid_cols])

    got = {(r, c) for r, c in enumerate(np.asarray(row2col)) if c >= 0}
    expected = set(zip(ri.tolist(), ci.tolist()))
    assert got == expected
    # no valid row is matched to a padded column
    assert all(c < n_valid_cols for _, c in got)


def test_row_and_col_masks():
    rng = np.random.default_rng(2)
    cost = rng.normal(size=(10, 10)).astype(np.float32)
    row_mask = np.asarray([True] * 6 + [False] * 4)
    col_mask = np.asarray([True] * 4 + [False] * 6)
    row2col, col2row = hungarian(
        jnp.asarray(cost), jnp.asarray(row_mask), jnp.asarray(col_mask)
    )
    ri, ci = linear_sum_assignment(cost[:6, :4])
    got = {(r, c) for r, c in enumerate(np.asarray(row2col)) if c >= 0}
    assert got == set(zip(ri.tolist(), ci.tolist()))


def test_batched():
    rng = np.random.default_rng(3)
    B, n, m = 6, 20, 12
    cost = rng.normal(size=(B, n, m)).astype(np.float32)
    n_valid = rng.integers(1, m + 1, size=B)
    col_mask = np.arange(m)[None, :] < n_valid[:, None]
    row2col, col2row = batched_hungarian(jnp.asarray(cost), col_mask=jnp.asarray(col_mask))
    for b in range(B):
        ri, ci = linear_sum_assignment(cost[b][:, : n_valid[b]])
        got = {(r, c) for r, c in enumerate(np.asarray(row2col[b])) if c >= 0}
        assert got == set(zip(ri.tolist(), ci.tolist())), b


def test_degenerate_all_masked():
    cost = jnp.ones((4, 4))
    row2col, col2row = hungarian(cost, col_mask=jnp.zeros(4, bool))
    assert (np.asarray(row2col) == -1).all()
    assert (np.asarray(col2row) == -1).all()
