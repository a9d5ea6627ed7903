"""On-device Hungarian (linear sum assignment) solver.

The reference moves every cost matrix to the host and calls scipy's
``linear_sum_assignment`` 2-3x per image per train step
(ref: pairnet/models/panoptic_heads/mask_hungarian_assigner.py:119-127,
pairnet/models/approaches/matcher.py:263-266) — a forced device→host sync on
the hot path. Here we solve the same problem on device with the
Jonker-Volgenant shortest-augmenting-path algorithm (the same algorithm family
scipy implements), written with ``lax.while_loop`` / ``lax.fori_loop`` so it
jits, and ``vmap``-batched over images.

Cost matrices in this framework are small (≤128 x ≤128: 100 queries x padded
GT segments), so the O(n·m²) sequential structure is cheap; every inner step
is a length-``m`` vector op that maps onto the VPU.

Padding contract: masked rows/columns are replaced by a constant
``PAD_COST`` identical across the padded row/column, which provably leaves
the optimal assignment on the valid submatrix unchanged (any placement of
leftover rows onto constant-cost columns has equal total cost).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_INF = jnp.float32(1e18)
PAD_COST = 1e6


def _solve_n_le_m(cost: jnp.ndarray) -> jnp.ndarray:
    """JV algorithm for an (n, m) cost matrix with n <= m.

    Returns ``row2col``: for each row, the assigned column index (always
    valid since n <= m). float32 costs.
    """
    n, m = cost.shape
    assert n <= m
    cost = cost.astype(jnp.float32)

    u0 = jnp.zeros((n,), jnp.float32)
    v0 = jnp.zeros((m + 1,), jnp.float32)
    # p[j] = row currently assigned to column j (-1 = free); index m is the
    # virtual start column holding the row being inserted.
    p0 = jnp.full((m + 1,), -1, jnp.int32)

    def insert_row(i, carry):
        u, v, p = carry
        p = p.at[m].set(i)
        way = jnp.zeros((m,), jnp.int32)
        minv = jnp.full((m,), _INF, jnp.float32)
        used = jnp.zeros((m + 1,), bool)
        row_used = jnp.zeros((n,), bool)
        j0 = jnp.int32(m)

        def cond(state):
            j0, *_ = state
            return state[6][j0] != -1  # p[j0] assigned -> keep searching

        def body(state):
            j0, used, row_used, minv, way, u, p_, v = state[0], state[1], state[2], state[3], state[4], state[5], state[6], state[7]
            used = used.at[j0].set(True)
            i0 = p_[j0]
            row_used = row_used.at[i0].set(True)
            cur = cost[i0, :] - u[i0] - v[:m]
            avail = ~used[:m]
            better = (cur < minv) & avail
            minv = jnp.where(better, cur, minv)
            way = jnp.where(better, j0, way)
            masked = jnp.where(avail, minv, _INF)
            j1 = jnp.argmin(masked).astype(jnp.int32)
            delta = masked[j1]
            u = u + jnp.where(row_used, delta, 0.0)
            v = v - jnp.where(used, delta, 0.0)
            minv = jnp.where(avail, minv - delta, minv)
            return (j1, used, row_used, minv, way, u, p_, v)

        state = (j0, used, row_used, minv, way, u, p, v)
        # The do-while: first iteration always runs (p[m] = i != -1).
        j0, used, row_used, minv, way, u, p, v = jax.lax.while_loop(
            cond, body, state
        )

        # Augment: walk `way` back to the virtual column, shifting matches.
        def aug_cond(s):
            j0, _ = s
            return j0 != m

        def aug_body(s):
            j0, p_ = s
            j1 = jnp.where(j0 == m, m, way[jnp.minimum(j0, m - 1)])
            p_ = p_.at[j0].set(p_[j1])
            return (j1, p_)

        j0, p = jax.lax.while_loop(aug_cond, aug_body, (j0, p))
        p = p.at[m].set(-1)
        return (u, v, p)

    u, v, p = jax.lax.fori_loop(0, n, insert_row, (u0, v0, p0))

    # Invert p (col -> row) into row2col.
    cols = jnp.arange(m, dtype=jnp.int32)
    row2col = jnp.full((n,), -1, jnp.int32)
    valid = p[:m] >= 0
    row2col = row2col.at[jnp.where(valid, p[:m], n)].set(
        jnp.where(valid, cols, -1), mode="drop"
    )
    return row2col


def _prep(cost, row_mask, col_mask):
    cost = cost.astype(jnp.float32)
    n, m = cost.shape
    if row_mask is None:
        row_mask = jnp.ones((n,), bool)
    if col_mask is None:
        col_mask = jnp.ones((m,), bool)
    # Clip to a sane range then overwrite padded entries with the constant.
    cost = jnp.clip(cost, -PAD_COST / 4, PAD_COST / 4)
    cost = jnp.where(col_mask[None, :], cost, PAD_COST)
    cost = jnp.where(row_mask[:, None], cost, PAD_COST)
    return cost, row_mask, col_mask


def _hungarian(
    cost: jnp.ndarray,
    row_mask: jnp.ndarray | None = None,
    col_mask: jnp.ndarray | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Solve a single (n, m) assignment problem on device.

    Masked (padded) rows/columns never match a valid counterpart. Returns
    ``(row2col, col2row)`` int32 arrays with -1 for unassigned/invalid.
    Matches ``scipy.optimize.linear_sum_assignment`` on the valid submatrix.
    """
    n, m = cost.shape
    cost, row_mask, col_mask = _prep(cost, row_mask, col_mask)

    if n <= m:
        row2col = _solve_n_le_m(cost)
    else:
        col2row_full = _solve_n_le_m(cost.T)
        row2col = jnp.full((n,), -1, jnp.int32)
        rows = jnp.arange(m, dtype=jnp.int32)
        row2col = row2col.at[col2row_full].set(rows, mode="drop")

    # Strip pad-pad matches: a valid row matched to an invalid column (or
    # vice versa) is reported unmatched.
    cols_ok = jnp.where(
        (row2col >= 0) & row_mask & col_mask[jnp.clip(row2col, 0, m - 1)],
        row2col,
        -1,
    )
    col2row = jnp.full((m,), -1, jnp.int32)
    rows = jnp.arange(n, dtype=jnp.int32)
    col2row = col2row.at[jnp.where(cols_ok >= 0, cols_ok, m)].set(
        jnp.where(cols_ok >= 0, rows, -1), mode="drop"
    )
    return cols_ok, col2row


hungarian = jax.jit(_hungarian)


@functools.partial(jax.jit, static_argnames=())
def batched_hungarian(cost, row_mask=None, col_mask=None):
    """vmap of :func:`hungarian` over a leading batch axis.

    cost: (B, n, m); masks (B, n) / (B, m) bool or None.
    Returns (row2col (B, n), col2row (B, m)).
    """
    B, n, m = cost.shape
    if row_mask is None:
        row_mask = jnp.ones((B, n), bool)
    if col_mask is None:
        col_mask = jnp.ones((B, m), bool)
    return jax.vmap(_hungarian)(cost, row_mask, col_mask)
