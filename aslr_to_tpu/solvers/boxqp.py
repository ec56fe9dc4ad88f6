"""Projected-Newton box-constrained QP.

TPU-native replacement for Crocoddyl's ``BoxQP`` (class fossil
``boxqp_792`` in the reference's committed doxygen index,
``unittest/doc/doxygen-html/search/all_12.js:55-58``), used per knot by the
BoxDDP backward pass.

    min_x 0.5 x' H x + q' x   s.t.  lb <= x <= ub

Algorithm (Tassa et al. 2014, as in Crocoddyl): identify the clamped set
(at a bound with the gradient pushing outward), Newton step on the free
subsystem, Armijo backtracking with projection.

jit-first design: the active set is data-dependent, so instead of slicing
out the free submatrix (dynamic shapes) we solve a *masked* full-size
system — clamped rows/columns replaced by identity — which is exactly the
free-subsystem solve. Iteration count is fixed with convergence masking
(SPMD-safe: every scenario in a vmap batch runs the same program).
Problem sizes here are tiny (nu <= 4), so the masked solves are cheap.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.scipy.linalg import cho_solve

from ..utils.vma import pvary_like


class BoxQPResult(NamedTuple):
    x: jnp.ndarray        # solution
    free: jnp.ndarray     # bool mask of free dimensions
    converged: jnp.ndarray


def masked_free_solve(H, free, B):
    """Solve ``H_ff X_f = B_f`` through a full-size masked system.

    Rows/cols of ``H`` outside ``free`` are replaced by identity and the
    corresponding rows of ``B`` by zero, so the output has exact zeros on
    clamped dimensions and the free block solves the true subsystem.
    ``B`` may be a vector or a matrix.
    """
    n = H.shape[0]
    f = free.astype(H.dtype)
    mask2 = f[:, None] * f[None, :]
    A = H * mask2 + jnp.eye(n, dtype=H.dtype) * (1.0 - f)
    # Cholesky (not LU): an indefinite free block then yields NaNs, which
    # the solver's regularization-retry loop detects — matching Crocoddyl's
    # LLT-failure -> increase-reg path instead of silently using garbage.
    L = jnp.linalg.cholesky(A)
    if B.ndim == 1:
        return cho_solve((L, True), B * f)
    return cho_solve((L, True), B * f[:, None])


def boxqp(
    H,
    q,
    lb,
    ub,
    x_init,
    maxiter: int = 10,
    th_acceptstep: float = 0.1,
    th_grad: float = 1e-9,
    n_alphas: int = 10,
) -> BoxQPResult:
    """Solve the box QP with a fixed-iteration masked projected-Newton."""
    dtype = H.dtype
    alphas = jnp.asarray([2.0 ** -i for i in range(n_alphas)], dtype=dtype)

    def fval(x):
        return 0.5 * jnp.dot(x, H @ x) + jnp.dot(q, x)

    x0 = jnp.clip(x_init, lb, ub)

    def body(carry, _):
        x, done = carry
        g = q + H @ x
        clamped_lo = (x <= lb) & (g >= 0.0)
        clamped_hi = (x >= ub) & (g <= 0.0)
        free = ~(clamped_lo | clamped_hi)
        g_free_norm = jnp.max(jnp.abs(g * free.astype(dtype)))
        converged_now = g_free_norm < th_grad

        dx = -masked_free_solve(H, free, g)

        # Armijo over all alphas in parallel, pick the first acceptable one.
        def trial(a):
            xa = jnp.clip(x + a * dx, lb, ub)
            return fval(xa), xa

        fs, xs = jax.vmap(trial)(alphas)
        f0 = fval(x)
        gdx = jnp.dot(g, dx)
        accept = fs - f0 <= th_acceptstep * alphas * gdx
        any_accept = jnp.any(accept)
        idx = jnp.argmax(accept)  # first True (alphas ordered large->small)
        x_new = jnp.where(any_accept, xs[idx], x)

        new_done = done | converged_now | ~any_accept
        x_out = jnp.where(done, x, x_new)
        return (x_out, new_done), None

    (x_fin, _), _ = jax.lax.scan(
        body, pvary_like((x0, jnp.asarray(False)), q), None, length=maxiter)

    g = q + H @ x_fin
    clamped_lo = (x_fin <= lb) & (g >= 0.0)
    clamped_hi = (x_fin >= ub) & (g <= 0.0)
    free = ~(clamped_lo | clamped_hi)
    conv = jnp.max(jnp.abs(g * free.astype(dtype))) < jnp.asarray(1e-6, dtype=dtype)
    return BoxQPResult(x=x_fin, free=free, converged=conv)
