"""Pallas TPU kernel: batched small-SPD inverse via unrolled Cholesky.

The PD-augmented mass matrix Mtilde (17x17 for the UR5+SIH) must be
inverted every sim step for every env. XLA lowers jnp.linalg.cholesky /
solve_triangular on batched tiny matrices to sequential loop constructs
that dominate the dynamics phase. This kernel lays the batch out on the
VPU lanes ([n, n, B-tile]) and unrolls the n=17 factorization and
triangular inversion completely — every statement is a [TB]-wide vector op
across envs, no loops, no HBM round-trips between stages.

Output: W = L^-1 (lower triangular) with M = L L^T; the caller forms
M^-1 = W^T W with one tiny batched matmul (MXU) outside.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _chol_inv_kernel(n: int, a_ref, w_ref):
    """a_ref: [n, n, TB] SPD (batch on lanes); w_ref receives L^-1.
    Fully unrolled Cholesky-Crout + forward substitution — every statement
    is one [TB]-wide lane-vector op."""
    L = {}
    for j in range(n):
        s = a_ref[j, j]
        for k in range(j):
            s = s - L[(j, k)] * L[(j, k)]
        inv_ljj = jax.lax.rsqrt(jnp.maximum(s, 1e-12))
        L[(j, j)] = inv_ljj  # store 1/L[j,j] directly
        for i in range(j + 1, n):
            s = a_ref[i, j]
            for k in range(j):
                s = s - L[(i, k)] * L[(j, k)]
            L[(i, j)] = s * inv_ljj

    W = {}
    zero = jnp.zeros_like(a_ref[0, 0])
    for r in range(n):
        for i in range(n):
            if i < r:
                W[(i, r)] = zero
            elif i == r:
                W[(i, r)] = L[(i, i)]  # 1/L[i,i]
            else:
                s = zero
                for k in range(r, i):
                    s = s - L[(i, k)] * W[(k, r)]
                W[(i, r)] = s * L[(i, i)]
            w_ref[i, r] = W[(i, r)]


def _linv_pallas(a_t: jnp.ndarray, n: int, interpret: bool) -> jnp.ndarray:
    """a_t: [n, n, B] -> W = L^-1 as [n, n, B]."""
    B = a_t.shape[-1]
    TB = 512 if B % 512 == 0 else (128 if B % 128 == 0 else B)
    kernel = functools.partial(_chol_inv_kernel, n)
    return pl.pallas_call(
        kernel,
        grid=(B // TB,),
        in_specs=[
            pl.BlockSpec((n, n, TB), lambda i: (0, 0, i), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec(
            (n, n, TB), lambda i: (0, 0, i), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n, n, B), a_t.dtype),
        interpret=interpret,
    )(a_t)


def spd_inverse(M: jnp.ndarray, force_pallas: bool | None = None) -> jnp.ndarray:
    """Batched inverse of SPD matrices M: [B, n, n] -> [B, n, n].

    Uses the Pallas kernel on TPU (or when force_pallas=True, interpreted
    elsewhere); falls back to a Cholesky solve on other backends."""
    B, n, _ = M.shape
    use_pallas = (
        force_pallas
        if force_pallas is not None
        else jax.default_backend() == "tpu"
    )
    if not use_pallas:
        chol = jnp.linalg.cholesky(M)
        eye = jnp.broadcast_to(jnp.eye(n, dtype=M.dtype), (B, n, n))
        y = jax.scipy.linalg.solve_triangular(chol, eye, lower=True)
        return jax.scipy.linalg.solve_triangular(
            jnp.swapaxes(chol, -1, -2), y, lower=False
        )
    interpret = jax.default_backend() != "tpu"
    a_t = jnp.moveaxis(M, 0, -1)  # [n, n, B]
    w_t = _linv_pallas(a_t, n, interpret)
    W = jnp.moveaxis(w_t, -1, 0)  # [B, n, n], lower = L^-1
    return jnp.einsum("bki,bkj->bij", W, W)  # M^-1 = W^T W
