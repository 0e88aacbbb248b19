"""Voxel SDF grids: host-side baking + jnp trilinear sampling.

TPU-native replacement for both PhysX mesh-vs-mesh narrowphase and the
reference's warp/pysdf usage (SURVEY.md §2.9: industreal_algo_utils.py
SDF queries). Objects' collision geometry becomes a precomputed signed
distance grid in body frame; contact generation is point-vs-SDF with
analytic trilinear gradients — branch-free, batched, MXU/VPU friendly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def bake_sdf(
    mesh,
    resolution: int = 32,
    margin: float = 0.015,
    samples: int = 60000,
    seed: int = 0,
):
    """Bake a signed-distance voxel grid from a triangle mesh (host-side).

    Sign via the sampled pseudo-normal method: sign((p - nearest) . normal).
    Robust for the mostly-watertight YCB/EGAD scans at grasping resolution.

    Returns (grid [R,R,R] float32, lo [3], spacing float).
    """
    from scipy.spatial import cKDTree

    v = mesh.vertices
    f = mesh.faces
    a, b, c = v[f[:, 0]], v[f[:, 1]], v[f[:, 2]]
    n = np.cross(b - a, c - a)
    areas = 0.5 * np.linalg.norm(n, axis=-1)
    n_unit = n / np.maximum(np.linalg.norm(n, axis=-1, keepdims=True), 1e-12)

    rng = np.random.default_rng(seed)
    probs = areas / max(areas.sum(), 1e-12)
    idx = rng.choice(len(f), size=samples, p=probs)
    r1, r2 = rng.random((2, samples, 1))
    s = np.sqrt(r1)
    pts = a[idx] * (1 - s) + b[idx] * (s * (1 - r2)) + c[idx] * (s * r2)
    normals = n_unit[idx]

    lo = v.min(0) - margin
    hi = v.max(0) + margin
    spacing = float((hi - lo).max() / (resolution - 1))
    axes = [lo[i] + spacing * np.arange(resolution) for i in range(3)]
    gx, gy, gz = np.meshgrid(*axes, indexing="ij")
    q = np.stack([gx, gy, gz], axis=-1).reshape(-1, 3)

    tree = cKDTree(pts)
    # average over k nearest sample normals to de-noise the sign
    dist, nn = tree.query(q, k=5, workers=-1)
    delta = q[:, None, :] - pts[nn]
    signs = np.einsum("qki,qki->qk", delta, normals[nn])
    sign = np.where(signs.mean(axis=1) >= 0, 1.0, -1.0)
    sdf = (sign * dist[:, 0]).reshape(resolution, resolution, resolution)
    return sdf.astype(np.float32), lo.astype(np.float32), spacing


def sample_sdf(grid: jnp.ndarray, lo: jnp.ndarray, spacing: jnp.ndarray, p: jnp.ndarray):
    """Trilinear SDF sample at body-frame points p: [..., 3] -> [...]."""
    R = grid.shape[0]
    u = (p - lo) / spacing
    u = jnp.clip(u, 0.0, R - 1.001)
    i0 = jnp.floor(u).astype(jnp.int32)
    frac = u - i0
    i1 = jnp.minimum(i0 + 1, R - 1)
    x0, y0, z0 = i0[..., 0], i0[..., 1], i0[..., 2]
    x1, y1, z1 = i1[..., 0], i1[..., 1], i1[..., 2]
    fx, fy, fz = frac[..., 0], frac[..., 1], frac[..., 2]
    c000 = grid[x0, y0, z0]
    c001 = grid[x0, y0, z1]
    c010 = grid[x0, y1, z0]
    c011 = grid[x0, y1, z1]
    c100 = grid[x1, y0, z0]
    c101 = grid[x1, y0, z1]
    c110 = grid[x1, y1, z0]
    c111 = grid[x1, y1, z1]
    c00 = c000 * (1 - fz) + c001 * fz
    c01 = c010 * (1 - fz) + c011 * fz
    c10 = c100 * (1 - fz) + c101 * fz
    c11 = c110 * (1 - fz) + c111 * fz
    c0 = c00 * (1 - fy) + c01 * fy
    c1 = c10 * (1 - fy) + c11 * fy
    d = c0 * (1 - fx) + c1 * fx
    # outside the grid: add the clamped-distance excess so far-away points
    # still see increasing distance
    u_raw = (p - lo) / spacing
    excess = jnp.linalg.norm(jnp.maximum(jnp.abs(u_raw - (R - 1) / 2) - (R - 1) / 2, 0.0), axis=-1)
    return d + excess * spacing


def bake_grad_grid(grid: np.ndarray, spacing: float) -> np.ndarray:
    """Precompute the gradient field of a baked SDF: [R, R, R, 3] via
    central differences (host-side, once). Sampling distance+gradient then
    costs ONE 8-corner gather of a 4-channel field instead of seven
    separate trilinear evaluations — gathers are the expensive op on TPU."""
    g = np.stack(np.gradient(grid, spacing), axis=-1)
    n = np.linalg.norm(g, axis=-1, keepdims=True)
    return (g / np.maximum(n, 1e-9)).astype(np.float32)


def sample_sdf_channels(field: jnp.ndarray, lo, spacing, p):
    """Trilinear sample of a multi-channel voxel field [R,R,R,C] at
    body-frame points p [..., 3] -> [..., C] (one fused 8-corner gather)."""
    R = field.shape[0]
    u = (p - lo) / spacing
    u = jnp.clip(u, 0.0, R - 1.001)
    i0 = jnp.floor(u).astype(jnp.int32)
    frac = u - i0
    i1 = jnp.minimum(i0 + 1, R - 1)
    x0, y0, z0 = i0[..., 0], i0[..., 1], i0[..., 2]
    x1, y1, z1 = i1[..., 0], i1[..., 1], i1[..., 2]
    fx = frac[..., 0:1]
    fy = frac[..., 1:2]
    fz = frac[..., 2:3]
    c000 = field[x0, y0, z0]
    c001 = field[x0, y0, z1]
    c010 = field[x0, y1, z0]
    c011 = field[x0, y1, z1]
    c100 = field[x1, y0, z0]
    c101 = field[x1, y0, z1]
    c110 = field[x1, y1, z0]
    c111 = field[x1, y1, z1]
    c00 = c000 * (1 - fz) + c001 * fz
    c01 = c010 * (1 - fz) + c011 * fz
    c10 = c100 * (1 - fz) + c101 * fz
    c11 = c110 * (1 - fz) + c111 * fz
    c0 = c00 * (1 - fy) + c01 * fy
    c1 = c10 * (1 - fy) + c11 * fy
    return c0 * (1 - fx) + c1 * fx


def sample_sdf_grad(grid, lo, spacing, p, grad_grid=None, eps_vox: float = 0.5):
    """(distance, unit gradient). With a precomputed grad_grid [R,R,R,3]
    this is one fused 4-channel trilinear gather; without, falls back to
    central differences of the distance field (7 evaluations)."""
    if grad_grid is not None:
        field = jnp.concatenate([grid[..., None], grad_grid], axis=-1)
        out = sample_sdf_channels(field, lo, spacing, p)
        d = out[..., 0]
        g = out[..., 1:4]
        g = g * jax.lax.rsqrt(jnp.sum(g * g, axis=-1, keepdims=True) + 1e-18)
        # out-of-grid excess (see sample_sdf)
        R = grid.shape[0]
        u_raw = (p - lo) / spacing
        excess = jnp.linalg.norm(
            jnp.maximum(jnp.abs(u_raw - (R - 1) / 2) - (R - 1) / 2, 0.0),
            axis=-1,
        )
        return d + excess * spacing, g
    e = eps_vox * spacing
    d = sample_sdf(grid, lo, spacing, p)
    grads = []
    for ax in range(3):
        dp = jnp.zeros_like(p).at[..., ax].set(e)
        grads.append(
            sample_sdf(grid, lo, spacing, p + dp)
            - sample_sdf(grid, lo, spacing, p - dp)
        )
    g = jnp.stack(grads, axis=-1)
    g = g * jax.lax.rsqrt(jnp.sum(g * g, axis=-1, keepdims=True) + 1e-18)
    return d, g
