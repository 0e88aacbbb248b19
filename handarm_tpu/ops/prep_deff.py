"""Pallas TPU kernel: fused robot-side effective-mass prep.

`solver._prepare` computes, per contact slot c and friction-basis
direction d, the robot's contribution to the effective mass:

    d_robot[b, c, d] = v^T Minv v,
    v[u] = anc[c, u] * ((screw_ang_u x p_c + screw_lin_u) . w_d)

The XLA path materializes the [B, C, nv, 3] `arm`/`v` tensors and a
batched [nv, nv] x [nv, C*3] GEMM in HBM — >400 MB of intermediates at
fleet batch (the dominant prep cost: 3.8 ms/sim-step of the measured
12.3 at B=8192, C=127; docs/performance.md). This kernel keeps one
env-tile entirely in VMEM: V planes are built per dof (17-24 unrolled
cross+dot ops on [Bt, C] tiles), and the quadratic form accumulates over
symmetric (u, w) pairs with per-env Minv entries broadcast from the flat
[Bt, nv*nv] plane — no [B, C, nv] tensor ever touches HBM.

Replaces the effective-mass part of what PhysX's prep pass does per
contact on GPU (reference solver budget: isaacgymenvs/cfg/task/
Ur5SihBase.yaml sim block).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _deff_kernel(nv: int, screws, pos, basis, anc, minv2, out):
    """screws [6, Bt, nv]; pos [3, Bt, C]; basis [9, Bt, C];
    anc [C, nv] static; minv2 [Bt, nv*nv]; out [3, Bt, C]."""
    px, py, pz = pos[0], pos[1], pos[2]

    # V[d][u]: [Bt, C] planes, nv*3 of them — all VMEM-resident
    V = [[None] * nv for _ in range(3)]
    for u in range(nv):
        sax = screws[0][:, u][:, None]  # [Bt, 1]
        say = screws[1][:, u][:, None]
        saz = screws[2][:, u][:, None]
        slx = screws[3][:, u][:, None]
        sly = screws[4][:, u][:, None]
        slz = screws[5][:, u][:, None]
        # arm = sa x p + sl  (broadcast [Bt,1] against [Bt,C])
        ax = say * pz - saz * py + slx
        ay = saz * px - sax * pz + sly
        az = sax * py - say * px + slz
        a_u = anc[:, u][None, :]  # [1, C] static ancestor mask row
        for d in range(3):
            wx, wy, wz = basis[3 * d], basis[3 * d + 1], basis[3 * d + 2]
            V[d][u] = (ax * wx + ay * wy + az * wz) * a_u

    # d_d = sum_u M_uu V_u^2 + 2 sum_{u<w} M_uw V_u V_w, with M entries
    # per-env scalars broadcast from the flat Minv plane
    for d in range(3):
        acc = jnp.zeros_like(px)
        for u in range(nv):
            m_uu = minv2[:, u * nv + u][:, None]  # [Bt, 1]
            acc = acc + m_uu * (V[d][u] * V[d][u])
            for w in range(u + 1, nv):
                m_uw = minv2[:, u * nv + w][:, None]
                acc = acc + (2.0 * m_uw) * (V[d][u] * V[d][w])
        out[d] = acc


def _pick_tile(B: int, C: int, nv: int) -> int:
    """Largest env tile whose V planes + in/out blocks stay well under the
    16 MB scoped-VMEM budget (V dominates: 3*nv [Bt, Cp] f32 planes)."""
    cp = ((C + 127) // 128) * 128
    nvp = ((nv + 127) // 128) * 128  # lane padding of the nv-minor blocks
    budget = 10 * 1024 * 1024
    for bt in (512, 256, 128, 64, 32, 16, 8, 4, 2, 1):
        if B % bt:
            continue
        v_bytes = 3 * nv * bt * cp * 4
        io = (2 * (12 * bt * cp) + 6 * bt * nvp + bt * nv * nv) * 4
        if v_bytes + io <= budget:
            return bt
    return 0


def robot_deff(
    screws: jnp.ndarray,  # [6, B, nv] (ang xyz, lin xyz)
    pos: jnp.ndarray,  # [3, B, C] contact points
    basis: jnp.ndarray,  # [9, B, C] (w0 xyz, w1 xyz, w2 xyz)
    anc: jnp.ndarray,  # [C, nv] static ancestor mask
    minv2: jnp.ndarray,  # [B, nv*nv] flat Minv (u-major)
    interpret: bool = False,
) -> jnp.ndarray:  # [3, B, C] per-direction robot effective mass
    _, B, nv = screws.shape
    C = pos.shape[2]
    bt = _pick_tile(B, C, nv)
    if bt == 0:
        raise ValueError(f"no valid tile for B={B}, C={C}, nv={nv}")
    vm = pltpu.VMEM
    return pl.pallas_call(
        functools.partial(_deff_kernel, nv),
        grid=(B // bt,),
        in_specs=[
            pl.BlockSpec((6, bt, nv), lambda i: (0, i, 0), memory_space=vm),
            pl.BlockSpec((3, bt, C), lambda i: (0, i, 0), memory_space=vm),
            pl.BlockSpec((9, bt, C), lambda i: (0, i, 0), memory_space=vm),
            pl.BlockSpec((C, nv), lambda i: (0, 0), memory_space=vm),
            pl.BlockSpec((bt, nv * nv), lambda i: (i, 0), memory_space=vm),
        ],
        out_specs=pl.BlockSpec(
            (3, bt, C), lambda i: (0, i, 0), memory_space=vm
        ),
        out_shape=jax.ShapeDtypeStruct((3, B, C), pos.dtype),
        interpret=interpret,
    )(screws, pos, basis, anc, minv2)
