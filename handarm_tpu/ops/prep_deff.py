"""Pallas TPU kernel: fused robot-side effective-mass prep.

`solver._prepare` computes, per contact slot c and friction-basis
direction d, the robot's contribution to the effective mass:

    d_robot[b, c, d] = v^T Minv v,
    v[u] = anc[c, u] * ((screw_ang_u x p_c + screw_lin_u) . w_d)

The XLA path materializes the [B, C, nv, 3] `arm`/`v` tensors and a
batched [nv, nv] x [nv, C*3] micro-GEMM in HBM — >400 MB of intermediates
at fleet batch (3.8 of the 12.3 ms/sim-step profile at B=8192, C=127;
docs/performance.md). This kernel keeps one env-tile fully VMEM-resident.

Layout rules learned the hard way (Mosaic/TPU):
- the lane (minor) dim cannot be dynamically sliced -> every per-dof read
  uses a STATIC lane index (python-unrolled dof loops) or a dynamic slice
  of the MAJOR dim (Minv is passed as [nv, B, nv] so row u is a major-dim
  slice and entry (u, w) a static lane column);
- fully unrolling the nv^2-term quadratic form stack-allocates every
  temporary (~30 MB scoped VMEM > the 16 MB limit) -> V planes live in
  ONE reused scratch buffer and the dof loop is unrolled only per
  direction (nv iterations of ~2*nv short-lived temporaries).

Replaces the effective-mass part of PhysX's contact-prep pass (reference
solver budget: isaacgymenvs/cfg/task/Ur5SihBase.yaml sim block).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _deff_kernel(nv: int, screws, pos, basis, ancT, minv3, out, vbuf):
    """screws [nv, Bt, 6] (dof-major); pos [3, Bt, C]; basis [9, Bt, C];
    ancT [nv, C] static; minv3 [nv, Bt, nv] (dof-major Minv rows);
    out [3, Bt, C]; vbuf [nv, Bt, C] VMEM scratch.

    Dof loops are fori_loops with ~2*nv-op bodies: Mosaic stack-allocates
    every temporary of an unrolled loop without slot reuse (fully unrolled
    this kernel wants 30-48 MB of scoped VMEM against the 16 MB limit),
    while a fori body's slots are reused across iterations. All dynamic
    slices are on MAJOR dims (screws/Minv passed dof-major); lane indices
    are static."""
    px, py, pz = pos[0, :, :], pos[1, :, :], pos[2, :, :]

    for d in range(3):  # three friction-basis directions
        wx = basis[3 * d, :, :]
        wy = basis[3 * d + 1, :, :]
        wz = basis[3 * d + 2, :, :]

        def build(u, _):
            s = screws[pl.ds(u, 1), :, :][0]  # [Bt, 6]
            sax, say, saz = s[:, 0:1], s[:, 1:2], s[:, 2:3]
            slx, sly, slz = s[:, 3:4], s[:, 4:5], s[:, 5:6]
            # arm = sa x p + sl  (broadcast [Bt,1] against [Bt,C])
            ax = say * pz - saz * py + slx
            ay = saz * px - sax * pz + sly
            az = sax * py - say * px + slz
            a_u = ancT[pl.ds(u, 1), :]  # [1, C]
            vbuf[pl.ds(u, 1), :, :] = (
                (ax * wx + ay * wy + az * wz) * a_u
            )[None]
            return 0

        jax.lax.fori_loop(0, nv, build, 0, unroll=False)

        def qf(u, acc):
            v_u = vbuf[pl.ds(u, 1), :, :][0]
            mrow = minv3[pl.ds(u, 1), :, :][0]  # [Bt, nv]
            y = mrow[:, 0:1] * vbuf[0, :, :]
            for w in range(1, nv):  # static lane columns of mrow
                y = y + mrow[:, w : w + 1] * vbuf[w, :, :]
            return acc + v_u * y

        out[d, :, :] = jax.lax.fori_loop(
            0, nv, qf, jnp.zeros_like(px), unroll=False
        )


def _pick_tile(B: int, C: int, nv: int) -> int:
    """Largest env tile fitting the 16 MB scoped-VMEM limit: the V scratch
    (nv [Bt, Cp] f32 planes) + double-buffered in/out blocks + slack for
    the ~2*nv live temporaries of one unrolled dof iteration."""
    cp = ((C + 127) // 128) * 128
    nvp = 128  # lane padding of the 6-wide / nv-wide minor dims
    budget = 12 * 1024 * 1024
    for bt in (512, 256, 128, 64, 32, 16, 8, 4, 2, 1):
        if B % bt:
            continue
        scratch = nv * bt * cp * 4  # the V-plane buffer
        # double-buffered blocks: 12 in + 3 out [bt, cp] planes, plus the
        # dof-major screw and Minv blocks (minor dims pad to 128 lanes)
        io = 2 * ((12 + 3) * bt * cp + 2 * nv * bt * nvp) * 4
        # ~2*nv live temporaries of one fori body iteration
        slack = 2 * nv * bt * cp * 4
        if scratch + io + slack <= budget:
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
    minv3 = jnp.moveaxis(minv2.reshape(B, nv, nv), 1, 0)  # [nv, B, nv]
    screws_t = jnp.moveaxis(screws, 0, -1)  # [B, nv, 6]
    screws_t = jnp.moveaxis(screws_t, 1, 0)  # [nv, B, 6] dof-major
    vm = pltpu.VMEM
    return pl.pallas_call(
        functools.partial(_deff_kernel, nv),
        grid=(B // bt,),
        in_specs=[
            pl.BlockSpec((nv, bt, 6), lambda i: (0, i, 0), memory_space=vm),
            pl.BlockSpec((3, bt, C), lambda i: (0, i, 0), memory_space=vm),
            pl.BlockSpec((9, bt, C), lambda i: (0, i, 0), memory_space=vm),
            pl.BlockSpec((nv, C), lambda i: (0, 0), memory_space=vm),
            pl.BlockSpec((nv, bt, nv), lambda i: (0, i, 0), memory_space=vm),
        ],
        out_specs=pl.BlockSpec(
            (3, bt, C), lambda i: (0, i, 0), memory_space=vm
        ),
        out_shape=jax.ShapeDtypeStruct((3, B, C), pos.dtype),
        scratch_shapes=[pltpu.VMEM((nv, bt, C), pos.dtype)],
        interpret=interpret,
    )(screws_t, pos, basis, anc.T, minv3)
