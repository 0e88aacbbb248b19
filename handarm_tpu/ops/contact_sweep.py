"""Pallas TPU kernel: fused relaxed-Jacobi contact sweeps.

The SoA jacobi solver (physics/solver.py `_solve_jacobi_soa`) runs
`iterations` sweeps under lax.scan; every sweep re-reads ~40 [B, C] planes
plus Minv from HBM (~300 MB/sweep at fleet batch), making the solve phase
HBM-bound at ~0.6 ms/sweep. This kernel fuses ALL sweeps: each grid step
loads one env-tile of every plane into VMEM once, runs the fully-unrolled
iteration loop on-chip (VPU elementwise on [Bt, C] tiles, slot<->body and
slot<->object couplings as small MXU matmuls against static 0/1 matrices),
and writes qd / object velocities / accumulated impulses back once.
Per-solve HBM traffic falls from O(planes * iterations) to O(planes).

Semantics are identical to the scan path (same update order, same
projection); tests/test_contact_sweep.py pins them element-wise.

Replaces the per-iteration TGS sweep PhysX runs on GPU (reference budget:
8 position iterations, isaacgymenvs/cfg/task/Ur5SihBase.yaml sim block).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# plane-stack layout (first axis of the [NP, B, C] input). bias is NOT in
# the stack: it is the only plane that changes between anchored substeps,
# so it rides as its own input and the stack can be built once per sim
# step and threaded through the substep scan unchanged.
_BASE = dict(
    n=(0, 1, 2), t1=(3, 4, 5), t2=(6, 7, 8), pos=(9, 10, 11),
    mu=12, inv_d=(13, 14, 15), gate=16,
)
_NBASE = 17
_NSIDE = 10  # r(3) + Iinv sym(6) + invm(1)


def _sweep_kernel(
    nv: int, K: int, n_sides: int, signs: tuple, iterations: int,
    omega: float, apply_warm: bool, emit_vn: bool,
    planes, bias_ref, screws, qd_ref, minv2, obj, lam0,
    ancT, anc, fold, *rest,
):
    onehots = rest[: 2 * n_sides]
    qd_out = rest[2 * n_sides]
    obj_out = rest[2 * n_sides + 1]
    lam_out = rest[2 * n_sides + 2]
    vn_out = rest[2 * n_sides + 3] if emit_vn else None

    f32 = jnp.float32
    dot = functools.partial(jnp.dot, preferred_element_type=f32)

    P = lambda k: planes[k]
    nx, ny, nz = (P(k) for k in _BASE["n"])
    t1x, t1y, t1z = (P(k) for k in _BASE["t1"])
    t2x, t2y, t2z = (P(k) for k in _BASE["t2"])
    px, py, pz = (P(k) for k in _BASE["pos"])
    bias = bias_ref[:]
    mu = P(_BASE["mu"])
    id0, id1, id2 = (P(k) for k in _BASE["inv_d"])
    gate = P(_BASE["gate"])

    sides = []
    for s in range(n_sides):
        b = _NBASE + s * _NSIDE
        sides.append(dict(
            sign=signs[s],
            r=(P(b), P(b + 1), P(b + 2)),
            Iinv=(P(b + 3), P(b + 4), P(b + 5), P(b + 6), P(b + 7), P(b + 8)),
            invm=P(b + 9),
            onehot=onehots[2 * s][:],    # [C, K]
            onehotT=onehots[2 * s + 1][:],  # [K, C]
        ))

    sc = [screws[a] for a in range(6)]  # [Bt, nv] each
    qd = qd_ref[:]
    lv = [obj[i] for i in range(3)]
    av = [obj[3 + i] for i in range(3)]
    lam = [lam0[i] for i in range(3)]
    ancT_m = ancT[:]
    anc_m = anc[:]
    fold_m = fold[:]
    minv2_m = minv2[:]

    def rel_velocity(qd, lv, av):
        b6 = [dot(sc[a] * qd, ancT_m) for a in range(6)]
        wx, wy, wz, lx, ly, lz = b6
        vx = lx + wy * pz - wz * py
        vy = ly + wz * px - wx * pz
        vz = lz + wx * py - wy * px
        for sd in sides:
            ox = [dot(lv[i], sd["onehotT"]) for i in range(3)]
            aw = [dot(av[i], sd["onehotT"]) for i in range(3)]
            rx, ry, rz = sd["r"]
            sg = sd["sign"]
            vx = vx + sg * (ox[0] + aw[1] * rz - aw[2] * ry)
            vy = vy + sg * (ox[1] + aw[2] * rx - aw[0] * rz)
            vz = vz + sg * (ox[2] + aw[0] * ry - aw[1] * rx)
        return vx, vy, vz

    def apply_impulse(qd, lv, av, dP):
        dPx, dPy, dPz = dP
        mx = py * dPz - pz * dPy
        my = pz * dPx - px * dPz
        mz = px * dPy - py * dPx
        T = [dot(c, anc_m) for c in (mx, my, mz, dPx, dPy, dPz)]
        gi = (sc[0] * T[0] + sc[1] * T[1] + sc[2] * T[2]
              + sc[3] * T[3] + sc[4] * T[4] + sc[5] * T[5])
        giT = jnp.concatenate([gi] * nv, axis=1)  # [Bt, nv*nv], u-major
        qd = qd + dot(minv2_m * giT, fold_m)
        for sd in sides:
            sg = sd["sign"]
            invm = sd["invm"]
            lv = [lv[i] + sg * dot(dP[i] * invm, sd["onehot"])
                  for i in range(3)]
            rx, ry, rz = sd["r"]
            tx = ry * dPz - rz * dPy
            ty = rz * dPx - rx * dPz
            tz = rx * dPy - ry * dPx
            ixx, ixy, ixz, iyy, iyz, izz = sd["Iinv"]
            dwx = ixx * tx + ixy * ty + ixz * tz
            dwy = ixy * tx + iyy * ty + iyz * tz
            dwz = ixz * tx + iyz * ty + izz * tz
            av = [av[i] + sg * dot(dw, sd["onehot"])
                  for i, dw in enumerate((dwx, dwy, dwz))]
        return qd, lv, av

    if apply_warm:
        # warm start (anchored substeps): lam0 arrives pre-clipped to the
        # friction cone in basis components; re-applying it here replaces
        # the XLA-side _apply_soa pass (engine._step_anchored fast path)
        dP0 = (lam[0] * nx + lam[1] * t1x + lam[2] * t2x,
               lam[0] * ny + lam[1] * t1y + lam[2] * t2y,
               lam[0] * nz + lam[1] * t1z + lam[2] * t2z)
        qd, lv, av = apply_impulse(qd, lv, av, dP0)

    for _ in range(iterations):
        vx, vy, vz = rel_velocity(qd, lv, av)
        # --- projected impulse update ------------------------------------
        vn = vx * nx + vy * ny + vz * nz
        vt1 = vx * t1x + vy * t1y + vz * t1z
        vt2 = vx * t2x + vy * t2y + vz * t2z
        new_n = jnp.maximum(lam[0] + (bias - vn) * id0, 0.0)
        ft1 = lam[1] - vt1 * id1
        ft2 = lam[2] - vt2 * id2
        fmag = jnp.sqrt(ft1 * ft1 + ft2 * ft2)
        fmax = mu * new_n
        scale = jnp.where(fmag > fmax, fmax / jnp.maximum(fmag, 1e-9), 1.0)
        new = (new_n, ft1 * scale, ft2 * scale)
        dlam = tuple(omega * (new[i] - lam[i]) * gate for i in range(3))
        lam = tuple(lam[i] + dlam[i] for i in range(3))
        dPx = dlam[0] * nx + dlam[1] * t1x + dlam[2] * t2x
        dPy = dlam[0] * ny + dlam[1] * t1y + dlam[2] * t2y
        dPz = dlam[0] * nz + dlam[1] * t1z + dlam[2] * t2z
        qd, lv, av = apply_impulse(qd, lv, av, (dPx, dPy, dPz))

    qd_out[:] = qd
    for i in range(3):
        obj_out[i] = lv[i]
        obj_out[3 + i] = av[i]
    for i in range(3):
        lam_out[i] = lam[i]
    if emit_vn:
        # post-solve normal relative velocity (one extra evaluation): the
        # anchored-substep depth advance consumes this instead of running
        # a full _rel_velocity pass in XLA
        vx, vy, vz = rel_velocity(qd, lv, av)
        vn_out[:] = vx * nx + vy * ny + vz * nz


def _vmem_estimate(bt: int, C: int, n_planes: int, nv: int, K: int,
                   n_sides: int) -> int:
    """Model the kernel's total VMEM footprint at env-tile bt (bytes).

    Every per-env input/output block is double-buffered by the pallas
    pipeline; minor dims pad to 128 lanes and the second-minor to 8
    sublanes. Statics (ancT/anc/fold/onehots) are single-buffered."""
    lane = lambda n: ((n + 127) // 128) * 128
    sub = lambda n: ((n + 7) // 8) * 8
    db = 0
    db += n_planes * bt * lane(C)          # planes [NP, bt, C]
    db += 6 * bt * lane(nv)                # screws
    db += bt * lane(nv)                    # qd in
    db += bt * lane(nv * nv)               # minv2
    db += 6 * bt * lane(K)                 # obj in
    db += 3 * bt * lane(C)                 # lam0
    db += bt * lane(nv)                    # qd out
    db += 6 * bt * lane(K)                 # obj out
    db += 3 * bt * lane(C)                 # lam out
    db += bt * lane(C)                     # vn out (anchored fast path)
    single = sub(nv) * lane(C) + sub(C) * lane(nv) + sub(nv * nv) * lane(nv)
    single += n_sides * (sub(C) * lane(K) + sub(K) * lane(C))
    return (2 * db + single) * 4


def _pick_tile(B: int, C: int, n_planes: int, nv: int = 17, K: int = 1,
               n_sides: int = 2) -> int:
    """Largest power-of-two env tile whose modeled total VMEM footprint
    (see _vmem_estimate) stays within ~12 MB of the 16 MB budget. The old
    fixed 5.5 MB planes-only budget left the multiobj scene (C=372) on
    bt=32 tiles — 256 grid steps whose per-op overheads dominated the
    solve; the full model admits 2x larger tiles at both C=127 and C=372.
    Anchors: bt=256 at C=80/NP=38 measures ~16.5 MB (OOM), bt=128 fits;
    the model gives 15.9 MB / 8.6 MB for those."""
    budget = int(11.8 * 1024 * 1024)
    for bt in (512, 256, 128, 64, 32, 16, 8):
        if B % bt:
            continue
        if _vmem_estimate(bt, C, n_planes, nv, K, n_sides) <= budget:
            return bt
    return 0


def fused_jacobi_sweeps(
    planes: jnp.ndarray,  # [NP, B, C] stacked SoA planes (see _BASE)
    bias: jnp.ndarray,  # [B, C] depenetration bias (per-substep plane)
    screws: jnp.ndarray,  # [6, B, nv]
    qd: jnp.ndarray,  # [B, nv]
    minv2: jnp.ndarray,  # [B, nv*nv] (u-major flat Minv)
    obj: jnp.ndarray,  # [6, B, K] (lv xyz, av xyz)
    lam0: jnp.ndarray,  # [3, B, C]
    ancT: jnp.ndarray,  # [nv, C]
    anc: jnp.ndarray,  # [C, nv]
    fold: jnp.ndarray,  # [nv*nv, nv]
    side_onehots: list,  # per side: (onehot [C, K], onehotT [K, C])
    signs: tuple,
    iterations: int,
    omega: float,
    interpret: bool = False,
    apply_warm: bool = False,
    emit_vn: bool = False,
):
    NP, B, C = planes.shape
    nv = qd.shape[1]
    K = obj.shape[2]
    bt = _pick_tile(B, C, NP, nv, K, len(side_onehots))
    if bt == 0:  # pathological shape; caller should use the scan path
        raise ValueError(f"no valid tile for B={B}, C={C}")
    n_sides = len(side_onehots)

    kernel = functools.partial(
        _sweep_kernel, nv, K, n_sides, signs, iterations, omega,
        apply_warm, emit_vn,
    )
    grid = (B // bt,)
    vm = pltpu.VMEM
    in_specs = [
        pl.BlockSpec((NP, bt, C), lambda i: (0, i, 0), memory_space=vm),
        pl.BlockSpec((bt, C), lambda i: (i, 0), memory_space=vm),
        pl.BlockSpec((6, bt, nv), lambda i: (0, i, 0), memory_space=vm),
        pl.BlockSpec((bt, nv), lambda i: (i, 0), memory_space=vm),
        pl.BlockSpec((bt, nv * nv), lambda i: (i, 0), memory_space=vm),
        pl.BlockSpec((6, bt, K), lambda i: (0, i, 0), memory_space=vm),
        pl.BlockSpec((3, bt, C), lambda i: (0, i, 0), memory_space=vm),
        pl.BlockSpec((nv, C), lambda i: (0, 0), memory_space=vm),
        pl.BlockSpec((C, nv), lambda i: (0, 0), memory_space=vm),
        pl.BlockSpec((nv * nv, nv), lambda i: (0, 0), memory_space=vm),
    ]
    args = [planes, bias, screws, qd, minv2, obj, lam0, ancT, anc, fold]
    for oh, ohT in side_onehots:
        in_specs.append(pl.BlockSpec((C, K), lambda i: (0, 0), memory_space=vm))
        in_specs.append(pl.BlockSpec((K, C), lambda i: (0, 0), memory_space=vm))
        args.append(oh)
        args.append(ohT)

    out_shape = [
        jax.ShapeDtypeStruct((B, nv), qd.dtype),
        jax.ShapeDtypeStruct((6, B, K), qd.dtype),
        jax.ShapeDtypeStruct((3, B, C), qd.dtype),
    ]
    out_specs = [
        pl.BlockSpec((bt, nv), lambda i: (i, 0), memory_space=vm),
        pl.BlockSpec((6, bt, K), lambda i: (0, i, 0), memory_space=vm),
        pl.BlockSpec((3, bt, C), lambda i: (0, i, 0), memory_space=vm),
    ]
    if emit_vn:
        out_shape.append(jax.ShapeDtypeStruct((B, C), qd.dtype))
        out_specs.append(pl.BlockSpec((bt, C), lambda i: (i, 0),
                                      memory_space=vm))
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        interpret=interpret,
    )(*args)
