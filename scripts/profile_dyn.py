"""Micro-profile of compute_dyn's internals at bench shapes."""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")


def timeit(name, fn, *args, iters=50):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    ms = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:34s} {ms:9.3f} ms/call", flush=True)
    return ms


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--envs", type=int, default=8192)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from handarm_tpu.envs.registry import make_env
    from handarm_tpu.ops.spd_inverse import spd_inverse
    from handarm_tpu.physics import dynamics as D
    from handarm_tpu.physics.kinematics import (
        body_velocities,
        forward_kinematics,
    )

    print("devices:", jax.devices(), flush=True)
    env, _ = make_env("Ur5SihLift", [f"num_envs={args.envs}"])
    scene = env.scene
    m, sp = scene.model, scene.params
    h = sp.dt / sp.substeps
    st, _ = jax.jit(env.reset)(jax.random.PRNGKey(0))
    rob = st.physics.robot
    B = rob.q.shape[0]
    bq = jnp.broadcast_to(scene.base_quat[None], (B, 4))
    bp = jnp.broadcast_to(scene.base_pos[None], (B, 3))
    fk = jax.jit(lambda q: forward_kinematics(m, q, bq, bp))(rob.q)

    f_inertia = jax.jit(lambda fk: D.world_spatial_inertias(m, fk))
    I_sp = f_inertia(fk)
    f_bv = jax.jit(lambda fk, qd: body_velocities(m, fk, qd))
    bv = f_bv(fk, rob.qd)
    f_M = jax.jit(lambda fk, I: D.mass_matrix(m, fk, I))
    M = f_M(fk, I_sp)
    f_Mt = jax.jit(
        lambda M: D.pd_augmented_mass(m, M, scene.kp, scene.kd, h)
    )
    Mt = f_Mt(M)
    f_inv = jax.jit(spd_inverse)
    f_bias = jax.jit(
        lambda fk, qd, I, bv: D.bias_forces(
            m, fk, qd, scene.gravity, I, bv
        )
    )
    f_all = jax.jit(
        lambda fk, qd: D.compute_dyn(
            m, fk, qd, scene.gravity, scene.kp, scene.kd, h
        )
    )
    f_all(fk, rob.qd)

    timeit("world_spatial_inertias", f_inertia, fk)
    timeit("body_velocities", f_bv, fk, rob.qd)
    timeit("mass_matrix (CRBA)", f_M, fk, I_sp)
    timeit("pd_augmented_mass", f_Mt, M)
    timeit("spd_inverse (pallas)", f_inv, Mt)
    timeit("bias_forces", f_bias, fk, rob.qd, I_sp, bv)
    timeit("compute_dyn (fused)", f_all, fk, rob.qd)


if __name__ == "__main__":
    main()
