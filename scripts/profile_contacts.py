"""Sub-component profile of generate_contacts for the multi-object task.

Separates the analytic static-surface part from the mesh-SDF gathers
(robot-sphere-vs-object and object-pair queries) to quantify how much of
the contact-generation time is TPU gather cost.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")


def timeit(name, fn, *args, iters=20):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    ms = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:36s} {ms:9.3f} ms/call", flush=True)
    return ms


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--envs", type=int, default=1024)
    p.add_argument("--iters", type=int, default=20)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from handarm_tpu.envs.registry import make_env
    from handarm_tpu.math.quat import quat_rotate, quat_rotate_inv
    from handarm_tpu.physics.contacts import generate_contacts, _static_surface, _wall_surface
    from handarm_tpu.physics.shapes import object_sdf

    print("devices:", jax.devices(), flush=True)
    env, _ = make_env("Ur5SihMultiObjectManipulation",
                      [f"num_envs={args.envs}"])
    scene = env.scene
    shapes, spheres, geom, slots = (
        scene.shapes, scene.spheres, scene.geom, scene.slots)
    K = shapes.num_objects
    P = shapes.points_per_object
    S = spheres.body.shape[0]
    print(f"B={args.envs} K={K} P={P} S={S} slots={slots.num_slots} "
          f"walls={geom.num_walls} sdf_field={getattr(shapes, 'sdf_field', None) is not None and shapes.sdf_field.shape}",
          flush=True)

    state, obs = jax.jit(env.reset)(jax.random.PRNGKey(0))
    phys = state.physics
    opos, oquat, _, _ = phys.objects
    from handarm_tpu.physics.kinematics import forward_kinematics
    m = scene.model
    fk = jax.jit(lambda q: forward_kinematics(
        m, q, scene.base_quat[None], scene.base_pos[None]))(phys.robot.q)
    bq, bp = fk.body_quat, fk.body_pos

    timeit("generate_contacts (full)", jax.jit(
        lambda opos, oquat, bq, bp: generate_contacts(
            slots, shapes, spheres, geom, opos, oquat, bq, bp)),
        opos, oquat, bq, bp, iters=args.iters)

    # object points world + static surface only
    def f_static(opos, oquat):
        pts_w = opos[:, :, None, :] + quat_rotate(
            oquat[:, :, None, :], shapes.points[None])
        d, n = _static_surface(geom, pts_w)
        return d, n
    timeit("  obj points vs static", jax.jit(f_static), opos, oquat,
           iters=args.iters)

    def f_walls(opos, oquat):
        pts_w = opos[:, :, None, :] + quat_rotate(
            oquat[:, :, None, :], shapes.points[None])
        return _wall_surface(geom, pts_w)
    if geom.num_walls:
        timeit("  obj points vs walls", jax.jit(f_walls), opos, oquat,
               iters=args.iters)

    # robot spheres vs all K object SDFs
    def f_sph_obj(opos, oquat, bq, bp):
        centers = bp[:, spheres.body] + quat_rotate(
            bq[:, spheres.body], spheres.offset[None])
        outs = []
        for k in range(K):
            c_body = quat_rotate_inv(
                oquat[:, k:k + 1, :], centers - opos[:, k:k + 1, :])
            outs.append(object_sdf(shapes, k, c_body))
        return outs
    timeit(f"  robot spheres vs K SDFs ({S*K}q)", jax.jit(f_sph_obj),
           opos, oquat, bq, bp, iters=args.iters)

    # object pair queries
    Q = 8
    def f_pairs(opos, oquat):
        pts_w = opos[:, :, None, :] + quat_rotate(
            oquat[:, :, None, :], shapes.points[None])
        outs = []
        for ka in range(K):
            for kb in range(K):
                if ka == kb:
                    continue
                p_in_b = quat_rotate_inv(
                    oquat[:, kb:kb + 1, :],
                    pts_w[:, ka, :Q] - opos[:, kb:kb + 1, :])
                outs.append(object_sdf(shapes, kb, p_in_b))
        return outs
    timeit(f"  obj-pair SDF queries ({K*(K-1)*Q}q)", jax.jit(f_pairs),
           opos, oquat, iters=args.iters)

    # raw single-object SDF query scaling
    for nq in (64, 256, 1024):
        pts = jax.random.uniform(jax.random.PRNGKey(1),
                                 (args.envs, nq, 3), minval=-0.05, maxval=0.05)
        timeit(f"  raw SDF k=0 x{nq} pts", jax.jit(
            lambda pts: object_sdf(shapes, 0, pts)), pts, iters=args.iters)


if __name__ == "__main__":
    main()
