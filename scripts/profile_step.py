"""Phase breakdown of one lift-task sim step on the real device.

Times, at bench shapes, each phase of engine.step's shared-prep path in
isolation: FK, compute_dyn (incl. the batched SPD inverse), contact
generation, solver _prepare, the anchored substep loop, and the fully
fused env.step for reference. Drives the optimization order.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")


def timeit(name, fn, *args, iters=30):
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
    p.add_argument("--iters", type=int, default=30)
    p.add_argument("--task", default="Ur5SihLift")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from handarm_tpu.envs.registry import make_env
    from handarm_tpu.physics import solver as S
    from handarm_tpu.physics.contacts import generate_contacts
    from handarm_tpu.physics.dynamics import compute_dyn
    from handarm_tpu.physics.engine import step as engine_step
    from handarm_tpu.physics.kinematics import forward_kinematics

    print("devices:", jax.devices(), flush=True)
    env, _ = make_env(args.task, [f"num_envs={args.envs}"])
    scene = env.scene
    m, sp = scene.model, scene.params
    h = sp.dt / sp.substeps
    key = jax.random.PRNGKey(0)
    st, _ = jax.jit(env.reset)(key)
    ps = st.physics
    rob, objs = ps.robot, ps.objects
    B = rob.q.shape[0]
    C = scene.slots.num_slots
    print(f"B={B} C={C} nv={m.nv} nb={m.nb} K={scene.shapes.num_objects}",
          flush=True)

    bq = jnp.broadcast_to(scene.base_quat[None], (B, 4))
    bp = jnp.broadcast_to(scene.base_pos[None], (B, 3))

    fk_fn = jax.jit(lambda q: forward_kinematics(m, q, bq, bp))
    fk = fk_fn(rob.q)

    dyn_fn = jax.jit(
        lambda q, qd, fk: compute_dyn(
            m, fk, qd, scene.gravity, scene.kp, scene.kd, h
        )
    )
    dyn = dyn_fn(rob.q, rob.qd, fk)

    gc_fn = jax.jit(
        lambda opos, oquat, fk: generate_contacts(
            scene.slots, scene.shapes, scene.spheres, scene.geom,
            opos, oquat, fk.body_quat, fk.body_pos,
        )
    )
    contacts = gc_fn(objs.pos, objs.quat, fk)

    prep_fn = jax.jit(
        lambda fk, Minv, contacts, opos, oquat: S._prepare(
            m, fk, Minv, scene.slots, contacts, scene.shapes,
            opos, oquat, h, sp.solver,
        )
    )
    prep = prep_fn(fk, dyn.Minv, contacts, objs.pos, objs.quat)

    solve_fn = jax.jit(
        lambda prep, qd, lv, av, lam: S.solve_prepared(
            prep, qd, lv, av, sp.solver, lam
        )
    )

    step_fn = jax.jit(lambda s: engine_step(scene, s))
    act = 0.1 * jax.random.normal(jax.random.PRNGKey(1), (B, env.num_actions))
    env_step = jax.jit(env.step)

    it = args.iters
    t_fk = timeit("forward_kinematics", fk_fn, rob.q, iters=it)
    t_dyn = timeit("compute_dyn (Minv etc)", dyn_fn, rob.q, rob.qd, fk, iters=it)
    t_gc = timeit("generate_contacts", gc_fn, objs.pos, objs.quat, fk, iters=it)
    t_prep = timeit("solver._prepare", prep_fn, fk, dyn.Minv, contacts,
                    objs.pos, objs.quat, iters=it)
    t_solve = timeit(
        f"solve_prepared ({sp.solver.iterations} sweeps)", solve_fn,
        prep, rob.qd, objs.linvel, objs.angvel, ps.contact_impulse, iters=it,
    )
    t_sim = timeit("engine.step (3x via scan? no: 1 dt)", step_fn, ps, iters=it)
    t_env = timeit("env.step (full, 3 sim steps)", env_step, st, act, iters=it)
    print(f"\nper sim step (dt): fk+dyn+gc+prep = "
          f"{t_fk + t_dyn + t_gc + t_prep:.3f} ms, "
          f"substeps~2x solve = {2 * t_solve:.3f} ms", flush=True)
    print(f"env-step = 3 sim steps -> ideal "
          f"{3 * (t_fk + t_dyn + t_gc + t_prep + 2 * t_solve):.3f} ms vs "
          f"measured {t_env:.3f} ms", flush=True)
    print(f"throughput now: {B / t_env * 1e3:,.0f} env-steps/s", flush=True)


if __name__ == "__main__":
    main()
