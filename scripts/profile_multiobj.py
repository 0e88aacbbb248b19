"""Component-level profile of the multi-object env step (runs on TPU).

Times each stage of the physics pipeline separately to localize the
multi-object throughput bottleneck (lift got 3x from the prep fix;
multi-object stayed ~3K env-steps/s, so its time must be elsewhere).

Usage: python scripts/profile_multiobj.py [--envs 1024] [--iters 10]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")


def timeit(name, fn, *args, iters=10):
    import jax

    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    ms = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:28s} {ms:9.2f} ms/call  (compile {compile_s:.1f}s)",
          flush=True)
    return ms


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--envs", type=int, default=1024)
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--task", default="Ur5SihMultiObjectManipulation")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from handarm_tpu.envs.registry import make_env
    from handarm_tpu.physics import engine as eng
    from handarm_tpu.physics.contacts import generate_contacts
    from handarm_tpu.physics.dynamics import compute_dyn
    from handarm_tpu.physics.kinematics import forward_kinematics
    from handarm_tpu.physics.solver import _prepare, solve_prepared, _rel_velocity

    print("devices:", jax.devices(), flush=True)
    env, _ = make_env(args.task, [f"num_envs={args.envs}"])
    scene = env.scene
    m, par = scene.model, scene.params
    h = par.dt / par.substeps
    print(f"task={args.task} B={args.envs} slots={scene.slots.num_slots} "
          f"K={scene.shapes.num_objects} nv={m.nv}", flush=True)

    key = jax.random.PRNGKey(0)
    env.ensure_initial_pool()  # genesis pool must exist before reset is traced
    state, obs = jax.jit(env.reset)(key)
    actions = 0.1 * jax.random.normal(key, (args.envs, env.num_actions))
    step = jax.jit(env.step)
    state, res = step(state, actions)  # settle one step
    jax.block_until_ready(res.reward)

    phys = state.physics
    rob = phys.robot
    q, qd = rob.q, rob.qd
    opos, oquat, olin, oang = phys.objects
    base_quat = scene.base_quat[None] if not m.floating else rob.base_quat
    base_pos = scene.base_pos[None] if not m.floating else rob.base_pos

    # --- components
    fk_fn = jax.jit(lambda q: forward_kinematics(m, q, base_quat, base_pos))
    fk = fk_fn(q)
    timeit("forward_kinematics", fk_fn, q, iters=args.iters)

    dyn_fn = jax.jit(lambda fk, qd: compute_dyn(
        m, fk, qd, scene.gravity, scene.kp, scene.kd, h))
    dyn = dyn_fn(fk, qd)
    timeit("compute_dyn (CRBA+Minv)", dyn_fn, fk, qd, iters=args.iters)

    gc_fn = jax.jit(lambda opos, oquat, bq, bp: generate_contacts(
        scene.slots, scene.shapes, scene.spheres, scene.geom,
        opos, oquat, bq, bp))
    contacts = gc_fn(opos, oquat, fk.body_quat, fk.body_pos)
    timeit("generate_contacts", gc_fn, opos, oquat,
           fk.body_quat, fk.body_pos, iters=args.iters)

    prep_fn = jax.jit(lambda fk, Minv, contacts, opos, oquat: _prepare(
        m, fk, Minv, scene.slots, contacts, scene.shapes,
        opos, oquat, h, par.solver))
    prep = prep_fn(fk, dyn.Minv, contacts, opos, oquat)
    timeit("solver _prepare", prep_fn, fk, dyn.Minv, contacts,
           opos, oquat, iters=args.iters)

    qd_free = qd + h * dyn.solve(jnp.zeros_like(qd) - dyn.bias)
    solve_fn = jax.jit(lambda prep, qd_free, olin, oang, lam: solve_prepared(
        prep, qd_free, olin, oang, par.solver, warm_lam=lam))
    lam0 = phys.contact_impulse
    out = solve_fn(prep, qd_free, olin, oang, lam0)
    timeit("solve_prepared (sweeps)", solve_fn, prep, qd_free,
           olin, oang, lam0, iters=args.iters)

    # --- full physics step vs full env step
    ps_fn = jax.jit(lambda s: eng.step(scene, s))
    ps_fn(phys)
    ms_phys = timeit("physics step (x3 = env)", ps_fn, phys,
                     iters=args.iters)

    t0 = time.perf_counter()
    for _ in range(args.iters):
        state, res = step(state, actions)
    jax.block_until_ready(res.reward)
    ms_env = (time.perf_counter() - t0) / args.iters * 1e3
    print(f"{'full env.step':28s} {ms_env:9.2f} ms/call -> "
          f"{args.envs / ms_env * 1e3:,.0f} env-steps/s", flush=True)
    print(f"obs/reward/reset overhead ~ {ms_env - 3 * ms_phys:.2f} ms",
          flush=True)


if __name__ == "__main__":
    main()
