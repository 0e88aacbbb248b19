"""Grasp-hold capability probe: CAN the physics hold a grasp at all?

Separates contact-holding physics from approach choreography: the scripted
controller (scripted_grasp.make_controller) runs its reach/descend/plant
phases normally, then — right before the finger snap — the object is
TELEPORTED into the measured claw pocket (midpoint of finger tips and thumb
tip, resting on the table). The snap + lift then demonstrate that the
contact model (friction cone, warm-started impulses, rolling resistance)
sustains a multi-point grasp through a 25 cm lift.

This is the capability ground truth the RL lift task depends on (reference
task: multi_object_manipulation.py lift success criterion); RL learns the
approach closed-loop, which open-loop scripting cannot do robustly.

Used by tests/test_grasp.py. PASS = object ends >0.25 m above the table
and within 12 cm of the finger centroid.
"""

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

if os.environ.get("GRASP_PROBE_TPU") != "1":
    import jax

    jax.config.update("jax_platforms", "cpu")


def run(verbose=True, seed=0):
    import jax
    import jax.numpy as jnp
    from scripted_grasp import make_controller
    from handarm_tpu.envs.hand_arm import HandArmConfig, HandArmEnv
    from handarm_tpu.physics.kinematics import forward_kinematics, site_poses

    cfg = HandArmConfig(
        num_envs=1,
        spawn_noise=(0.0, 0.0, 0.0),
        episode_length=10_000,
        objects=(("sphere", (0.03,), 0.15),),
        # low bin wall: the object is pressed against it for the squeeze
        # (the SIH thumb cannot reach below a table-level equator; the
        # reference task likewise grasps out of a walled bin)
        use_bin=True,
        bin_wall_height=0.045,
        # wall face at y=0.549: the sphere (r=0.03 at y=0.58) spawns
        # tangent to the bin's -y wall
        bin_center=(0.28, 0.699),
    )
    env = HandArmEnv(cfg)
    import os as _os
    policy = make_controller(env, pitch=-0.95, plant_thumb=False, yaw=float(_os.environ.get('YAW', '0.65')))
    state, _ = jax.jit(env.reset)(jax.random.PRNGKey(seed))

    m = env.scene.model
    bq = env.scene.base_quat[None]
    bp = env.scene.base_pos[None]

    @jax.jit
    def tips_of(q):
        fk = forward_kinematics(m, q, bq, bp)
        _, tp = site_poses(fk, *env.fingertip_sites, base_quat=bq, base_pos=bp)
        return tp[0]

    anchor = jnp.asarray(state.task.initial_obj_pos[:, 0, :2])

    @jax.jit
    def step(state, t, anchor):
        a, anchor = policy(state, t, anchor)
        st, res = env.step(state, a)
        return st, res, anchor

    T_TELEPORT = 216  # just before the finger snap (T_SNAP = 218)
    r = 0.03
    for t in range(480):
        if t == T_TELEPORT:
            # measure the claw pocket and drop the sphere into it
            tp = np.asarray(tips_of(state.physics.robot.q))
            fctr, thumb = tp[1:].mean(0), tp[0]
            pocket = 0.5 * (fctr + thumb)
            pos = jnp.asarray(
                [[[pocket[0], pocket[1], cfg.table_height + r]]], jnp.float32
            )
            obj = state.physics.objects._replace(
                pos=pos,
                linvel=jnp.zeros_like(state.physics.objects.linvel),
                angvel=jnp.zeros_like(state.physics.objects.angvel),
            )
            state = state._replace(physics=state.physics._replace(objects=obj))
            if verbose:
                print(f"teleport: pocket={np.round(pocket, 3)}")
        state, res, anchor = step(state, jnp.asarray(t), anchor)
        if verbose and t % 40 == 0 and t >= 200:
            o = np.asarray(state.physics.objects.pos[0, 0])
            print(f"t={t:3d} obj={np.round(o, 3)}")

    obj = np.asarray(state.physics.objects.pos[0, 0])
    tp = np.asarray(tips_of(state.physics.robot.q))
    fctr = tp[1:].mean(0)
    height = obj[2] - cfg.table_height
    dist = float(np.linalg.norm(obj - fctr))
    ok = bool(height > 0.25 and dist < 0.12)
    if verbose:
        print(f"final obj={np.round(obj, 3)} height_above_table={height:.3f} "
              f"tip_dist={dist:.3f} HELD={ok}")
    return ok, height, dist


if __name__ == "__main__":
    run()
