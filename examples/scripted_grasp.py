"""Scripted grasp-and-lift probe: a hand-crafted differential-IK controller
drives the lift task through env.step() to check that the physics supports a
successful grasp at all (capability ground truth, independent of RL).

Phases: hover above the object -> descend around it -> close the SIH ->
lift to the 0.8 m goal height. Prints a per-step trace and the final
verdict (object height vs goal). Used by tests/test_grasp.py.
"""

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

if os.environ.get("GRASP_PROBE_TPU") != "1":
    import jax

    jax.config.update("jax_platforms", "cpu")  # probe runs on host CPU


def make_controller(env, pitch=-1.45):
    """policy(state, t) -> action: 6D differential IK (analytic screw
    Jacobian) driving a claw grasp — reorient the hand so the fingers point
    down, descend around the object, close the flexions, lift."""
    import jax
    import jax.numpy as jnp
    from handarm_tpu.physics.kinematics import forward_kinematics, site_poses
    from handarm_tpu.math.quat import quat_mul, quat_conj, quat_from_axis_angle

    m = env.scene.model
    site = env.fingertip_sites

    bq = env.scene.base_quat[None]
    bp = env.scene.base_pos[None]

    # reference flange orientation at reset (fingers along +y); pitching the
    # hand about world x by `pitch` tilts the fingertips downward (claw)
    from handarm_tpu.robots.ur5sih import RESET_JOINT_CONFIG
    import numpy as np_

    q0 = jnp.asarray(np_.asarray(RESET_JOINT_CONFIG), jnp.float32)
    fk0 = forward_kinematics(m, q0[None], bq, bp)
    fq0, _ = site_poses(fk0, *env.flange_site, base_quat=bq, base_pos=bp)
    q_tilt = quat_from_axis_angle(
        jnp.array([[1.0, 0.0, 0.0]]), jnp.array([pitch])
    )[0]
    q_tgt_const = quat_mul(q_tilt, fq0[0, 0])

    def hand_state(q_full):
        fk = forward_kinematics(m, q_full[None], bq, bp)
        _, tp = site_poses(fk, *site, base_quat=bq, base_pos=bp)
        fq, _ = site_poses(fk, *env.flange_site, base_quat=bq, base_pos=bp)
        return jnp.mean(tp[0], axis=0), fq[0, 0], fk.screw[0, :6]

    def rotvec_err(q_tgt, q_now):
        qe = quat_mul(q_tgt, quat_conj(q_now))
        qe = qe * jnp.sign(qe[0])
        v = qe[1:4]
        s = jnp.maximum(qe[0], 1e-8)
        n = jnp.linalg.norm(v)
        angle = 2.0 * jnp.arctan2(n, s)
        return v / jnp.maximum(n, 1e-9) * angle

    dt_policy = env.cfg.dt  # integration step of the relative actionable

    def policy_single(q_full, obj_pos, t):
        p_now, q_now, screw = hand_state(q_full)

        hover = obj_pos + jnp.array([0.02, -0.01, 0.22])
        grasp = obj_pos + jnp.array([0.02, -0.01, -0.02])
        frac_d = jnp.clip((t - 70) / 90.0, 0.0, 1.0)
        tgt_dh = hover + frac_d * (grasp - hover)
        lift_h = jnp.clip((t - 190) * 0.004, 0.0, 0.45)  # 8 cm/s ascent
        tgt = jnp.where(t < 190, tgt_dh, grasp + jnp.array([0.0, 0.0, 1.0]) * lift_h)

        # thumb stays opposed (servo 0 at +1: SERVO_UPPER is the opposed
        # pose, q0=-1.556); flexions close once the claw surrounds the box
        flex = jnp.where(t >= 160, -1.0, 1.0) * jnp.ones(4)
        servo_a = jnp.concatenate([jnp.array([1.0]), flex])

        e_pos = tgt - p_now
        e_rot = rotvec_err(q_tgt_const, q_now)
        # 6D DLS on the analytic screw Jacobian: J_pos = s_lin + s_ang x p,
        # J_rot = s_ang (arm dofs are ancestors of every hand body)
        s_ang, s_lin = screw[:, :3], screw[:, 3:]
        Jp = (s_lin + jnp.cross(s_ang, p_now[None])).T  # [3, 6]
        Jr = s_ang.T  # [3, 6]
        w_rot = 0.12  # position must win: claw orientation is secondary
        J = jnp.concatenate([Jp, w_rot * Jr], axis=0)  # [6, 6]
        err = jnp.concatenate([e_pos, w_rot * e_rot])
        A = J @ J.T + 1e-3 * jnp.eye(6)
        dq = J.T @ jnp.linalg.solve(A, err)
        a_arm = jnp.clip(dq * 2.0 / (dt_policy * env.cfg.arm_action_scale), -0.5, 0.5)
        return jnp.concatenate([a_arm, servo_a])

    def policy(state, t):
        B = state.physics.robot.q.shape[0]
        tgt_idx = state.task.target_obj
        # anchor on the EPISODE-INITIAL object position: the waypoint schedule
        # must not chase the object once it is grasped and moving
        obj = jnp.take_along_axis(
            state.task.initial_obj_pos, tgt_idx[:, None, None], axis=1
        )[:, 0]
        return jax.vmap(lambda q, o: policy_single(q, o, t))(
            state.physics.robot.q, obj
        )

    return policy


def run(num_envs=2, steps=260, verbose=True, record=None, cfg_kwargs=None):
    import jax
    import jax.numpy as jnp
    from handarm_tpu.envs.hand_arm import HandArmConfig, HandArmEnv

    cfg = HandArmConfig(
        num_envs=num_envs,
        spawn_noise=(0.0, 0.0, 0.0),
        episode_length=10_000,  # no auto-reset during the probe
        **(cfg_kwargs or {}),
    )
    env = HandArmEnv(cfg)
    policy = make_controller(env)
    state, obs = jax.jit(env.reset)(jax.random.PRNGKey(0))

    @jax.jit
    def step(state, t):
        a = policy(state, t)
        return env.step(state, a)

    frames = []
    trace = []
    for t in range(steps):
        state, res = step(state, jnp.asarray(t))
        if verbose and t % 20 == 0 or t == steps - 1:
            obj_z = np.asarray(state.physics.objects.pos[:, 0, 2])
            tips = None
            trace.append((t, obj_z.copy()))
            if verbose:
                print(f"t={t:4d} obj_z={obj_z} reward={np.asarray(res.reward)}",
                      flush=True)
        if record is not None and t % 5 == 0:
            frames.append(jax.tree.map(np.asarray, state))
    obj_z = np.asarray(state.physics.objects.pos[:, 0, 2])
    goal_h = cfg.table_height + cfg.lift_goal_height_above_table
    ok = obj_z > goal_h
    if verbose:
        print(f"final obj_z={obj_z} goal_h={goal_h} lifted={ok}")
    if record is not None:
        from handarm_tpu.utils.visualization import render_state

        os.makedirs(record, exist_ok=True)
        for i, f in enumerate(frames):
            render_state(env, f, 0, path=os.path.join(record, f"t{i * 5:04d}.png"))
        print("wrote", len(frames), "frames to", record)
    return ok, obj_z, state


if __name__ == "__main__":
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--envs", type=int, default=2)
    p.add_argument("--steps", type=int, default=260)
    p.add_argument("--record", default=None)
    args = p.parse_args()
    run(args.envs, args.steps, record=args.record)
