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


def make_controller(env, pitch=-1.45, plant_thumb=True, yaw=0.0):
    """policy(state, t) -> action: 6D differential IK (analytic screw
    Jacobian) driving a claw grasp — reorient the hand so the fingers point
    down, descend around the object, close the flexions, lift."""
    import jax
    import jax.numpy as jnp
    from handarm_tpu.physics.kinematics import forward_kinematics, site_poses
    from handarm_tpu.math.quat import (
        quat_mul, quat_conj, quat_from_axis_angle, quat_slerp,
    )

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
    # yaw about world z aligns the finger-curl plane with the world -y axis
    # (measured ~37 deg off; an unaligned curl squirts the object sideways)
    q_yaw = quat_from_axis_angle(
        jnp.array([[0.0, 0.0, 1.0]]), jnp.array([yaw])
    )[0]
    q_tgt_const = quat_mul(q_yaw, quat_mul(q_tilt, fq0[0, 0]))
    cy_, sy_ = float(np_.cos(yaw)), float(np_.sin(yaw))

    def yaw_off(off):
        # rotate a waypoint offset into the yawed claw frame (z unchanged)
        return jnp.array([
            cy_ * off[0] - sy_ * off[1],
            sy_ * off[0] + cy_ * off[1],
            off[2],
        ])
    # reset-pose anchors: the Cartesian schedule starts HERE and moves
    # continuously, so the incremental IK only ever corrects a few mm/step
    _, tp0 = site_poses(fk0, *site, base_quat=bq, base_pos=bp)
    p_reset = jnp.mean(tp0[0, 1:], axis=0)
    q_reset_flange = fq0[0, 0]

    # fixed open-hand model for the IK: during close/lift the curling
    # fingers would otherwise drag the arm target around
    q_hand_ik = q0[6:]

    def hand_state(q_full):
        fk = forward_kinematics(m, q_full[None], bq, bp)
        _, tp = site_poses(fk, *site, base_quat=bq, base_pos=bp)
        fq, _ = site_poses(fk, *env.flange_site, base_quat=bq, base_pos=bp)
        # FINGER centroid (thumb excluded): the thumb sits ~11 cm away, so
        # including it biases the mean and parks the fingers on the box top
        return jnp.mean(tp[0, 1:], axis=0), fq[0, 0], fk.screw[0, :6]

    def rotvec_err(q_tgt, q_now):
        qe = quat_mul(q_tgt, quat_conj(q_now))
        qe = qe * jnp.sign(qe[0])
        v = qe[1:4]
        s = jnp.maximum(qe[0], 1e-8)
        n = jnp.linalg.norm(v)
        angle = 2.0 * jnp.arctan2(n, s)
        return v / jnp.maximum(n, 1e-9) * angle

    dt_policy = env.cfg.dt  # integration step of the relative actionable

    def ik_step(q_arm, q_hand, tgt_p, tgt_q):
        """One damped Gauss-Newton step of 6D IK on the arm joints.

        Errors are clamped per iteration (8 cm / 0.4 rad) so a distant
        target never saturates the joint update into a limit cycle."""
        q_full = jnp.concatenate([q_arm, q_hand])
        p_now, q_now, screw = hand_state(q_full)
        e_pos = tgt_p - p_now
        e_rot = rotvec_err(tgt_q, q_now)
        en = jnp.linalg.norm(e_pos)
        e_pos = e_pos * jnp.minimum(1.0, 0.08 / jnp.maximum(en, 1e-9))
        rn = jnp.linalg.norm(e_rot)
        e_rot = e_rot * jnp.minimum(1.0, 0.4 / jnp.maximum(rn, 1e-9))
        # analytic screw Jacobian: J_pos = s_lin + s_ang x p, J_rot = s_ang
        # (the 6 arm dofs are ancestors of every hand body)
        s_ang, s_lin = screw[:, :3], screw[:, 3:]
        Jp = (s_lin + jnp.cross(s_ang, p_now[None])).T  # [3, 6]
        Jr = s_ang.T  # [3, 6]
        w_rot = 0.5  # claw orientation matters, position wins when infeasible
        J = jnp.concatenate([Jp, w_rot * Jr], axis=0)  # [6, 6]
        err = jnp.concatenate([e_pos, w_rot * e_rot])
        A = J @ J.T + 3e-3 * jnp.eye(6)
        dq = J.T @ jnp.linalg.solve(A, err)
        return q_arm + jnp.clip(dq, -0.15, 0.15)

    # phase schedule (control steps at 60 Hz)
    T_REACH, T_DESC, T_IN, T_SNAP, T_LIFT = 100, 180, 206, 218, 295

    def smoothstep(x):
        x = jnp.clip(x, 0.0, 1.0)
        return x * x * (3.0 - 2.0 * x)

    def policy_single(q_full, arm_target, obj0, anchor_xy, t):
        # xy anchor: chases the object until T_IN (it can roll during the
        # approach/thumb plant), then FROZEN for move-in/snap/lift; z comes
        # from the schedule against the initial pose
        obj_pos = jnp.concatenate([anchor_xy, obj0[2:]])
        # finger-centroid targets: descend clear of the box's corner-swing
        # radius (4.2 cm + wobble), slide laterally to the face, then PRESS
        # 3 cm past it during the close — the press pushes the box into the
        # descending thumb (the SIH thumb can only reach the box's top/near
        # edge, so the squeeze must come from the fingers)
        hover = obj_pos + yaw_off([0.028, 0.075, 0.20])
        descend = obj_pos + yaw_off([0.028, 0.075, -0.018])
        grasp = obj_pos + yaw_off([0.028, 0.036, -0.018])
        # +x bias: the thumb hangs ~3 cm to -x of the finger centroid;
        # shifting the claw +x centers the THUMB on the object so the
        # squeeze can't squirt it out diagonally around the thumb.
        # During the snap the wrist DROPS 2.2 cm: curling fingertips rise,
        # and without the drop every contact lands above the object's
        # equator and squirts it out (watermelon-seed failure)
        snapdrop = smoothstep((t - T_SNAP) / 20.0) * 0.022
        press = grasp - jnp.array([0.0, 0.0, 1.0]) * 0.022
        hold = grasp - jnp.array([0.0, 0.0, 1.0]) * snapdrop
        # reach: continuous lerp/slerp from the RESET tip pose to the claw
        # hover — the tip tracks this line instead of a joint-space sweep
        # that can plough through the table
        s_r = smoothstep(t / T_REACH)
        tgt_reach = p_reset + s_r * (hover - p_reset)
        q_sched = quat_slerp(q_reset_flange, q_tgt_const, s_r)
        frac_d = smoothstep((t - T_REACH) / (T_DESC - T_REACH))
        # arm holds at `descend` while the thumb wall plants (T_DESC..T_IN),
        # then moves in quickly for the snap
        frac_in = smoothstep((t - T_IN) / (T_SNAP - T_IN))
        tgt_dh = jnp.where(
            t < T_REACH,
            tgt_reach,
            jnp.where(
                t < T_DESC,
                hover + frac_d * (descend - hover),
                jnp.where(
                    t < T_SNAP,
                    descend + frac_in * (grasp - descend),
                    hold,
                ),
            ),
        )
        lift_h = jnp.clip((t - T_LIFT) * 0.0015, 0.0, 0.45)
        tgt = jnp.where(
            t < T_LIFT, tgt_dh, press + jnp.array([0.0, 0.0, 1.0]) * lift_h
        )

        # thumb stays opposed (servo 0 at +1: SERVO_UPPER is the opposed
        # pose, q0=-1.556). Close choreography (quasi-static, ~1/4 rate —
        # a full-rate flexion bats the box away):
        #   1. thumb flexes 26 steps and FREEZES mid-arc: its tip lands at
        #      the box's near-bottom edge and stays there as a wall
        #   2. fingers then flex + the arm presses the far face, squeezing
        #      the box against the planted thumb
        # choreography: (1) thumb flexes 26 steps while the arm holds at
        # `descend` — its tip plants at the sphere's near-bottom as a wall;
        # (2) the arm moves in; (3) fingers SNAP-scoop under the equator
        # against the planted thumb; gentle squeeze holds through the lift
        if plant_thumb:
            thumb_flex = jnp.where(
                jnp.logical_and(t >= T_DESC, t < T_DESC + 26), -0.25, 0.0
            ) + jnp.where(t < T_DESC, 1.0, 0.0)
            # the wall must STAY planted: no further thumb flexion
            thumb_flex = jnp.where(t >= T_SNAP, 0.0, thumb_flex)
        else:
            # a bin wall provides the block; the thumb joins the snap,
            # closing down onto the object to trap it from above
            thumb_flex = jnp.where(
                jnp.logical_and(t >= T_SNAP, t < T_SNAP + 20), -0.3,
                jnp.where(t < T_SNAP, 1.0, -0.03),
            )
        f_cmd = jnp.where(
            jnp.logical_and(t >= T_SNAP, t < T_SNAP + 20), -0.5, -0.05
        )
        f_cmd = jnp.where(t < T_SNAP, 1.0, f_cmd)
        finger_flex = f_cmd * jnp.ones(3)
        servo_a = jnp.concatenate(
            [jnp.array([1.0]), thumb_flex[None], finger_flex]
        )

        # damped GN IK solved on the CONTROL TARGET arm joints against the
        # FIXED open-hand model: the arm must hold rock-still through the
        # snap (an adaptive model chases the curling fingers and drags the
        # planted thumb wall off its post).
        q_hand = q_hand_ik

        # PD-lag compensation: the measured arm trails the control target
        # by ~0.05 rad while moving (~2-3 cm at the tip), enough to clip
        # the box edge on descent. Aim the IK beyond the waypoint by the
        # measured Cartesian lag (clamped to 3 cm/axis).
        p_meas, _, _ = hand_state(q_full)
        p_ctrl, _, _ = hand_state(jnp.concatenate([arm_target, q_hand]))
        tgt = tgt - jnp.clip(p_meas - p_ctrl, -0.03, 0.03)

        q_ik = arm_target
        for _ in range(6):
            q_ik = ik_step(q_ik, q_hand, tgt, q_sched)
        a_arm = jnp.clip(
            (q_ik - arm_target) / (dt_policy * env.cfg.arm_action_scale),
            -1.0, 1.0,
        )
        return jnp.concatenate([a_arm, servo_a])

    def policy(state, t, anchor_xy):
        """Stateful controller: returns (action, new_anchor). `anchor_xy`
        [B, 2] tracks the target object's xy until T_IN, then freezes (the
        close must not chase the object it is about to displace)."""
        tgt_idx = state.task.target_obj
        obj0 = jnp.take_along_axis(
            state.task.initial_obj_pos, tgt_idx[:, None, None], axis=1
        )[:, 0]
        obj_now = jnp.take_along_axis(
            state.physics.objects.pos, tgt_idx[:, None, None], axis=1
        )[:, 0]
        anchor_new = jnp.where(t < T_IN, obj_now[:, :2], anchor_xy)
        act = jax.vmap(lambda q, at, o0, an: policy_single(q, at, o0, an, t))(
            state.physics.robot.q, state.control.arm_target, obj0, anchor_new
        )
        return act, anchor_new

    return policy


def run(num_envs=2, steps=480, verbose=True, record=None, cfg_kwargs=None):
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

    anchor = jnp.asarray(state.task.initial_obj_pos[:, 0, :2])

    @jax.jit
    def step(state, t, anchor):
        a, anchor = policy(state, t, anchor)
        st, res = env.step(state, a)
        return st, res, anchor

    frames = []
    trace = []
    for t in range(steps):
        state, res, anchor = step(state, jnp.asarray(t), anchor)
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
    p.add_argument("--steps", type=int, default=480)
    p.add_argument("--record", default=None)
    args = p.parse_args()
    run(args.envs, args.steps, record=args.record)
