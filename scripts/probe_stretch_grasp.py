"""Scripted Stretch pinch-lift probe (StretchLift diagnosis, round 5).

Drives the 5-dim grouped relative action through align -> descend -> close
-> lift phases with a per-group P-controller on the joint TARGETS (the
same path a policy uses), then reports whether the cube left the table and
whether the task's success latch fired. This is the Stretch analog of
examples/scripted_grasp.py: it separates "the physics/geometry permits a
pinch-lift" from "RL failed to find it" (reference capability:
tasks/hand_arm/env/stretch_multi_object.py drives the same grouped
targets, base/stretch.py:216-229).

Run on CPU (no chip needed): JAX_PLATFORMS=cpu python scripts/probe_stretch_grasp.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from handarm_tpu.envs.registry import make_env

    env, _ = make_env("StretchLift", ["num_envs=2"])
    st, obs = env.reset(jax.random.PRNGKey(0))
    step = jax.jit(env.step)

    obj0 = np.asarray(st.physics.objects.pos[:, 0])
    print("object start", obj0[0])

    dt, s = env.cfg.dt, 0.25

    def act_toward(st, desired, fingers):
        """P-action steering joint targets toward `desired` (mast, lift,
        arm_total) and the finger pair toward `fingers`."""
        t = np.asarray(st.control.joint_target)
        a = np.zeros((t.shape[0], 5), np.float32)
        a[:, 0] = np.clip((desired[0] - t[:, 0]) / (dt * s), -1, 1)  # mast
        a[:, 1] = np.clip((desired[1] - t[:, 1]) / (dt * s), -1, 1)  # lift
        a[:, 2] = np.clip((desired[2] / 4 - t[:, 2]) / (dt * s), -1, 1)
        a[:, 3] = np.clip((0.0 - t[:, 6]) / (dt * 8 * s), -1, 1)  # yaw 0
        a[:, 4] = np.clip((fingers - t[:, 7]) / (dt * 6 * s), -1, 1)
        return jnp.asarray(a)

    def run_phase(st, n, desired, fingers, name):
        for _ in range(n):
            st, res = step(st, act_toward(st, desired, fingers))
        op = np.asarray(st.physics.objects.pos[0, 0])
        gc = np.asarray(res.obs_dict.get("_", 0)) if False else None
        q = np.asarray(st.physics.robot.q[0])
        print(f"[{name}] obj={np.round(op,3)} q(mast,lift,arm4,yaw,f)="
              f"{np.round(q[[0,1,2,6,7]],3)} reward={float(res.reward[0]):.3f}")
        return st, res

    # geometry: grasp-center x = 0.221 - (mast - 0), y = 0.525 + arm_total,
    # z = 0.526 + lift (measured via FK probe, round-5 session)
    ox, oy, oz = obj0[0]
    mast_d = 0.221 - ox  # move grasp x onto the cube
    arm_d = oy - 0.525
    zpinch = max(oz + 0.015 - 0.526, 0.0)  # slightly above the equator
    # finger value for a given tip gap: gap ~ 0.021 + 0.33*finger
    f_open, f_hold = 0.45, float(os.environ.get("PROBE_FHOLD", 0.10))
    # 1. align above the cube, fingers open, pinch plane 10 cm above cube
    st, _ = run_phase(st, 60, (mast_d, zpinch + 0.10, arm_d), f_open, "align")
    # 2. descend: pinch plane just above cube center
    st, _ = run_phase(st, 60, (mast_d, zpinch, arm_d), f_open, "descend")
    # 3. close to a light squeeze (NOT zero: position-control over-squeeze
    #    ejects the cube and shoves the lift joint upward)
    st, _ = run_phase(st, 50, (mast_d, zpinch, arm_d), f_hold, "close")
    # 4. lift 35 cm (success needs z > table + 0.3)
    st, res = run_phase(st, 120, (mast_d, zpinch + 0.35, arm_d), f_hold, "lift")

    obj1 = np.asarray(st.physics.objects.pos[0, 0])
    dz = obj1[2] - obj0[0][2]
    print(f"delta_z={dz:.3f} (success needs object z>{env.cfg.table_height + env.cfg.lift_goal_height_above_table})")
    print("PINCH-LIFT", "ACHIEVED" if obj1[2] > env.cfg.table_height + env.cfg.lift_goal_height_above_table else "FAILED")


if __name__ == "__main__":
    main()
