"""FK-carry cadence (HandArmConfig.carry_fk): exact FK once per control
step, first-order propagated kinematics for the remaining sim steps
(engine.step carry_fk). These tests pin that the approximation does not
change contact-rich outcomes: a scripted sweep that knocks an object must
produce near-identical trajectories with the flag on and off.

Reference cost anchor: PhysX runs its articulation FK on every sim step
(vec_task.py:409-412 gym.simulate); the carry path trades 3 of 4 exact FK
chains per control step for O((qd*dt)^2) pose error re-anchored at 20 Hz.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from handarm_tpu.envs.hand_arm import HandArmConfig, HandArmEnv


def _rollout(carry_fk: bool, steps: int = 40):
    env = HandArmEnv(HandArmConfig(num_envs=4, carry_fk=carry_fk))
    state, obs = env.reset(jax.random.PRNGKey(0))
    step = jax.jit(env.step)
    # deterministic sweep: drive the arm toward/through the object region
    # so robot-object contacts (the only FK consumer) actually occur
    a_seq = []
    k = jax.random.PRNGKey(3)
    for t in range(steps):
        k, sk = jax.random.split(k)
        a = 0.8 * jnp.tanh(
            jax.random.normal(sk, (4, env.num_actions))
            + jnp.sin(jnp.float32(t) / 5.0)
        )
        a_seq.append(a)
    qs, objs = [], []
    for a in a_seq:
        state, res = step(state, a)
        qs.append(np.asarray(state.physics.robot.q))
        objs.append(np.asarray(state.physics.objects.pos))
    return np.stack(qs), np.stack(objs)


def test_carry_fk_trajectory_parity():
    q0, o0 = _rollout(False)
    q1, o1 = _rollout(True)
    # contacts perturb the trajectory slightly (propagated poses differ by
    # O((qd*dt)^2)); the bound is far below task-relevant scales
    assert np.isfinite(q1).all() and np.isfinite(o1).all()
    assert np.abs(q1 - q0).max() < 0.08, np.abs(q1 - q0).max()
    assert np.abs(o1 - o0).max() < 0.05, np.abs(o1 - o0).max()


def test_carry_fk_returns_propagated_fk():
    from handarm_tpu.physics import engine as eng
    from handarm_tpu.physics.kinematics import forward_kinematics

    env = HandArmEnv(HandArmConfig(num_envs=2, carry_fk=True))
    state, _ = env.reset(jax.random.PRNGKey(0))
    heavy = eng.compute_heavy(env.scene, state.physics)
    out_state, info, fk_next = eng.step(
        env.scene, state.physics, heavy=heavy,
        fk0=heavy.fk0, contacts0=heavy.contacts0, carry_fk=True,
    )
    B = 2
    exact = forward_kinematics(
        env.scene.model, out_state.robot.q,
        jnp.broadcast_to(env.scene.base_quat, (B, 4)),
        jnp.broadcast_to(env.scene.base_pos, (B, 3)),
    )
    err = jnp.abs(fk_next.body_pos - exact.body_pos).max()
    # first-order propagation over one dt at bringup speeds
    assert float(err) < 5e-3, float(err)
