"""Learner stack: PPO (symmetric + asymmetric critic), DAgger distillation,
PBT exchange, checkpoint round-trip."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from handarm_tpu.envs.hand_arm import HandArmConfig, HandArmEnv
from handarm_tpu.learn.ppo import PPO, PPOConfig


@pytest.fixture(scope="module")
def tiny_env():
    cfg = HandArmConfig(
        num_envs=8, episode_length=6,
        observations=("ur5_joint_pos", "target_object_pos", "dof_position_targets"),
        teacher_observations=(
            "ur5_joint_pos", "target_object_pos", "object_linvel",
            "dof_position_targets",
        ),
        actions=("ur5_relative_joint_pos",),
        solver_iterations=4,
    )
    return HandArmEnv(cfg)


def small_ppo_cfg(**kw):
    return PPOConfig(
        horizon=4, minibatch_size=16, mini_epochs=2, hidden=(32, 32), **kw
    )


def test_ppo_train_iter_runs_and_updates(tiny_env):
    ppo = PPO(tiny_env, small_ppo_cfg())
    ts = ppo.init(jax.random.PRNGKey(0))
    train = jax.jit(ppo.train_iter)
    ts2, stats = train(ts)
    assert np.isfinite(float(stats["kl"]))
    assert np.isfinite(float(stats["reward_mean"]))
    # params actually changed
    leaves0 = jax.tree.leaves(ts.params)
    leaves1 = jax.tree.leaves(ts2.params)
    assert any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(leaves0, leaves1)
    )
    # runs again (state threading is consistent)
    ts3, _ = train(ts2)
    assert int(ts3.epoch) == 2


def test_ppo_asymmetric_critic(tiny_env):
    ppo = PPO(tiny_env, small_ppo_cfg(asymmetric_critic=True))
    ts = ppo.init(jax.random.PRNGKey(1))
    assert "critic" in ts.params and "actor" in ts.params
    ts2, stats = jax.jit(ppo.train_iter)(ts)
    assert np.isfinite(float(stats["value_loss"]))
    c0 = jax.tree.leaves(ts.params["critic"])
    c1 = jax.tree.leaves(ts2.params["critic"])
    assert any(
        not np.allclose(np.asarray(a), np.asarray(b)) for a, b in zip(c0, c1)
    )


def test_dagger_distillation(tiny_env):
    from handarm_tpu.learn.distill import DAgger, DistillConfig
    import dataclasses

    # the teacher policy is trained on the privileged observation set
    # (reference: teacher PPO runs with observations=teacher list, then CPD
    # distills into the student set)
    teacher_env = HandArmEnv(
        dataclasses.replace(
            tiny_env.cfg, observations=tiny_env.cfg.teacher_observations
        )
    )
    ppo = PPO(teacher_env, small_ppo_cfg())
    teacher_ts = ppo.init(jax.random.PRNGKey(2))
    dagger = DAgger(
        tiny_env, ppo, teacher_ts,
        DistillConfig(horizon=4, minibatch_size=16, mini_epochs=1,
                      beta_decay_iters=10),
        aux_from_obs={"target_object_pos": (6, 9)},
    )
    ds = dagger.init(jax.random.PRNGKey(3))
    train = jax.jit(dagger.train_iter)
    losses = []
    for _ in range(5):
        ds, stats = train(ds)
        losses.append(float(stats["bc_loss"]))
    assert np.isfinite(losses).all()
    # behavior cloning of a fixed teacher should reduce loss
    assert losses[-1] < losses[0]
    # student inference works
    obs, _, obs_dict = jax.jit(tiny_env.observe)(ds.env_state)
    a = dagger.act(ds, obs, obs_dict)
    assert a.shape == (8, tiny_env.num_actions)


def test_checkpoint_roundtrip(tiny_env, tmp_path):
    from handarm_tpu.utils.checkpoint import (
        latest_checkpoint,
        load_checkpoint,
        save_checkpoint,
    )

    ppo = PPO(tiny_env, small_ppo_cfg())
    ts = ppo.init(jax.random.PRNGKey(4))
    path = save_checkpoint(str(tmp_path), ts, step=7)
    assert latest_checkpoint(str(tmp_path)) == path
    ts2 = load_checkpoint(path, example_tree=ts)
    for a, b in zip(jax.tree.leaves(ts), jax.tree.leaves(ts2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_pbt_exchange(tiny_env, tmp_path):
    from handarm_tpu.parallel.pbt import PbtConfig, pbt_step

    ppo = PPO(tiny_env, small_ppo_cfg())
    rng = np.random.default_rng(0)
    states = [ppo.init(jax.random.PRNGKey(10 + i)) for i in range(4)]
    hp = {"learning_rate": 3e-4, "e_clip": 0.15}
    objectives = [0.1, 0.9, 0.88, 0.87]  # policy 0 is far behind
    cfgs = [
        PbtConfig(workspace=str(tmp_path), policy_idx=i, num_policies=4,
                  frames_slack=0.5)
        for i in range(4)
    ]
    # everyone checkpoints once
    for i in (1, 2, 3):
        _, _, restarted = pbt_step(
            cfgs[i], states[i], hp, frames=1000, objective=objectives[i], rng=rng
        )
        assert not restarted  # healthy policies keep their weights
    new_state, new_hp, restarted = pbt_step(
        cfgs[0], states[0], hp, frames=1000, objective=objectives[0], rng=rng
    )
    assert restarted  # bottom policy adopts a top peer
    # weights now equal one of the best peers' weights
    best_leaves = [jax.tree.leaves(states[i].params) for i in (1, 2)]
    new_leaves = jax.tree.leaves(new_state.params)
    match = any(
        all(np.allclose(np.asarray(a), np.asarray(b)) for a, b in zip(bl, new_leaves))
        for bl in best_leaves
    )
    assert match


def test_hrl_wrapper_trains_high_level(tiny_env):
    """High-level PPO over a frozen low-level policy (reference HRLAgent):
    the hierarchy is one jitted program; the latent overwrites the goal
    block of the low-level policy's observation."""
    from handarm_tpu.learn.hrl import HRLEnv, make_low_level_from_ppo

    low_ppo = PPO(tiny_env, small_ppo_cfg())
    low_ts = low_ppo.init(jax.random.PRNGKey(7))
    # tiny_env obs: ur5_joint_pos(6), target_object_pos(3), dof_targets(17)
    low_level = make_low_level_from_ppo(low_ppo, low_ts, latent_slice=(6, 9))
    henv = HRLEnv(tiny_env, low_level, latent_dim=3, latent_steps=2)
    hppo = PPO(henv, small_ppo_cfg())
    ts = hppo.init(jax.random.PRNGKey(8))
    ts2, stats = jax.jit(hppo.train_iter)(ts)
    assert np.isfinite(float(stats["reward_mean"]))
    # high-level params updated; low-level frozen by construction
    a0 = jax.tree.leaves(ts.params)
    a1 = jax.tree.leaves(ts2.params)
    assert any(
        not np.allclose(np.asarray(x), np.asarray(y)) for x, y in zip(a0, a1)
    )


def test_pbt_launcher_and_best_archive(tmp_path):
    """Process launcher + grid (reference pbt/launcher/run_processes.py)
    and the best-policy archive (pbt.py:564-610)."""
    import sys
    from handarm_tpu.parallel.launch_pbt import experiment_grid, run_processes
    from handarm_tpu.parallel.pbt import PbtConfig, maybe_save_best_policy

    cmds = experiment_grid([sys.executable, "-c", "pass"], {"seed": [1, 2], "lr": [0.1]})
    assert len(cmds) == 2 and cmds[0][-2:] == ["seed=1", "lr=0.1"]
    codes = run_processes(cmds, max_parallel=2, poll_s=0.05)
    assert codes == [0, 0]

    import jax.numpy as jnp

    cfg = PbtConfig(workspace=str(tmp_path), policy_idx=1)
    ts = {"w": jnp.arange(4.0)}
    assert maybe_save_best_policy(cfg, ts, objective=0.5, frames=100)
    assert not maybe_save_best_policy(cfg, ts, objective=0.4, frames=200)
    assert maybe_save_best_policy(cfg, ts, objective=0.9, frames=300)
    best_dir = tmp_path / "best"
    metas = [f for f in best_dir.iterdir() if f.suffix == ".json"]
    assert len(metas) == 2  # 0.5 and 0.9 archived, 0.4 rejected


def test_pbt_slurm_ngc_backends(tmp_path):
    """Launcher backends (reference pbt/launcher/run_slurm.py, run_ngc.py):
    sbatch scripts + command lines are emitted print-only by default; the
    NGC template substitution matches the reference's placeholder scheme."""
    from handarm_tpu.parallel.launch_pbt import (
        emit_ngc,
        emit_slurm,
        experiment_grid,
    )

    cmds = experiment_grid(
        ["python", "train.py", "task=Ur5SihLift"], {"seed": [1, 2]}
    )
    assert len(cmds) == 2 and cmds[0][-1] == "seed=1"

    jobs = emit_slurm(cmds, str(tmp_path / "slurm"), partition="tpu",
                      timeout="12:00:00")
    assert len(jobs) == 2
    for script, cmdline in jobs:
        body = open(script).read()
        assert body.startswith("#!/bin/bash")
        assert "train.py task=Ur5SihLift" in body
        assert "-p tpu" in cmdline and "--time 12:00:00" in cmdline
        assert cmdline.startswith("sbatch")

    tmpl = "ngc batch run --name {{ name }} \\\n  --command '{{ experiment_cmd }}'"
    lines = emit_ngc(cmds, tmpl, names=["a", "b"])
    assert "--name a" in lines[0] and "seed=2" in lines[1]
    assert "\\" not in lines[0]  # whitespace-normalized like the reference


def test_pbt_restart_argv_rebuild():
    """Full-process restart argv (reference pbt.py:123-177): stale mutable
    overrides and resume= are replaced, everything else is preserved."""
    import train as train_mod

    argv = [
        "task=Ur5SihLift", "experiment=p0", "ppo.learning_rate=3e-4",
        "pbt.policy_idx=0", "pbt.num_policies=4", "resume=auto", "seed=5",
    ]
    new = train_mod.pbt_restart_argv(
        argv, {"learning_rate": 0.001, "e_clip": 0.2}
    )
    assert "ppo.learning_rate=0.001" in new and "ppo.e_clip=0.2" in new
    assert "ppo.learning_rate=3e-4" not in new
    assert new.count("resume=auto") == 1
    assert "pbt.policy_idx=0" in new and "seed=5" in new  # preserved
