"""Actor/learner split (parallel/actor_learner.py): pipelined rollout on
actor devices + PPO update on the learner device (SURVEY §2.10 optional
topology / BASELINE config 5). Runs on the virtual 8-device CPU mesh."""

import numpy as np

import jax
import jax.numpy as jnp

from handarm_tpu.envs.classic import make_cartpole
from handarm_tpu.learn.ppo import PPO, PPOConfig
from handarm_tpu.parallel.actor_learner import ActorLearner


def test_actor_learner_pipeline_trains_cartpole():
    devs = jax.devices()
    assert len(devs) >= 3, "conftest must provide the 8-device CPU mesh"
    n_actors = 2
    envs_per_actor = 32
    total = n_actors * envs_per_actor

    ppo = PPO(
        make_cartpole(num_envs=total, episode_length=100),
        PPOConfig(horizon=16, minibatch_size=256, mini_epochs=2,
                  hidden=(32, 32)),
    )
    ts = ppo.init(jax.random.PRNGKey(0))

    al = ActorLearner(
        ppo,
        make_env=lambda n: make_cartpole(num_envs=n, episode_length=100),
        envs_per_actor=envs_per_actor,
        actor_devices=devs[:n_actors],
        learner_device=devs[2],
    )
    ts, stats = al.run(ts, iterations=25, seed=3)

    assert len(stats) == 25
    rewards = [float(s["reward_mean"]) for s in stats]
    assert all(np.isfinite(r) for r in rewards)
    # staleness bounded: per actor there can be queue_depth*n_actors queued
    # trajectory sets plus one in flight, plus the one the learner holds
    assert max(s["staleness"] for s in stats) <= al.queue_depth * 2 + 2
    # learner consumed trajectories from every actor each iteration:
    # cartpole balance reward should move up under real updates
    assert np.mean(rewards[-5:]) > np.mean(rewards[:3]), rewards
    # the updated state is a full TrainState usable by colocated PPO
    assert int(ts.epoch) == 25
