"""Actor/learner split over a device mesh (sebulba-style pipeline).

The colocated PPO (`learn/ppo.py`) steps envs and runs SGD in one jitted
program per device — the right default on TPU ("anakin" topology). This
module is the optional decoupled topology from SURVEY.md §2.10 / BASELINE
config 5 ("full PPO actor-learner loop: sharded envs + sharded learner"):

- **actor devices** each own an env shard and run a jitted
  rollout-only program (policy inference + env.step scanned over the
  horizon) under a possibly stale parameter snapshot;
- the **learner device** concatenates trajectories from all actors and
  runs the exact same GAE + minibatched-epochs update as colocated PPO
  (`PPO._update_from_traj`), then publishes a fresh snapshot.

Host threads pipeline the two: actors keep rolling while the learner
updates, hiding learner latency behind env stepping (the reference gets
the same overlap from rl_games' separate play/train phases only across
GPUs via NCCL; here the seam is explicit device-to-device `device_put`).
Parameter staleness is bounded by the trajectory queue depth (default 1
iteration — standard sebulba).

MLP policies only (recurrent rollouts carry per-env hidden state whose
chunked BPTT layout is tied to the colocated path).
"""

from __future__ import annotations

import queue
import threading
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from handarm_tpu.learn.ppo import Transition, _gaussian_logp
from handarm_tpu.learn.running_stats import denormalize


class ActorSnapshot(NamedTuple):
    """What an actor needs from TrainState. Field names mirror TrainState
    so `PPO._policy_value(snapshot, snapshot.params, ...)` duck-types."""

    params: Any
    obs_stats: Any
    value_stats: Any
    teacher_obs_stats: Any
    version: jnp.ndarray  # learner iteration that produced this snapshot


def snapshot_of(ts, version: int) -> ActorSnapshot:
    return ActorSnapshot(
        params=ts.params,
        obs_stats=ts.obs_stats,
        value_stats=ts.value_stats,
        teacher_obs_stats=ts.teacher_obs_stats,
        version=jnp.asarray(version, jnp.int32),
    )


class ActorLearner:
    """Pipelined actor/learner PPO.

    Args:
      ppo: a `PPO` whose cfg shapes the learner update. `ppo.env` is used
        for obs/action dims only — actors step their own env shards.
      make_env: `make_env(num_envs) -> env` building one actor's env shard
        (same task/config as ppo.env, smaller batch).
      envs_per_actor: env count per actor shard.
      actor_devices / learner_device: `jax.Device`s. Actors and learner
        may share a device (then the pipeline only hides host latency).
      queue_depth: max unconsumed trajectory sets per actor (bounds
        parameter staleness to ~queue_depth learner iterations).
    """

    def __init__(self, ppo, make_env, envs_per_actor: int,
                 actor_devices, learner_device, queue_depth: int = 1):
        if ppo.recurrent:
            raise NotImplementedError(
                "actor/learner split supports MLP policies only"
            )
        self.ppo = ppo
        self.cfg = ppo.cfg
        self.actor_devices = list(actor_devices)
        self.learner_device = learner_device
        self.envs_per_actor = envs_per_actor
        self.queue_depth = queue_depth
        self.envs = [make_env(envs_per_actor) for _ in self.actor_devices]
        self._rollouts = [
            self._make_rollout(env, dev)
            for env, dev in zip(self.envs, self.actor_devices)
        ]
        self._update = jax.jit(self._learner_update)

    # --- actor side --------------------------------------------------------

    def _make_rollout(self, env, device):
        ppo, cfg = self.ppo, self.cfg
        sharding = jax.sharding.SingleDeviceSharding(device)

        def rollout(snap: ActorSnapshot, env_state, obs, teacher_obs, key):
            def step(carry, k):
                env_state, obs, teacher_obs = carry
                mu, log_std, value = ppo._policy_value(
                    snap, snap.params, obs, teacher_obs
                )
                a = mu + jnp.exp(log_std) * jax.random.normal(k, mu.shape)
                logp = _gaussian_logp(mu, log_std, a)
                env_state, res = env.step(env_state, a)
                value = (
                    denormalize(snap.value_stats, value)
                    if cfg.normalize_value
                    else value
                )
                value = jnp.where(jnp.isfinite(value), value, 0.0)
                reward = (
                    jnp.where(jnp.isfinite(res.reward), res.reward, 0.0)
                    * cfg.reward_scale
                )
                if cfg.value_bootstrap:
                    # `where`, not mask-multiply: NaN * 0.0 == NaN (see the
                    # colocated rollout_step)
                    reward = reward + cfg.gamma * jnp.where(
                        res.done & jnp.isfinite(value), value, 0.0
                    )
                t = Transition(
                    obs=obs, action=a, logp=logp, value=value,
                    reward=reward, done=res.done, mu=mu,
                    sigma=jnp.exp(log_std), teacher_obs=teacher_obs,
                )
                next_obs = jnp.where(jnp.isfinite(res.obs), res.obs, 0.0)
                next_teacher = jnp.where(
                    jnp.isfinite(res.teacher_obs), res.teacher_obs, 0.0
                )
                return (env_state, next_obs, next_teacher), (t, res.info)

            key, k_roll = jax.random.split(key)
            keys = jax.random.split(k_roll, cfg.horizon)
            (env_state, obs, teacher_obs), (traj, infos) = jax.lax.scan(
                step, (env_state, obs, teacher_obs), keys
            )
            return env_state, obs, teacher_obs, traj, infos, key

        return jax.jit(rollout, out_shardings=sharding)

    def _actor_thread(self, idx: int, init_key, traj_q: queue.Queue,
                      stop: threading.Event, latest: list):
        env = self.envs[idx]
        device = self.actor_devices[idx]
        key = jax.device_put(init_key, device)
        env_state, obs = jax.jit(
            env.reset,
            out_shardings=jax.sharding.SingleDeviceSharding(device),
        )(key)
        teacher = jnp.zeros(
            (self.envs_per_actor, getattr(env, "num_teacher_obs", 0)),
            obs.dtype,
        )
        teacher = jax.device_put(teacher, device)
        while not stop.is_set():
            snap = jax.device_put(latest[0], device)
            env_state, obs, teacher, traj, infos, key = self._rollouts[idx](
                snap, env_state, obs, teacher, key
            )
            # block in the actor thread, not the learner, when full
            traj_q.put((idx, traj, obs, teacher, infos, snap.version))

    # --- learner side ------------------------------------------------------

    def _learner_update(self, ts, traj, last_obs, last_teacher, infos):
        key, k = jax.random.split(ts.key)
        ts = ts._replace(key=key)
        return self.ppo._update_from_traj(
            ts, traj, ts.env_state, last_obs, last_teacher, k, infos=infos
        )

    def run(self, ts, iterations: int, seed: int = 0):
        """Drive `iterations` learner updates; returns (ts, stats_list).
        Each update consumes one fresh trajectory set from EVERY actor
        (synchronous consumption, asynchronous production)."""
        n = len(self.actor_devices)
        traj_q: queue.Queue = queue.Queue(maxsize=n * self.queue_depth)
        stop = threading.Event()
        latest = [jax.device_put(snapshot_of(ts, 0), self.learner_device)]
        threads = [
            threading.Thread(
                target=self._actor_thread,
                args=(i, jax.random.PRNGKey(seed * 1000 + i), traj_q,
                      stop, latest),
                daemon=True,
            )
            for i in range(n)
        ]
        for t in threads:
            t.start()
        stats_list = []
        try:
            for it in range(iterations):
                parts = [traj_q.get() for _ in range(n)]
                parts.sort(key=lambda p: p[0])
                # the actor->learner seam: move every shard to the learner
                # device first (ICI transfer on real hardware), then concat
                # over the env axis (trajectories are [T, B, ...])
                moved = [
                    jax.device_put(p[1:5], self.learner_device)
                    for p in parts
                ]
                traj = jax.tree.map(
                    lambda *ls: jnp.concatenate(ls, axis=1),
                    *[m[0] for m in moved],
                )
                last_obs = jnp.concatenate([m[1] for m in moved], axis=0)
                last_teacher = jnp.concatenate(
                    [m[2] for m in moved], axis=0
                )
                # per-env info planes concat on the env axis; per-shard
                # scalars (device-side EWMAs are [T]) average across actors
                infos = jax.tree.map(
                    lambda *ls: (
                        jnp.concatenate(ls, axis=1)
                        if ls[0].ndim >= 2
                        else jnp.mean(jnp.stack(ls), axis=0)
                    ),
                    *[m[3] for m in moved],
                )
                ts, stats = self._update(
                    ts, traj, last_obs, last_teacher, infos
                )
                stats["staleness"] = float(
                    it - min(int(p[5]) for p in parts)
                )
                stats_list.append(stats)
                latest[0] = jax.device_put(
                    snapshot_of(ts, it + 1), self.learner_device
                )
        finally:
            stop.set()
            # unblock any actor waiting on a full queue
            while not traj_q.empty():
                try:
                    traj_q.get_nowait()
                except queue.Empty:
                    break
        return ts, stats_list
