"""Adversarial Motion Priors: discriminator, style reward, demo/replay
buffers, and an AMP-augmented PPO iteration.

TPU-native re-implementation of the reference's AMP stack (isaacgymenvs/
learning/amp_continuous.py: discriminator loss/acc at :393-447, demo buffer
+ replay at :449-523, style-reward combination at :488-512; discriminator
head from amp_network_builder.py:40-120; AMPDataset). The machinery is
env-agnostic: the env (or caller) supplies an `amp_obs_fn(env_state) ->
[B, amp_dim]` feature map and a demo motion source; the humanoid
motion-imitation tasks arrive with floating-base dynamics in a later round.

Everything — rollout with style rewards, discriminator SGD on
demo/replay/policy batches, GAE + PPO updates — is one jitted function.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import optax

from handarm_tpu.learn import replay_buffer as rb
from handarm_tpu.learn.ppo import PPO, PPOConfig, TrainState


class Discriminator(nn.Module):
    """MLP discriminator: >0 logits = 'looks like demo motion'."""

    hidden: Sequence[int] = (1024, 512)

    @nn.compact
    def __call__(self, amp_obs):
        x = amp_obs
        for i, h in enumerate(self.hidden):
            x = nn.Dense(h, name=f"dense_{i}")(x)
            x = nn.relu(x)
        return nn.Dense(1, name="logit")(x)[..., 0]


class AMPConfig(NamedTuple):
    amp_dim: int = 0
    disc_hidden: tuple = (1024, 512)
    disc_lr: float = 1e-4
    disc_updates: int = 2  # discriminator SGD steps per iteration
    disc_minibatch: int = 4096
    disc_grad_penalty: float = 5.0
    disc_logit_reg: float = 0.05
    task_reward_w: float = 0.5
    style_reward_w: float = 0.5
    replay_capacity: int = 65536
    demo_capacity: int = 65536


class AMPState(NamedTuple):
    ppo: TrainState
    disc_params: Any
    disc_opt: Any
    replay: rb.ReplayBuffer  # recent policy amp obs
    demo: rb.ReplayBuffer  # reference motion amp obs


class AMP:
    """AMP-augmented PPO. `amp_obs_fn(env_state) -> [B, amp_dim]`."""

    def __init__(
        self,
        env,
        amp_obs_fn: Callable,
        demo_data,  # [N, amp_dim] reference motion features
        ppo_cfg: PPOConfig = PPOConfig(),
        cfg: AMPConfig = AMPConfig(),
    ):
        self.env = env
        self.amp_obs_fn = amp_obs_fn
        self.cfg = cfg._replace(amp_dim=int(demo_data.shape[-1]))
        self.ppo = PPO(env, ppo_cfg)
        self.disc = Discriminator(hidden=cfg.disc_hidden)
        self.disc_optimizer = optax.adam(cfg.disc_lr)
        self._demo_init = jnp.asarray(demo_data)

    def init(self, key) -> AMPState:
        k1, k2 = jax.random.split(key)
        ppo_ts = self.ppo.init(k1)
        disc_params = self.disc.init(k2, self._demo_init[:1])
        example = {"amp_obs": jnp.zeros((1, self.cfg.amp_dim))}
        replay = rb.create(example, self.cfg.replay_capacity)
        demo = rb.create(example, self.cfg.demo_capacity)
        demo = rb.add(demo, {"amp_obs": self._demo_init})
        return AMPState(
            ppo=ppo_ts,
            disc_params=disc_params,
            disc_opt=self.disc_optimizer.init(disc_params),
            replay=replay,
            demo=demo,
        )

    def style_reward(self, disc_params, amp_obs):
        """r_style = -log(1 - sigmoid(D)) clipped (amp_continuous.py:
        :488-512 uses -log(max(1 - D_prob, eps)))."""
        logits = self.disc.apply(disc_params, amp_obs)
        prob = jax.nn.sigmoid(logits)
        return -jnp.log(jnp.clip(1.0 - prob, 1e-4, 1.0))

    def train_iter(self, st: AMPState):
        cfg = self.cfg
        ppo = self.ppo
        pcfg = ppo.cfg
        ts = st.ppo
        key, k_roll, k_demo, k_replay, k_perm = jax.random.split(ts.key, 5)

        # --- rollout with combined task + style reward -----------------------
        def rollout_step(carry, k):
            env_state, obs = carry
            mu, log_std, value = ppo._policy_value(ts, ts.params, obs, jnp.zeros((obs.shape[0], 0)))
            a = mu + jnp.exp(log_std) * jax.random.normal(k, mu.shape)
            env_state2, res = self.env.step(env_state, a)
            amp_obs = self.amp_obs_fn(env_state2)
            style = self.style_reward(st.disc_params, amp_obs)
            reward = (
                cfg.task_reward_w * res.reward + cfg.style_reward_w * style
            ) * pcfg.reward_scale
            from handarm_tpu.learn.running_stats import denormalize
            from handarm_tpu.learn.ppo import Transition, _gaussian_logp

            value = (
                denormalize(ts.value_stats, value)
                if pcfg.normalize_value else value
            )
            if pcfg.value_bootstrap:
                reward = reward + pcfg.gamma * value * res.done
            t = Transition(
                obs=obs, action=a, logp=_gaussian_logp(mu, log_std, a),
                value=value, reward=reward, done=res.done, mu=mu,
                sigma=jnp.exp(log_std),
                teacher_obs=jnp.zeros((obs.shape[0], 0)),
            )
            return (env_state2, res.obs), (t, amp_obs)

        keys = jax.random.split(k_roll, pcfg.horizon)
        (env_state, last_obs), (traj, amp_traj) = jax.lax.scan(
            rollout_step, (ts.env_state, ts.last_obs), keys
        )

        # --- discriminator update -------------------------------------------
        amp_flat = amp_traj.reshape(-1, cfg.amp_dim)
        replay = rb.add(st.replay, {"amp_obs": amp_flat})
        n = min(cfg.disc_minibatch, amp_flat.shape[0])

        def disc_loss(params, demo_b, policy_b):
            d_demo = self.disc.apply(params, demo_b)
            d_policy = self.disc.apply(params, policy_b)
            # least-squares AMP loss (Peng et al.; reference uses BCE — both
            # supported in the literature, LS is better conditioned)
            loss = jnp.mean((d_demo - 1.0) ** 2) + jnp.mean((d_policy + 1.0) ** 2)
            # gradient penalty on demo samples
            grad = jax.grad(
                lambda x: jnp.sum(self.disc.apply(params, x))
            )(demo_b)
            gp = jnp.mean(jnp.sum(grad**2, axis=-1))
            reg = sum(
                jnp.sum(p**2)
                for p in jax.tree.leaves(params)
            )
            total = loss + cfg.disc_grad_penalty * gp + cfg.disc_logit_reg * 1e-4 * reg
            acc_demo = jnp.mean(d_demo > 0)
            acc_policy = jnp.mean(d_policy < 0)
            return total, dict(
                disc_loss=loss, grad_penalty=gp,
                disc_acc_demo=acc_demo, disc_acc_policy=acc_policy,
            )

        def disc_step(carry, k):
            params, opt = carry
            kd, kr, kf = jax.random.split(k, 3)
            demo_b = rb.sample(st.demo, kd, n)["amp_obs"]
            # half fresh policy samples, half replay (amp_continuous.py:449-523)
            replay_b = rb.sample(replay, kr, n // 2)["amp_obs"]
            fresh_idx = jax.random.randint(
                kf, (n - n // 2,), 0, amp_flat.shape[0]
            )
            policy_b = jnp.concatenate([amp_flat[fresh_idx], replay_b], axis=0)
            grads, metrics = jax.grad(disc_loss, has_aux=True)(
                params, demo_b, policy_b
            )
            updates, opt = self.disc_optimizer.update(grads, opt, params)
            return (optax.apply_updates(params, updates), opt), metrics

        (disc_params, disc_opt), disc_metrics_all = jax.lax.scan(
            disc_step, (st.disc_params, st.disc_opt),
            jax.random.split(k_demo, cfg.disc_updates),
        )
        disc_metrics = jax.tree.map(lambda x: x[-1], disc_metrics_all)

        # --- PPO update on the combined-reward trajectory -------------------
        ts2, ppo_stats = ppo._update_from_traj(
            ts, traj, env_state, last_obs,
            jnp.zeros((last_obs.shape[0], 0)), key,
        )
        stats = dict(ppo_stats)
        stats.update({k: v for k, v in disc_metrics.items()})
        stats["style_reward_mean"] = jnp.mean(
            self.style_reward(disc_params, amp_flat[: 2048])
        )
        return AMPState(
            ppo=ts2, disc_params=disc_params, disc_opt=disc_opt,
            replay=replay, demo=st.demo,
        ), stats
