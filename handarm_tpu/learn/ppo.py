"""PPO with GAE — the whole training iteration is one jitted function.

TPU-native replacement for the reference's external rl_games A2CAgent +
learning/common_agent.py train loop (SURVEY.md §2.6): rollout is a
`lax.scan(policy ∘ env.step)` over the horizon fused with the physics; the
SGD phase scans over mini-epochs × minibatches in the same XLA program. No
host round-trips inside an iteration. Feature parity targets the hand-arm
PPO config (cfg/train/HandArmTaskMultiObjectManipulationPPO.yaml): adaptive
KL learning rate, clipped value loss, bounds loss, input/value running
normalization, value bootstrap on timeout, reward scaling.
"""

from __future__ import annotations

from functools import partial
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from handarm_tpu.learn.networks import ActorCritic
from handarm_tpu.learn.running_stats import (
    RunningStats,
    denormalize,
    init_stats,
    normalize,
    update_stats,
)


class PPOConfig(NamedTuple):
    horizon: int = 16
    num_minibatches: int = 0  # 0 -> derive from minibatch_size
    minibatch_size: int = 32768
    mini_epochs: int = 4
    gamma: float = 0.99
    tau: float = 0.95  # GAE lambda
    learning_rate: float = 3e-4
    kl_threshold: float = 0.016  # adaptive LR target
    lr_schedule: str = "adaptive"  # adaptive | fixed
    e_clip: float = 0.15
    clip_value: bool = True
    critic_coef: float = 4.0
    entropy_coef: float = 0.0
    bounds_loss_coef: float = 0.0001
    grad_norm: float = 1.0
    reward_scale: float = 0.01
    normalize_input: bool = True
    normalize_value: bool = True
    normalize_advantage: bool = True
    value_bootstrap: bool = True
    max_lr: float = 1e-2
    min_lr: float = 1e-6
    # trust-region rescue: if the iteration's mean policy KL exceeds this,
    # the whole parameter update is discarded (one poisoned minibatch —
    # e.g. a physics blowup leaking extreme observations — must not
    # destroy the policy; recovery from such a spike costs hundreds of
    # iterations otherwise)
    kl_guard: float = 1.0
    hidden: tuple = (768, 512, 256)
    # asymmetric actor-critic: value net sees the privileged teacher
    # observations (reference central-value / asymmetric-obs configs,
    # e.g. ShadowHand asymmetric state + hand_arm teacher_observations)
    asymmetric_critic: bool = False
    # recurrent policy (reference rl_games rnn block: lstm-before-mlp with
    # layer norm, cfg/train/AllegroHandDextremeADRPPO.yaml; hand-arm LSTM
    # variant seq_len 4). 0 = MLP policy. BPTT runs over stored-state
    # seq_len chunks of the rollout (rl_games seq_length semantics).
    rnn_units: int = 0
    seq_len: int = 4
    zero_rnn_on_done: bool = True
    # separate LSTM width for the asymmetric central-value critic
    # (reference central_value_config rnn units: 2048); 0 -> rnn_units
    critic_rnn_units: int = 0
    # data-parallel shard count of the env axis (mesh 'data' size). The SGD
    # phase lays the rollout out as [data_shards, N_loc] and permutes
    # minibatches shard-locally so the update runs sharded (grads
    # all-reduce) instead of all-gathering the batch to every device.
    # 1 (single device) reproduces the global-shuffle semantics.
    data_shards: int = 1


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    obs_stats: RunningStats
    value_stats: RunningStats
    lr: jnp.ndarray
    env_state: Any
    last_obs: jnp.ndarray
    key: jnp.ndarray
    epoch: jnp.ndarray
    teacher_obs_stats: RunningStats | None = None
    last_teacher_obs: jnp.ndarray | None = None
    # LSTM carry per env (None for MLP policies)
    hidden: Any = None


class Transition(NamedTuple):
    obs: jnp.ndarray
    action: jnp.ndarray
    logp: jnp.ndarray
    value: jnp.ndarray
    reward: jnp.ndarray
    done: jnp.ndarray
    mu: jnp.ndarray
    sigma: jnp.ndarray
    teacher_obs: jnp.ndarray | None = None
    # PRE-step LSTM carry (BPTT chunk-start states; None for MLP)
    hidden: Any = None


def _gaussian_logp(mu, log_std, a):
    return jnp.sum(
        -0.5 * ((a - mu) / jnp.exp(log_std)) ** 2
        - log_std
        - 0.5 * jnp.log(2.0 * jnp.pi),
        axis=-1,
    )


class PPO:
    """Builder tying an env (HandArmEnv-like: .step/.reset/.num_obs/
    .num_actions) to a jitted train iteration."""

    def __init__(self, env, cfg: PPOConfig = PPOConfig()):
        self.env = env
        self.cfg = cfg
        if cfg.asymmetric_critic:
            assert getattr(env, "num_teacher_obs", 0) > 0, (
                "asymmetric_critic requires env teacher_observations"
            )
        self.recurrent = cfg.rnn_units > 0
        if self.recurrent:
            from handarm_tpu.learn.networks import (
                RecurrentActorCritic,
                RecurrentValueNet,
            )

            assert cfg.horizon % cfg.seq_len == 0, (
                "seq_len must divide horizon (rl_games seq_length rule)"
            )
            self.net = RecurrentActorCritic(
                num_actions=env.num_actions,
                rnn_units=cfg.rnn_units,
                hidden=cfg.hidden,
            )
            self.value_net = (
                RecurrentValueNet(
                    rnn_units=cfg.critic_rnn_units or cfg.rnn_units,
                    hidden=cfg.hidden,
                )
                if cfg.asymmetric_critic
                else None
            )
        else:
            self.net = ActorCritic(num_actions=env.num_actions, hidden=cfg.hidden)
            from handarm_tpu.learn.networks import ValueNet

            self.value_net = (
                ValueNet(hidden=cfg.hidden) if cfg.asymmetric_critic else None
            )
        batch = env.cfg.num_envs * cfg.horizon
        if cfg.num_minibatches:
            self.num_minibatches = cfg.num_minibatches
        else:
            self.num_minibatches = max(1, batch // cfg.minibatch_size)
        assert batch % self.num_minibatches == 0
        self.mb_size = batch // self.num_minibatches
        if self.recurrent:
            assert self.mb_size % cfg.seq_len == 0
        self.optimizer = optax.apply_if_finite(
            optax.chain(
                optax.clip_by_global_norm(cfg.grad_norm),
                optax.scale_by_adam(eps=1e-8),
                optax.scale_by_learning_rate(1.0, flip_sign=True),
            ),
            # a non-finite minibatch gradient (tail physics event slipping
            # past the env guards) skips that update instead of poisoning
            # Adam moments + params for the rest of the run
            max_consecutive_errors=10_000,
        )

    # --- init ---------------------------------------------------------------

    def init_carry(self, batch: int):
        """Zeroed LSTM carry pytree for `batch` envs (None for MLP)."""
        if not self.recurrent:
            return None
        if self.cfg.asymmetric_critic:
            return {
                "actor": self.net.init_carry(batch),
                "critic": self.value_net.init_carry(batch),
            }
        return self.net.init_carry(batch)

    def init(self, key) -> TrainState:
        k_env, k_net, k_vnet, k_next = jax.random.split(key, 4)
        # jit the init-time reset: eagerly dispatching the multiobj reset's
        # op stream (FK, per-object obs) at fleet batch sizes crashes the
        # remote TPU worker; one compiled program is also much faster
        # genesis pool (host-driven bounded dispatches) must exist BEFORE
        # reset is traced — it cannot run inside a jit trace
        ensure = getattr(self.env, "ensure_initial_pool", None)
        if ensure is not None:
            ensure()
        env_state, obs = jax.jit(self.env.reset)(k_env)
        hidden = self.init_carry(obs.shape[0])
        if self.recurrent:
            carry1 = self.net.init_carry(1)
            params = self.net.init(k_net, obs[:1], carry1)
        else:
            params = self.net.init(k_net, obs[:1])
        teacher_stats = last_teacher = None
        if self.cfg.asymmetric_critic:
            _, teacher0, _ = self.env.observe(env_state)
            if self.recurrent:
                critic_params = self.value_net.init(
                    k_vnet, teacher0[:1], self.value_net.init_carry(1)
                )
            else:
                critic_params = self.value_net.init(k_vnet, teacher0[:1])
            params = {"actor": params, "critic": critic_params}
            teacher_stats = init_stats((self.env.num_teacher_obs,))
            last_teacher = teacher0
        opt_state = self.optimizer.init(params)
        return TrainState(
            params=params,
            opt_state=opt_state,
            obs_stats=init_stats((self.env.num_obs,)),
            value_stats=init_stats(()),
            lr=jnp.asarray(self.cfg.learning_rate),
            env_state=env_state,
            last_obs=obs,
            key=k_next,
            epoch=jnp.zeros((), jnp.int32),
            teacher_obs_stats=teacher_stats,
            last_teacher_obs=last_teacher,
            hidden=hidden,
        )

    # --- net helpers --------------------------------------------------------

    def _actor_params(self, params):
        return params["actor"] if self.cfg.asymmetric_critic else params

    def _policy_value(self, ts, params, obs, teacher_obs):
        """(mu, log_std, value) with the critic fed privileged obs when
        asymmetric."""
        nobs = normalize(ts.obs_stats, obs) if self.cfg.normalize_input else obs
        mu, log_std, value = self.net.apply(self._actor_params(params), nobs)
        if self.cfg.asymmetric_critic:
            t_nobs = (
                normalize(ts.teacher_obs_stats, teacher_obs)
                if self.cfg.normalize_input
                else teacher_obs
            )
            value = self.value_net.apply(params["critic"], t_nobs)
        return mu, log_std, value

    def _policy_value_rnn(self, ts, params, obs, teacher_obs, carry):
        """(mu, log_std, value, new_carry) for the recurrent policy."""
        nobs = normalize(ts.obs_stats, obs) if self.cfg.normalize_input else obs
        if self.cfg.asymmetric_critic:
            mu, log_std, _, a_carry = self.net.apply(
                params["actor"], nobs, carry["actor"]
            )
            t_nobs = (
                normalize(ts.teacher_obs_stats, teacher_obs)
                if self.cfg.normalize_input
                else teacher_obs
            )
            value, c_carry = self.value_net.apply(
                params["critic"], t_nobs, carry["critic"]
            )
            return mu, log_std, value, {"actor": a_carry, "critic": c_carry}
        mu, log_std, value, new_carry = self.net.apply(params, nobs, carry)
        return mu, log_std, value, new_carry

    # --- one train iteration (jit this) -------------------------------------

    def train_iter(self, ts: TrainState):
        if self.recurrent:
            return self._train_iter_rnn(ts)
        cfg = self.cfg
        key, k_roll, k_perm = jax.random.split(ts.key, 3)

        # 1. rollout
        B = ts.last_obs.shape[0]
        teacher0 = (
            ts.last_teacher_obs
            if ts.last_teacher_obs is not None
            else jnp.zeros(
                (B, getattr(self.env, "num_teacher_obs", 0)), ts.last_obs.dtype
            )
        )

        def rollout_step(carry, k):
            env_state, obs, teacher_obs = carry
            mu, log_std, value = self._policy_value(ts, ts.params, obs, teacher_obs)
            a = mu + jnp.exp(log_std) * jax.random.normal(k, mu.shape)
            logp = _gaussian_logp(mu, log_std, a)
            env_state, res = self.env.step(env_state, a)
            value = (
                denormalize(ts.value_stats, value)
                if cfg.normalize_value
                else value
            )
            value = jnp.where(jnp.isfinite(value), value, 0.0)
            # learner-boundary finite guard: envs without their own guard
            # (or a guard with a hole) must not poison the batch. Note
            # NaN * 0.0 == NaN in IEEE — the bootstrap below must use
            # `where`, not multiplication by the done mask, or a single
            # non-finite critic value leaks into EVERY transition's reward
            # and GAE back-propagates it across the whole horizon.
            reward = (
                jnp.where(jnp.isfinite(res.reward), res.reward, 0.0)
                * cfg.reward_scale
            )
            # value bootstrap on episode-length timeout (all our dones are
            # timeouts — reference sets value_bootstrap: True)
            if cfg.value_bootstrap:
                boot = jnp.where(
                    res.done & jnp.isfinite(value), value, 0.0
                )
                reward = reward + cfg.gamma * boot
            t = Transition(
                obs=obs, action=a, logp=logp, value=value,
                reward=reward, done=res.done, mu=mu, sigma=jnp.exp(log_std),
                teacher_obs=teacher_obs,
            )
            next_obs = jnp.where(jnp.isfinite(res.obs), res.obs, 0.0)
            next_teacher = jnp.where(
                jnp.isfinite(res.teacher_obs), res.teacher_obs, 0.0
            )
            return (env_state, next_obs, next_teacher), (t, res.info)

        keys = jax.random.split(k_roll, cfg.horizon)
        (env_state, last_obs, last_teacher), (traj, infos) = jax.lax.scan(
            rollout_step, (ts.env_state, ts.last_obs, teacher0), keys
        )
        return self._update_from_traj(
            ts, traj, env_state, last_obs, last_teacher, key, infos=infos
        )

    def _update_from_traj(
        self, ts: TrainState, traj: Transition, env_state, last_obs,
        last_teacher, key, infos=None,
    ):
        """GAE + normalization-stat updates + minibatched PPO epochs on an
        already-collected trajectory (shared by PPO and the AMP learner)."""
        cfg = self.cfg
        k_perm = jax.random.fold_in(key, 1)

        # bootstrap value for the state after the last step
        _, _, last_value = self._policy_value(ts, ts.params, last_obs, last_teacher)
        last_value = (
            denormalize(ts.value_stats, last_value)
            if cfg.normalize_value
            else last_value
        )
        last_value = jnp.where(jnp.isfinite(last_value), last_value, 0.0)

        # 2. GAE
        def gae_step(carry, t):
            adv_next, v_next = carry
            nonterminal = 1.0 - t.done.astype(jnp.float32)
            delta = t.reward + cfg.gamma * v_next * nonterminal - t.value
            adv = delta + cfg.gamma * cfg.tau * nonterminal * adv_next
            return (adv, t.value), adv

        _, advantages = jax.lax.scan(
            gae_step,
            (jnp.zeros_like(last_value), last_value),
            traj,
            reverse=True,
        )
        returns = advantages + traj.value

        # flatten ENV-MAJOR into [D, N_loc] where D = data-mesh shards and
        # the leading axis carries the env sharding. The old T-major
        # [T, B] -> [T*B] reshape merged an unsharded major axis with the
        # sharded env axis — unrepresentable in GSPMD, so EVERY batch leaf
        # was all-gathered to every device and the whole SGD phase ran
        # replicated (measured: all-gather bytes doubling per mesh
        # doubling, zero gradient all-reduce — scripts/collective_bytes.py).
        # Env-major keeps each device's rollout block local; minibatches
        # permute WITHIN blocks (jax.random per-shard perms) and gradients
        # all-reduce at a mesh-size-independent cost.
        D = max(1, int(cfg.data_shards))
        B = traj.reward.shape[1]
        assert B % D == 0, (B, D)

        def flat(x):
            # [T, B, ...] -> [B, T, ...] -> [D, (B//D)*T, ...]
            x = jnp.swapaxes(x, 0, 1)
            return x.reshape((D, (B // D) * x.shape[1]) + x.shape[2:])

        batch = jax.tree.map(flat, traj)
        advantages_f = flat(advantages)
        returns_f = flat(returns)

        # 3. update running stats once per iteration (reductions over the
        # env-major layout: [D, N_loc, F] -> [D*N_loc, F] keeps the sharded
        # axis major, so the partial reduce stays device-local)
        obs_stats = (
            update_stats(ts.obs_stats, batch.obs.reshape(-1, batch.obs.shape[-1]))
            if cfg.normalize_input
            else ts.obs_stats
        )
        teacher_stats = ts.teacher_obs_stats
        if cfg.asymmetric_critic and cfg.normalize_input:
            teacher_stats = update_stats(
                teacher_stats,
                batch.teacher_obs.reshape(-1, batch.teacher_obs.shape[-1]),
            )
        value_stats = (
            update_stats(ts.value_stats, returns_f.reshape(-1))
            if cfg.normalize_value
            else ts.value_stats
        )
        if cfg.normalize_advantage:
            advantages_f = (advantages_f - advantages_f.mean()) / (
                advantages_f.std() + 1e-8
            )
        returns_n = (
            normalize(value_stats, returns_f, clip=jnp.inf)
            if cfg.normalize_value
            else returns_f
        )
        values_n = (
            normalize(value_stats, batch.value, clip=jnp.inf)
            if cfg.normalize_value
            else batch.value
        )

        N_loc = returns_f.shape[1]  # rollout elements per data shard

        # 4. minibatch SGD with KL-adaptive LR.
        # The loss normalizes obs with the ROLLOUT-time stats (ts.obs_stats),
        # not the freshly-updated ones: batch.mu/logp were recorded under
        # the old stats, so evaluating the new policy under shifted stats
        # makes ratio != 1 and KL > 0 at identical params — pure
        # normalization drift read as policy movement. Early in training
        # (or whenever the obs distribution shifts, e.g. first lifts) that
        # artificial KL exceeds 2x kl_threshold every iteration and pins
        # the adaptive LR at min_lr (observed: probe_can, lr 1e-6 from
        # iter 140 with kl stuck at 0.03-0.05). The updated stats take
        # effect on the NEXT rollout.
        def loss_fn(params, mb):
            obs_n = (
                normalize(ts.obs_stats, mb["obs"])
                if cfg.normalize_input
                else mb["obs"]
            )
            mu, log_std, value = self.net.apply(self._actor_params(params), obs_n)
            if cfg.asymmetric_critic:
                t_n = (
                    normalize(ts.teacher_obs_stats, mb["teacher_obs"])
                    if cfg.normalize_input
                    else mb["teacher_obs"]
                )
                value = self.value_net.apply(params["critic"], t_n)
            logp = _gaussian_logp(mu, log_std, mb["action"])
            ratio = jnp.exp(logp - mb["logp"])
            surr1 = ratio * mb["adv"]
            surr2 = jnp.clip(ratio, 1.0 - cfg.e_clip, 1.0 + cfg.e_clip) * mb["adv"]
            policy_loss = -jnp.mean(jnp.minimum(surr1, surr2))
            if cfg.clip_value:
                v_clipped = mb["value_n"] + jnp.clip(
                    value - mb["value_n"], -cfg.e_clip, cfg.e_clip
                )
                v_loss = jnp.maximum(
                    (value - mb["return_n"]) ** 2,
                    (v_clipped - mb["return_n"]) ** 2,
                )
            else:
                v_loss = (value - mb["return_n"]) ** 2
            value_loss = 0.5 * jnp.mean(v_loss)
            entropy = jnp.mean(
                jnp.sum(log_std + 0.5 * jnp.log(2.0 * jnp.pi * jnp.e), axis=-1)
            )
            # soft bound loss pushing mu into [-1.1, 1.1]
            mu_excess = jnp.maximum(jnp.abs(mu) - 1.1, 0.0)
            bounds_loss = jnp.mean(jnp.sum(mu_excess**2, axis=-1))
            total = (
                policy_loss
                + cfg.critic_coef * 0.5 * value_loss
                - cfg.entropy_coef * entropy
                + cfg.bounds_loss_coef * bounds_loss
            )
            # KL(old || new) for adaptive LR (rl_games policy_kl form)
            old_sigma, sigma = mb["sigma"], jnp.exp(log_std)
            kl = jnp.sum(
                jnp.log(sigma / old_sigma)
                + (old_sigma**2 + (mb["mu"] - mu) ** 2) / (2.0 * sigma**2)
                - 0.5,
                axis=-1,
            )
            return total, dict(
                policy_loss=policy_loss,
                value_loss=value_loss,
                entropy=entropy,
                kl=jnp.mean(kl),
                bounds_loss=bounds_loss,
            )

        grad_fn = jax.grad(loss_fn, has_aux=True)

        def take_mb(x, idx):
            # batched shard-local gather: x [D, N_loc, ...], idx [D, mb_loc]
            ix = idx.reshape(idx.shape + (1,) * (x.ndim - 2))
            return jnp.take_along_axis(x, ix, axis=1)

        def mb_step(carry, idx):
            params, opt_state, lr = carry
            mb = dict(
                obs=take_mb(batch.obs, idx),
                action=take_mb(batch.action, idx),
                logp=take_mb(batch.logp, idx),
                adv=take_mb(advantages_f, idx),
                return_n=take_mb(returns_n, idx),
                value_n=take_mb(values_n, idx),
                mu=take_mb(batch.mu, idx),
                sigma=take_mb(batch.sigma, idx),
                teacher_obs=take_mb(batch.teacher_obs, idx),
            )
            grads, aux = grad_fn(params, mb)
            updates, opt_state = self.optimizer.update(grads, opt_state, params)
            updates = jax.tree.map(lambda u: u * lr, updates)
            params = optax.apply_updates(params, updates)
            if cfg.lr_schedule == "adaptive":
                lr = jnp.where(
                    aux["kl"] > 2.0 * cfg.kl_threshold,
                    jnp.maximum(lr / 1.5, cfg.min_lr),
                    jnp.where(
                        aux["kl"] < 0.5 * cfg.kl_threshold,
                        jnp.minimum(lr * 1.5, cfg.max_lr),
                        lr,
                    ),
                )
            return (params, opt_state, lr), aux

        assert self.mb_size % D == 0, (self.mb_size, D)
        mb_loc = self.mb_size // D

        def epoch_step(carry, k):
            # one independent permutation per data shard, local indices only
            perm = jax.vmap(lambda kk: jax.random.permutation(kk, N_loc))(
                jax.random.split(k, D)
            )  # [D, N_loc]
            perm = perm.reshape(D, self.num_minibatches, mb_loc).swapaxes(0, 1)
            carry, auxs = jax.lax.scan(mb_step, carry, perm)
            return carry, auxs

        epoch_keys = jax.random.split(k_perm, cfg.mini_epochs)
        (params, opt_state, lr), auxs = jax.lax.scan(
            epoch_step, (ts.params, ts.opt_state, ts.lr), epoch_keys
        )

        # trust-region rescue: revert a catastrophic update wholesale.
        # Armed only after the first few iterations — the very first updates
        # from a random init legitimately move the policy by KL ~ 1 while
        # the input/value statistics warm up.
        kl_mean = auxs["kl"].mean()
        guard = (ts.epoch >= 8) & (
            ~jnp.isfinite(kl_mean) | (kl_mean > cfg.kl_guard)
        )
        # revert the normalization statistics along with params/opt_state:
        # a poisoned rollout that trips the guard must not permanently
        # shift the input/value normalization either (advisor r2 finding)
        (params, opt_state, obs_stats, value_stats, teacher_stats) = (
            jax.tree.map(
                lambda old, new: jnp.where(guard, old, new),
                (ts.params, ts.opt_state, ts.obs_stats, ts.value_stats,
                 ts.teacher_obs_stats),
                (params, opt_state, obs_stats, value_stats, teacher_stats),
            )
        )
        lr = jnp.where(guard, jnp.maximum(ts.lr / 2.0, cfg.min_lr), lr)

        stats = dict(
            reward_mean=traj.reward.mean() / cfg.reward_scale,
            episode_done_frac=traj.done.mean(),
            kl=kl_mean,
            kl_guard_triggered=guard.astype(jnp.float32),
            policy_loss=auxs["policy_loss"].mean(),
            value_loss=auxs["value_loss"].mean(),
            entropy=auxs["entropy"].mean(),
            lr=lr,
            success_rate_ewma=(
                infos["success_rate_ewma"][-1]
                if infos is not None and "success_rate_ewma" in infos
                else jnp.zeros(())
            ),
        )
        if infos is not None and "per_object_success_ewma" in infos:
            # device-side per-object EWMAs ([T, K] over the rollout) ->
            # one scalar column per object in metrics.jsonl (reference
            # multi_object_manipulation.py per-object success accounting)
            po = infos["per_object_success_ewma"][-1]
            for k in range(po.shape[-1]):
                stats[f"success_ewma_obj{k}"] = po[..., k]
        new_ts = TrainState(
            params=params,
            opt_state=opt_state,
            obs_stats=obs_stats,
            value_stats=value_stats,
            lr=lr,
            env_state=env_state,
            last_obs=last_obs,
            key=key,
            epoch=ts.epoch + 1,
            teacher_obs_stats=teacher_stats,
            last_teacher_obs=(
                last_teacher if cfg.asymmetric_critic else ts.last_teacher_obs
            ),
        )
        return new_ts, stats

    # --- recurrent (LSTM) path -----------------------------------------------

    def _train_iter_rnn(self, ts: TrainState):
        """Rollout with the LSTM carry threaded through the scan (reset-
        masked on done), then BPTT over stored-state seq_len chunks
        (rl_games seq_length semantics: the chunk-start hidden states come
        from the rollout and are not recomputed between mini-epochs)."""
        cfg = self.cfg
        key, k_roll = jax.random.split(ts.key)
        B = ts.last_obs.shape[0]
        teacher0 = (
            ts.last_teacher_obs
            if ts.last_teacher_obs is not None
            else jnp.zeros(
                (B, getattr(self.env, "num_teacher_obs", 0)), ts.last_obs.dtype
            )
        )

        def rollout_step(carry, k):
            env_state, obs, teacher_obs, h = carry
            mu, log_std, value, h_new = self._policy_value_rnn(
                ts, ts.params, obs, teacher_obs, h
            )
            a = mu + jnp.exp(log_std) * jax.random.normal(k, mu.shape)
            logp = _gaussian_logp(mu, log_std, a)
            env_state, res = self.env.step(env_state, a)
            value = (
                denormalize(ts.value_stats, value)
                if cfg.normalize_value
                else value
            )
            value = jnp.where(jnp.isfinite(value), value, 0.0)
            reward = (
                jnp.where(jnp.isfinite(res.reward), res.reward, 0.0)
                * cfg.reward_scale
            )
            if cfg.value_bootstrap:
                boot = jnp.where(res.done & jnp.isfinite(value), value, 0.0)
                reward = reward + cfg.gamma * boot
            t = Transition(
                obs=obs, action=a, logp=logp, value=value,
                reward=reward, done=res.done, mu=mu, sigma=jnp.exp(log_std),
                teacher_obs=teacher_obs, hidden=h,
            )
            if cfg.zero_rnn_on_done:
                h_new = jax.tree.map(
                    lambda x: jnp.where(res.done[:, None], 0.0, x), h_new
                )
            next_obs = jnp.where(jnp.isfinite(res.obs), res.obs, 0.0)
            next_teacher = jnp.where(
                jnp.isfinite(res.teacher_obs), res.teacher_obs, 0.0
            )
            return (env_state, next_obs, next_teacher, h_new), (t, res.info)

        keys = jax.random.split(k_roll, cfg.horizon)
        (env_state, last_obs, last_teacher, last_hidden), (traj, infos) = (
            jax.lax.scan(
                rollout_step,
                (ts.env_state, ts.last_obs, teacher0, ts.hidden),
                keys,
            )
        )
        return self._update_from_traj_rnn(
            ts, traj, env_state, last_obs, last_teacher, last_hidden, key,
            infos=infos,
        )

    def _update_from_traj_rnn(
        self, ts: TrainState, traj: Transition, env_state, last_obs,
        last_teacher, last_hidden, key, infos=None,
    ):
        cfg = self.cfg
        k_perm = jax.random.fold_in(key, 1)

        _, _, last_value, _ = self._policy_value_rnn(
            ts, ts.params, last_obs, last_teacher, last_hidden
        )
        last_value = (
            denormalize(ts.value_stats, last_value)
            if cfg.normalize_value
            else last_value
        )
        last_value = jnp.where(jnp.isfinite(last_value), last_value, 0.0)

        def gae_step(carry, t):
            adv_next, v_next = carry
            nonterminal = 1.0 - t.done.astype(jnp.float32)
            delta = t.reward + cfg.gamma * v_next * nonterminal - t.value
            adv = delta + cfg.gamma * cfg.tau * nonterminal * adv_next
            return (adv, t.value), adv

        _, advantages = jax.lax.scan(
            gae_step,
            (jnp.zeros_like(last_value), last_value),
            traj,
            reverse=True,
        )
        returns = advantages + traj.value

        # --- sequence-chunk the [T, B] trajectory: N_seq = (T/B)*L chunks
        # of length L, each with its rollout-stored initial carry. Laid out
        # ENV-MAJOR as [D, N_seq_loc, L] (D = data shards) so the minibatch
        # permutation stays shard-local and the update runs data-parallel —
        # same all-gather pathology as the MLP path otherwise (see
        # _update_from_traj).
        T, B = traj.done.shape
        L = cfg.seq_len
        n_chunks = T // L
        D = max(1, int(cfg.data_shards))
        assert B % D == 0, (B, D)
        N_seq = n_chunks * B
        N_seq_loc = n_chunks * (B // D)

        def seq(x):  # [T, B, ...] -> [D, N_seq_loc, L, ...]
            x = x.reshape((n_chunks, L, B) + x.shape[2:])
            x = jnp.moveaxis(x, 2, 0)  # [B, n_chunks, L, ...]
            return x.reshape((D, N_seq_loc, L) + x.shape[3:])

        def chunk_start(h):  # [T, B, R] -> [D, N_seq_loc, R]
            h = jnp.swapaxes(h[::L], 0, 1)  # [B, n_chunks, R]
            return h.reshape((D, N_seq_loc) + h.shape[2:])

        obs_s = seq(traj.obs)
        teacher_s = seq(traj.teacher_obs)
        returns_s = seq(returns)
        adv_s = seq(advantages)

        # running stats from the env-major layout (shard-local partial
        # reductions; the T-major reshapes forced batch all-gathers)
        obs_stats = (
            update_stats(ts.obs_stats, obs_s.reshape(-1, obs_s.shape[-1]))
            if cfg.normalize_input
            else ts.obs_stats
        )
        teacher_stats = ts.teacher_obs_stats
        if cfg.asymmetric_critic and cfg.normalize_input:
            teacher_stats = update_stats(
                teacher_stats, teacher_s.reshape(-1, teacher_s.shape[-1]),
            )
        value_stats = (
            update_stats(ts.value_stats, returns_s.reshape(-1))
            if cfg.normalize_value
            else ts.value_stats
        )

        if cfg.normalize_advantage:
            adv_s = (adv_s - adv_s.mean()) / (adv_s.std() + 1e-8)
        returns_n = (
            normalize(value_stats, returns_s, clip=jnp.inf)
            if cfg.normalize_value
            else returns_s
        )
        values_s = seq(traj.value)
        values_n = (
            normalize(value_stats, values_s, clip=jnp.inf)
            if cfg.normalize_value
            else values_s
        )

        done_s = seq(traj.done)
        # prev-step done inside each chunk (chunk-start carry is already
        # post-reset from the rollout masking); chunk time axis is now 2
        dprev = jnp.concatenate(
            [jnp.zeros_like(done_s[:, :, :1]), done_s[:, :, :-1]], axis=2
        )
        batch = dict(
            obs=obs_s,
            action=seq(traj.action),
            logp=seq(traj.logp),
            adv=adv_s,
            return_n=returns_n,
            value_n=values_n,
            mu=seq(traj.mu),
            sigma=seq(traj.sigma),
            teacher_obs=teacher_s,
            dprev=dprev,
            h0=jax.tree.map(chunk_start, traj.hidden),
        )

        def apply_rnn_over_chunk(params, obs_n, teacher_n, h0, dprev_mb):
            """Scan the nets over the L steps of each chunk (time-major)."""
            om = jnp.swapaxes(obs_n, 0, 1)  # [L, n, D]
            dp = jnp.swapaxes(dprev_mb, 0, 1)  # [L, n]

            def mask(c, d):
                if not cfg.zero_rnn_on_done:
                    return c
                return jax.tree.map(
                    lambda x: jnp.where(d[:, None], 0.0, x), c
                )

            if cfg.asymmetric_critic:
                tm = jnp.swapaxes(teacher_n, 0, 1)

                def step(carry, xs):
                    o, t_o, d = xs
                    ca = mask(carry["actor"], d)
                    cc = mask(carry["critic"], d)
                    mu, log_std, _, ca2 = self.net.apply(params["actor"], o, ca)
                    v, cc2 = self.value_net.apply(params["critic"], t_o, cc)
                    return {"actor": ca2, "critic": cc2}, (mu, log_std, v)

                _, (mu, log_std, value) = jax.lax.scan(
                    step, h0, (om, tm, dp)
                )
            else:

                def step(carry, xs):
                    o, d = xs
                    c = mask(carry, d)
                    mu, log_std, v, c2 = self.net.apply(params, o, c)
                    return c2, (mu, log_std, v)

                _, (mu, log_std, value) = jax.lax.scan(step, h0, (om, dp))
            # back to [n, L, ...]
            return (
                jnp.swapaxes(mu, 0, 1),
                jnp.swapaxes(log_std, 0, 1),
                jnp.swapaxes(value, 0, 1),
            )

        def loss_fn(params, mb):
            # rollout-time stats, not the freshly-updated ones — see the
            # MLP-path loss_fn comment (normalization drift otherwise
            # reads as policy KL and pins the adaptive LR at min_lr)
            obs_n = (
                normalize(ts.obs_stats, mb["obs"])
                if cfg.normalize_input
                else mb["obs"]
            )
            teacher_n = (
                normalize(ts.teacher_obs_stats, mb["teacher_obs"])
                if (cfg.asymmetric_critic and cfg.normalize_input)
                else mb["teacher_obs"]
            )
            mu, log_std, value = apply_rnn_over_chunk(
                params, obs_n, teacher_n, mb["h0"], mb["dprev"]
            )
            logp = _gaussian_logp(mu, log_std, mb["action"])
            ratio = jnp.exp(logp - mb["logp"])
            surr1 = ratio * mb["adv"]
            surr2 = jnp.clip(ratio, 1.0 - cfg.e_clip, 1.0 + cfg.e_clip) * mb["adv"]
            policy_loss = -jnp.mean(jnp.minimum(surr1, surr2))
            if cfg.clip_value:
                v_clipped = mb["value_n"] + jnp.clip(
                    value - mb["value_n"], -cfg.e_clip, cfg.e_clip
                )
                v_loss = jnp.maximum(
                    (value - mb["return_n"]) ** 2,
                    (v_clipped - mb["return_n"]) ** 2,
                )
            else:
                v_loss = (value - mb["return_n"]) ** 2
            value_loss = 0.5 * jnp.mean(v_loss)
            entropy = jnp.mean(
                jnp.sum(log_std + 0.5 * jnp.log(2.0 * jnp.pi * jnp.e), axis=-1)
            )
            mu_excess = jnp.maximum(jnp.abs(mu) - 1.1, 0.0)
            bounds_loss = jnp.mean(jnp.sum(mu_excess**2, axis=-1))
            total = (
                policy_loss
                + cfg.critic_coef * 0.5 * value_loss
                - cfg.entropy_coef * entropy
                + cfg.bounds_loss_coef * bounds_loss
            )
            old_sigma, sigma = mb["sigma"], jnp.exp(log_std)
            kl = jnp.sum(
                jnp.log(sigma / old_sigma)
                + (old_sigma**2 + (mb["mu"] - mu) ** 2) / (2.0 * sigma**2)
                - 0.5,
                axis=-1,
            )
            return total, dict(
                policy_loss=policy_loss,
                value_loss=value_loss,
                entropy=entropy,
                kl=jnp.mean(kl),
                bounds_loss=bounds_loss,
            )

        grad_fn = jax.grad(loss_fn, has_aux=True)
        mb_seqs = self.mb_size // L
        assert mb_seqs % D == 0, (mb_seqs, D)
        mb_seqs_loc = mb_seqs // D

        def take_mb(x, idx):
            # shard-local batched gather [D, N_seq_loc, ...] -> [D, mb, ...]
            # then merge the (sharded-major) D axis into the minibatch axis,
            # which GSPMD represents without communication
            ix = idx.reshape(idx.shape + (1,) * (x.ndim - 2))
            g = jnp.take_along_axis(x, ix, axis=1)
            return g.reshape((D * idx.shape[1],) + x.shape[2:])

        def mb_step(carry, idx):
            params, opt_state, lr = carry
            mb = jax.tree.map(lambda x: take_mb(x, idx), batch)
            grads, aux = grad_fn(params, mb)
            updates, opt_state = self.optimizer.update(grads, opt_state, params)
            updates = jax.tree.map(lambda u: u * lr, updates)
            params = optax.apply_updates(params, updates)
            if cfg.lr_schedule == "adaptive":
                lr = jnp.where(
                    aux["kl"] > 2.0 * cfg.kl_threshold,
                    jnp.maximum(lr / 1.5, cfg.min_lr),
                    jnp.where(
                        aux["kl"] < 0.5 * cfg.kl_threshold,
                        jnp.minimum(lr * 1.5, cfg.max_lr),
                        lr,
                    ),
                )
            return (params, opt_state, lr), aux

        def epoch_step(carry, k):
            perm = jax.vmap(lambda kk: jax.random.permutation(kk, N_seq_loc))(
                jax.random.split(k, D)
            )  # [D, N_seq_loc] of shard-local indices
            perm = perm.reshape(
                D, self.num_minibatches, mb_seqs_loc
            ).swapaxes(0, 1)
            carry, auxs = jax.lax.scan(mb_step, carry, perm)
            return carry, auxs

        epoch_keys = jax.random.split(k_perm, cfg.mini_epochs)
        (params, opt_state, lr), auxs = jax.lax.scan(
            epoch_step, (ts.params, ts.opt_state, ts.lr), epoch_keys
        )

        kl_mean = auxs["kl"].mean()
        guard = (ts.epoch >= 8) & (
            ~jnp.isfinite(kl_mean) | (kl_mean > cfg.kl_guard)
        )
        (params, opt_state, obs_stats, value_stats, teacher_stats) = (
            jax.tree.map(
                lambda old, new: jnp.where(guard, old, new),
                (ts.params, ts.opt_state, ts.obs_stats, ts.value_stats,
                 ts.teacher_obs_stats),
                (params, opt_state, obs_stats, value_stats, teacher_stats),
            )
        )
        lr = jnp.where(guard, jnp.maximum(ts.lr / 2.0, cfg.min_lr), lr)

        stats = dict(
            reward_mean=traj.reward.mean() / cfg.reward_scale,
            episode_done_frac=traj.done.mean(),
            kl=kl_mean,
            kl_guard_triggered=guard.astype(jnp.float32),
            policy_loss=auxs["policy_loss"].mean(),
            value_loss=auxs["value_loss"].mean(),
            entropy=auxs["entropy"].mean(),
            lr=lr,
            success_rate_ewma=(
                infos["success_rate_ewma"][-1]
                if infos is not None and "success_rate_ewma" in infos
                else jnp.zeros(())
            ),
        )
        if infos is not None and "per_object_success_ewma" in infos:
            # device-side per-object EWMAs ([T, K] over the rollout) ->
            # one scalar column per object in metrics.jsonl (reference
            # multi_object_manipulation.py per-object success accounting)
            po = infos["per_object_success_ewma"][-1]
            for k in range(po.shape[-1]):
                stats[f"success_ewma_obj{k}"] = po[..., k]
        new_ts = TrainState(
            params=params,
            opt_state=opt_state,
            obs_stats=obs_stats,
            value_stats=value_stats,
            lr=lr,
            env_state=env_state,
            last_obs=last_obs,
            key=key,
            epoch=ts.epoch + 1,
            teacher_obs_stats=teacher_stats,
            last_teacher_obs=(
                last_teacher if cfg.asymmetric_critic else ts.last_teacher_obs
            ),
            hidden=last_hidden,
        )
        return new_ts, stats

    # --- inference ----------------------------------------------------------

    def act(self, ts: TrainState, obs, deterministic=True, key=None,
            hidden=None):
        """Policy action for `obs`. For recurrent policies pass (and carry
        forward) `hidden`; returns (action, new_hidden) in that case."""
        nobs = normalize(ts.obs_stats, obs) if self.cfg.normalize_input else obs
        if self.recurrent:
            if hidden is None:
                hidden = self.init_carry(obs.shape[0])
            a_carry = (
                hidden["actor"] if self.cfg.asymmetric_critic else hidden
            )
            mu, log_std, _, a_carry2 = self.net.apply(
                self._actor_params(ts.params), nobs, a_carry
            )
            new_hidden = (
                {**hidden, "actor": a_carry2}
                if self.cfg.asymmetric_critic
                else a_carry2
            )
            a = (
                mu
                if deterministic
                else mu + jnp.exp(log_std) * jax.random.normal(key, mu.shape)
            )
            return a, new_hidden
        mu, log_std, _ = self.net.apply(self._actor_params(ts.params), nobs)
        if deterministic:
            return mu
        return mu + jnp.exp(log_std) * jax.random.normal(key, mu.shape)
