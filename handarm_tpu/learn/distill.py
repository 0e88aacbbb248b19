"""Teacher-student DAgger distillation.

TPU-native replacement for the reference's external `cpd` package
(imported at isaacgymenvs/train.py:102-105; DAggerAgent + ActorBuilder +
PointcloudActorBuilder, config cfg/train/HandArmTaskMultiObjectManipulation
CPD.yaml): a privileged teacher (trained PPO policy on teacher_observations)
supervises a student that sees only deployable observations (proprioception
+ synthetic pointclouds). The rollout + relabeling + SGD loop is one jitted
function, like the PPO learner.

Differences by design:
- the pointcloud encoder is a PointNet-style dense max-pool MLP (batched
  matmuls on the MXU) instead of the reference's Minkowski sparse conv —
  sparse ops don't map to TPUs; dense N<=128-point clouds do.
- auxiliary objectives (fingertip_pos / target_object_pos regression from
  the encoding, CPD.yaml auxiliary block) are optional heads.
- beta-mixing: actions executed in the env interpolate teacher -> student
  over training (classic DAgger schedule).
"""

from __future__ import annotations

from typing import Any, NamedTuple, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import optax

from handarm_tpu.learn.running_stats import normalize


class PointcloudEncoder(nn.Module):
    """PointNet-style encoder over [B, N, 4] (xyz + PointType) clouds."""

    features: Sequence[int] = (64, 128)
    out_dim: int = 128

    @nn.compact
    def __call__(self, cloud):
        x = cloud
        valid = (cloud[..., 3:] > 0).astype(x.dtype)
        for i, f in enumerate(self.features):
            x = nn.Dense(f, name=f"pt_{i}")(x)
            x = nn.relu(x)
        x = nn.Dense(self.out_dim, name="pt_out")(x)
        # masked max-pool over points
        x = jnp.where(valid > 0, x, -1e9)
        x = jnp.max(x, axis=-2)
        return jnp.where(jnp.isfinite(x), x, 0.0)


class StudentPolicy(nn.Module):
    """Flat-obs (+ optional clouds) -> action mu (+ aux predictions)."""

    num_actions: int
    cloud_keys: Sequence[str] = ()
    hidden: Sequence[int] = (512, 256, 128)
    encoder_dim: int = 128
    aux_heads: dict[str, int] | None = None  # name -> dim

    @nn.compact
    def __call__(self, obs, obs_dict=None):
        feats = [obs]
        for key in self.cloud_keys:
            enc = PointcloudEncoder(out_dim=self.encoder_dim, name=f"enc_{key}")
            feats.append(enc(obs_dict[key]))
        x = jnp.concatenate(feats, axis=-1)
        for i, h in enumerate(self.hidden):
            x = nn.Dense(h, name=f"dense_{i}")(x)
            x = nn.elu(x)
        mu = nn.Dense(self.num_actions, name="mu")(x)
        aux = {}
        for name, dim in (self.aux_heads or {}).items():
            aux[name] = nn.Dense(dim, name=f"aux_{name}")(x)
        return mu, aux


class DistillConfig(NamedTuple):
    horizon: int = 16
    learning_rate: float = 1e-3
    mini_epochs: int = 2
    minibatch_size: int = 4096
    beta_start: float = 1.0  # fraction of teacher actions executed
    beta_end: float = 0.0
    beta_decay_iters: int = 500
    aux_coef: float = 0.1
    grad_norm: float = 1.0
    cloud_keys: tuple = ()


class DistillState(NamedTuple):
    params: Any
    opt_state: Any
    env_state: Any
    last_obs: jnp.ndarray
    last_teacher_obs: jnp.ndarray
    last_obs_dict: dict
    key: jnp.ndarray
    iteration: jnp.ndarray


class DAgger:
    """Distill a trained PPO teacher into a student policy.

    teacher: the PPO object + its TrainState (frozen). env must expose
    teacher observations (cfg.teacher_observations non-empty)."""

    def __init__(self, env, teacher, teacher_ts, cfg: DistillConfig = DistillConfig(),
                 aux_from_obs: dict[str, tuple[int, int]] | None = None):
        self.env = env
        self.teacher = teacher
        self.teacher_ts = teacher_ts
        self.cfg = cfg
        # aux targets sliced out of the (privileged) teacher obs vector:
        # name -> (start, end) (e.g. fingertip_pos / target_object_pos slices)
        self.aux_from_obs = aux_from_obs or {}
        aux_heads = {k: e - s for k, (s, e) in self.aux_from_obs.items()}
        self.net = StudentPolicy(
            num_actions=env.num_actions,
            cloud_keys=cfg.cloud_keys,
            aux_heads=aux_heads,
        )
        self.optimizer = optax.chain(
            optax.clip_by_global_norm(cfg.grad_norm),
            optax.adam(cfg.learning_rate),
        )

    def init(self, key) -> DistillState:
        k_env, k_net, k_next = jax.random.split(key, 3)
        # genesis pool (host-driven bounded dispatches) must exist BEFORE
        # reset is traced — it cannot run inside a jit trace
        ensure = getattr(self.env, "ensure_initial_pool", None)
        if ensure is not None:
            ensure()
        env_state, obs = jax.jit(self.env.reset)(k_env)
        # one step to obtain teacher obs + cloud shapes
        env_state, res = jax.jit(self.env.step)(
            env_state, jnp.zeros((obs.shape[0], self.env.num_actions))
        )
        params = self.net.init(k_net, res.obs[:1],
                               {k: v[:1] for k, v in res.obs_dict.items()})
        return DistillState(
            params=params,
            opt_state=self.optimizer.init(params),
            env_state=env_state,
            last_obs=res.obs,
            last_teacher_obs=res.teacher_obs,
            last_obs_dict=res.obs_dict,
            key=k_next,
            iteration=jnp.zeros((), jnp.int32),
        )

    def _teacher_action(self, teacher_obs):
        return self.teacher.act(self.teacher_ts, teacher_obs, deterministic=True)

    def beta(self, iteration):
        c = self.cfg
        frac = jnp.clip(iteration / max(c.beta_decay_iters, 1), 0.0, 1.0)
        return c.beta_start + (c.beta_end - c.beta_start) * frac

    def train_iter(self, ds: DistillState):
        cfg = self.cfg
        key, k_roll, k_perm = jax.random.split(ds.key, 3)
        beta = self.beta(ds.iteration)

        def rollout_step(carry, k):
            env_state, obs, teacher_obs, obs_dict = carry
            teacher_a = self._teacher_action(teacher_obs)
            student_mu, _ = self.net.apply(ds.params, obs, obs_dict)
            mix = jax.random.bernoulli(k, beta, (obs.shape[0], 1))
            action = jnp.where(mix, teacher_a, student_mu)
            env_state, res = self.env.step(env_state, action)
            sample = dict(obs=obs, obs_dict=obs_dict, target=teacher_a,
                          teacher_obs=teacher_obs)
            succ = res.info.get("success_rate_ewma", jnp.zeros(()))
            return (env_state, res.obs, res.teacher_obs, res.obs_dict), (
                sample, succ,
            )

        keys = jax.random.split(k_roll, cfg.horizon)
        carry, (batch, succ) = jax.lax.scan(
            rollout_step,
            (ds.env_state, ds.last_obs, ds.last_teacher_obs, ds.last_obs_dict),
            keys,
        )
        env_state, last_obs, last_teacher_obs, last_obs_dict = carry

        def flat(x):
            return x.reshape((-1,) + x.shape[2:])

        batch = jax.tree.map(flat, batch)
        N = batch["obs"].shape[0]
        mb = min(cfg.minibatch_size, N)
        n_mb = max(1, N // mb)

        def loss_fn(params, idx):
            obs = batch["obs"][idx]
            od = {k: v[idx] for k, v in batch["obs_dict"].items()}
            mu, aux = self.net.apply(params, obs, od)
            loss = jnp.mean((mu - batch["target"][idx]) ** 2)
            aux_loss = 0.0
            for name, (s, e) in self.aux_from_obs.items():
                tgt = batch["teacher_obs"][idx][:, s:e]
                aux_loss = aux_loss + jnp.mean((aux[name] - tgt) ** 2)
            return loss + cfg.aux_coef * aux_loss, dict(
                bc_loss=loss, aux_loss=aux_loss
            )

        def mb_step(carry, idx):
            params, opt_state = carry
            grads, metrics = jax.grad(loss_fn, has_aux=True)(params, idx)
            updates, opt_state = self.optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), metrics

        def epoch(carry, k):
            perm = jax.random.permutation(k, N)[: n_mb * mb].reshape(n_mb, mb)
            return jax.lax.scan(mb_step, carry, perm)

        (params, opt_state), metrics = jax.lax.scan(
            epoch, (ds.params, ds.opt_state),
            jax.random.split(k_perm, cfg.mini_epochs),
        )
        stats = dict(
            bc_loss=metrics["bc_loss"].mean(),
            aux_loss=metrics["aux_loss"].mean(),
            beta=beta,
            # env-side success EWMA at rollout end; with beta near 0 this
            # is the STUDENT's own success (the CPD yaml's eval criterion)
            success_rate_ewma=succ[-1],
        )
        return DistillState(
            params=params, opt_state=opt_state, env_state=env_state,
            last_obs=last_obs, last_teacher_obs=last_teacher_obs,
            last_obs_dict=last_obs_dict, key=key,
            iteration=ds.iteration + 1,
        ), stats

    def act(self, ds: DistillState, obs, obs_dict):
        mu, _ = self.net.apply(ds.params, obs, obs_dict)
        return mu
