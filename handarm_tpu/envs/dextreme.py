"""AllegroHandDextreme: in-hand reorientation under ADR + RNA (reference
tasks/dextreme/allegro_hand_dextreme.py AllegroHandDextremeADR).

Wraps the AllegroHand reorientation env with DeXtreme's two transfer
mechanisms:
- **ADR** (envs/adr.py, the ADRVecTask port): per-env adversary strengths
  — observation noise, action noise, and the RNA mixing weight — sampled
  from ranges that widen/narrow by boundary-worker performance
  (adr_vec_task.py:666-918). The objective is the episode's consecutive
  goal count.
- **RNA** (learn/rna.py): a fixed random binned-MLP adversary perturbs
  the policy's actions, mixed by the ADR-controlled alpha
  (allegro_hand_dextreme.py RNA usage + utils/rna_util.py).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from handarm_tpu.envs.adr import AdrConfig, AdrState, adr_step, init_adr_state
from handarm_tpu.envs.dexhand import make_allegro
from handarm_tpu.learn.rna import (
    RNAParams,
    RNAState,
    rna_apply,
    rna_init,
    rna_masks,
)

# adversary parameters under ADR control (allegro_hand_dextreme.py uses
# these three on top of the physical DR set)
DEXTREME_ADR = AdrConfig(
    enabled=True,
    names=("obs_noise", "action_noise", "rna_alpha"),
    init_lo=(0.0, 0.0, 0.0),
    init_hi=(0.0, 0.0, 0.0),
    limit_lo=(0.0, 0.0, 0.0),
    limit_hi=(0.1, 0.1, 0.4),
    delta=(0.005, 0.005, 0.02),
    queue_len=64,
    objective_lo=1.0,
    objective_hi=3.0,
)


class DextremeState(NamedTuple):
    inner: object
    obs: jnp.ndarray  # last observation (RNA input)
    adr: AdrState
    rna: RNAState
    key: jnp.ndarray


class DextremeStepResult(NamedTuple):
    obs: jnp.ndarray
    reward: jnp.ndarray
    done: jnp.ndarray
    info: dict
    teacher_obs: jnp.ndarray


class AllegroHandDextremeEnv:
    def __init__(self, num_envs=256, episode_length=600,
                 adr: AdrConfig = DEXTREME_ADR, rna_seed: int = 0):
        self.env = make_allegro(num_envs=num_envs,
                                episode_length=episode_length)
        self.cfg = self.env.cfg
        self.adr_cfg = adr
        self.num_obs = self.env.num_obs
        self.num_actions = self.env.num_actions
        self.num_teacher_obs = self.env.num_teacher_obs
        self.obs_slices = self.env.obs_slices
        self.rna_params: RNAParams = rna_init(
            jax.random.PRNGKey(rna_seed), self.num_obs, self.num_actions
        )

    def reset(self, key):
        k_in, k_adr, k_rna, k_next = jax.random.split(key, 4)
        inner, obs = self.env.reset(k_in)
        B = self.cfg.num_envs
        return DextremeState(
            inner=inner,
            obs=obs,
            adr=init_adr_state(self.adr_cfg, k_adr, B),
            rna=rna_masks(k_rna, B, self.rna_params),
            key=k_next,
        ), obs

    def step(self, state: DextremeState, actions):
        B = actions.shape[0]
        key, k_act, k_obs, k_adr, k_rna = jax.random.split(state.key, 5)
        vals = state.adr.values  # [B, 3]
        obs_noise, act_noise, alpha = vals[:, 0], vals[:, 1], vals[:, 2]

        a_rna = rna_apply(self.rna_params, state.rna, state.obs)
        a = (1.0 - alpha[:, None]) * actions + alpha[:, None] * a_rna
        a = a + act_noise[:, None] * jax.random.normal(k_act, a.shape)

        inner2, res = self.env.step(state.inner, a)
        obs = res.obs + obs_noise[:, None] * jax.random.normal(
            k_obs, res.obs.shape
        )

        # ADR objective: consecutive goal reaches this episode
        # (adr_vec_task uses the rolling successes statistic)
        objective = state.inner.successes.astype(jnp.float32)
        adr2 = adr_step(self.adr_cfg, state.adr, res.done, objective, k_adr)
        # fresh RNA dropout masks for reset envs (refresh_nets analog)
        fresh = rna_masks(k_rna, B, self.rna_params)
        rna2 = RNAState(
            mask1=jnp.where(res.done[:, None], fresh.mask1, state.rna.mask1),
            mask2=jnp.where(res.done[:, None], fresh.mask2, state.rna.mask2),
        )
        new_state = DextremeState(
            inner=inner2, obs=obs, adr=adr2, rna=rna2, key=key
        )
        info = dict(res.info)
        info["adr_range_width"] = jnp.mean(adr2.hi - adr2.lo)
        info["rna_alpha_mean"] = jnp.mean(alpha)
        return new_state, DextremeStepResult(
            obs=obs, reward=res.reward, done=res.done, info=info,
            teacher_obs=res.teacher_obs,
        )


def make_allegro_dextreme(num_envs=256, episode_length=600, **kw):
    return AllegroHandDextremeEnv(
        num_envs=num_envs, episode_length=episode_length, **kw
    )


# AllegroHandDextremeManualDR (allegro_hand_dextreme.py): the same env +
# RNA adversary, but the randomization ranges are FIXED at hand-tuned
# values instead of adapting — expressed here as an AdrConfig whose deltas
# are zero, so rollout workers sample uniformly in the manual ranges and
# the bounds never move.
DEXTREME_MANUAL_DR = AdrConfig(
    enabled=True,
    names=("obs_noise", "action_noise", "rna_alpha"),
    init_lo=(0.0, 0.0, 0.0),
    init_hi=(0.04, 0.04, 0.25),
    limit_lo=(0.0, 0.0, 0.0),
    limit_hi=(0.04, 0.04, 0.25),
    delta=(0.0, 0.0, 0.0),
    queue_len=64,
    objective_lo=1.0,
    objective_hi=3.0,
)


def make_allegro_dextreme_manual(num_envs=256, episode_length=600, **kw):
    return AllegroHandDextremeEnv(
        num_envs=num_envs, episode_length=episode_length,
        adr=DEXTREME_MANUAL_DR, **kw
    )
