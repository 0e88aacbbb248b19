"""HumanoidAMP: motion-imitation humanoid (reference tasks/humanoid_amp.py
+ tasks/amp/humanoid_amp_base.py).

The amp_humanoid mjcf (28 dofs) is PD-position controlled with the xml's
joint stiffness/damping as gains (the reference's _pd_control path,
humanoid_amp_base.py:255-295: actions map to targets through
pd_action_offset/scale built from widened joint limits). Observations =
the 105-dim AMP feature vector (learn/amp_obs.py); the step result also
carries a 2-frame AMP feature window in `info["amp_obs"]` for the
discriminator. Episodes start from Random Reference State Init: a frame
sampled from the motion library (humanoid_amp.py:193-237,
StateInit.Random), and terminate early when a non-foot body touches the
ground below termination height (humanoid_amp_base.py:540-560).

The task reward is 1.0 per step (humanoid_amp_base.py:532-536) — the
style reward is added by the AMP learner (learn/amp.py).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from handarm_tpu.learn.amp_obs import (
    DOF_OFFSETS,
    KEY_BODY_NAMES,
    NUM_AMP_OBS_PER_STEP,
    build_amp_observations,
)
from handarm_tpu.learn.motion_lib import MotionLib
from handarm_tpu.math.quat import quat_to_matrix
from handarm_tpu.physics.contacts import RobotSpheres, StaticGeom
from handarm_tpu.physics.engine import (
    SimParams,
    build_scene,
    initial_state,
    step as engine_step,
)
from handarm_tpu.physics.kinematics import forward_kinematics, site_poses
from handarm_tpu.physics.model import compile_mjcf
from handarm_tpu.physics.shapes import stack_objects
from handarm_tpu.physics.solver import SolverParams

AMP_HUMANOID_MJCF = "/root/reference/assets/mjcf/amp_humanoid.xml"
MOTION_DIR = "/root/reference/assets/amp/motions"


@dataclass(frozen=True)
class HumanoidAMPConfig:
    num_envs: int = 256
    episode_length: int = 300
    dt: float = 1.0 / 60.0
    substeps: int = 2
    control_freq_inv: int = 2  # reference runs control at 30 Hz
    motion_file: str = "amp_humanoid_walk.npy"
    termination_height: float = 0.15
    enable_early_termination: bool = True
    local_root_obs: bool = True


class HAState(NamedTuple):
    physics: object
    progress: jnp.ndarray
    amp_window: jnp.ndarray  # [B, 2, 105] (current, previous)
    key: jnp.ndarray


class HAStepResult(NamedTuple):
    obs: jnp.ndarray
    reward: jnp.ndarray
    done: jnp.ndarray
    info: dict
    teacher_obs: jnp.ndarray


class HumanoidAMPEnv:
    def __init__(self, cfg: HumanoidAMPConfig = HumanoidAMPConfig()):
        self.cfg = cfg
        art, extras = compile_mjcf(AMP_HUMANOID_MJCF)
        self.art = art
        nj = art.nv - 6  # 28
        assert nj == 28

        bodies, offs, rads, mus = [], [], [], []
        for bname, sph in extras.link_spheres.items():
            site = art.sites[bname]
            Rl = np.asarray(quat_to_matrix(jnp.asarray(site.quat)))
            mu = float(extras.geom_friction.get(bname, 1.0))
            for pos, r in sph:
                bodies.append(site.body)
                offs.append(Rl @ np.asarray(pos) + site.pos)
                rads.append(r)
                mus.append(mu)
        spheres = RobotSpheres(
            body=np.asarray(bodies, np.int32),
            offset=jnp.asarray(np.asarray(offs), jnp.float32),
            radius=jnp.asarray(np.asarray(rads), jnp.float32),
            friction=jnp.asarray(np.asarray(mus), jnp.float32),
        )
        geom = StaticGeom(
            table_lo=jnp.array([1e6, 1e6]),
            table_hi=jnp.array([1e6 + 1.0, 1e6 + 1.0]),
            table_height=jnp.asarray(0.0),
            friction=jnp.asarray(1.0),
        )
        # PD gains = mjcf joint stiffness/damping (IsaacGym DOF_MODE_POS
        # with asset-declared gains; humanoid_amp_base.py uses pd_control)
        kp = np.zeros(art.nv, np.float32)
        kd = np.zeros(art.nv, np.float32)
        for i, jn in enumerate(art.joint_names):
            if jn in extras.joint_stiffness:
                kp[i] = extras.joint_stiffness[jn]
        kd[6:] = art.joint_damping[6:]
        self.scene = build_scene(
            art, stack_objects([]), spheres, geom,
            kp=kp, kd=kd,
            base_pos=(0.0, 0.0, 0.89),
            params=SimParams(
                dt=cfg.dt, substeps=cfg.substeps,
                solver=SolverParams(iterations=8),
            ),
        )
        # pd action offset/scale from widened limits (humanoid_amp_base.py
        # :263-295): spherical clusters get +-pi, hinges 0.7x widened range
        lo = np.array(art.q_min[6:], np.float64)
        hi = np.array(art.q_max[6:], np.float64)
        for j in range(len(DOF_OFFSETS) - 1):
            o, o1 = DOF_OFFSETS[j], DOF_OFFSETS[j + 1]
            if o1 - o == 3:
                lo[o:o1], hi[o:o1] = -np.pi, np.pi
            else:
                mid = 0.5 * (hi[o] + lo[o])
                scale = 0.7 * (hi[o] - lo[o])
                lo[o], hi[o] = mid - scale, mid + scale
        self.pd_offset = jnp.asarray(0.5 * (hi + lo), jnp.float32)
        self.pd_scale = jnp.asarray(0.5 * (hi - lo), jnp.float32)

        self.key_bodies = np.asarray(
            [art.sites[n].body for n in KEY_BODY_NAMES], np.int32
        )
        self.key_site_pos = jnp.stack(
            [jnp.asarray(art.sites[n].pos) for n in KEY_BODY_NAMES]
        )
        self.key_site_quat = jnp.stack(
            [jnp.asarray(art.sites[n].quat) for n in KEY_BODY_NAMES]
        )
        # bodies allowed to touch the ground (feet incl. welded variants)
        contact_ok = [
            art.sites[n].body for n in art.sites if "foot" in n
        ]
        self.contact_ok = np.unique(np.asarray(contact_ok, np.int32))
        all_bodies = np.arange(art.nb)
        self.fall_bodies = np.asarray(
            [b for b in all_bodies if b not in self.contact_ok], np.int32
        )

        import glob
        import os

        files = (
            [os.path.join(MOTION_DIR, cfg.motion_file)]
            if cfg.motion_file
            else sorted(glob.glob(os.path.join(MOTION_DIR, "*.npy")))
        )
        self.motion_lib = MotionLib(files)

        self.num_actions = nj
        self.num_obs = NUM_AMP_OBS_PER_STEP  # 105
        self.num_amp_obs = 2 * NUM_AMP_OBS_PER_STEP
        self.num_teacher_obs = 0
        self.obs_slices = {"obs": (0, self.num_obs)}

    # -- kinematic helpers ---------------------------------------------------

    def _root_state(self, phys):
        qd = phys.robot.qd
        bq, bp = phys.robot.base_quat, phys.robot.base_pos
        w = qd[:, 3:6]
        v = qd[:, 0:3] + jnp.cross(w, bp)
        return bp, bq, v, w

    def _key_pos(self, phys):
        m = self.scene.model
        fk = forward_kinematics(
            m, phys.robot.q, phys.robot.base_quat, phys.robot.base_pos
        )
        sq, sp = site_poses(
            fk, self.key_bodies, self.key_site_pos, self.key_site_quat,
            base_quat=phys.robot.base_quat, base_pos=phys.robot.base_pos,
        )
        return sp, fk  # [B, 4, 3]

    def _amp_features(self, phys):
        bp, bq, v, w = self._root_state(phys)
        key_pos, _ = self._key_pos(phys)
        return build_amp_observations(
            bp, bq, v, w, phys.robot.q[:, 6:], phys.robot.qd[:, 6:], key_pos
        )

    # -- reference state init ------------------------------------------------

    def _rsi(self, key, B):
        """Random Reference State Init from the motion library."""
        k1, k2 = jax.random.split(key)
        ids = self.motion_lib.sample_motions(k1, B)
        times = self.motion_lib.sample_time(k2, ids)
        s = self.motion_lib.get_state(ids, times)
        phys = initial_state(
            self.scene, B,
            base_pos0=s["root_pos"],
            base_quat0=s["root_rot"],
        )
        q = phys.robot.q.at[:, 6:].set(s["dof_pos"])
        # origin-Plücker base velocity rows: v_origin = v_root - w x p
        v_o = s["root_vel"] - jnp.cross(s["root_ang_vel"], s["root_pos"])
        qd = phys.robot.qd.at[:, 0:3].set(v_o)
        qd = qd.at[:, 3:6].set(s["root_ang_vel"])
        qd = qd.at[:, 6:].set(s["dof_vel"])
        return phys._replace(
            robot=phys.robot._replace(q=q, qd=qd, targets=q)
        )

    def _fresh(self, key, B) -> HAState:
        k_rsi, k_next = jax.random.split(key)
        phys = self._rsi(k_rsi, B)
        amp = self._amp_features(phys)
        return HAState(
            physics=phys,
            progress=jnp.zeros(B, jnp.int32),
            amp_window=jnp.stack([amp, amp], axis=1),
            key=k_next,
        )

    def reset(self, key):
        s = self._fresh(key, self.cfg.num_envs)
        k_prog = jax.random.fold_in(key, 29)
        s = s._replace(progress=jax.random.randint(
            k_prog, (self.cfg.num_envs,), 0, self.cfg.episode_length
        ))
        return s, self._obs(s)

    def _obs(self, s: HAState):
        return s.amp_window[:, 0]

    def amp_obs(self, s: HAState):
        """[B, 210] discriminator features (current + previous frame)."""
        B = s.amp_window.shape[0]
        return s.amp_window.reshape(B, -1)

    # -- step ------------------------------------------------------------------

    def step(self, state: HAState, actions):
        cfg = self.cfg
        B = actions.shape[0]
        actions = jnp.clip(actions, -1.0, 1.0)
        key, k_reset = jax.random.split(state.key)

        targets_j = self.pd_offset[None] + self.pd_scale[None] * actions
        phys = state.physics
        targets = phys.robot.targets.at[:, 6:].set(targets_j)
        phys = phys._replace(robot=phys.robot._replace(targets=targets))
        info_last = None
        for _ in range(cfg.control_freq_inv):
            phys, info_last = engine_step(self.scene, phys)

        progress = state.progress + 1
        amp_cur = self._amp_features(phys)
        window = jnp.stack([amp_cur, state.amp_window[:, 0]], axis=1)

        reward = jnp.ones(B)

        # early termination: a non-foot body in contact AND below height
        m = self.scene.model
        fk = forward_kinematics(
            m, phys.robot.q, phys.robot.base_quat, phys.robot.base_pos
        )
        body_z = fk.body_pos[:, self.fall_bodies, 2]
        contact_f = jnp.linalg.norm(
            info_last.body_contact_force[:, self.fall_bodies], axis=-1
        )
        fallen = jnp.any(
            (contact_f > 0.1) & (body_z < cfg.termination_height), axis=-1
        )
        fallen = fallen & (progress > 1)
        if not cfg.enable_early_termination:
            fallen = jnp.zeros_like(fallen)
        finite = (
            jnp.all(jnp.isfinite(phys.robot.q), axis=-1)
            & jnp.all(jnp.isfinite(phys.robot.qd), axis=-1)
        )
        done = fallen | (progress >= cfg.episode_length) | ~finite
        reward = jnp.where(finite, reward, 0.0)

        mid = HAState(
            physics=phys, progress=progress, amp_window=window, key=key
        )
        fresh = self._fresh(k_reset, B)
        new_state = jax.tree_util.tree_map(
            lambda f, c: (
                jnp.where(done.reshape((B,) + (1,) * (c.ndim - 1)), f, c)
                if c.ndim and c.shape[0] == B
                else c
            ),
            fresh._replace(key=None),
            mid._replace(key=None),
        )._replace(key=key)
        obs = self._obs(new_state)
        obs = jnp.where(jnp.isfinite(obs), obs, 0.0)
        return new_state, HAStepResult(
            obs=obs,
            reward=reward,
            done=done,
            info={
                "amp_obs": self.amp_obs(new_state),
                "fallen_frac": jnp.mean(fallen.astype(jnp.float32)),
            },
            teacher_obs=jnp.zeros((B, 0), obs.dtype),
        )


def make_humanoid_amp(num_envs=256, episode_length=300, **kw):
    return HumanoidAMPEnv(HumanoidAMPConfig(
        num_envs=num_envs, episode_length=episode_length, **kw
    ))
