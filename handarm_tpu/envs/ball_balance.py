"""BallBalance: keep a ball centered on a tripod tray
(reference tasks/ball_balance.py + cfg/task/BallBalance.yaml + the
mjcf/balance_bot.xml asset).

Floating-base balance bot (free tray root + 3 two-segment legs standing on
the ground) with a free ball dropped onto the tray. Actions integrate the
3 LOWER leg joint position targets (dt * action_speed_scale); reward =
1/(1+|ball - (0,0,0.7)|) * 1/(1+|ball_vel|); reset when the ball falls
below 1.5 r."""

from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from handarm_tpu.physics.contacts import RobotSpheres, StaticGeom
from handarm_tpu.physics.engine import (
    SimParams,
    build_scene,
    initial_state,
    step as engine_step,
)
from handarm_tpu.physics.model import compile_model
from handarm_tpu.physics.mjcf import parse_mjcf
from handarm_tpu.physics.shapes import make_sphere_object, stack_objects
from handarm_tpu.physics.solver import SolverParams
from handarm_tpu.math.quat import quat_to_matrix

BBOT_MJCF = "/root/reference/assets/mjcf/balance_bot.xml"
BALL_RADIUS = 0.1
BALL_MASS = 200.0 * 4.0 / 3.0 * np.pi * BALL_RADIUS**3  # density 200


@dataclass(frozen=True)
class BallBalanceConfig:
    num_envs: int = 256
    episode_length: int = 500
    dt: float = 1.0 / 60.0
    substeps: int = 2
    action_speed_scale: float = 20.0  # yaml actionSpeedScale
    tray_height: float = 0.559117


class BBotState(NamedTuple):
    physics: object
    targets: jnp.ndarray
    progress: jnp.ndarray
    actions: jnp.ndarray
    key: jnp.ndarray


class BBotStepResult(NamedTuple):
    obs: jnp.ndarray
    reward: jnp.ndarray
    done: jnp.ndarray
    info: dict
    teacher_obs: jnp.ndarray


class BallBalanceEnv:
    def __init__(self, cfg: BallBalanceConfig = BallBalanceConfig()):
        self.cfg = cfg
        urdf, extras = parse_mjcf(BBOT_MJCF)
        art = compile_model(urdf, floating_base=True, default_density=1000.0)
        self.art = art

        # collision spheres from the mjcf cylinder geoms
        bodies, offs, rads = [], [], []
        for bname, sph in extras.link_spheres.items():
            site = art.sites[bname]
            if site.body < 0:
                continue
            Rl = np.asarray(quat_to_matrix(jnp.asarray(site.quat)))
            for pos, r in sph:
                bodies.append(site.body)
                offs.append(Rl @ np.asarray(pos) + site.pos)
                rads.append(r)
        spheres = RobotSpheres(
            body=np.asarray(bodies, np.int32),
            offset=jnp.asarray(np.asarray(offs), jnp.float32),
            radius=jnp.asarray(np.asarray(rads), jnp.float32),
            friction=jnp.asarray(np.full(len(rads), 1.0), jnp.float32),
        )
        ball = make_sphere_object(BALL_RADIUS, mass=float(BALL_MASS))
        shapes = stack_objects([ball])
        geom = StaticGeom(
            table_lo=jnp.asarray([-1e4, -1e4]),
            table_hi=jnp.asarray([1e4, 1e4]),
            table_height=jnp.asarray(0.0),
            friction=jnp.asarray(1.0),
        )
        nv = art.nv
        kp = np.zeros(nv)
        kd = np.zeros(nv)
        kp[6:] = 100.0  # position-drive legs (reference DOF_MODE_POS)
        kd[6:] = 10.0
        self.scene = build_scene(
            art, shapes, spheres, geom,
            kp=kp, kd=kd,
            params=SimParams(
                dt=cfg.dt, substeps=cfg.substeps,
                solver=SolverParams(iterations=8, rolling_friction=0.002),
            ),
        )
        names = art.joint_names[6:]
        self.actuated = np.array(
            [6 + i for i, n in enumerate(names) if "lower" in n], np.int32
        )
        assert len(self.actuated) == 3, names
        self.q_lo = jnp.asarray(art.q_min, jnp.float32)
        self.q_hi = jnp.asarray(art.q_max, jnp.float32)
        self.tray_body = art.sites["tray"].body
        # the three leg attachment points on the tray (sensor poses)
        self.attach = jnp.asarray(
            [[0.272721, 0.0, -0.1], [-0.13636, 0.236183, -0.1],
             [-0.13636, -0.236183, -0.1]], jnp.float32,
        )

        self.num_actions = 3
        self.num_obs = 24
        self.num_teacher_obs = 0
        self.obs_slices = {"obs": (0, self.num_obs)}

    def _fresh(self, key, B) -> BBotState:
        cfg = self.cfg
        k_pos, k_h, k_v, k_next = jax.random.split(key, 4)
        phys = initial_state(
            self.scene, B,
            base_pos0=jnp.asarray([0.0, 0.0, cfg.tray_height]),
        )
        # ball spawn: radius<0.15 disc above the tray with inward speed
        # (reference reset_idx:370-393)
        ang = jax.random.uniform(k_pos, (B,), minval=0.0, maxval=2 * np.pi)
        r = jax.random.uniform(k_pos, (B,), minval=0.0, maxval=0.15)
        h = jax.random.uniform(k_h, (B,), minval=1.0, maxval=2.0)
        pos = jnp.stack([r * jnp.cos(ang), r * jnp.sin(ang), h], -1)
        hs = jax.random.uniform(k_v, (B,), minval=0.0, maxval=2.0)
        vel = jnp.stack(
            [-r / 0.15 * hs * jnp.cos(ang), -r / 0.15 * hs * jnp.sin(ang),
             jnp.full((B,), -5.0)], -1,
        )
        obj = phys.objects._replace(
            pos=pos[:, None], linvel=vel[:, None]
        )
        phys = phys._replace(objects=obj)
        return BBotState(
            physics=phys,
            targets=jnp.zeros((B, self.art.nv)),
            progress=jnp.zeros(B, jnp.int32),
            actions=jnp.zeros((B, 3)),
            key=k_next,
        )

    def reset(self, key):
        s = self._fresh(key, self.cfg.num_envs)
        return s, self._obs(s, None)

    def _obs(self, s: BBotState, info):
        phys = s.physics
        q, qd = phys.robot.q, phys.robot.qd
        ball_p = phys.objects.pos[:, 0]
        ball_v = phys.objects.linvel[:, 0]
        # tray force sensor approximation: net contact force on the tray
        # body, torques = r_i x F at the three leg attachment points
        if info is not None:
            F = info.body_contact_force[:, self.tray_body]
        else:
            F = jnp.zeros_like(ball_p)
        torques = jnp.cross(
            jnp.broadcast_to(self.attach[None], (q.shape[0], 3, 3)),
            F[:, None, :],
        )
        return jnp.concatenate(
            [
                q[:, self.actuated],
                qd[:, self.actuated],
                ball_p,
                ball_v,
                F / 20.0,
                (torques / 20.0).reshape(q.shape[0], 9),
            ],
            axis=-1,
        )

    def step(self, state: BBotState, actions):
        cfg = self.cfg
        B = actions.shape[0]
        actions = jnp.clip(actions, -1.0, 1.0)
        key, k_reset = jax.random.split(state.key)

        # dt-integrated targets on the 3 lower-leg dofs (ball_balance.py:
        # 414-421)
        targets = state.targets.at[:, self.actuated].add(
            cfg.dt * cfg.action_speed_scale * actions
        )
        targets = jnp.clip(targets, self.q_lo[None], self.q_hi[None])
        phys = state.physics._replace(
            robot=state.physics.robot._replace(targets=targets)
        )
        phys, info = engine_step(self.scene, phys)

        progress = state.progress + 1
        ball_p = phys.objects.pos[:, 0]
        ball_v = phys.objects.linvel[:, 0]
        ball_dist = jnp.sqrt(
            ball_p[:, 0] ** 2 + (ball_p[:, 2] - 0.7) ** 2 + ball_p[:, 1] ** 2
        )
        ball_speed = jnp.linalg.norm(ball_v, axis=-1)
        reward = 1.0 / (1.0 + ball_dist) / (1.0 + ball_speed)

        finite = jnp.all(jnp.isfinite(ball_p), axis=-1) & jnp.all(
            jnp.isfinite(phys.robot.q), axis=-1
        )
        done = (
            (ball_p[:, 2] < BALL_RADIUS * 1.5)
            | (progress >= cfg.episode_length)
            | ~finite
        )
        reward = jnp.where(jnp.isfinite(reward), reward, 0.0)

        mid = BBotState(
            physics=phys, targets=targets, progress=progress,
            actions=actions, key=key,
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
        obs = self._obs(new_state, info)
        obs = jnp.where(jnp.isfinite(obs), obs, 0.0)
        return new_state, BBotStepResult(
            obs=obs,
            reward=reward,
            done=done,
            info={"ball_dist": jnp.mean(ball_dist)},
            teacher_obs=jnp.zeros((B, 0), obs.dtype),
        )


def make_ball_balance(num_envs=256, episode_length=500, **kw) -> BallBalanceEnv:
    return BallBalanceEnv(BallBalanceConfig(
        num_envs=num_envs, episode_length=episode_length, **kw
    ))
