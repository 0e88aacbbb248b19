"""Genesis: drop-initialized object pose pools.

The reference's first-reset object-drop initialization (isaacgymenvs/tasks/
hand_arm/task/multi_object_manipulation.py:93-156: drop each object from a
randomized pose, simulate, re-drop until in the bin, settle until
linvel < 0.01, snapshot pools) is a variable-length host loop around
gym.simulate. TPU-native redesign: a separate bounded "genesis" jit — drop
via a fixed-length scan, settle via a bounded lax.while_loop with an
all-envs-settled early exit — producing pose pools that the hot step's fused
auto-reset merely gathers from (SURVEY.md §7 hard part 3).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from handarm_tpu.math.quat import quat_from_axis_angle, quat_mul
from handarm_tpu.physics.engine import ObjectState, PhysicsState, RobotState, step as physics_step


class InitialPool(NamedTuple):
    """Settled object configurations: [num_configs, B, K, ...]."""

    pos: jnp.ndarray
    quat: jnp.ndarray


def _sample_drop_poses(env, key):
    cfg = env.cfg
    B = cfg.num_envs
    K = env.cfg_num_objects
    k_pos, k_yaw = jax.random.split(key)
    drop = jnp.asarray(cfg.drop_pos, jnp.float32)
    noise = jax.random.uniform(k_pos, (B, K, 3), minval=-1.0, maxval=1.0) * jnp.asarray(
        cfg.drop_noise, jnp.float32
    )
    pos = drop[None, None] + noise
    # stagger drop heights so objects don't start interpenetrating
    stagger = jnp.arange(K, dtype=jnp.float32) * (
        2.5 * jnp.max(env.scene.shapes.bound_radius) + 0.02
    )
    pos = pos.at[..., 2].add(stagger[None])
    yaw = jax.random.uniform(k_yaw, (B, K), minval=-np.pi, maxval=np.pi)
    axis = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (B, K, 3))
    quat = quat_from_axis_angle(axis, yaw)
    return pos, quat


def objects_in_bin(env, pos: jnp.ndarray) -> jnp.ndarray:
    """AABB containment test against the bin extent (reference
    env/multi_object.py:705-719; the no_bin default extent is +/-0.25
    around the bin center, table..+0.2 high, :422-423)."""
    cfg = env.cfg
    cx, cy = cfg.bin_center if cfg.bin_center else cfg.drop_pos[:2]
    e = cfg.bin_half_extent if cfg.use_bin else 0.25
    zh = cfg.bin_wall_height if cfg.use_bin else 0.2
    lo = jnp.asarray([cx - e, cy - e, cfg.table_height - 0.01], jnp.float32)
    hi = jnp.asarray([cx + e, cy + e, cfg.table_height + zh], jnp.float32)
    return jnp.all((pos >= lo) & (pos <= hi), axis=-1)


def _sim_chunk_fn(env, chunk: int):
    """Jitted fixed-length sim burst returning (state, max object speed).

    Genesis runs as a HOST loop over these bounded dispatches instead of
    one giant drop+settle program: a single device execution covering
    3 x (100-step drop + <=600-step settle) at fleet batch is minutes of
    unbroken device time, which the remote TPU tunnel kills (observed:
    deterministic worker 'kernel fault' at B=8192/C=372, while the same
    physics in shorter dispatches runs clean). Bounded chunks also give
    early-exit settling its reference semantics at zero recompile cost."""

    def run(state):
        def sim_body(s, _):
            s, _ = physics_step(env.scene, s)
            return s, None

        state, _ = jax.lax.scan(sim_body, state, None, length=chunk)
        speed = jnp.max(jnp.linalg.norm(state.objects.linvel, axis=-1))
        return state, speed

    return jax.jit(run)


def _drop_once(env, key, drop_steps: int, settle_steps: int,
               pos0=None, quat0=None, keep=None, sim_chunk=None,
               chunk: int = 50):
    """Drop objects from staggered randomized poses and settle.

    With `keep` [B, K] given, kept objects start from (pos0, quat0)
    instead of a fresh drop pose (the re-drop path: only out-of-bin
    objects fall again). Returns settled (pos [B, K, 3], quat [B, K, 4])."""
    cfg = env.cfg
    B = cfg.num_envs
    K = env.cfg_num_objects
    pos, quat = _sample_drop_poses(env, key)
    if keep is not None:
        pos = jnp.where(keep[..., None], pos0, pos)
        quat = jnp.where(keep[..., None], quat0, quat)

    # robot parked in the bringup pose well above the table
    q0 = jnp.broadcast_to(
        jnp.asarray(env.robot.bringup_q, jnp.float32), (B, env.art.nv)
    )
    state = PhysicsState(
        robot=RobotState(q=q0, qd=jnp.zeros_like(q0), targets=q0),
        objects=ObjectState(
            pos=pos,
            quat=quat,
            linvel=jnp.zeros((B, K, 3), jnp.float32),
            angvel=jnp.zeros((B, K, 3), jnp.float32),
        ),
        contact_impulse=jnp.zeros((B, env.scene.slots.num_slots, 3), jnp.float32),
    )

    if sim_chunk is None:
        sim_chunk = _sim_chunk_fn(env, chunk)

    # drop phase: fixed number of steps in bounded bursts. Step counts are
    # rounded UP to a multiple of `chunk` (a drop_steps=40 request simulates
    # 50) and the settle early-exit is evaluated once per chunk rather than
    # per step — deliberately coarser than the reference's per-step loop:
    # genesis only needs "objects at rest in the bin", and extra settle
    # steps on an already-quiet pile are a no-op, while per-step host
    # round-trips through the TPU tunnel are not.
    for _ in range(-(-drop_steps // chunk)):
        state, _ = sim_chunk(state)

    # settle: host loop with all-settled early exit
    # (reference: <=600 steps until linvel < 0.01)
    for _ in range(-(-settle_steps // chunk)):
        state, speed = sim_chunk(state)
        if float(speed) <= 0.01:
            break
    return state.objects.pos, state.objects.quat


def build_initial_pool(
    env,
    key,
    num_configurations: int = 1,
    drop_steps: int = 100,
    settle_steps: int = 600,
) -> InitialPool:
    """Generate `num_configurations` settled configurations per env.

    Out-of-workspace objects (fell off the table / out of the bin) are
    re-placed at the spawn surface — the analog of the reference's re-drop
    loop, bounded for jit."""
    cfg = env.cfg
    ws_lo = jnp.asarray(cfg.workspace_lo, jnp.float32)
    ws_hi = jnp.asarray(cfg.workspace_hi, jnp.float32)
    sim_chunk = _sim_chunk_fn(env, 50)

    def one_config(key):
        pos, quat = _drop_once(
            env, key, drop_steps, settle_steps, sim_chunk=sim_chunk
        )
        # re-drop objects that settled outside the bin, keeping the good
        # ones in place (reference re-drop-until-in-bin loop,
        # multi_object_manipulation.py:93-156), bounded host loop
        for attempt in range(2):
            good = objects_in_bin(env, pos)
            key = jax.random.fold_in(key, attempt + 2)
            pos, quat = _drop_once(
                env, key, drop_steps, settle_steps,
                pos0=pos, quat0=quat, keep=good, sim_chunk=sim_chunk,
            )
        # final fallback: anything still outside the workspace gets placed
        # flat at a spawn pose
        bad = jnp.any(
            (pos < ws_lo[None, None] - 0.05) | (pos > ws_hi[None, None] + 0.05),
            axis=-1,
        )  # [B, K]
        fallback_pos, fallback_quat = env._sample_object_poses(
            jax.random.fold_in(key, 1), cfg.num_envs
        )
        pos = jnp.where(bad[..., None], fallback_pos, pos)
        quat = jnp.where(bad[..., None], fallback_quat, quat)
        return pos, quat

    configs = [one_config(k) for k in jax.random.split(key, num_configurations)]
    pos = jnp.stack([c[0] for c in configs])
    quat = jnp.stack([c[1] for c in configs])
    return InitialPool(pos=pos, quat=quat)
