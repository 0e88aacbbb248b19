"""ops/prep_deff.py: the fused robot effective-mass kernel matches the
direct v^T Minv v formula element-wise, and the solver's kernel-gated
prep path ('pallas', interpreted on CPU) matches the XLA path."""

import numpy as np

import jax
import jax.numpy as jnp

from handarm_tpu.ops.prep_deff import robot_deff


def _reference(screws, pos, basis, anc, minv2):
    # dense [B, C, nv, 3(dir)] construction, the solver._prepare XLA path
    _, B, nv = screws.shape
    C = pos.shape[2]
    sa = jnp.moveaxis(screws[:3], 0, -1)  # [B, nv, 3]
    sl = jnp.moveaxis(screws[3:], 0, -1)
    p = jnp.moveaxis(pos, 0, -1)  # [B, C, 3]
    w = jnp.moveaxis(basis.reshape(3, 3, B, C), (0, 1), (2, 3))  # [B,C,3d,3]
    arm = (
        jnp.cross(sa[:, None], p[:, :, None]) + sl[:, None]
    ) * anc[None, :, :, None]  # [B, C, nv, 3]
    v = jnp.einsum("bcux,bcdx->bcud", arm, w)  # [B, C, nv, 3(dir)]
    Minv = minv2.reshape(B, nv, nv)
    return jnp.moveaxis(
        jnp.einsum("bcud,buw,bcwd->bcd", v, Minv, v), -1, 0
    )  # [3, B, C]


def test_robot_deff_matches_dense_formula():
    B, C, nv = 8, 40, 9
    k = jax.random.PRNGKey(0)
    ks = jax.random.split(k, 5)
    screws = jax.random.normal(ks[0], (6, B, nv))
    pos = jax.random.normal(ks[1], (3, B, C))
    # three orthonormal-ish directions per slot (exactness not required)
    basis = jax.random.normal(ks[2], (9, B, C))
    anc = (jax.random.uniform(ks[3], (C, nv)) > 0.4).astype(jnp.float32)
    # SPD Minv per env
    A = jax.random.normal(ks[4], (B, nv, nv))
    Minv = A @ jnp.swapaxes(A, 1, 2) + 3.0 * jnp.eye(nv)
    minv2 = Minv.reshape(B, nv * nv)

    got = robot_deff(screws, pos, basis, anc, minv2, interpret=True)
    want = _reference(screws, pos, basis, anc, minv2)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4
    )


def test_prepare_kernel_path_matches_xla_path():
    """End-to-end through solver._prepare on a real scene: jacobi_impl
    'pallas' (kernel prep, interpreted) vs 'pallas_off' (XLA prep)."""
    from handarm_tpu.envs.hand_arm import HandArmConfig, HandArmEnv

    env = HandArmEnv(
        HandArmConfig(num_envs=4, episode_length=8,
                      observations=("ur5_joint_pos",))
    )
    state, _ = jax.jit(env.reset)(jax.random.PRNGKey(0))
    a = 0.3 * jnp.ones((4, env.num_actions))

    def run(impl):
        sp = env.scene.params
        solver = sp.solver._replace(jacobi_impl=impl)
        scene = env.scene._replace(params=sp._replace(solver=solver))
        from handarm_tpu.physics.engine import step as engine_step

        st = state.physics
        step = jax.jit(lambda s: engine_step(scene, s))
        for _ in range(3):
            out = step(st)
            st = out[0] if isinstance(out, tuple) else out
        return st

    sa = run("pallas")
    sb = run("pallas_off")
    np.testing.assert_allclose(
        np.asarray(sa.robot.qd), np.asarray(sb.robot.qd), atol=5e-4
    )
    np.testing.assert_allclose(
        np.asarray(sa.objects.pos), np.asarray(sb.objects.pos), atol=1e-5
    )
