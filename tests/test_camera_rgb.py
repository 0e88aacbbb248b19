"""Color camera family: per-point albedo rendering with occlusion, texture
baking from YCB assets, and the env-level color observable (reference
ImageType.COLOR, tasks/hand_arm/utils/camera.py:17-40 + color refresh
:278-311)."""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from handarm_tpu.envs.camera import CameraConfig, render_points


def straight_cam(**kw):
    return CameraConfig(name="test", pos=(0.0, 0.0, 0.0),
                        quat=(1.0, 0.0, 0.0, 0.0), fovx_deg=90.0,
                        width=64, height=64, **kw)


def test_color_winner_takes_pixel():
    cam = straight_cam()
    # near red point occludes far green point at the image center; blue
    # point off-axis; background stays black
    pts = jnp.asarray([[[1.0, 0.0, 0.0], [2.0, 0.0, 0.0], [1.0, 0.5, 0.0]]])
    seg = jnp.asarray([3, 4, 5], jnp.int32)
    rgb = jnp.asarray([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]])
    r = render_points(cam, pts, seg, colors=rgb)
    img = np.asarray(r.color[0])
    assert img.shape == (64, 64, 3)
    np.testing.assert_allclose(img[32, 32], [1.0, 0.0, 0.0], atol=2 / 255)
    np.testing.assert_allclose(img[32, 16], [0.0, 0.0, 1.0], atol=2 / 255)
    np.testing.assert_allclose(img[0, 0], [0.0, 0.0, 0.0], atol=1e-6)


def test_color_channels_never_mix():
    cam = straight_cam()
    # two EXACTLY tied points at one pixel with complementary colors: the
    # packed-int scatter must yield one of the two, not a channel blend
    pts = jnp.asarray([[[1.0, 0.0, 0.0], [1.0, 0.0, 0.0]]])
    seg = jnp.asarray([3, 4], jnp.int32)
    rgb = jnp.asarray([[1.0, 0.0, 0.2], [0.0, 1.0, 0.8]])
    r = render_points(cam, pts, seg, colors=rgb)
    got = np.asarray(r.color[0, 32, 32])
    d0 = np.abs(got - np.asarray(rgb[0])).max()
    d1 = np.abs(got - np.asarray(rgb[1])).max()
    assert min(d0, d1) < 2 / 255, f"blended color {got}"


def test_no_colors_keeps_color_none():
    cam = straight_cam()
    pts = jnp.asarray([[[1.0, 0.0, 0.0]]])
    r = render_points(cam, pts, jnp.asarray([3], jnp.int32))
    assert r.color is None


YCB = "/root/reference/assets/hand_arm/object_sets/urdf/ycb"


@pytest.mark.skipif(not os.path.isdir(YCB), reason="reference assets absent")
def test_ycb_texture_bake_peach_is_warm():
    """015_peach ships its texture_map.png in the asset snapshot (several
    other YCB models' pngs are absent and fall back to the palette)."""
    from handarm_tpu.envs.objects import load_object

    rec = load_object(os.path.join(YCB, "015_peach.urdf"))
    rgb = rec["point_rgb"]
    assert rgb.shape[1] == 3
    assert (rgb >= 0).all() and (rgb <= 1).all()
    mean = rgb.mean(0)
    # a peach is warm-toned: red channel dominates blue on average
    assert mean[0] > mean[2] + 0.05, mean
    # not all samples identical (a real texture, not a flat fallback)
    assert rgb.std(0).max() > 0.05


def test_env_color_observable():
    """topview color image renders through the observable pipeline with a
    box object: some robot-gray pixels, some object-palette pixels."""
    import jax

    from handarm_tpu.envs.hand_arm import HandArmConfig, HandArmEnv

    cam = CameraConfig(name="topview", width=64, height=36)
    cfg = HandArmConfig(
        num_envs=2,
        episode_length=8,
        solver_iterations=2,
        cameras=(cam,),
        observations=("ur5_joint_pos", "topview_color"),
    )
    env = HandArmEnv(cfg)
    st, obs = env.reset(jax.random.PRNGKey(0))
    st2, res = env.step(st, jnp.zeros((2, env.num_actions)))
    img = res.obs_dict["topview_color"]
    assert img.shape == (2, 36, 64, 3)
    img0 = np.asarray(img[0])
    assert np.isfinite(img0).all()
    lit = img0.sum(-1) > 0
    assert lit.any(), "nothing rendered"
    # the box object's palette color (red-ish channel ordering) appears
    reds = img0[..., 0] > img0[..., 2] + 0.1
    assert (reds & lit).any()
