"""Offline debug visualization (matplotlib; no Vulkan viewer on TPU pods).

Replaces the reference's viewer wireframes + cv2 windows (isaacgymenvs/
tasks/hand_arm/utils/visualization.py, observable_vec_task.py:213-274 mp4
recorder): renders env states to PNG frames / MP4 from the host, using the
same scene description the physics runs on (robot collision spheres, object
shapes, table, pointclouds, goals).
"""

from __future__ import annotations

import os

import numpy as np


_BOX_EDGES = [
    (0, 1), (0, 2), (0, 4), (1, 3), (1, 5), (2, 3),
    (2, 6), (3, 7), (4, 5), (4, 6), (5, 7), (6, 7),
]


def _draw_box(ax, pos, quat, half, color):
    """Wireframe of an oriented box (pos/quat world pose, half-extents)."""
    from handarm_tpu.math.quat import quat_rotate
    import jax.numpy as jnp

    signs = np.array(
        [[sx, sy, sz] for sx in (-1, 1) for sy in (-1, 1) for sz in (-1, 1)],
        np.float32,
    )
    corners = np.asarray(
        quat_rotate(jnp.asarray(quat)[None], jnp.asarray(signs * half[None]))
    ) + pos[None]
    for a, b in _BOX_EDGES:
        ax.plot(*zip(corners[a], corners[b]), c=color, lw=1.0)


def _scene_artists(ax, env, state, env_idx: int, scale: float = 1.0):
    import jax.numpy as jnp

    from handarm_tpu.physics.kinematics import forward_kinematics, site_poses

    scene = env.scene
    # table
    lo, hi = np.asarray(scene.geom.table_lo), np.asarray(scene.geom.table_hi)
    th = float(scene.geom.table_height)
    xs = [lo[0], hi[0], hi[0], lo[0], lo[0]]
    ys = [lo[1], lo[1], hi[1], hi[1], lo[1]]
    ax.plot(xs, ys, [th] * 5, "k-", lw=0.5)

    fk = forward_kinematics(
        scene.model,
        state.physics.robot.q[env_idx : env_idx + 1],
        scene.base_quat[None],
        scene.base_pos[None],
    )
    from handarm_tpu.math.quat import quat_rotate

    centers = fk.body_pos[:, scene.spheres.body] + quat_rotate(
        fk.body_quat[:, scene.spheres.body], scene.spheres.offset[None]
    )
    c = np.asarray(centers[0])
    r = np.asarray(scene.spheres.radius)
    ax.scatter(c[:, 0], c[:, 1], c[:, 2], s=(r * 300 * scale) ** 2,
               c="tab:blue", alpha=0.4, label="robot")
    # fingertip sites (if the env exposes them)
    sites = getattr(env, "fingertip_sites", None)
    if sites is not None:
        _, tp = site_poses(fk, *sites, base_quat=scene.base_quat[None],
                           base_pos=scene.base_pos[None])
        tp = np.asarray(tp[0])
        ax.scatter(tp[:, 0], tp[:, 1], tp[:, 2], s=25 * scale**2, c="tab:red",
                   marker="^", label="tips")

    op = np.asarray(state.physics.objects.pos[env_idx])
    oq = np.asarray(state.physics.objects.quat[env_idx])
    size = np.asarray(scene.shapes.size)
    kind = np.asarray(scene.shapes.kind)
    tgt = int(np.asarray(state.task.target_obj[env_idx]))
    for k in range(op.shape[0]):
        col = "tab:green" if k == tgt else "tab:orange"
        ax.scatter(*op[k], s=40, c=col, marker="s")
        if kind[k] in (0, 3):  # box-like (box / mesh OBB): draw wireframe
            _draw_box(ax, op[k], oq[k], size[k], col)
    gp = np.asarray(state.task.goal_pos[env_idx])
    ax.scatter(*gp, s=150, c="tab:red", marker="*", label="goal")


def render_state(env, state, env_idx: int = 0, path: str | None = None,
                 elev: float = 25, azim: float = -60,
                 center=None, extent: float | None = None):
    """Render one env's state to a matplotlib 3D figure (returns the figure,
    optionally saves a PNG). center/extent zoom the view to center±extent
    (center may be "object" to track the target object)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig = plt.figure(figsize=(6, 5))
    ax = fig.add_subplot(111, projection="3d")
    if center is not None and isinstance(center, str) and center == "object":
        tgt = int(np.asarray(state.task.target_obj[env_idx]))
        center = np.asarray(state.physics.objects.pos[env_idx, tgt])
    scale = 1.0 if extent is None else min(3.0, 0.45 / extent)
    _scene_artists(ax, env, state, env_idx, scale=scale)
    if center is None:
        ax.set_xlim(-0.3, 0.9)
        ax.set_ylim(0.0, 1.2)
        ax.set_zlim(0.0, 1.2)
    else:
        e = extent or 0.25
        ax.set_xlim(center[0] - e, center[0] + e)
        ax.set_ylim(center[1] - e, center[1] + e)
        ax.set_zlim(center[2] - e, center[2] + e)
    ax.view_init(elev=elev, azim=azim)
    ax.set_xlabel("x"); ax.set_ylabel("y"); ax.set_zlabel("z")
    if path:
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        fig.savefig(path, dpi=110)
    return fig


def render_pointcloud(cloud, path: str | None = None):
    """Scatter an [N, 4] semantic pointcloud (colors by PointType)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    cloud = np.asarray(cloud)
    valid = cloud[:, 3] > 0
    colors = {1.0: "tab:gray", 2.0: "tab:green", 3.0: "tab:red"}
    fig = plt.figure(figsize=(5, 5))
    ax = fig.add_subplot(111, projection="3d")
    for t, col in colors.items():
        sel = valid & (cloud[:, 3] == t)
        if sel.any():
            ax.scatter(cloud[sel, 0], cloud[sel, 1], cloud[sel, 2], s=4, c=col)
    if path:
        fig.savefig(path, dpi=110)
    return fig


class CameraRecorder:
    """Per-env MP4 capture from the camera observable pipeline — the
    counterpart of the reference's `_write_recordings`
    (observable_vec_task.py:223-274): buffers each recorded env's depth and
    segmentation frames from the point-rasterized camera sensors and, when
    that env's episode ends, writes
    `<out_dir>/{cam}_{type}_env_{i}_episode_{n}.mp4` (cv2; PNG-strip
    fallback) and clears the buffer.

    Intended for eval/replay env counts (it renders the full batch through
    the same `render_points` path the camera observables use, then selects
    `env_ids` host-side). Depth maps to grayscale over `depth_range` like
    the reference; segmentation ids map through a fixed color table.
    """

    def __init__(self, env, out_dir: str, env_ids=(0,),
                 depth_range: tuple = (0.0, 2.5)):
        import jax
        import jax.numpy as jnp

        cams = tuple(getattr(env.cfg, "cameras", ()) or ())
        if not cams:
            raise ValueError(
                "CameraRecorder needs an env built with cfg.cameras "
                "(yaml `cameras:` block)"
            )
        self.env = env
        self.cams = cams
        self.out_dir = out_dir
        self.env_ids = tuple(int(i) for i in env_ids)
        self.depth_range = depth_range
        self.episode_count = {i: 0 for i in self.env_ids}
        # frames[cam][type][env_id] -> list of HxWx3 uint8
        self.frames = {
            c.name: {t: {i: [] for i in self.env_ids}
                     for t in ("depth", "segmentation", "color")}
            for c in cams
        }

        def render_all(state):
            from handarm_tpu.envs.camera import render_points
            from handarm_tpu.envs.hand_arm import ObsContext

            ctx = ObsContext(env, state, None)
            pts, segs, _ = env._camera_scene_points(ctx)
            out = {}
            rgb = getattr(env, "scene_point_rgb", None)
            for cam in cams:
                r = render_points(cam, pts, segs.astype(jnp.int32),
                                  valid=segs, colors=rgb)
                out[cam.name] = (r.depth, r.segmentation, r.color)
            return out

        self._render = jax.jit(render_all)

    # fixed segmentation palette: 0 bg, 1 robot, 3+k objects
    _SEG_COLORS = np.array(
        [
            [0, 0, 0], [180, 180, 180], [80, 80, 80], [31, 119, 180],
            [255, 127, 14], [44, 160, 44], [214, 39, 40], [148, 103, 189],
            [140, 86, 75], [227, 119, 194], [127, 127, 127], [188, 189, 34],
        ],
        dtype=np.uint8,
    )

    def _depth_to_rgb(self, d: np.ndarray) -> np.ndarray:
        lo, hi = self.depth_range
        g = np.clip((d - lo) / (hi - lo), 0.0, 1.0)
        g8 = (g * 255).astype(np.uint8)
        return np.stack([g8] * 3, axis=-1)

    def _seg_to_rgb(self, s: np.ndarray) -> np.ndarray:
        return self._SEG_COLORS[np.clip(s, 0, len(self._SEG_COLORS) - 1)]

    def add(self, state, done=None) -> list[str]:
        """Append this step's camera frames for the recorded envs; flush an
        env's buffers to mp4 when `done[env]` is set. Returns paths written
        this call."""
        rendered = self._render(state)
        done_np = None if done is None else np.asarray(done)
        written: list[str] = []
        for cam in self.cams:
            depth, seg, color = rendered[cam.name]
            depth = np.asarray(depth)
            seg = np.asarray(seg)
            for i in self.env_ids:
                self.frames[cam.name]["depth"][i].append(
                    self._depth_to_rgb(depth[i])
                )
                self.frames[cam.name]["segmentation"][i].append(
                    self._seg_to_rgb(seg[i])
                )
                if color is not None:
                    self.frames[cam.name]["color"][i].append(
                        (np.asarray(color[i]) * 255).astype(np.uint8)
                    )
        if done_np is not None:
            for i in self.env_ids:
                if done_np[i]:
                    written.extend(self.flush(i))
        return written

    def flush(self, env_id: int) -> list[str]:
        """Write and clear env_id's buffered frames (one mp4 per
        camera x image type), named like the reference's recordings."""
        self.episode_count[env_id] += 1
        n = self.episode_count[env_id]
        fps = 1.0 / (self.env.cfg.dt * self.env.cfg.control_freq_inv)
        os.makedirs(self.out_dir, exist_ok=True)
        paths = []
        for cam in self.cams:
            for typ in ("depth", "segmentation", "color"):
                frames = self.frames[cam.name][typ][env_id]
                if not frames:
                    continue
                path = os.path.join(
                    self.out_dir,
                    f"{cam.name}_{typ}_env_{env_id}_episode_{n}.mp4",
                )
                _write_video(frames, path, fps)
                paths.append(path)
                self.frames[cam.name][typ][env_id] = []
        return paths


def _write_video(frames: list[np.ndarray], path: str, fps: float) -> None:
    try:
        import cv2

        h, w, _ = frames[0].shape
        vw = cv2.VideoWriter(
            path, cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h)
        )
        for f in frames:
            vw.write(cv2.cvtColor(f, cv2.COLOR_RGB2BGR))
        vw.release()
    except Exception:
        base = os.path.splitext(path)[0]
        import matplotlib.pyplot as plt  # noqa: F401

        for i, f in enumerate(frames):
            plt.imsave(f"{base}_{i:04d}.png", f)


class EpisodeRecorder:
    """Record per-step frames of one env and write an MP4 (cv2) or a PNG
    strip — the analog of the reference's camera mp4 recorder
    (observable_vec_task.py:223-274)."""

    def __init__(self, env, out_path: str, env_idx: int = 0, every: int = 1):
        self.env = env
        self.out_path = out_path
        self.env_idx = env_idx
        self.every = every
        self.frames: list[np.ndarray] = []
        self._i = 0

    def add(self, state):
        if self._i % self.every == 0:
            import matplotlib.pyplot as plt

            fig = render_state(self.env, state, self.env_idx)
            fig.canvas.draw()
            buf = np.asarray(fig.canvas.buffer_rgba())[..., :3]
            self.frames.append(buf.copy())
            plt.close(fig)
        self._i += 1

    def save(self, fps: int = 20) -> str:
        os.makedirs(os.path.dirname(self.out_path) or ".", exist_ok=True)
        try:
            import cv2

            h, w, _ = self.frames[0].shape
            vw = cv2.VideoWriter(
                self.out_path, cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h)
            )
            for f in self.frames:
                vw.write(cv2.cvtColor(f, cv2.COLOR_RGB2BGR))
            vw.release()
        except Exception:
            # PNG-strip fallback
            base = os.path.splitext(self.out_path)[0]
            for i, f in enumerate(self.frames):
                import matplotlib.pyplot as plt

                plt.imsave(f"{base}_{i:04d}.png", f)
        return self.out_path
