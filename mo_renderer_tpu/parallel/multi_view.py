"""Multi-view rendering over a TPU device mesh (data-parallel over cameras).

The reference is single-device by design (SURVEY.md §2.3); the TPU-native
scale-out axis is *views*: a batch of cameras rendered in parallel across
chips (BASELINE.json configs[4], "8 cameras across TPU cores").  The scene
(vertex soup, textures, materials, lights — scene/scene_buffers.py) and IBL
maps are replicated; per-camera frame params are sharded over the ``views``
mesh axis, and each device runs the exact same single-view frame program
(passes/frame_graph.py:frame_program) for its local views.  The output
image stack is assembled by XLA across ICI — no explicit collectives are
needed beyond shard_map's output layout.
"""

from __future__ import annotations

import functools
import logging

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import EngineConfig
from ..passes.frame_graph import (
    Renderer,
    build_camera_params,
    frame_program,
)
from ..scene.scene_buffers import find_shadow_light

logger = logging.getLogger("mo_renderer_tpu")


def make_view_mesh(devices=None, axis_name: str = "views") -> Mesh:
    """A 1-D device mesh over which camera views are data-parallel."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def stack_params(param_list: list) -> object:
    """Stack per-view CameraParams into one with a leading (V, ...) axis."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *param_list)


class MultiViewRenderer:
    """Renders a batch of cameras in one sharded XLA program.

    Scene preparation matches the single-view ``Renderer`` (it reuses its
    ``prepare``); only the frame function differs: it takes stacked params
    with a leading view axis laid out over the mesh's ``views`` axis.
    """

    def __init__(self, config: EngineConfig, mesh: Mesh | None = None):
        self.config = config
        self.mesh = mesh if mesh is not None else make_view_mesh()
        self.axis = self.mesh.axis_names[0]
        self._inner = Renderer(config)
        self._frame_fn = None

    @property
    def scene(self):
        return self._inner.scene

    @property
    def ibl(self):
        return self._inner.ibl

    def prepare(self, world) -> None:
        self._inner.prepare(world)
        self._prepared_at = self._inner._prepare_count
        self._frame_fn = self._build_frame_fn()
        logger.info(
            "multi-view renderer: mesh %s over %d devices",
            dict(zip(self.mesh.axis_names, self.mesh.devices.shape)),
            self.mesh.devices.size,
        )

    def _sync_topology(self, world) -> None:
        """Mirror Renderer._sync_topology for the sharded program: apply
        spawn/despawn incrementally (content-only — the sharded jit keeps
        working), and rebuild the sharded frame fn iff the inner renderer
        fell back to a full prepare (its derived statics may change)."""
        self._inner._sync_topology(world)
        if self._inner._prepare_count != getattr(self, "_prepared_at", None):
            self._prepared_at = self._inner._prepare_count
            self._frame_fn = self._build_frame_fn()

    def _build_frame_fn(self):
        cfg = self.config
        inner = self._inner
        mesh, axis = self.mesh, self.axis
        n_dev = mesh.devices.size

        def shard_body(scene, ibl, params, shadow_quads, has_shadow_light):
            # Local leading dim = V // n_devices, static at trace time:
            # render each local view through the identical frame program.
            # The shadow map is view-independent: memoized once, shared.
            v_local = params["proj_view"].shape[0]
            frames, ovfs = [], []
            for i in range(v_local):
                rgba, ovf = frame_program(
                    scene, ibl,
                    {k: v[i] for k, v in params.items()},
                    cfg=cfg, pad_w=inner.pad_w, pad_h=inner.pad_h,
                    binned_cap=inner._binned_cap,
                    has_shadow_light=has_shadow_light,
                    fast_sampling=inner._fast,
                    slot_map=inner._slot_map,
                    shadow_quads=shadow_quads,
                    static_light_count=inner._n_lights,
                    with_overflow=True,
                )
                frames.append(rgba)
                ovfs.append(ovf)
            return jnp.stack(frames), jnp.stack(ovfs)

        @functools.partial(jax.jit, static_argnames=("has_shadow_light",))
        def frame(scene, ibl, params, shadow_quads, has_shadow_light):
            body = jax.shard_map(
                functools.partial(
                    shard_body, has_shadow_light=has_shadow_light
                ),
                mesh=mesh,
                in_specs=(P(), P(), P(axis), P()),
                out_specs=(P(axis), P(axis)),
                check_vma=False,
            )
            return body(scene, ibl, params, shadow_quads)

        @functools.partial(jax.jit, static_argnames=("has_shadow_light",))
        def sequence(scene, ibl, params_seq, shadow_quads, has_shadow_light):
            # K camera-path steps x V views in ONE dispatch: shard_map
            # over views, lax.scan over steps inside each shard.  The
            # per-dispatch floor and the per-step host work (K*V param
            # uploads, K schedule runs) amortize K-fold — the offline
            # camera-path shape of BASELINE configs[4] (the per-frame
            # interactive path stays render_views_device; a K-frame scan
            # LOSES there, NOTES_PERF.md).
            def shard_body(scene, ibl, pseq, shadow_quads):
                def step(ovf, p):
                    rgba, o = shard_frames(scene, ibl, p, shadow_quads)
                    return ovf + o.max(axis=0), rgba

                def shard_frames(scene, ibl, params, shadow_quads):
                    v_local = params["proj_view"].shape[0]
                    frames, ovfs = [], []
                    for i in range(v_local):
                        rgba, ovf = frame_program(
                            scene, ibl,
                            {k: v[i] for k, v in params.items()},
                            cfg=cfg, pad_w=inner.pad_w, pad_h=inner.pad_h,
                            binned_cap=inner._binned_cap,
                            has_shadow_light=has_shadow_light,
                            fast_sampling=inner._fast,
                            slot_map=inner._slot_map,
                            shadow_quads=shadow_quads,
                            static_light_count=inner._n_lights,
                            with_overflow=True,
                        )
                        frames.append(rgba)
                        ovfs.append(ovf)
                    return jnp.stack(frames), jnp.stack(ovfs)

                ovf, frames = jax.lax.scan(
                    step, jnp.zeros((2,), jnp.int32), pseq
                )
                # (K, v_local, H, W), (1, 2) per-shard overflow
                return frames, ovf[None]

            body = jax.shard_map(
                shard_body,
                mesh=mesh,
                in_specs=(P(), P(), P(None, axis), P()),
                out_specs=(P(None, axis), P(axis)),
                check_vma=False,
            )
            return body(scene, ibl, params_seq, shadow_quads)

        self._sequence_fn = sequence
        self._n_dev = n_dev
        return frame

    def render_views_device(self, cameras, world):
        """Render one frame per camera, leaving the result ON DEVICE.

        Returns the sharded (V_pad, H, W) packed-rgba8 uint32 stack
        (V_pad = len(cameras) rounded up to a mesh multiple; extra views
        repeat the last camera) — the multi-chip analog of
        ``Renderer.render_device``.  Fetching frames to host rides a slow
        tunnel on some rigs (~160MB/s: 8 views at 4K = 264MB/step), so
        steady-state loops must stay device-side and sync on one scalar;
        use ``present.unpack_rgba8(np.asarray(...))`` only for frames you
        actually need on host.
        """
        if self._frame_fn is None:
            self.prepare(world)
        from ..scene.scene_buffers import refresh_transforms

        self._sync_topology(world)
        self._inner.scene = refresh_transforms(self._inner.scene)
        light_pv, has_light = find_shadow_light(world)
        n_dev = self.mesh.devices.size
        v = len(cameras)
        v_pad = ((v + n_dev - 1) // n_dev) * n_dev
        dicts = [build_camera_params(c, light_pv) for c in cameras]
        dicts += [dicts[-1]] * (v_pad - v)  # pad to a multiple of the mesh
        params = stack_params(dicts)
        params = jax.device_put(
            params, NamedSharding(self.mesh, P(self.axis))
        )
        ibl_maps = self.ibl.maps() if self.ibl is not None else None
        quads = self._inner._cached_shadow_quads(light_pv, has_light)
        frames, overflow = self._frame_fn(
            self.scene, ibl_maps, params, quads, has_shadow_light=has_light
        )
        self._inner._note_overflow(overflow.max(axis=0))
        return frames

    def render_view_sequence_device(self, camera_steps, world):
        """K camera-path steps x V views in ONE dispatch, left on device
        as a (K, V_pad, H, W) packed-rgba8 uint32 stack — the offline
        camera-path analog of ``Renderer.render_sequence_device``
        composed with view data-parallelism (BASELINE configs[4]'s
        120-frame path).  The per-dispatch floor and per-step host work
        amortize over K; the scene is frame-invariant within the
        sequence (lights may move per step via each step's params).

        camera_steps: list over steps; each entry a list of per-view
        ``CameraParams`` (``build_camera_params``), all the same length.
        """
        if self._frame_fn is None:
            self.prepare(world)
        from ..scene.scene_buffers import refresh_transforms

        self._sync_topology(world)
        self._inner.scene = refresh_transforms(self._inner.scene)
        light_pv, has_light = find_shadow_light(world)
        n_dev = self.mesh.devices.size
        v = len(camera_steps[0])
        v_pad = ((v + n_dev - 1) // n_dev) * n_dev
        per_step = []
        for step in camera_steps:
            assert len(step) == v, "ragged camera_steps"
            per_step.append(stack_params(list(step) + [step[-1]] * (v_pad - v)))
        seq = jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs), *per_step
        )  # leaves (K, V_pad, ...)
        seq = jax.device_put(
            seq, NamedSharding(self.mesh, P(None, self.axis))
        )
        ibl_maps = self.ibl.maps() if self.ibl is not None else None
        # memoized shadow map only when the light matrix is identical
        # across EVERY step and view (each step's params carry their own
        # light_proj_view — a per-step light must re-raster in-scan)
        lpv = np.asarray(light_pv, np.float32).reshape(-1)
        same_light = all(
            p.host is not None and np.array_equal(p.host[32:48], lpv)
            for step in camera_steps
            for p in step
        )
        quads = (
            self._inner._cached_shadow_quads(light_pv, has_light)
            if same_light
            else None
        )
        frames, overflow = self._sequence_fn(
            self.scene, ibl_maps, seq, quads, has_shadow_light=has_light
        )
        self._inner._note_overflow(overflow.max(axis=0))
        return frames

    def check_overflow(self) -> None:
        self._inner.check_overflow()

    def render_views(self, cameras, world) -> np.ndarray:
        """Render one frame per camera; returns (V, H, W, 4) uint8 on
        host (convenience path — see render_views_device for loops)."""
        frames = self.render_views_device(cameras, world)
        from ..passes.present import unpack_rgba8

        out = unpack_rgba8(np.asarray(frames)[: len(cameras)])
        self.check_overflow()
        return out
