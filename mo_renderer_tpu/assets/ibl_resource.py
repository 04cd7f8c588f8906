"""IBLResource — environment lighting precompute driver
(mo_ecs/src/resource/ibl_resource.rs).

Loads ``resources/tex/env/{name}.hdr`` (ibl_resource.rs:41,68), then runs
the precompute chain on TPU: equirect -> cubemap, irradiance convolution,
GGX specular prefilter mips, BRDF LUT (ibl_resource.rs:86-88 dispatches).
Results are cached on disk (keyed by env file + parameters), so startup
after the first run skips the compute entirely — the reference re-runs its
blocking compute pipelines every launch.
"""

from __future__ import annotations

import dataclasses
import hashlib
import logging
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..device.sampling import MipCube
from ..kernels import ibl as ibl_kernels
from . import image_io

logger = logging.getLogger("mo_renderer_tpu")


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class IBLMaps:
    """Device-array pytree consumed by the shading pass.

    The quad/SH fields are gather-minimal derivations of the base maps
    (see device/sampling.py quad layouts): specular_quad does trilinear
    LOD in two gathers AND carries the environment's quad rows appended
    after the last mip, so sky pixels (depth==1) reuse the first specular
    gather for their environment sample — the skybox costs ZERO extra
    gather indices (passes/shading.py ibl_ambient_sky_fast).
    irradiance_sh9 evaluates diffuse ambient gather-free; the BRDF LUT is
    a fitted polynomial (kernels/brdf.env_brdf_poly), also gather-free.
    """

    environment_faces: jnp.ndarray  # (6, S, S, 3)
    irradiance_faces: jnp.ndarray  # (6, I, I, 3)
    specular_mips: MipCube
    brdf_lut: jnp.ndarray  # (B, B, 3)
    specular_quad: "object"  # MipCubeQuad (RGBE); env quad rows appended
    # MipCubeQuadMerged: child+parent quad pairs -> trilinear in ONE
    # 32-byte gather when both specular taps run on the half grid
    specular_quad_merged: "object"
    irradiance_sh9: jnp.ndarray  # (9, 3)

    def tree_flatten(self):
        return tuple(
            getattr(self, f.name) for f in dataclasses.fields(self)
        ), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


@jax.jit
def _derive_jit(irr, spec):
    """ONE compiled program for the derived-layout builds.  Eagerly,
    the quad/merged/SH9 constructions are hundreds of small distinct-
    shape ops — on a remote backend each pays its own compile+dispatch
    (measured ~3 min of startup); as one jit they compile once (and
    replay from the persistent cache)."""
    from ..device.sampling import MipCubeQuad, MipCubeQuadMerged
    from ..kernels.ibl import sh9_project_cube

    quad = MipCubeQuad(spec)
    return quad, MipCubeQuadMerged(quad), sh9_project_cube(irr)


def _derive_fast_maps(env, irr, spec, lut):
    """Build the gather-minimal layouts from the base IBL maps.

    HDR cubes pack to RGBE uint32 quads (16-byte rows — the fast gather
    tier).  Specular mip 0 IS the environment (kernels/ibl
    .specular_prefilter: roughness-0 prefilter = mirror), so sky pixels
    read their environment sample from the mip-0 region of the same
    table — no appended copy (duplicate rows would cost ~25MB of table,
    and gather cost grows with table size).
    """
    quad, merged, sh9 = _derive_jit(irr, spec)
    return dict(
        specular_quad=quad,
        specular_quad_merged=merged,
        irradiance_sh9=sh9,
    )


class IBLResource:
    def __init__(
        self,
        name: str = "default_sky",
        resource_root: str | None = None,
        cubemap_size: int | None = None,
        irradiance_size: int = 128,
        specular_mips: int = 8,
        specular_samples: int | None = None,
        brdf_lut_size: int | None = None,
        cache: bool = True,
    ):
        from ..config import DEFAULT_CONFIG

        cfg = DEFAULT_CONFIG
        self.name = name
        self.resource_root = resource_root or cfg.resource_root
        self.cubemap_size = cubemap_size or cfg.ibl_cubemap_size
        self.irradiance_size = irradiance_size
        self.num_specular_mips = specular_mips
        self.specular_samples = specular_samples or cfg.ibl_specular_samples
        self.brdf_lut_size = brdf_lut_size or cfg.ibl_brdf_lut_size
        self.use_cache = cache
        self._maps: IBLMaps | None = None
        self._equirect: np.ndarray | None = None
        self.hdr_path = os.path.join(
            self.resource_root, "tex", "env", f"{name}.hdr"
        )

    @classmethod
    def from_equirect(cls, equirect: np.ndarray, **kw) -> "IBLResource":
        """Environment from an in-memory (H, W, 3+) float equirect panorama
        instead of a .hdr file (synthetic skies, tests, asset-free runs)."""
        kw.setdefault("cache", False)
        res = cls(name="equirect", **kw)
        res._equirect = np.asarray(equirect, np.float32)
        return res

    # --- compute --------------------------------------------------------
    def ensure_computed(self) -> None:
        if self._maps is not None:
            return
        from ..utils import enable_compile_cache

        enable_compile_cache()  # chain + derive are compile-dominated cold
        cached = self._load_cache() if self.use_cache else None
        if cached is not None:
            self._maps = cached
            logger.info("IBL loaded from cache (%s)", self.name)
            return

        if self._equirect is not None:
            equirect = jnp.asarray(self._equirect)
        else:
            equirect = jnp.asarray(image_io.load_hdr(self.hdr_path))
        logger.info(
            "IBL precompute: env %s %s -> cube %d, irradiance %d, "
            "%d specular mips x %d samples, BRDF LUT %d",
            self.name, tuple(equirect.shape), self.cubemap_size,
            self.irradiance_size, self.num_specular_mips,
            self.specular_samples, self.brdf_lut_size,
        )
        env = ibl_kernels.equirect_to_cubemap(equirect, self.cubemap_size)[..., :3]
        irr = ibl_kernels.irradiance_map(env, self.irradiance_size)
        spec = ibl_kernels.specular_prefilter(
            env, self.num_specular_mips, self.specular_samples
        )
        lut = ibl_kernels.brdf_lut(self.brdf_lut_size)
        self._maps = IBLMaps(
            environment_faces=env,
            irradiance_faces=irr,
            specular_mips=spec,
            brdf_lut=lut,
            **_derive_fast_maps(env, irr, spec, lut),
        )
        if self.use_cache:
            self._save_cache()
        logger.info("IBL prepared (%s)", self.name)

    def maps(self) -> IBLMaps:
        self.ensure_computed()
        return self._maps

    # --- disk cache -----------------------------------------------------
    def _cache_path(self) -> str:
        try:
            with open(self.hdr_path, "rb") as f:
                file_hash = hashlib.sha1(f.read()).hexdigest()[:12]
        except OSError:
            file_hash = "missing"
        key = (
            f"{self.name}-{file_hash}-{self.cubemap_size}-"
            f"{self.irradiance_size}-{self.num_specular_mips}-"
            f"{self.specular_samples}-{self.brdf_lut_size}"
        )
        cache_dir = os.environ.get(
            "MO_CACHE_DIR", os.path.join(os.path.expanduser("~"), ".mo_cache")
        )
        os.makedirs(cache_dir, exist_ok=True)
        return os.path.join(cache_dir, f"ibl-{key}.npz")

    def _save_cache(self) -> None:
        m = self._maps
        arrays = {
            "environment": np.asarray(m.environment_faces),
            "irradiance": np.asarray(m.irradiance_faces),
            "brdf_lut": np.asarray(m.brdf_lut),
        }
        for i in range(m.specular_mips.num_levels):
            arrays[f"spec_{i}"] = np.asarray(m.specular_mips.level(i))
        np.savez_compressed(self._cache_path(), **arrays)

    def _load_cache(self) -> IBLMaps | None:
        path = self._cache_path()
        if not os.path.exists(path):
            return None
        try:
            data = np.load(path)
            spec_levels = []
            i = 0
            while f"spec_{i}" in data:
                spec_levels.append(jnp.asarray(data[f"spec_{i}"]))
                i += 1
            env = jnp.asarray(data["environment"])
            irr = jnp.asarray(data["irradiance"])
            spec = MipCube(spec_levels)
            lut = jnp.asarray(data["brdf_lut"])
            return IBLMaps(
                environment_faces=env,
                irradiance_faces=irr,
                specular_mips=spec,
                brdf_lut=lut,
                **_derive_fast_maps(env, irr, spec, lut),
            )
        except Exception as e:  # corrupt cache -> recompute
            logger.warning("IBL cache load failed (%s); recomputing", e)
            return None
