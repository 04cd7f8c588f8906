"""mo_renderer_tpu — a TPU-native deferred PBR rendering engine in JAX/Pallas.

A ground-up rebuild of the capabilities of `mo_renderer` (Rust/Vulkan,
reference at /root/reference) designed TPU-first:

- The Vulkan device/swapchain layer is replaced by XLA device buffers and a
  headless framebuffer (``device/``).
- Every render pass (shadow, G-buffer raster, SSAO, deferred shading + skybox,
  present) is a jit-compiled JAX/Pallas program over pixel tiles (``passes/``,
  ``kernels/``).
- The bevy_ecs-style scene API (entities + Transform/Model/DirectionalLight
  components, Camera/Input/Timer resources) and glTF loading are preserved so
  the ``pbr_ibl`` example drives this engine with the same calls as the
  reference's ``examples/pbr_ibl/main.rs``.
"""

# Lazy exports (PEP 562): keeps `import mo_renderer_tpu` cheap and lets
# submodules be developed independently.
_EXPORTS = {
    "App": ".app.application",
    "AppError": ".app.application",
    "FColor": ".app.color",
    "Transform": ".math.transform",
    "DirectionalLight": ".scene.components",
    "PointLight": ".scene.components",
    "Camera": ".scene.camera",
    "CameraSettings": ".scene.camera",
    "Input": ".scene.input",
    "Timer": ".scene.timer",
    "Model": ".assets.model",
    "DefaultTextures": ".assets.default_textures",
    "GlobalSamplers": ".assets.samplers",
    "IBLResource": ".assets.ibl_resource",
    "EngineConfig": ".config",
}


def __getattr__(name):
    if name in _EXPORTS:
        import importlib

        mod = importlib.import_module(_EXPORTS[name], __name__)
        val = getattr(mod, name)
        globals()[name] = val
        return val
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")

__all__ = [
    "App",
    "AppError",
    "FColor",
    "Transform",
    "DirectionalLight",
    "PointLight",
    "Camera",
    "CameraSettings",
    "Input",
    "Timer",
    "Model",
    "DefaultTextures",
    "GlobalSamplers",
    "IBLResource",
    "EngineConfig",
]

__version__ = "0.1.0"
