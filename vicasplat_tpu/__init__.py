"""vicasplat_tpu — a TPU-native (JAX/XLA/Pallas) feed-forward 3D Gaussian
Splatting + camera pose framework.

Re-designed from scratch for TPU with the capabilities of WU-CVGL/VicaSplat
(reference: unposed video clip -> pixel-aligned 3D Gaussians + per-frame
camera poses as dual quaternions + optional intrinsics, rendered through a
differentiable Gaussian rasterizer).

Layout:
  geometry/   pure-jnp math: projection, quaternions, dual quaternions, SE(3)
  ops/        TPU compute kernels: RoPE, attention, differentiable splatting
  models/     VicaNet backbone (ViT-L encoder + mix video decoder), DPT heads,
              Gaussian adapter, the VicaSplat model
  decoder/    rendering decoder built on ops.rasterize
  loss/       mse / lpips / camera-dq / ssim / depth / distillation losses
  data/       host-side dataset pipeline (RE10K chunk format, view samplers)
  training/   optimizer, pjit data-parallel train step, checkpointing
  evaluation/ NVS + pose evaluation harnesses and metrics
  parallel/   device mesh + sharding helpers
  utils/      config system, torch-checkpoint conversion, benchmarking, IO
"""

__version__ = "0.1.0"

# Persistent XLA compile cache for every entry point (CLI, demo, serving —
# previously only bench.py/__graft_entry__ set it, so each demo run paid the
# full multi-minute flagship compile from scratch). JAX_COMPILATION_CACHE_DIR
# overrides; default lives next to the package checkout.
import os as _os

try:
    import jax as _jax

    _jax.config.update(
        "jax_compilation_cache_dir",
        _os.environ.get(
            "JAX_COMPILATION_CACHE_DIR",
            _os.path.join(_os.path.dirname(_os.path.dirname(__file__)),
                          ".jax_cache"),
        ),
    )
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
except Exception:  # cache is an optimization, never a hard dependency
    pass
