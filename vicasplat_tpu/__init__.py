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
