"""Exploration: run the ACTUAL reference torch VicaSplat vs our JAX model with
identical weights and print per-stage max|diff|. Frozen into
tests/test_parity_reference.py once conventions are confirmed.

Run: env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu python tools/parity_probe.py
"""
import sys
sys.path.insert(0, "/root/repo")

import numpy as np
import torch

from tests import ref_shims

ref_shims.install()

from src.model.encoder.vicasplat import (  # noqa: E402
    VicaSplat as RefVicaSplat,
    VicaSplatCfg as RefCfg,
    OpacityMappingCfg as RefOpacityCfg,
)
from src.model.encoder.common.gaussian_adapter import (  # noqa: E402
    GaussianAdapterCfg as RefAdapterCfg,
)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from vicasplat_tpu.models import (  # noqa: E402
    GaussianAdapterConfig,
    VicaNetConfig,
    VicaSplatConfig,
    init_vicasplat,
    vicasplat_forward,
)
from vicasplat_tpu.models.vicanet import vicanet_forward  # noqa: E402
from vicasplat_tpu.utils.ckpt_convert import export_torch_state_dict  # noqa: E402

IMG, T, B = 64, 3, 1
GLOBAL_STEP = 100

bb = VicaNetConfig(img_size=IMG)
cfg = VicaSplatConfig(backbone=bb, gaussian_adapter=GaussianAdapterConfig())

print("init jax params...", flush=True)
params = init_vicasplat(jax.random.PRNGKey(0), cfg)
# the camera head is zero-initialized on both sides (identity pose); give it
# small random weights so pose-decoding parity is actually exercised
kc = jax.random.PRNGKey(7)
ch = params["camera_extrinsic_head"]["proj"]
ch["w"] = 0.05 * jax.random.normal(kc, ch["w"].shape)
ch["b"] = 0.02 * jax.random.normal(jax.random.PRNGKey(8), ch["b"].shape)
# tame the exp-norm postprocess: random-init DPT logits reach ~20, and
# exp(20) magnifies fp32 noise into absolute diffs that obscure the
# comparison; scale the final convs so outputs are O(1) like a trained net
for head in ("center_head", "gaussian_param_head"):
    hp = params[head]["head"]
    last = "conv3" if "conv3" in hp else "conv2"
    hp[last]["w"] = 0.02 * hp[last]["w"]
    if "b" in hp[last]:
        hp[last]["b"] = 0.01 * jax.random.normal(
            jax.random.PRNGKey(9), hp[last]["b"].shape
        )

print("export to torch...", flush=True)
# exporter emits the released Lightning layout ('encoder.'-prefixed)
sd = {k.removeprefix("encoder."): torch.from_numpy(np.ascontiguousarray(v))
      for k, v in export_torch_state_dict(params).items()}

backbone_kwargs = dict(
    img_size=IMG,
    patch_size=16,
    enc_embed_dim=1024,
    enc_depth=24,
    enc_num_heads=16,
    dec_embed_dim=768,
    dec_depth=12,
    dec_num_heads=12,
    mlp_ratio=4.0,
    temporal_rope_theta=30,
    rope_dim_list=[32, 32],
    use_blocked_causal_attention=True,
    use_framewise_modulation=True,
    use_cross_neighbor_attention=True,
    use_intrinsic_embedding=True,
)
ref_cfg = RefCfg(
    name="vicasplat",
    backbone=backbone_kwargs,
    visualizer=None,
    gaussian_adapter=RefAdapterCfg(
        gaussian_scale_min=0.005, gaussian_scale_max=0.04,
        sh_degree=4, scale_act="softplus",
    ),
    apply_bounds_shim=False,
    opacity_mapping=RefOpacityCfg(initial=0.0, final=0.0, warm_up=1),
    predict_opacity=False,
    camera_type="dq",
)
print("build reference model...", flush=True)
ref = RefVicaSplat(ref_cfg)
missing, unexpected = ref.load_state_dict(sd, strict=False)
print("missing:", missing)
print("unexpected:", unexpected)
assert not missing and not unexpected, "state dict key mismatch"
ref.eval()

rng = np.random.default_rng(42)
img = rng.uniform(-1, 1, (B, T, 3, IMG, IMG)).astype(np.float32)
K = np.broadcast_to(
    np.array([[1.2, 0, 0.5], [0, 1.3, 0.5], [0, 0, 1.0]], np.float32),
    (B, T, 3, 3),
).copy()
# mild c2w poses for the viewspace-depth path
exts = []
for i in range(T):
    th = 0.1 * i
    R = np.array([[np.cos(th), 0, np.sin(th)],
                  [0, 1, 0],
                  [-np.sin(th), 0, np.cos(th)]], np.float32)
    E = np.eye(4, dtype=np.float32)
    E[:3, :3] = R
    E[:3, 3] = [0.1 * i, -0.05 * i, 0.2 * i]
    exts.append(E)
E = np.broadcast_to(np.stack(exts), (B, T, 4, 4)).copy()

ctx_t = {
    "image": torch.from_numpy(img),
    "intrinsics": torch.from_numpy(K),
    "extrinsics": torch.from_numpy(E),
}
print("reference forward...", flush=True)
with torch.no_grad():
    out_ref = ref(ctx_t, global_step=GLOBAL_STEP)
    video = ctx_t["image"].permute(0, 2, 1, 3, 4)
    _, cam_ref, glob_ref, interms_ref = ref.backbone(video, ctx_t["intrinsics"])

ctx_j = {
    "image": jnp.asarray(img.transpose(0, 1, 3, 4, 2)),
    "intrinsics": jnp.asarray(K),
    "extrinsics": jnp.asarray(E),
}
print("jax forward...", flush=True)
out_jax = vicasplat_forward(
    params, cfg, ctx_j, global_step=GLOBAL_STEP,
    compute_viewspace_depth=True, dtype=jnp.float32,
)
_, cam_jax, glob_jax, interms_jax = vicanet_forward(
    params["backbone"], bb, ctx_j["image"], ctx_j["intrinsics"],
    dtype=jnp.float32,
)


def diff(name, a_t, b_j):
    a = a_t.detach().numpy() if hasattr(a_t, "detach") else np.asarray(a_t)
    b = np.asarray(b_j)
    if a.shape != b.shape:
        print(f"{name}: SHAPE {a.shape} vs {b.shape}")
        return
    d = np.abs(a - b)
    scale = np.abs(a).mean() + 1e-8
    print(f"{name}: max|d|={d.max():.3e} mean|d|={d.mean():.3e} scale={scale:.3e}")


for i, (ir, ij) in enumerate(zip(interms_ref, interms_jax)):
    diff(f"interm[{i}]", ir, ij)
diff("camera_embeds", cam_ref, cam_jax)

diff("pred_extrins", out_ref["pred_extrins"], out_jax["pred_extrins"])
diff("poses4x4", out_ref["gaussian_camera_extrins"], out_jax["gaussian_camera_extrins"])
diff("gs_centers", out_ref["gaussian_centers"], out_jax["gaussian_centers"])
diff("viewspace_depth", out_ref["context_view_depths"], out_jax["context_view_depths"])
diff("raw_gaussians", out_ref["raw_gaussians"], out_jax["raw_gaussians"])

g_ref, g_jax = out_ref["gaussians"], out_jax["gaussians"]
diff("g.means", g_ref.means, g_jax.means)
diff("g.covariances", g_ref.covariances, g_jax.covariances)
diff("g.harmonics", g_ref.harmonics, g_jax.harmonics)
diff("g.opacities", g_ref.opacities.squeeze(-1), g_jax.opacities)
diff("g.scales", g_ref.scales, g_jax.scales)
diff("g.rotations", g_ref.rotations, g_jax.rotations)
print("PROBE DONE")
