"""Full-forward activation parity against the ACTUAL reference torch model.

Instantiates the reference VicaSplat (reference src/model/encoder/vicasplat.py
+ backbone_vica.py + DPT heads) on CPU via tests/ref_shims, loads OUR
randomly-initialized parameters into it through export_torch_state_dict
(strict key check = released-checkpoint format fidelity), and asserts
per-hook activations, camera tokens, decoded poses, and every Gaussian field
match the JAX forward. A drift in any convention (RoPE variant, padding,
token order, AdaLN split order, dq decode, head postprocess) fails this test.

Arch is the exact released ViT-L config (enc 24x1024, dec 12x768, rope
[32,32], theta 30) at reduced image size 64 and T=3 to keep CPU time sane.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from tests import ref_shims  # noqa: E402

ref_shims.install()

from src.model.encoder.vicasplat import (  # noqa: E402
    VicaSplat as RefVicaSplat,
    VicaSplatCfg as RefCfg,
    OpacityMappingCfg as RefOpacityCfg,
)
from src.model.encoder.common.gaussian_adapter import (  # noqa: E402
    GaussianAdapterCfg as RefAdapterCfg,
)

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


@pytest.fixture(scope="module")
def both_forwards():
    bb = VicaNetConfig(img_size=IMG)
    cfg = VicaSplatConfig(backbone=bb, gaussian_adapter=GaussianAdapterConfig())

    params = init_vicasplat(jax.random.PRNGKey(0), cfg)
    # the camera head is zero-initialized on both sides (identity pose); give
    # it small random weights so pose-decoding parity is actually exercised
    ch = params["camera_extrinsic_head"]["proj"]
    ch["w"] = 0.05 * jax.random.normal(jax.random.PRNGKey(7), ch["w"].shape)
    ch["b"] = 0.02 * jax.random.normal(jax.random.PRNGKey(8), ch["b"].shape)
    # tame the exp postprocess: random-init DPT logits reach ~20 and exp(20)
    # magnifies fp32 noise into absolute diffs that obscure the comparison
    for head in ("center_head", "gaussian_param_head"):
        hp = params[head]["head"]
        last = "conv3" if "conv3" in hp else "conv2"
        hp[last]["w"] = 0.02 * hp[last]["w"]
        hp[last]["b"] = 0.01 * jax.random.normal(
            jax.random.PRNGKey(9), hp[last]["b"].shape
        )

    sd = {
        k.removeprefix("encoder."): torch.from_numpy(np.ascontiguousarray(v))
        for k, v in export_torch_state_dict(params).items()
    }

    ref_cfg = RefCfg(
        name="vicasplat",
        backbone=dict(
            img_size=IMG, patch_size=16,
            enc_embed_dim=1024, enc_depth=24, enc_num_heads=16,
            dec_embed_dim=768, dec_depth=12, dec_num_heads=12,
            mlp_ratio=4.0, temporal_rope_theta=30, rope_dim_list=[32, 32],
            use_blocked_causal_attention=True, use_framewise_modulation=True,
            use_cross_neighbor_attention=True, use_intrinsic_embedding=True,
        ),
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
    ref = RefVicaSplat(ref_cfg)
    missing, unexpected = ref.load_state_dict(sd, strict=False)
    assert not missing, f"reference keys our export lacks: {missing[:8]}"
    assert not unexpected, f"exported keys reference lacks: {unexpected[:8]}"
    ref.eval()

    rng = np.random.default_rng(42)
    img = rng.uniform(-1, 1, (B, T, 3, IMG, IMG)).astype(np.float32)
    K = np.broadcast_to(
        np.array([[1.2, 0, 0.5], [0, 1.3, 0.5], [0, 0, 1.0]], np.float32),
        (B, T, 3, 3),
    ).copy()
    exts = []
    for i in range(T):
        th = 0.1 * i
        E = np.eye(4, dtype=np.float32)
        E[:3, :3] = np.array(
            [[np.cos(th), 0, np.sin(th)], [0, 1, 0], [-np.sin(th), 0, np.cos(th)]],
            np.float32,
        )
        E[:3, 3] = [0.1 * i, -0.05 * i, 0.2 * i]
        exts.append(E)
    E = np.broadcast_to(np.stack(exts), (B, T, 4, 4)).copy()

    ctx_t = {
        "image": torch.from_numpy(img),
        "intrinsics": torch.from_numpy(K),
        "extrinsics": torch.from_numpy(E),
    }
    with torch.no_grad():
        out_ref = ref(ctx_t, global_step=GLOBAL_STEP)
        video = ctx_t["image"].permute(0, 2, 1, 3, 4)
        _, cam_ref, _, interms_ref = ref.backbone(video, ctx_t["intrinsics"])

    ctx_j = {
        "image": jnp.asarray(img.transpose(0, 1, 3, 4, 2)),
        "intrinsics": jnp.asarray(K),
        "extrinsics": jnp.asarray(E),
    }
    out_jax = vicasplat_forward(
        params, cfg, ctx_j, global_step=GLOBAL_STEP,
        compute_viewspace_depth=True, dtype=jnp.float32,
    )
    _, cam_jax, _, interms_jax = vicanet_forward(
        params["backbone"], bb, ctx_j["image"], ctx_j["intrinsics"],
        dtype=jnp.float32,
    )
    return dict(
        out_ref=out_ref, out_jax=out_jax,
        cam_ref=cam_ref, cam_jax=cam_jax,
        interms_ref=interms_ref, interms_jax=interms_jax,
    )


def _close(a_t, b_j, atol, name):
    a = a_t.detach().numpy() if hasattr(a_t, "detach") else np.asarray(a_t)
    b = np.asarray(b_j)
    assert a.shape == b.shape, f"{name}: {a.shape} vs {b.shape}"
    np.testing.assert_allclose(a, b, atol=atol, rtol=1e-4, err_msg=name)


def test_backbone_hook_activations(both_forwards):
    bf = both_forwards
    assert len(bf["interms_ref"]) == len(bf["interms_jax"]) == 13
    for i, (ir, ij) in enumerate(zip(bf["interms_ref"], bf["interms_jax"])):
        _close(ir, ij, 3e-4, f"interm[{i}]")
    _close(bf["cam_ref"], bf["cam_jax"], 3e-4, "camera_embeds")


def test_camera_pose_decode(both_forwards):
    r, j = both_forwards["out_ref"], both_forwards["out_jax"]
    _close(r["pred_extrins"], j["pred_extrins"], 1e-4, "pred_extrins")
    _close(
        r["gaussian_camera_extrins"], j["gaussian_camera_extrins"],
        3e-4, "poses4x4",
    )


def test_head_outputs_and_gaussians(both_forwards):
    r, j = both_forwards["out_ref"], both_forwards["out_jax"]
    _close(r["gaussian_centers"], j["gaussian_centers"], 1e-4, "gs_centers")
    _close(
        r["context_view_depths"], j["context_view_depths"],
        1e-4, "viewspace_depth",
    )
    _close(r["raw_gaussians"], j["raw_gaussians"], 1e-4, "raw_gaussians")
    gr, gj = r["gaussians"], j["gaussians"]
    _close(gr.means, gj.means, 1e-4, "means")
    _close(gr.covariances, gj.covariances, 1e-9, "covariances")
    _close(gr.harmonics, gj.harmonics, 1e-5, "harmonics")
    _close(gr.opacities.squeeze(-1), gj.opacities, 1e-5, "opacities")
    _close(gr.scales, gj.scales, 1e-7, "scales")
    _close(gr.rotations, gj.rotations, 1e-4, "rotations")
