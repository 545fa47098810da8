"""DPT gs-head cost attribution: trunk vs resize vs merger vs head convs."""
import sys
for m in [k for k in sys.modules if k.startswith("vicasplat_tpu") or k == "benchlib"]:
    del sys.modules[m]
sys.path.insert(0, "/root/repo/tools")

import jax
import jax.numpy as jnp
from benchlib import device_time, sync

from vicasplat_tpu.models.heads import (
    DPTConfig, init_dpt, dpt_trunk, dpt_gs_head,
)
from vicasplat_tpu.models.layers import (
    conv2d, conv2d_im2col, resize_bilinear_align_corners,
)

B, size = 8, 256
gs_cfg = DPTConfig(hook_dims=(1024, 768, 768, 768), num_channels=82,
                   head_type="gs_params", patch_size=16, use_input_merger=True)
params = jax.tree.map(lambda x: x.astype(jnp.bfloat16),
                      init_dpt(jax.random.PRNGKey(0), gs_cfg))
grid = (16, 16)
hooks = [
    jax.random.normal(jax.random.PRNGKey(i), (B, 256, d), jnp.bfloat16)
    for i, d in enumerate(gs_cfg.hook_dims)
]
imgs = jax.random.uniform(jax.random.PRNGKey(9), (B, size, size, 3)) * 2 - 1

t = device_time(lambda h0, h1, h2, h3: dpt_gs_head(
    params, gs_cfg, [h0, h1, h2, h3], grid, imgs, jnp.bfloat16), *hooks, iters=20)
print(f"gs head full: {t*1e3:.2f} ms")

t = device_time(lambda h0, h1, h2, h3: dpt_trunk(
    params, gs_cfg, [h0, h1, h2, h3], grid, jnp.bfloat16), *hooks, iters=20)
print(f"trunk alone: {t*1e3:.2f} ms")

p1 = jax.jit(lambda hs: dpt_trunk(params, gs_cfg, hs, grid, jnp.bfloat16))(hooks)
sync(p1[..., :2])
t = device_time(lambda p: resize_bilinear_align_corners(p, (256, 256)), p1, iters=20)
print(f"resize 128->256: {t*1e3:.2f} ms")

p1b = jax.jit(lambda p: resize_bilinear_align_corners(p, (256, 256)))(p1)
sync(p1b[..., :2])
t = device_time(lambda im: jax.nn.relu(conv2d_im2col(
    params["input_merger"]["conv"], im.astype(jnp.bfloat16), 7, dtype=jnp.bfloat16)),
    imgs, iters=20)
print(f"merger 7x7 im2col: {t*1e3:.2f} ms")

t = device_time(lambda p: conv2d(params["head"]["conv1"], p, dtype=jnp.bfloat16),
                p1b, iters=20)
fl = 2 * B * 256 * 256 * 9 * 256 * 256
print(f"head conv1 3x3 256ch@256^2: {t*1e3:.2f} ms ({fl/t/1e12:.0f} TFLOP/s)")

h = jax.jit(lambda p: jax.nn.relu(conv2d(params["head"]["conv1"], p, dtype=jnp.bfloat16)))(p1b)
sync(h[..., :2])
t = device_time(lambda x: conv2d(params["head"]["conv2"], x, dtype=jnp.bfloat16),
                h, iters=20)
print(f"head conv2 1x1 256->82@256^2: {t*1e3:.2f} ms")

# raw conv variants for the big conv1
w = params["head"]["conv1"]["w"]
x = jax.random.normal(jax.random.PRNGKey(3), (B, 256, 256, 256), jnp.bfloat16)
t = device_time(lambda x: jax.lax.conv_general_dilated(
    x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")), x, iters=20)
print(f"conv3x3 NHWC bf16: {t*1e3:.2f} ms ({fl/t/1e12:.0f} TFLOP/s)")
# f32 accum output
t = device_time(lambda x: jax.lax.conv_general_dilated(
    x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
    preferred_element_type=jnp.float32), x, iters=20)
print(f"conv3x3 NHWC f32-out: {t*1e3:.2f} ms")
# as 9 shifted 1x1 matmuls (explicit decomposition)
def conv_as_9mm(x):
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    acc = None
    for i in range(3):
        for j in range(3):
            part = xp[:, i:i + 256, j:j + 256, :].reshape(-1, 256) @ w[i, j]
            acc = part if acc is None else acc + part
    return acc.reshape(B, 256, 256, 256)

t = device_time(conv_as_9mm, x, iters=20)
print(f"conv3x3 as 9 matmuls: {t*1e3:.2f} ms ({fl/t/1e12:.0f} TFLOP/s)")
