"""DPT head decomposition at the flagship shape (8 frames, 256^2, grid 16).

decomp_r3: center head 4.2 ms, gs head ~8.7 ms — together as big as the
24-block encoder. Roofline estimate: the gs head's full-res 3x3 256->256
conv1 alone is ~620 GFLOP = 3.0 ms at peak; trunk ~1-2 ms. Time each stage
(trunk, upsample, merger, head convs) to find whether the remaining ~4 ms
is real FLOPs or layout/bandwidth waste worth optimizing.
"""
import sys
for m in [k for k in sys.modules if k.startswith("vicasplat_tpu") or k in ("benchlib",)]:
    del sys.modules[m]
sys.path.insert(0, "/root/repo/tools")
sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from benchlib import device_time, sync

from vicasplat_tpu.models.heads import (
    DPTConfig, init_dpt, dpt_trunk, dpt_gs_head, dpt_regression_head,
)
from vicasplat_tpu.models.layers import (
    conv2d, conv2d_s2d, resize_bilinear_align_corners,
)

BT, size, gh = 8, 256, 16
dt = jnp.bfloat16
hook_dims = (1024, 768, 768, 768)
n_gs = 1 + 7 + 3 * 25  # GaussianAdapterConfig.raw_gs_dim at sh_degree 4
gs_cfg = DPTConfig(hook_dims=hook_dims, head_type="gs_params",
                   num_channels=n_gs, use_input_merger=True)
ctr_cfg = DPTConfig(hook_dims=hook_dims, head_type="regression",
                    num_channels=3)

key = jax.random.PRNGKey(0)
ks = jax.random.split(key, 8)
gs_p = jax.tree.map(lambda x: x.astype(dt), init_dpt(ks[0], gs_cfg))
ctr_p = jax.tree.map(lambda x: x.astype(dt), init_dpt(ks[1], ctr_cfg))
hooks = [jax.random.normal(k, (BT, gh * gh, d), dt)
         for k, d in zip(ks[2:6], hook_dims)]
imgs = jax.random.normal(ks[6], (BT, size, size, 3), dt)


def tm(name, fn, *args, iters=20):
    t = device_time(fn, *args, iters=iters, base=2, repeats=2)
    print(f"{name:24s} {t*1e3:8.3f} ms", flush=True)
    return t


# full heads
tm("gs_head", lambda *h: dpt_gs_head(gs_p, gs_cfg, h, (gh, gh), imgs, dt),
   *hooks)
tm("center_head",
   lambda *h: dpt_regression_head(ctr_p, ctr_cfg, h, (gh, gh), dt), *hooks)

# shared trunk
tm("trunk", lambda *h: dpt_trunk(gs_p, gs_cfg, h, (gh, gh), dt), *hooks)
p1 = jax.jit(lambda *h: dpt_trunk(gs_p, gs_cfg, h, (gh, gh), dt))(*hooks)
sync(p1[0, 0, 0])

# gs head tail stages on the realized trunk output (128^2, 256ch)
tm("gs_resize_x2", lambda x: resize_bilinear_align_corners(x, (size, size)),
   p1)
p1u = jax.jit(
    lambda x: resize_bilinear_align_corners(x, (size, size)))(p1)
sync(p1u[0, 0, 0])
tm("gs_merger_s2d",
   lambda im: jax.nn.relu(
       conv2d_s2d(gs_p["input_merger"]["conv"], im.astype(dt), 7, s=4,
                  dtype=dt)), imgs)
tm("gs_conv1_3x3_256", lambda x: jax.nn.relu(
    conv2d(gs_p["head"]["conv1"], x, dtype=dt)), p1u)
h1 = jax.jit(lambda x: conv2d(gs_p["head"]["conv1"], x, dtype=dt))(p1u)
sync(h1[0, 0, 0])
tm("gs_conv2_1x1", lambda x: conv2d(gs_p["head"]["conv2"], x, dtype=dt), h1)

# center head tail
tm("ctr_conv1_3x3_128res",
   lambda x: conv2d(ctr_p["head"]["conv1"], x, dtype=dt), p1)
hc = jax.jit(lambda x: conv2d(ctr_p["head"]["conv1"], x, dtype=dt))(p1)
sync(hc[0, 0, 0])
tm("ctr_resize+conv2+conv3",
   lambda x: conv2d(
       ctr_p["head"]["conv3"],
       jax.nn.relu(conv2d(ctr_p["head"]["conv2"],
                          resize_bilinear_align_corners(x, (size, size)),
                          dtype=dt)), dtype=dt), hc)

# is the f32 resize the problem? try bf16-resident resize
tm("gs_resize_bf16_path",
   lambda x: resize_bilinear_align_corners(x.astype(jnp.bfloat16),
                                           (size, size)), p1)
