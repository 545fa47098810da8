"""GS-head PREFIX decomposition (VERDICT r3 #4 follow-up to job 017).

Job 017 timed stages in ISOLATION: trunk 0.609 + resize 0.849 + merger
1.026 + conv1 3.119 + conv2 0.272 = 5.875 ms, vs 9.958 ms for the full
head — ~4.1 ms unexplained. Isolated stages get their own best layouts and
their producers hoisted; composition may insert copies/transposes. Here we
time cumulative PREFIXES of the exact production pipeline (differences =
in-context stage costs, summing to the full head by construction), then
try targeted variants.
"""
import sys
for m in [k for k in sys.modules if k.startswith("vicasplat_tpu") or k in ("benchlib",)]:
    del sys.modules[m]
sys.path.insert(0, "/root/repo/tools")
sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from benchlib import device_time

from vicasplat_tpu.models.heads import DPTConfig, init_dpt, dpt_trunk, dpt_gs_head
from vicasplat_tpu.models.layers import (
    conv2d, conv2d_s2d, resize_bilinear_align_corners,
)

BT, size, gh = 8, 256, 16
dt = jnp.bfloat16
hook_dims = (1024, 768, 768, 768)
n_gs = 1 + 7 + 3 * 25
gs_cfg = DPTConfig(hook_dims=hook_dims, head_type="gs_params",
                   num_channels=n_gs, use_input_merger=True)

key = jax.random.PRNGKey(0)
ks = jax.random.split(key, 8)
gs_p = jax.tree.map(lambda x: x.astype(dt), init_dpt(ks[0], gs_cfg))
hooks = [jax.random.normal(k, (BT, gh * gh, d), dt)
         for k, d in zip(ks[2:6], hook_dims)]
imgs = jax.random.normal(ks[6], (BT, size, size, 3), dt)


def tm(name, fn, *args, iters=20):
    t = device_time(fn, *args, iters=iters, base=2, repeats=2)
    print(f"{name:28s} {t*1e3:8.3f} ms", flush=True)
    return t


# prefixes of the production pipeline; params + imgs are jit ARGS (job 017
# captured them — closure constants change what XLA can fold)
# stream BOTH hooks and images (first arg = perturbed); params ride as a
# plain jit arg
stream = {"h": hooks, "im": imgs}


def pfx_trunk(st, p):
    return dpt_trunk(p, gs_cfg, st["h"], (gh, gh), dt)


def pfx_resize(st, p):
    p1 = dpt_trunk(p, gs_cfg, st["h"], (gh, gh), dt)
    return resize_bilinear_align_corners(p1, (size, size))


def pfx_merge(st, p):
    x = pfx_resize(st, p)
    direct = jax.nn.relu(
        conv2d_s2d(p["input_merger"]["conv"], st["im"].astype(x.dtype), 7,
                   s=4, dtype=dt))
    return x + direct


def pfx_conv1(st, p):
    x = pfx_merge(st, p)
    return jax.nn.relu(conv2d(p["head"]["conv1"], x, dtype=dt))


def pfx_full(st, p):
    return dpt_gs_head(p, gs_cfg, st["h"], (gh, gh), st["im"], dt)


ts = {}
for name, fn in [("trunk", pfx_trunk), ("+resize", pfx_resize),
                 ("+merger", pfx_merge), ("+conv1", pfx_conv1),
                 ("full(gs_head)", pfx_full)]:
    ts[name] = tm(name, fn, stream, gs_p)

print("\nin-context stage costs (prefix differences):")
prev, order = 0.0, ["trunk", "+resize", "+merger", "+conv1", "full(gs_head)"]
for name in order:
    print(f"  {name:26s} +{(ts[name]-prev)*1e3:7.3f} ms")
    prev = ts[name]

# variants
no_merge_cfg = DPTConfig(hook_dims=hook_dims, head_type="gs_params",
                         num_channels=n_gs, use_input_merger=False)
nm_p = {k: v for k, v in gs_p.items() if k != "input_merger"}
tm("variant: no merger", lambda st, p: dpt_gs_head(
    p, no_merge_cfg, st["h"], (gh, gh), None, dt), stream, nm_p)


# variant: f32 resize (is the x2 upsample happier in f32 in-context?)
def v_f32resize(st, p):
    p1 = dpt_trunk(p, gs_cfg, st["h"], (gh, gh), dt)
    x = resize_bilinear_align_corners(p1.astype(jnp.float32), (size, size))
    direct = jax.nn.relu(
        conv2d_s2d(p["input_merger"]["conv"], st["im"].astype(dt), 7, s=4,
                   dtype=dt))
    x = x.astype(dt) + direct
    h = jax.nn.relu(conv2d(p["head"]["conv1"], x, dtype=dt))
    return conv2d(p["head"]["conv2"], h, dtype=dt)


tm("variant: f32 resize", v_f32resize, stream, gs_p)
