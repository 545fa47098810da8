"""MoE decoder block vs dense at flagship decoder scale (d=768, T=8 frames,
N=257 tokens -> S=2056): measures the honest cost of the GShard one-hot
dispatch/combine einsums (O(S^2 d) at fixed capacity factor) against the
dense MLP, at E=4 and E=8, top-1 and top-2. Documents DESIGN.md's caveat
with on-chip numbers.
"""
import sys

for m in [k for k in sys.modules if k.startswith("vicasplat_tpu") or k in ("benchlib",)]:
    del sys.modules[m]
sys.path.insert(0, "/root/repo/tools")
sys.path.insert(0, "/root/repo")

import dataclasses
import json
import pathlib

import jax
import jax.numpy as jnp
from benchlib import device_time

from vicasplat_tpu.models.vicanet import (
    VicaNetConfig, _dec_block_init, _dec_block_apply_aux,
    _spatial_rope_tables, _temporal_rope_tables, camera_blocked_causal_mask,
)

B, T = 1, 8
base = VicaNetConfig()  # dec 768 x 12 heads
N = base.n_tokens
res = {}

for tag, moe_e, top_k in [("dense", 0, 1), ("moe4_top1", 4, 1),
                          ("moe4_top2", 4, 2), ("moe8_top2", 8, 2)]:
    cfg = dataclasses.replace(base, moe_experts=moe_e, moe_top_k=top_k,
                              use_flash_attention=False)
    p = _dec_block_init(jax.random.PRNGKey(0), cfg)
    p = jax.tree.map(lambda x: x.astype(jnp.bfloat16), p)
    cos_s, sin_s = _spatial_rope_tables(cfg, cfg.dec_head_dim, None)
    cos_t, sin_t = _temporal_rope_tables(cfg, T)
    mask = camera_blocked_causal_mask(T, N, False)
    tables = (cos_s, sin_s, cos_t, sin_t, mask)

    img = jax.random.normal(jax.random.PRNGKey(1), (B, T, N, 768),
                            jnp.bfloat16)
    cam = jax.random.normal(jax.random.PRNGKey(2), (B, T, 768), jnp.bfloat16)

    def block(img, cam, p=p, cfg=cfg, tables=tables):
        i, c, _ = _dec_block_apply_aux(p, img, cam, cfg, tables,
                                       jnp.bfloat16)
        return i, c

    ms = device_time(lambda im, cm, pp: block(im, cm, p=pp), img, cam, p,
                     iters=40) * 1e3
    res[tag] = round(ms, 3)
    print(f"{tag}: {ms:.3f} ms/block", flush=True)

out = pathlib.Path("/root/repo/outputs/perf_decomposition/moe_block.json")
out.parent.mkdir(parents=True, exist_ok=True)
out.write_text(json.dumps(res, indent=1))
print(json.dumps(res))
