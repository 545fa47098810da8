"""LPIPS perceptual metric/loss: VGG16 feature distance in JAX.

Parity target: reference src/loss/loss_lpips.py + src/evaluation/metrics.py
LPIPS (VGG variant). Implements the full LPIPS computation graph — VGG16
conv trunk, per-stage unit-normalized feature differences, learned 1x1
linear heads, spatial averaging — with weights loaded from a converted
torch checkpoint.

This environment has no network egress and ships no VGG weights, so
`make_lpips_fn()` requires a weights file (torch `lpips` package state_dict
or torchvision VGG16 + LPIPS lins). Convert once with
`convert_lpips_torch_state(sd)`; at runtime the returned function is a pure
jittable (pred, target) -> scalar.
"""
from __future__ import annotations

import pathlib
import pickle
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

# VGG16 conv architecture: (out_channels, n_convs) per stage
_VGG_STAGES = [(64, 2), (128, 2), (256, 3), (512, 3), (512, 3)]
# ImageNet normalization used by LPIPS ("scaling layer")
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def convert_lpips_torch_state(sd: dict) -> dict:
    """torch `lpips.LPIPS(net='vgg')` state_dict -> JAX param pytree.

    Expects keys 'net.slice{k}.{i}.weight/bias' (VGG convs, OIHW) and
    'lin{k}.model.1.weight' (1x1 linear heads).
    """
    params = {"convs": [], "lins": []}
    conv_keys = sorted(
        (k for k in sd if k.startswith("net.") and k.endswith(".weight")),
        key=lambda k: (int(k.split("slice")[1].split(".")[0]), int(k.split(".")[2])),
    )
    for k in conv_keys:
        w = np.asarray(sd[k]).transpose(2, 3, 1, 0)  # OIHW -> HWIO
        b = np.asarray(sd[k.replace(".weight", ".bias")])
        params["convs"].append({"w": jnp.asarray(w), "b": jnp.asarray(b)})
    for i in range(5):
        w = np.asarray(sd[f"lin{i}.model.1.weight"])  # (1, C, 1, 1)
        params["lins"].append(jnp.asarray(w.reshape(-1)))
    return params


def _vgg_features(params, x):
    """x: (N, H, W, 3) in [-1, 1] (LPIPS convention). Returns 5 stage outputs."""
    h = (x - _SHIFT) / _SCALE
    feats = []
    idx = 0
    for stage, (c, n_convs) in enumerate(_VGG_STAGES):
        for _ in range(n_convs):
            p = params["convs"][idx]
            idx += 1
            h = jax.lax.conv_general_dilated(
                h, p["w"].astype(h.dtype), (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + p["b"].astype(h.dtype)
            h = jax.nn.relu(h)
        feats.append(h)
        if stage < 4:
            h = jax.lax.reduce_window(
                h, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
            )
    return feats


def lpips_distance(params, pred, target):
    """pred/target: (..., H, W, 3) in [0, 1]. Returns mean LPIPS."""
    shape = pred.shape
    x = pred.reshape(-1, *shape[-3:]) * 2.0 - 1.0
    y = target.reshape(-1, *shape[-3:]) * 2.0 - 1.0
    fx = _vgg_features(params, x)
    fy = _vgg_features(params, y)
    total = 0.0
    for f1, f2, lin in zip(fx, fy, params["lins"]):
        n1 = f1 / jnp.sqrt((f1**2).sum(-1, keepdims=True) + 1e-10)
        n2 = f2 / jnp.sqrt((f2**2).sum(-1, keepdims=True) + 1e-10)
        d = (n1 - n2) ** 2
        total = total + (d * lin.astype(d.dtype)).sum(-1).mean((-1, -2))
    return total.mean()


_DEFAULT_WEIGHTS = pathlib.Path(__file__).parent / "weights" / "lpips_vgg.pkl"


def init_random_lpips(key) -> dict:
    """Seeded-random VGG16 + uniform lins in the LPIPS param layout.

    NOT the trained metric: random conv features are a documented stand-in
    (random deep features still measure structured distance far better
    than pixel L2 — Zhang et al. 2018 report trained >> random >> L2) so
    the LPIPS *pipeline* (loss gate, metric plumbing, serving) can be
    driven end-to-end in an environment where the VGG weights are
    unobtainable. Real evaluations must convert real weights
    (convert_lpips_torch_state).
    """
    params = {"convs": [], "lins": []}
    c_in = 3
    for c_out, n_convs in _VGG_STAGES:
        for _ in range(n_convs):
            key, k1 = jax.random.split(key)
            fan_in = 3 * 3 * c_in
            w = jax.random.normal(k1, (3, 3, c_in, c_out), jnp.float32)
            w = w * np.sqrt(2.0 / fan_in)
            params["convs"].append({"w": w,
                                    "b": jnp.zeros((c_out,), jnp.float32)})
            c_in = c_out
        # one lin head per STAGE output (channels = stage width)
        params["lins"].append(
            jnp.full((c_out,), 1.0 / c_out, jnp.float32))
    return params


def make_lpips_fn(weights_path: Optional[str] = None,
                  allow_random: bool = False, seed: int = 0):
    """Returns a jittable (pred, target) -> scalar.

    Raises if no weights file exists, unless allow_random=True — then a
    seeded-random VGG (init_random_lpips) backs the same graph, clearly a
    pipeline stand-in rather than the trained perceptual metric.
    """
    path = pathlib.Path(weights_path) if weights_path else _DEFAULT_WEIGHTS
    if not path.exists():
        if allow_random:
            import sys

            print("lpips: weights not found; using SEEDED-RANDOM VGG "
                  "features (pipeline stand-in, not the trained metric)",
                  file=sys.stderr)
            params = init_random_lpips(jax.random.PRNGKey(seed))
            return lambda pred, target: lpips_distance(params, pred, target)
        raise FileNotFoundError(
            f"LPIPS VGG weights not found at {path}. Convert them once with: "
            "python -m vicasplat_tpu.loss.lpips <torch_lpips_state.pth> "
            f"{_DEFAULT_WEIGHTS} (or pass allow_random=True for a seeded "
            "random-feature stand-in)"
        )
    with open(path, "rb") as f:
        params = pickle.load(f)
    params = jax.tree.map(jnp.asarray, params)
    return lambda pred, target: lpips_distance(params, pred, target)


def main():
    """CLI: convert a torch LPIPS state_dict to the pickle this module loads."""
    import sys

    import torch

    src, dst = sys.argv[1], sys.argv[2]
    sd = torch.load(src, map_location="cpu")
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    sd = {k: v.numpy() for k, v in sd.items()}
    params = convert_lpips_torch_state(sd)
    params = jax.tree.map(np.asarray, params)
    pathlib.Path(dst).parent.mkdir(parents=True, exist_ok=True)
    with open(dst, "wb") as f:
        pickle.dump(params, f)
    print(f"wrote {dst}")


if __name__ == "__main__":
    main()
