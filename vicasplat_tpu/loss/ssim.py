"""Windowed SSIM with a separable Gaussian filter (pure jnp).

Parity target: reference src/loss/loss_ssim.py (11x11 window, sigma 1.5,
per-channel depthwise filtering), also used by evaluation/metrics.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _gaussian_kernel(window_size: int, sigma: float) -> jnp.ndarray:
    x = np.arange(window_size) - window_size // 2
    g = np.exp(-(x**2) / (2 * sigma**2))
    return jnp.asarray(g / g.sum(), jnp.float32)


def _filter2d_separable(x: jnp.ndarray, k: jnp.ndarray) -> jnp.ndarray:
    """Depthwise separable filtering on NHWC with SAME padding."""
    c = x.shape[-1]
    kh = jnp.broadcast_to(k[:, None, None, None], (k.shape[0], 1, 1, c))
    kw = jnp.broadcast_to(k[None, :, None, None], (1, k.shape[0], 1, c))
    dn = ("NHWC", "HWIO", "NHWC")
    y = jax.lax.conv_general_dilated(
        x, kh, (1, 1), "SAME", dimension_numbers=dn, feature_group_count=c
    )
    return jax.lax.conv_general_dilated(
        y, kw, (1, 1), "SAME", dimension_numbers=dn, feature_group_count=c
    )


def ssim(
    img1: jnp.ndarray,  # (..., H, W, C) in [0, 1]
    img2: jnp.ndarray,
    window_size: int = 11,
    sigma: float = 1.5,
    c1: float = 0.01**2,
    c2: float = 0.03**2,
) -> jnp.ndarray:
    """Mean SSIM over all pixels/channels. Leading dims are flattened.

    The reference (src/loss/loss_ssim.py) filters without padding, so its
    map covers only the valid interior. We filter SAME and crop the
    window_size//2 margin before reducing: under SAME padding the border
    "moments" are computed against an un-renormalized partial window, so
    E[x^2]-mu^2 there is not a variance — denominators can go ~0/negative
    and the map blows up (observed per-frame "SSIM" of 1.12 and -112 on
    real scenes before the crop). Variances are additionally clamped at 0
    and sigma_xy Cauchy-Schwarz-bounded for numerical safety.
    """
    orig_shape = img1.shape
    h, w, c = orig_shape[-3:]
    x = img1.reshape(-1, h, w, c).astype(jnp.float32)
    y = img2.reshape(-1, h, w, c).astype(jnp.float32)
    k = _gaussian_kernel(window_size, sigma)

    m = window_size // 2
    crop = lambda t: t[:, m : h - m, m : w - m, :]  # noqa: E731
    mu_x = crop(_filter2d_separable(x, k))
    mu_y = crop(_filter2d_separable(y, k))
    mu_x2, mu_y2, mu_xy = mu_x * mu_x, mu_y * mu_y, mu_x * mu_y
    sigma_x = jnp.maximum(crop(_filter2d_separable(x * x, k)) - mu_x2, 0.0)
    sigma_y = jnp.maximum(crop(_filter2d_separable(y * y, k)) - mu_y2, 0.0)
    sigma_xy = crop(_filter2d_separable(x * y, k)) - mu_xy
    # Cauchy-Schwarz safety clamp. stop_gradient on the bound: sqrt'(0) is
    # inf exactly where a window is constant in either image (variance 0),
    # and clip ties sigma_xy=bound=0 there, sending inf*0=NaN into EVERY
    # upstream parameter. Random-init DPT heads render near-empty frames,
    # which made 87.5M of 90.5M grads NaN from step 0 (round-5 A/B); the
    # clamp is a numerical guard, not a path gradients should flow through.
    bound = jax.lax.stop_gradient(jnp.sqrt(sigma_x * sigma_y))
    sigma_xy = jnp.clip(sigma_xy, -bound, bound)

    ssim_map = ((2 * mu_xy + c1) * (2 * sigma_xy + c2)) / (
        (mu_x2 + mu_y2 + c1) * (sigma_x + sigma_y + c2)
    )
    return ssim_map.mean()


def ssim_components(
    img1: jnp.ndarray,  # (..., H, W, C) in [0, 1]
    img2: jnp.ndarray,
    window_size: int = 11,
    sigma: float = 1.5,
    c1: float = 0.01**2,
    c2: float = 0.03**2,
) -> dict:
    """SSIM decomposed into brightness / contrast / structure terms.

    Parity target: reference src/loss/loss_ssim.py:106-125
    (`retrun_seprate=True`): sign-corrected sigma12 bounded by the
    Cauchy-Schwarz limit, C3 = C2/2, contrast & structure clamped at 0.98.
    Used by pose-opt objectives that optimize structure alone (the reference
    `SSIM` class exposes these; our `ssim()` keeps the fast mean-only path).

    The reference filters without padding, so its maps cover only the valid
    interior; we filter SAME (interior values are identical) and crop the
    window_size//2 margin before reducing — means match the reference
    exactly, unlike `ssim()` which averages borders too.

    Returns dict of scalars: ssim, brightness, contrast, structure, cs.
    """
    h, w, c = img1.shape[-3:]
    x = img1.reshape(-1, h, w, c).astype(jnp.float32)
    y = img2.reshape(-1, h, w, c).astype(jnp.float32)
    k = _gaussian_kernel(window_size, sigma)

    m = window_size // 2
    crop = lambda t: t[:, m : h - m, m : w - m, :]  # noqa: E731
    mu_x = crop(_filter2d_separable(x, k))
    mu_y = crop(_filter2d_separable(y, k))
    mu_x2, mu_y2, mu_xy = mu_x * mu_x, mu_y * mu_y, mu_x * mu_y
    sigma_x = crop(_filter2d_separable(x * x, k)) - mu_x2
    sigma_y = crop(_filter2d_separable(y * y, k)) - mu_y2
    sigma_xy = crop(_filter2d_separable(x * y, k)) - mu_xy

    cs_map = (2 * sigma_xy + c2) / (sigma_x + sigma_y + c2)
    lum_map = (2 * mu_xy + c1) / (mu_x2 + mu_y2 + c1)

    eps = jnp.float32(np.finfo(np.float32).eps) ** 2
    sx = jnp.maximum(sigma_x, eps)
    sy = jnp.maximum(sigma_y, eps)
    sxy_bound = jnp.sqrt(sx * sy)
    sxy = jnp.sign(sigma_xy) * jnp.minimum(sxy_bound, jnp.abs(sigma_xy))
    c3 = c2 / 2
    contrast_map = jnp.minimum((2 * sxy_bound + c2) / (sx + sy + c2), 0.98)
    structure_map = jnp.minimum((sxy + c3) / (sxy_bound + c3), 0.98)

    return {
        "ssim": (lum_map * cs_map).mean(),
        "cs": cs_map.mean(),
        "brightness": lum_map.mean(),
        "contrast": contrast_map.mean(),
        "structure": structure_map.mean(),
    }
