"""Real spherical harmonics evaluation (explicit tables to degree 4, exact
recurrence beyond — covers the reference's full rsh_cart_0..8 range).

Used to turn per-Gaussian SH coefficients into view-dependent RGB, matching
the convention of standard 3DGS renderers (the reference's CUDA rasterizers):
color = clamp(SH(dir) . coeffs + 0.5, min=0).

Basis uses the standard real-SH constants (hardcoded polynomials, same family
as reference src/misc/sht.py's rsh_cart_* tables).
"""
from __future__ import annotations

import jax.numpy as jnp

# degree 0
_C0 = 0.28209479177387814
# degree 1
_C1 = 0.4886025119029199
# degree 2
_C2 = (1.0925484305920792, -1.0925484305920792, 0.31539156525252005,
       -1.0925484305920792, 0.5462742152960396)
# degree 3
_C3 = (-0.5900435899266435, 2.890611442640554, -0.4570457994644658,
       0.3731763325901154, -0.4570457994644658, 1.445305721320277,
       -0.5900435899266435)
# degree 4
_C4 = (2.5033429417967046, -1.7701307697799304, 0.9461746957575601,
       -0.6690465435572892, 0.10578554691520431, -0.6690465435572892,
       0.47308734787878004, -1.7701307697799304, 0.6258357354491761)


def sh_basis_cols(dirs: jnp.ndarray, degree: int) -> list:
    """dirs: (..., 3) unit vectors -> list of (degree+1)^2 arrays shaped
    like dirs[..., 0]. The un-stacked (SoA) form: a stacked (N, 25) basis
    puts a 25-wide minor dim into 128-lane tiles; consuming the columns as
    flat (N,) vectors measures ~1.5x faster for the color contraction
    (tools/jobs/053_sh_layout)."""
    x, y, z = dirs[..., 0], dirs[..., 1], dirs[..., 2]
    out = [jnp.full(x.shape, _C0, dirs.dtype)]
    if degree >= 1:
        out += [-_C1 * y, _C1 * z, -_C1 * x]
    if degree >= 2:
        xx, yy, zz = x * x, y * y, z * z
        xy, yz, xz = x * y, y * z, x * z
        out += [
            _C2[0] * xy,
            _C2[1] * yz,
            _C2[2] * (2.0 * zz - xx - yy),
            _C2[3] * xz,
            _C2[4] * (xx - yy),
        ]
    if degree >= 3:
        out += [
            _C3[0] * y * (3 * xx - yy),
            _C3[1] * xy * z,
            _C3[2] * y * (4 * zz - xx - yy),
            _C3[3] * z * (2 * zz - 3 * xx - 3 * yy),
            _C3[4] * x * (4 * zz - xx - yy),
            _C3[5] * z * (xx - yy),
            _C3[6] * x * (xx - 3 * yy),
        ]
    if degree >= 4:
        out += [
            _C4[0] * xy * (xx - yy),
            _C4[1] * yz * (3 * xx - yy),
            _C4[2] * xy * (7 * zz - 1),
            _C4[3] * yz * (7 * zz - 3),
            _C4[4] * (zz * (35 * zz - 30) + 3),
            _C4[5] * xz * (7 * zz - 3),
            _C4[6] * (xx - yy) * (7 * zz - 1),
            _C4[7] * xz * (xx - 3 * yy),
            _C4[8] * (xx * (xx - 3 * yy) - yy * (3 * xx - yy)),
        ]
    if degree >= 5:
        out += _sh_cols_recurrence(x, y, z, 5, degree)
    return out


def _sh_cols_recurrence(x, y, z, l_min: int, l_max: int) -> list:
    """Columns for degrees l_min..l_max via the associated-Legendre
    recurrence — covers the reference's generated rsh_cart_5..8 tables
    (src/misc/sht.py) with a closed form instead of 1,600 lines of
    polynomials, and extends to any degree.

    Convention (matching the degree<=4 tables above and the reference):
    real SH with Condon-Shortley phase, ordered m = -l..l:
      Y_{l,-m} = (-1)^m sqrt(2) N_{lm} Q_l^m(z) B_m
      Y_{l, 0} =                 N_{l0} Q_l^0(z)
      Y_{l,+m} = (-1)^m sqrt(2) N_{lm} Q_l^m(z) A_m
    where A_m + i B_m = (x + iy)^m, Q_l^m = P_l^m / sin^m(theta) is the
    sectoral-factored Legendre polynomial (pure polynomial in z, SoA-safe),
    and N_{lm} = sqrt((2l+1)/(4pi) (l-m)!/(l+m)!).
    """
    import math

    # A_m / B_m: real/imag parts of (x+iy)^m, built iteratively
    A = [jnp.ones_like(x), x]
    B = [jnp.zeros_like(x), y]
    for m in range(2, l_max + 1):
        A.append(x * A[m - 1] - y * B[m - 1])
        B.append(x * B[m - 1] + y * A[m - 1])

    # Q_l^m(z) for all l <= l_max, m <= l (sin^m factored out):
    #   Q_m^m     = (2m-1)!!
    #   Q_{m+1}^m = (2m+1) z Q_m^m
    #   Q_l^m     = ((2l-1) z Q_{l-1}^m - (l+m-1) Q_{l-2}^m) / (l-m)
    Q = {}
    dfact = 1.0  # (2m-1)!!
    for m in range(0, l_max + 1):
        Q[(m, m)] = jnp.full(x.shape, dfact, x.dtype) if m == 0 else (
            dfact * jnp.ones_like(x)
        )
        if m + 1 <= l_max:
            Q[(m + 1, m)] = (2 * m + 1) * z * Q[(m, m)]
        for l in range(m + 2, l_max + 1):
            Q[(l, m)] = (
                (2 * l - 1) * z * Q[(l - 1, m)] - (l + m - 1) * Q[(l - 2, m)]
            ) / (l - m)
        dfact *= 2 * m + 1

    out = []
    for l in range(l_min, l_max + 1):
        for m in range(-l, l + 1):
            am = abs(m)
            n_lm = math.sqrt(
                (2 * l + 1) / (4 * math.pi)
                * math.factorial(l - am) / math.factorial(l + am)
            )
            if m == 0:
                out.append(n_lm * Q[(l, 0)])
                continue
            c = (-1.0) ** am * math.sqrt(2.0) * n_lm
            sect = B[am] if m < 0 else A[am]
            out.append(c * Q[(l, am)] * sect)
    return out


def sh_basis(dirs: jnp.ndarray, degree: int) -> jnp.ndarray:
    """dirs: (..., 3) unit vectors -> (..., (degree+1)^2) basis values."""
    return jnp.stack(sh_basis_cols(dirs, degree), axis=-1)


def eval_sh_colors(
    harmonics: jnp.ndarray,  # (..., 3, d_sh)
    dirs: jnp.ndarray,       # (..., 3) unit view directions
    degree: int,
) -> jnp.ndarray:
    """3DGS color decode: clamp(basis . coeffs + 0.5, 0)."""
    basis = sh_basis(dirs, degree)  # (..., d_sh)
    n = (degree + 1) ** 2
    rgb = jnp.einsum("...cd,...d->...c", harmonics[..., :n], basis)
    return jnp.maximum(rgb + 0.5, 0.0)


def rotate_sh(harmonics: jnp.ndarray, rotation: jnp.ndarray,
              degree: int | None = None) -> jnp.ndarray:
    """Rotate SH coefficients by a 3x3 rotation.

    Parity target: reference src/misc/sh_rotation.py rotate_sh (e3nn
    Wigner-D; bypassed in the reference's default path,
    gaussian_adapter.py:93-94). Implemented here without e3nn by refit:
    a band-limited function is exactly determined by its values on enough
    sample directions, so coefficients of the rotated function are
    pinv(B(dirs)) @ f(R^T dirs) — exact (up to lstsq conditioning) for the
    real SH basis of the given degree.

    harmonics: (..., d_sh); rotation: (3, 3) applied to the function's
    frame (f'(x) = f(R^T x)).
    """
    d_sh = harmonics.shape[-1]
    if degree is None:
        degree = int(round(d_sh**0.5)) - 1
    # fixed quasi-uniform sample directions (>= 2*d_sh for conditioning)
    import numpy as np

    m = max(4 * d_sh, 64)
    i = np.arange(m) + 0.5
    phi = np.arccos(1 - 2 * i / m)           # polar
    theta = np.pi * (1 + 5**0.5) * i         # golden-angle azimuth
    dirs = np.stack(
        [np.sin(phi) * np.cos(theta), np.sin(phi) * np.sin(theta), np.cos(phi)],
        axis=-1,
    ).astype(np.float32)
    B = sh_basis(jnp.asarray(dirs), degree)          # (M, d_sh)
    pinv = jnp.linalg.pinv(B)                        # (d_sh, M)
    dirs_rot = jnp.asarray(dirs) @ rotation          # R^T applied to rows
    B_rot = sh_basis(dirs_rot, degree)               # (M, d_sh)
    # coefficients of the rotated function: pinv @ (values at sample dirs)
    transfer = pinv @ B_rot                          # (d_sh, d_sh) Wigner-D
    return jnp.einsum("de,...e->...d", transfer, harmonics)
