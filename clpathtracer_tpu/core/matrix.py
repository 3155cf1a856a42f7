"""4x4 matrix helpers: multiply and analytic cofactor inverse.

Equivalent capability to the reference's unrolled cofactor inverse
(reference: src/matrix.c:27-37 multiply, :54-172 inverse; singular input
yields the zero matrix, :161-168). Implemented as closed-form adjugate math
so it is jit-able, differentiable, and batchable — no LU pivoting, which
XLA would otherwise lower to a host-unfriendly loop for 4x4.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def mat_multiply(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """[..., 4, 4] @ [..., 4, 4] row-major product.

    Full f32 precision: these are 4x4 camera matrices, and the default
    reduced matmul precision visibly skews the unprojection.
    """
    return jnp.matmul(a, b, precision=jax.lax.Precision.HIGHEST)


def mat_inverse(m: jnp.ndarray) -> jnp.ndarray:
    """Analytic inverse of a [..., 4, 4] matrix via the adjugate.

    Returns the zero matrix where `m` is singular, matching the reference's
    error convention (src/matrix.c:161-168).
    """
    m = jnp.asarray(m)
    a = m[..., 0, 0]; b = m[..., 0, 1]; c = m[..., 0, 2]; d = m[..., 0, 3]
    e = m[..., 1, 0]; f = m[..., 1, 1]; g = m[..., 1, 2]; h = m[..., 1, 3]
    i = m[..., 2, 0]; j = m[..., 2, 1]; k = m[..., 2, 2]; l = m[..., 2, 3]
    mm = m[..., 3, 0]; n = m[..., 3, 1]; o = m[..., 3, 2]; p = m[..., 3, 3]

    # 2x2 sub-determinants of the bottom two rows and top two rows
    kp_lo = k * p - l * o
    jp_ln = j * p - l * n
    jo_kn = j * o - k * n
    ip_lm = i * p - l * mm
    io_km = i * o - k * mm
    in_jm = i * n - j * mm

    af_be = a * f - b * e
    ag_ce = a * g - c * e
    ah_de = a * h - d * e
    bg_cf = b * g - c * f
    bh_df = b * h - d * f
    ch_dg = c * h - d * g

    # Cofactor matrix (already transposed into the adjugate layout)
    adj00 = f * kp_lo - g * jp_ln + h * jo_kn
    adj01 = -(b * kp_lo - c * jp_ln + d * jo_kn)
    adj02 = n * ch_dg - o * bh_df + p * bg_cf
    adj03 = -(j * ch_dg - k * bh_df + l * bg_cf)

    adj10 = -(e * kp_lo - g * ip_lm + h * io_km)
    adj11 = a * kp_lo - c * ip_lm + d * io_km
    adj12 = -(mm * ch_dg - o * ah_de + p * ag_ce)
    adj13 = i * ch_dg - k * ah_de + l * ag_ce

    adj20 = e * jp_ln - f * ip_lm + h * in_jm
    adj21 = -(a * jp_ln - b * ip_lm + d * in_jm)
    adj22 = mm * bh_df - n * ah_de + p * af_be
    adj23 = -(i * bh_df - j * ah_de + l * af_be)

    adj30 = -(e * jo_kn - f * io_km + g * in_jm)
    adj31 = a * jo_kn - b * io_km + c * in_jm
    adj32 = -(mm * bg_cf - n * ag_ce + o * af_be)
    adj33 = i * bg_cf - j * ag_ce + k * af_be

    det = a * adj00 + b * adj10 + c * adj20 + d * adj30

    adj = jnp.stack(
        [
            jnp.stack([adj00, adj01, adj02, adj03], axis=-1),
            jnp.stack([adj10, adj11, adj12, adj13], axis=-1),
            jnp.stack([adj20, adj21, adj22, adj23], axis=-1),
            jnp.stack([adj30, adj31, adj32, adj33], axis=-1),
        ],
        axis=-2,
    )
    safe_det = jnp.where(det == 0, 1.0, det)
    inv = adj / safe_det[..., None, None]
    return jnp.where((det == 0)[..., None, None], jnp.zeros_like(inv), inv)


def mat_scale(m: jnp.ndarray, s) -> jnp.ndarray:
    return m * s
