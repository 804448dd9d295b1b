"""3D convolution blocks for the voxel U-Net (north-star path).

XLA's ``conv_general_dilated`` already lowers 3D convs onto the MXU as
implicit GEMMs and fuses the following norm/activation into the epilogue,
so these wrappers focus on layout (NDHWC — channels-last for MXU tiling)
and on GroupNorm, which is the TPU-friendly normalization choice here: no
running statistics to synchronize across data-parallel replicas and no
train/eval asymmetry (the PointNet path keeps BatchNorm for reference
parity; the U-Net is new surface, designed TPU-first).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

DN = ("NDHWC", "DHWIO", "NDHWC")


def conv3d_init(key: jax.Array, k: int, cin: int, cout: int) -> dict:
    """He-uniform kernel (DHWIO) + zero bias."""
    fan_in = k * k * k * cin
    bound = jnp.sqrt(6.0 / fan_in)
    return {
        "kernel": jax.random.uniform(
            key, (k, k, k, cin, cout), jnp.float32, -bound, bound
        ),
        "bias": jnp.zeros((cout,), jnp.float32),
    }


def conv3d(p: dict, x: jax.Array, stride: int = 1, compute_dtype=None) -> jax.Array:
    dt = compute_dtype or x.dtype
    # no explicit f32 output type: mixed-dtype cotangents break the conv
    # transpose under autodiff; the MXU accumulates in f32 regardless
    y = jax.lax.conv_general_dilated(
        x.astype(dt),
        p["kernel"].astype(dt),
        window_strides=(stride,) * 3,
        padding="SAME",
        dimension_numbers=DN,
    )
    return y + p["bias"].astype(y.dtype)


def conv3d_transpose(p: dict, x: jax.Array, stride: int = 2, compute_dtype=None) -> jax.Array:
    dt = compute_dtype or x.dtype
    y = jax.lax.conv_transpose(
        x.astype(dt),
        p["kernel"].astype(dt),
        strides=(stride,) * 3,
        padding="SAME",
        dimension_numbers=DN,
    )
    return y + p["bias"].astype(y.dtype)


def group_norm_init(c: int) -> dict:
    return {
        "scale": jnp.ones((c,), jnp.float32),
        "bias": jnp.zeros((c,), jnp.float32),
    }


def group_norm(p: dict, x: jax.Array, groups: int = 8, eps: float = 1e-5) -> jax.Array:
    """GroupNorm over (D, H, W, C/g) per sample — stat-free across batch."""
    b, d, h, w, c = x.shape
    g = min(groups, c)
    while c % g:
        g -= 1
    xf = x.astype(jnp.float32).reshape(b, d, h, w, g, c // g)
    mean = jnp.mean(xf, axis=(1, 2, 3, 5), keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=(1, 2, 3, 5), keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y.reshape(b, d, h, w, c) * p["scale"] + p["bias"]
    return y.astype(x.dtype)
