"""Whole-image primitives matched to the OpenCV calls in the reference.

- ``gaussian_blur_7x7``: GaussianBlur(Size(7,7), sigma=2, BORDER_REFLECT_101)
  as used before descriptor sampling (``ORBextractor.cc:1130-1134``).
- ``resize_linear``: cv::resize INTER_LINEAR (half-pixel centers) used by
  ``ComputePyramid`` (``ORBextractor.cc:1152-1185``).
- ``quantize_u8``: round-to-integer emulation of the uint8 storage the C++
  pipeline uses between stages, so FAST decisions and descriptor bits match
  the 8-bit reference pipeline on pyramid levels.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def gaussian_kernel(ksize: int = 7, sigma: float = 2.0) -> np.ndarray:
    """cv::getGaussianKernel equivalent (float path)."""
    r = (ksize - 1) / 2
    x = np.arange(ksize) - r
    k = np.exp(-(x * x) / (2.0 * sigma * sigma))
    return (k / k.sum()).astype(np.float32)


def gaussian_blur_7x7(img: jnp.ndarray, sigma: float = 2.0) -> jnp.ndarray:
    """Separable 7x7 blur with reflect-101 borders. img: (H, W) float32."""
    k = jnp.asarray(gaussian_kernel(7, sigma))
    pad = 3
    p = jnp.pad(img, ((pad, pad), (pad, pad)), mode="reflect")
    # rows then cols via 1D convs expressed as dot over a rolled stack:
    # gather 7 shifted rows/cols and weight — XLA fuses this into one pass
    rows = sum(k[i] * p[:, i:i + img.shape[1]] for i in range(7))
    cols = sum(k[i] * rows[i:i + img.shape[0], :] for i in range(7))
    return cols


import functools


@functools.lru_cache(maxsize=None)
def _resize_weights(n_src: int, n_dst: int):
    """(n_dst, n_src) bilinear interpolation matrix with half-pixel centers
    (cv::resize INTER_LINEAR / jax.image.resize 'linear' semantics)."""
    import numpy as np
    scale = n_src / n_dst
    src = (np.arange(n_dst) + 0.5) * scale - 0.5
    i0 = np.clip(np.floor(src).astype(np.int64), 0, n_src - 1)
    i1 = np.minimum(i0 + 1, n_src - 1)
    f = np.clip(src - i0, 0.0, 1.0)
    W = np.zeros((n_dst, n_src), np.float32)
    W[np.arange(n_dst), i0] += 1.0 - f
    W[np.arange(n_dst), i1] += f
    return W


def resize_linear(img: jnp.ndarray, shape) -> jnp.ndarray:
    """Bilinear resize with half-pixel centers (== cv::resize INTER_LINEAR).

    Kept on jax.image.resize: an MXU formulation (two dense
    interpolation-matrix products, see resize_matmul) measured 4% SLOWER
    end-to-end in the tracking chunk — the per-level weight matrices
    reload from HBM every frame while the gather-based lowering stays in
    registers/VMEM."""
    return jax.image.resize(img, shape, method="linear", antialias=False)


def resize_matmul(img: jnp.ndarray, shape) -> jnp.ndarray:
    """Bilinear resize as two interpolation-matrix matmuls (separable
    bilinear = row weights @ img @ col weights^T). Numerically identical to
    resize_linear (max diff ~0.01 gray level); kept for workloads where the
    MXU is idle and HBM is not the constraint."""
    Hs, Ws = img.shape
    Hd, Wd = shape
    Wh = jnp.asarray(_resize_weights(Hs, Hd))
    Ww = jnp.asarray(_resize_weights(Ws, Wd))
    with jax.default_matmul_precision("float32"):
        return Wh @ img @ Ww.T


def quantize_u8(img: jnp.ndarray) -> jnp.ndarray:
    """Round to integral values in [0, 255] but keep float32 (TPU-friendly)."""
    return jnp.clip(jnp.round(img), 0.0, 255.0)


def max_pool_3x3(x: jnp.ndarray, strict_neighbors: bool = True) -> jnp.ndarray:
    """Max over the 8-neighborhood (excluding center when strict_neighbors),
    zero-padded at the border. Used for FAST non-max suppression."""
    shifts = [(dy, dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1)
              if not (strict_neighbors and dy == 0 and dx == 0)]
    H, W = x.shape
    out = jnp.full_like(x, -jnp.inf)
    p = jnp.pad(x, 1, constant_values=-jnp.inf)
    for dy, dx in shifts:
        out = jnp.maximum(out, p[1 + dy:1 + dy + H, 1 + dx:1 + dx + W])
    return out
