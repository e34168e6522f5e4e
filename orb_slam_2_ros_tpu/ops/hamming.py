"""Batched Hamming distance over 256-bit ORB descriptors.

Replaces ``ORBmatcher::DescriptorDistance`` (``ORBmatcher.cc:1649-1665``, the
Stanford bit-twiddling popcount over 8 uint32 words) with the same popcount
expressed as whole-matrix uint32 ops: an (N, M) distance matrix is one
XOR-popcount-reduce, which XLA vectorizes on the VPU. All matcher variants
(§2.7) consume this matrix with candidate-gate masks instead of per-pair
scalar loops.
"""

from __future__ import annotations

import jax.numpy as jnp

# sentinel distance for masked-out pairs; real distances are <= 256
INF_DIST = 1 << 10


def popcount_u32(v: jnp.ndarray) -> jnp.ndarray:
    """Bit population count of uint32 values (same bit trick as the
    reference's DescriptorDistance)."""
    v = v - ((v >> 1) & jnp.uint32(0x55555555))
    v = (v & jnp.uint32(0x33333333)) + ((v >> 2) & jnp.uint32(0x33333333))
    v = (v + (v >> 4)) & jnp.uint32(0x0F0F0F0F)
    return ((v * jnp.uint32(0x01010101)) >> 24).astype(jnp.int32)


def unpack_pm1(a: jnp.ndarray) -> jnp.ndarray:
    """(N, 8) uint32 -> (N, 256) bfloat16 in {-1, +1} (bit=1 -> -1)."""
    shifts = jnp.arange(32, dtype=jnp.uint32)
    bits = (a[:, :, None] >> shifts[None, None, :]) & jnp.uint32(1)
    pm = 1.0 - 2.0 * bits.astype(jnp.bfloat16)
    return pm.reshape(a.shape[0], 256)


def hamming_matrix(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """a: (N, 8) uint32, b: (M, 8) uint32 -> (N, M) int32 Hamming distances.

    Computed on the MXU: with bits mapped to +-1, ``dot(a, b) = 256 - 2 *
    hamming`` — one (N, 256) x (256, M) bfloat16 matmul with f32
    accumulation is exact (every intermediate is an integer <= 256) and an
    order of magnitude faster than the VPU xor-popcount path at matcher
    sizes (SURVEY.md §7.1: "batched Hamming ... as an (N x M) tile kernel").
    """
    pa = unpack_pm1(a)
    pb = unpack_pm1(b)
    dot = jnp.dot(pa, pb.T, preferred_element_type=jnp.float32)
    return ((256.0 - dot) * 0.5).astype(jnp.int32)


def hamming_matrix_popcount(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Reference xor-popcount path (kept as the oracle for the MXU version
    and for hosts without an MXU)."""
    x = a[:, None, :] ^ b[None, :, :]
    return jnp.sum(popcount_u32(x), axis=-1)


def hamming_pairs(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Elementwise rows: a, b (..., 8) uint32 -> (...,) int32."""
    return jnp.sum(popcount_u32(a ^ b), axis=-1)


def best_two(dist: jnp.ndarray, mask: jnp.ndarray):
    """Per-row best and second-best over a masked distance matrix.

    dist: (N, M) int32; mask: (N, M) bool (True = allowed candidate).
    Returns (best_idx (N,), best_d (N,), second_idx (N,), second_d (N,)).
    Rows with no candidate get best_d = INF_DIST.
    """
    d = jnp.where(mask, dist, INF_DIST)
    best_idx = jnp.argmin(d, axis=1)
    best_d = jnp.take_along_axis(d, best_idx[:, None], axis=1)[:, 0]
    d2 = d.at[jnp.arange(d.shape[0]), best_idx].set(INF_DIST)
    second_idx = jnp.argmin(d2, axis=1)
    second_d = jnp.take_along_axis(d2, second_idx[:, None], axis=1)[:, 0]
    return best_idx, best_d, second_idx, second_d
