"""Fused masked best-two descriptor matching as a Pallas TPU kernel.

The matcher variants (SURVEY.md §2.7) all reduce to: Hamming distances
between two descriptor sets, a per-pair candidate gate (search window,
octave band, stereo right-coordinate check), and a per-query best/second-
best reduction. The JAX path materializes the (N, M) distance matrix plus
several (N, M) gate masks in HBM; at the local-map search size
(16384 x 1536) that is hundreds of MB of traffic per frame.

This kernel streams: each grid step computes one (TN, TM) distance tile on
the MXU (bits pre-mapped to +-1 bfloat16, so ``hamming = (256 - dot) / 2``
exactly), applies the gates from small per-row/per-column metadata, and
folds the tile into running best/second keys kept in VMEM scratch — nothing
(N, M)-shaped ever touches HBM. Keys pack ``distance << 15 | column`` into
int32 so one min reduction yields both the distance and the argmin.

Gates replicated from the JAX matcher (frontend/matcher.py):
 - window: |u_row - u_col| <= r_row and |v_row - v_col| <= r_row
 - octave band: oct_lo_row <= oct_col <= oct_hi_row
 - stereo: |ur_row - ur_col| <= r_row where ur_col > 0
 - validity of both endpoints
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_KEY_INF = 2 ** 30          # plain int: jnp constants may not be captured
_IDX_BITS = 15    # supports M < 32768 candidates


def _pick_tile(n: int, cap: int, quantum: int) -> int:
    """Largest divisor of n that is <= cap and a multiple of quantum."""
    t = cap
    while t >= quantum:
        if n % t == 0:
            return t
        t -= quantum
    raise ValueError(f"no tile for n={n} (quantum {quantum})")


def _kernel(pa_ref, row_meta_ref, pb_ref, col_meta_ref,
            bk_ref, sk_ref, best_scratch, second_scratch, *, TN, TM):
    j = pl.program_id(1)
    nj = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        best_scratch[:] = jnp.full((1, TN), _KEY_INF, jnp.int32)
        second_scratch[:] = jnp.full((1, TN), _KEY_INF, jnp.int32)

    # ---- distance tile on the MXU: hamming = (256 - <pa, pb>) / 2
    dot = jnp.dot(pa_ref[:], pb_ref[:].T, preferred_element_type=jnp.float32)
    d = ((256.0 - dot) * 0.5).astype(jnp.int32)              # (TN, TM)

    # ---- gates from the metadata rows
    # row_meta: (8, TN) = [u, v, radius, oct_lo, oct_hi, ur, ok, unused]
    # col_meta: (8, TM) = [u, v, oct, ur, ok, unused...]
    ru = row_meta_ref[0, :][:, None]
    rv = row_meta_ref[1, :][:, None]
    rr = row_meta_ref[2, :][:, None]
    rlo = row_meta_ref[3, :][:, None]
    rhi = row_meta_ref[4, :][:, None]
    rur = row_meta_ref[5, :][:, None]
    rok = row_meta_ref[6, :][:, None] > 0
    cu = col_meta_ref[0, :][None, :]
    cv = col_meta_ref[1, :][None, :]
    co = col_meta_ref[2, :][None, :]
    cur = col_meta_ref[3, :][None, :]
    cok = col_meta_ref[4, :][None, :] > 0

    ok = (rok & cok
          & (jnp.abs(ru - cu) <= rr) & (jnp.abs(rv - cv) <= rr)
          & (co >= rlo) & (co <= rhi))
    stereo_ok = (cur <= 0) | (jnp.abs(rur - cur) <= rr)
    ok = ok & stereo_ok

    # ---- pack keys and fold the tile into the running best/second
    col0 = j * TM
    cols = col0 + jax.lax.broadcasted_iota(jnp.int32, (TN, TM), 1)
    key = jnp.where(ok, (d << _IDX_BITS) | cols, _KEY_INF)

    t1 = jnp.min(key, axis=1)                                 # (TN,)
    key2 = jnp.where(key == t1[:, None], _KEY_INF, key)
    t2 = jnp.min(key2, axis=1)

    b1 = best_scratch[0, :]
    b2 = second_scratch[0, :]
    new_b1 = jnp.minimum(b1, t1)
    new_b2 = jnp.minimum(jnp.maximum(b1, t1), jnp.minimum(b2, t2))
    best_scratch[0, :] = new_b1
    second_scratch[0, :] = new_b2

    @pl.when(j == nj - 1)
    def _():
        bk_ref[0, :] = best_scratch[0, :]
        sk_ref[0, :] = second_scratch[0, :]


@functools.partial(jax.jit, static_argnames=("interpret",))
def masked_best_two(pa, row_meta, pb, col_meta, interpret: bool = False):
    """pa (N, 256) bf16 +-1; pb (M, 256) bf16 +-1; row_meta (8, N) f32;
    col_meta (8, M) f32 (layouts in the kernel docstring). N % 128 == 0,
    M % 512 == 0, M < 32768.

    Returns (best_idx, best_d, second_idx, second_d), each (N,); rows with
    no candidate get d = INF_DIST-like large values and idx = 0.
    """
    N = pa.shape[0]
    M = pb.shape[0]
    assert N % 128 == 0 and M % 128 == 0 and M < (1 << _IDX_BITS), (N, M)
    TN = _pick_tile(N, 256, 128)
    TM = _pick_tile(M, 2048, 128)
    grid = (N // TN, M // TM)

    bk, sk = pl.pallas_call(
        functools.partial(_kernel, TN=TN, TM=TM),
        grid=grid,
        in_specs=[
            pl.BlockSpec((TN, 256), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, TN), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TM, 256), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, TM), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, TN), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TN), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((1, N), jnp.int32),
            jax.ShapeDtypeStruct((1, N), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((1, TN), jnp.int32),
            pltpu.VMEM((1, TN), jnp.int32),
        ],
        interpret=interpret,
    )(pa, row_meta, pb, col_meta)

    bk = bk[0]
    sk = sk[0]
    mask = jnp.int32((1 << _IDX_BITS) - 1)
    best_idx = bk & mask
    best_d = bk >> _IDX_BITS
    second_idx = sk & mask
    second_d = sk >> _IDX_BITS
    return best_idx, best_d, second_idx, second_d
