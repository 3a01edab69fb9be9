"""Pallas PQ decode kernel: codes -> dense bf16 rows via one-hot MXU.

Why a kernel: XLA lowers the decode's codebook gather to ~0.3 ns/element
scalar-ish gathers AND lane-pads the (N, dsub=8) gather output 16x on TPU
(measured: 121 ms to decode a 1M x 48 chunk that the downstream matmul
consumes in ~2 ms; the padded temp OOMed the 10M config at nprobe 64).

The TPU-native formulation avoids gathers entirely: a code IS a one-hot
row index, so decoding is a MATMUL — build (rows, g*ksub) one-hot tiles on
the VPU (iota compare, VMEM-only, never materialized to HBM) and multiply
by a block-diagonal GROUPED codebook (g subspaces per group so the MXU
output is a full 128-lane tile; per-subspace matmuls would waste 15/16 of
the array on dsub=8 columns). HBM traffic: M bytes of codes in, 2D bytes
of rows out — the minimum the decode can do.

Used by the IVF-PQ fused scan and the flat PQ scan when eligible; the XLA
gather decode (ops/pq._decode_bf16) stays as the semantics reference and
CPU path. Exact agreement is tested in interpret mode.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def pick_group(m: int, dsub: int) -> int:
    """Largest divisor g of m with g*dsub <= 128 (full-lane MXU output)."""
    g = max(1, 128 // max(dsub, 1))
    while g > 1 and m % g:
        g -= 1
    return g


def grouped_codebook(codebooks: jax.Array, g: int) -> jax.Array:
    """(M, ksub, dsub) -> (G, g*ksub, g*dsub) bf16 block-diagonal groups.

    Group j holds subspaces j*g..j*g+g-1; row i*ksub+c of W_j is codeword c
    of subspace j*g+i placed at columns [i*dsub, (i+1)*dsub) — so
    ``onehot(codes_group) @ W_j`` concatenates the g decoded subvectors."""
    m, ksub, dsub = codebooks.shape
    G = m // g
    w = np.zeros((G, g * ksub, g * dsub), np.float32)
    cb = np.asarray(codebooks, np.float32)
    for j in range(G):
        for i in range(g):
            w[j, i * ksub : (i + 1) * ksub, i * dsub : (i + 1) * dsub] = \
                cb[j * g + i]
    return jnp.asarray(w, jnp.bfloat16)


def _decode_kernel(codes_ref, w_ref, out_ref, *, g: int, ksub: int,
                   dsub: int):
    codes = codes_ref[...].astype(jnp.int32)          # (BR, M)
    br, m = codes.shape
    G = m // g
    for j in range(G):                                 # static unroll
        cj = codes[:, j * g : (j + 1) * g]             # (BR, g)
        col = lax.broadcasted_iota(jnp.int32, (br, g, ksub), 2)
        oh = (cj[:, :, None] == col).astype(jnp.bfloat16)
        oh = oh.reshape(br, g * ksub)                  # VMEM-only one-hot
        dec = jnp.dot(oh, w_ref[j], preferred_element_type=jnp.float32)
        out_ref[:, j * g * dsub : (j + 1) * g * dsub] = \
            dec.astype(out_ref.dtype)


def decode_eligible(platform: str, m: int, ksub: int, dsub: int,
                    n_rows: int, interpret: bool = False) -> bool:
    """Kernel constraints: TPU (or interpret for tests), a group shape that
    fills MXU lanes, 128-aligned rows, full uint8 code range."""
    g = pick_group(m, dsub)
    return (
        (platform == "tpu" or interpret)
        and g * dsub == 128          # full-lane output tiles
        and ksub in (16, 32, 64, 128, 256)
        and n_rows % 128 == 0
    )


def decode(
    codebooks: Tuple[int, int, int] | jax.Array,  # (M, ksub, dsub) shape/arr
    codes: jax.Array,       # (N, M) uint8, N % 128 == 0
    block_rows: int = 512,
    interpret: bool = False,
    w: jax.Array = None,    # precomputed grouped_codebook (REQUIRED under
    #                         jit: grouped_codebook runs host numpy)
) -> jax.Array:
    """Decode codes to (N, D) bf16 reconstructions on the MXU."""
    if w is None:
        m, ksub, dsub = codebooks.shape
        g = pick_group(m, dsub)
        w = grouped_codebook(codebooks, g)
    else:
        m, ksub, dsub = codebooks if isinstance(codebooks, tuple) \
            else codebooks.shape
        g = pick_group(m, dsub)
    n = codes.shape[0]
    br = block_rows if n % block_rows == 0 else 128
    if n % br:
        raise ValueError(f"rows {n} not a multiple of {br}")
    G = m // g
    kernel = functools.partial(_decode_kernel, g=g, ksub=ksub, dsub=dsub)
    return pl.pallas_call(
        kernel,
        grid=(n // br,),
        in_specs=[
            pl.BlockSpec((br, m), lambda i: (i, 0)),
            pl.BlockSpec((G, g * ksub, g * dsub), lambda i: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((br, m * dsub), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((n, m * dsub), jnp.bfloat16),
        interpret=interpret,
    )(codes, w)
