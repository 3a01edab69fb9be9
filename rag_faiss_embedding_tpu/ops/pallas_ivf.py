"""Pallas fused IVF union-scan kernel: block DMA + MXU matmul + streaming
slot-binned top-candidates selection, all on-chip.

This is the round-3 promotion of ``benchmarks/pallas_fused_proto.py`` into
the shipped IVF path (replacing ``faiss.IndexIVFFlat.search``'s C++ list
scan, reference ``faiss_store.py:49-81`` / BASELINE.md config #3). The
XLA fused path (ops/ivf_scan.py) is materialization-bound: XLA will not
fuse a gather into a dot operand, so the gathered union rows round-trip
HBM once (write + re-read for the matmul) and the scores round-trip again
for selection — 0.81 ms of a 1.45 ms batch at 1M x 384 (docs/PERF.md).
Here the whole probe stage runs inside one Pallas grid:

- **Block DMA via scalar-prefetched index maps.** The union list ids for
  every chunk (``u_all``, computed by the shared coarse/union stage in
  ops/ivf_scan.py) ride in as a scalar-prefetch operand; each grid cell's
  BlockSpec index maps select ``bb`` arbitrary (window, D) list blocks of
  the block-padded storage. Pallas double-buffers these DMAs across grid
  cells, so HBM reads overlap MXU work and the rows never materialize.

- **Per-block MXU matmul.** Each block scores as one (qc, D) x (D, window)
  dot with fp32 accumulation — MXU-shaped for window >= 128.

- **Streaming slot-binned selection (the round-3 fix).** The prototype's
  per-cell exact top-k (k serial masked-argmax passes over the full
  (qc, bb*window) score tile) was ~0.5 ms of VPU work. Instead, each
  query keeps ``window`` bins — one per within-list slot position — and
  each bin holds the ``cap`` best (score, block) pairs seen across ALL
  union blocks. Because a list's rows occupy distinct slots, two
  neighbors in the SAME list can never collide in a bin; cross-list
  collisions need >= ``cap`` better-scoring rows in one slot bin
  (P ~ C(k,cap)/window^cap per neighbor — < 1e-3 at cap=2, window=128).
  The insert is a compare-free max/min chain on a PACKED int32 (the
  order-preserving float trick from ops/pallas_scan._monotone_i32, low
  bits carrying the union-block id): 2 VPU ops per level, ~(4 + 2*cap)
  ops/element total vs ~55 for the masked-argmax loop. Packing truncates
  ceil(log2(U)) low mantissa bits (~2^-15 relative at U=256) — far below
  the bf16 matmul's own rounding, so ranking and returned values are
  unaffected at fp32-oracle recall granularity.

Only the (qc, cap*window) packed candidates per chunk leave the kernel;
unpacking, id lookup, exact final top-k, spill merge, and scale conversion
happen in XLA (ops/ivf_scan.py shares that tail with the XLA backend).

Measured (TPU v5e, 1M x 384, nlist 8192, ucap=qc=256, bf16, top-10):
the masked-argmax prototype tied the XLA path at 694k QPS @ 0.9931; this
kernel removes the selection bottleneck — see docs/PERF.md for the
shipped numbers.
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

from .distance import NEG_INF
from .pallas_scan import _monotone_i32

__all__ = ["union_scan", "decode_topk", "pallas_eligible"]

# target bytes of union blocks resident per grid cell (x2 for Pallas's
# double buffering); 16 x (128, 384) bf16 blocks ~ 1.6 MB
_CELL_BLOCK_BYTES = 2 << 20


def _mono_i32_host(x: float) -> int:
    """Host-side order-preserving f32 -> int32 map (mirrors
    ops/pallas_scan._monotone_i32)."""
    bits = int(np.array(np.float32(x)).view(np.int32))
    return bits ^ 0x7FFFFFFF if bits < 0 else bits


def _unmonotone_f32(mono: jax.Array) -> jax.Array:
    """XLA-side inverse of the order-preserving map."""
    bits = jnp.where(mono < 0, mono ^ jnp.int32(0x7FFFFFFF), mono)
    return lax.bitcast_convert_type(bits, jnp.float32)


def pick_bb(window: int, dim: int, itemsize: int, u_pad: int) -> int:
    """Union blocks per grid cell: amortize per-cell fixed costs (measured
    252k QPS at bb=1 vs 694k at bb=16, docs/PERF.md) while keeping the
    cell's resident blocks within the VMEM budget."""
    block_bytes = window * dim * itemsize
    bb = max(1, min(16, _CELL_BLOCK_BYTES // max(block_bytes, 1)))
    return min(bb, u_pad)


# premask sentinel: dead/padded rows store this as their sqnorm, so
# s = 2 q.x - rsq ~ -1e30 loses to every live row while staying far above
# the 0.5 * NEG_INF validity floor decode_topk checks ids against
_DEAD_SQ = jnp.float32(1e30)


def _make_kernel_v2(bb: int, cap: int, nbits: int, window: int, precision,
                    init_packed: int, ktop: int = 0, kpad: int = 0):
    """L2 fast variant: dead-row masking pre-folded into the rsq operand
    (aux is ONE (1, window) premasked-sqnorm row per list — no rid lane, no
    mask ops), queries pre-doubled outside the kernel (s = dots - rsq), and
    all ``bb`` MXU dots issued before the selection chain so Mosaic can
    overlap matmuls with the (serially dependent) bin inserts.

    ``ktop > 0`` additionally runs the final top-k selection IN-KERNEL at
    the last grid step (``ktop`` masked-max passes over the VMEM-resident
    (QC, cap*window) candidates) and emits (packed, flat-lane) pairs padded
    to ``kpad`` lanes — the XLA-side sort-based top_k over the full packed
    tile cost 0.29 ms of the 0.93 ms headline batch, and the output DMA
    shrinks cap*window/kpad x."""
    mask_lo = (1 << nbits) - 1

    def kern(u_ref, q_ref, *refs):
        blks = refs[:bb]                 # each (1, window, D) codes
        auxs = refs[bb:2 * bb]           # each (1, 1, window) i32 rsq bits
        if ktop:
            out_ref, lane_ref = refs[2 * bb], refs[2 * bb + 1]
            runs = refs[2 * bb + 2]      # scratch (cap, QC, window) int32
        else:
            out_ref = refs[2 * bb]       # (1, QC, cap*window)
            runs = refs[2 * bb + 1]

        b = pl.program_id(1)

        @pl.when(b == 0)
        def _():
            runs[:] = jnp.full_like(runs[:], jnp.int32(init_packed))

        q2 = q_ref[0]                    # (QC, D), pre-doubled
        dots = [
            lax.dot_general(
                q2, blks[j][0], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32, precision=precision,
            )
            for j in range(bb)
        ]                                # each (QC, window) f32
        for j in range(bb):
            rsq = pltpu.bitcast(auxs[j][0], jnp.float32)   # (1, window)
            s = dots[j] - rsq
            jglob = b * bb + j
            t = (_monotone_i32(s) & jnp.int32(~mask_lo)) | jglob
            for lvl in range(cap):
                cur = runs[lvl]
                runs[lvl] = jnp.maximum(cur, t)
                if lvl + 1 < cap:
                    t = jnp.minimum(cur, t)

        @pl.when(b == pl.num_programs(1) - 1)
        def _():
            if ktop:
                cand = jnp.concatenate(
                    [runs[lvl] for lvl in range(cap)], axis=1
                )                        # (QC, cap*window)
                m = cap * window
                li = lax.broadcasted_iota(jnp.int32, cand.shape, 1)
                cur = cand
                cols_v, cols_l = [], []
                for _ in range(ktop):
                    v = jnp.max(cur, axis=1, keepdims=True)
                    hit = cur == v
                    lane = jnp.min(jnp.where(hit, li, m), axis=1,
                                   keepdims=True)
                    cols_v.append(v)
                    cols_l.append(lane)
                    cur = jnp.where(li == lane, jnp.int32(-(2 ** 31)), cur)
                qc_rows = cand.shape[0]
                pad_v = jnp.full((qc_rows, kpad - ktop),
                                 jnp.int32(init_packed))
                pad_l = jnp.zeros((qc_rows, kpad - ktop), jnp.int32)
                out_ref[0] = jnp.concatenate(cols_v + [pad_v], axis=1)
                lane_ref[0] = jnp.concatenate(cols_l + [pad_l], axis=1)
            else:
                for lvl in range(cap):
                    out_ref[0, :, lvl * window:(lvl + 1) * window] = runs[lvl]

    return kern


def _make_kernel(bb: int, cap: int, metric: str, nbits: int, window: int,
                 precision, init_packed: int):
    mask_lo = (1 << nbits) - 1

    def kern(u_ref, q_ref, *refs):
        blks = refs[:bb]                 # each (1, window, D) codes
        auxs = refs[bb:2 * bb]           # each (1, 2, window) i32:
        #                                  row 0 = rsq bits, row 1 = rid
        out_ref = refs[2 * bb]           # (1, QC, cap*window)
        runs = refs[2 * bb + 1]          # scratch (cap, QC, window) int32

        b = pl.program_id(1)

        @pl.when(b == 0)
        def _():
            runs[:] = jnp.full_like(runs[:], jnp.int32(init_packed))

        q = q_ref[0]                     # (QC, D)
        for j in range(bb):
            dots = lax.dot_general(
                q, blks[j][0], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32, precision=precision,
            )                            # (QC, window)
            aux = auxs[j][0]             # (2, window)
            rid = aux[1:2, :]            # (1, window)
            if metric == "L2":
                rsq = pltpu.bitcast(aux[0:1, :], jnp.float32)
                s = 2.0 * dots - rsq
            else:
                s = dots
            s = jnp.where(rid >= 0, s, NEG_INF)
            jglob = b * bb + j           # this block's slot in the union
            packed = (_monotone_i32(s) & jnp.int32(~mask_lo)) | jglob
            # streaming top-`cap` per (query, slot) bin: max/min chain on
            # the packed values — the demoted entry cascades down a level
            t = packed
            for lvl in range(cap):
                cur = runs[lvl]
                runs[lvl] = jnp.maximum(cur, t)
                t = jnp.minimum(cur, t)

        @pl.when(b == pl.num_programs(1) - 1)
        def _():
            for lvl in range(cap):
                out_ref[0, :, lvl * window:(lvl + 1) * window] = runs[lvl]

    return kern


@functools.partial(
    jax.jit,
    static_argnames=("window", "cap", "bb", "metric", "interpret", "variant",
                     "ktop"),
)
def union_scan(
    qs: jax.Array,       # (chunks, QC, D) storage dtype
    u_all: jax.Array,    # (chunks, U) int32 union block ids (may hold the
    #                      sentinel id nlist; U must be a multiple of bb)
    codes3: jax.Array,   # (nlist+1, window, D) block-padded storage
    sorted_sq: jax.Array,   # ((nlist+1)*window,) f32 row sqnorms
    sorted_ids: jax.Array,  # ((nlist+1)*window,) int32 row ids (-1 = dead)
    *,
    window: int,
    cap: int,
    bb: int,
    metric: str,
    interpret: bool,
    variant: int = 1,
    ktop: int = 0,
) -> jax.Array:
    """Scan each chunk's union blocks; return PACKED candidates
    (chunks, QC, cap*window) int32 — order-mapped scores with the low
    ``ceil(log2(U))`` bits carrying the union-block index. Decode with
    :func:`decode_topk`.

    ``ktop > 0`` (variant 2 only) moves the final top-k selection into the
    kernel's last grid step and returns a (packed, flat_lane) PAIR of
    (chunks, QC, 128) arrays — decode with :func:`decode_selected`.

    ``variant=2`` folds dead-row masking into a premasked-sqnorm aux
    operand (``_DEAD_SQ`` rows lose to every live row; decode's ``ids >= 0``
    check drops them if they surface) and pre-scales the queries (x2 for L2
    — exact in any binary float — so the kernel computes ``dots - rsq``
    with no in-kernel multiply or mask select)."""
    chunks, qc, d = qs.shape
    u = u_all.shape[1]
    assert u % bb == 0, (u, bb)
    nb = u // bb
    nbits = max(1, int(np.ceil(np.log2(max(u, 2)))))
    init_packed = _mono_i32_host(NEG_INF) & ~((1 << nbits) - 1)
    precision = (
        lax.Precision.HIGHEST if qs.dtype == jnp.float32
        else lax.Precision.DEFAULT
    )
    if variant == 2:
        rsq_f = (
            sorted_sq.astype(jnp.float32) if metric == "L2"
            else jnp.zeros(sorted_sq.shape, jnp.float32)
        )
        rsq_f = jnp.where(sorted_ids >= 0, rsq_f, _DEAD_SQ)
        # (nlist+1, 1, window): a middle unit dim keeps the block's trailing
        # dims equal to the array's (Mosaic tiling rule — a 2D (1, window)
        # block on (nlist+1, window) is an illegal sub-8 sublane slice)
        aux = lax.bitcast_convert_type(rsq_f, jnp.int32).reshape(
            -1, 1, window)
        aux_block = (1, 1, window)
        aux_map = lambda c, b, u_pre, j=0: (u_pre[c, b * bb + j], 0, 0)
        if metric == "L2":
            qs = (qs.astype(jnp.float32) * 2.0).astype(qs.dtype)
        kpad = 128 if ktop else 0
        assert ktop < cap * window
        kernel = _make_kernel_v2(bb, cap, nbits, window, precision,
                                 init_packed, ktop=ktop, kpad=kpad)
    else:
        assert ktop == 0, "in-kernel top-k is a variant-2 feature"
        # rsq (bitcast to i32) and rid ride ONE (1, 2, window) block per
        # list: separate refs would double the per-block descriptor DMAs
        # (the codes DMA is large; these are ~0.5 KB each, fixed-cost bound)
        aux = jnp.stack(
            [
                lax.bitcast_convert_type(
                    sorted_sq.astype(jnp.float32), jnp.int32
                ).reshape(-1, window),
                sorted_ids.reshape(-1, window),
            ],
            axis=1,
        )                                # (nlist+1, 2, window) i32
        aux_block = (1, 2, window)
        aux_map = lambda c, b, u_pre, j=0: (u_pre[c, b * bb + j], 0, 0)
        kernel = _make_kernel(bb, cap, metric, nbits, window, precision,
                              init_packed)

    in_specs = [pl.BlockSpec((1, qc, d), lambda c, b, u_pre: (c, 0, 0))]
    for j in range(bb):
        in_specs.append(pl.BlockSpec(
            (1, window, d),
            lambda c, b, u_pre, j=j: (u_pre[c, b * bb + j], 0, 0)))
    for j in range(bb):
        in_specs.append(pl.BlockSpec(
            aux_block, functools.partial(aux_map, j=j)))
    if ktop:
        out_specs = [
            pl.BlockSpec((1, qc, kpad), lambda c, b, u_pre: (c, 0, 0)),
            pl.BlockSpec((1, qc, kpad), lambda c, b, u_pre: (c, 0, 0)),
        ]
        out_shape = [
            jax.ShapeDtypeStruct((chunks, qc, kpad), jnp.int32),
            jax.ShapeDtypeStruct((chunks, qc, kpad), jnp.int32),
        ]
        out_bytes = 2 * chunks * qc * kpad * 4
    else:
        out_specs = pl.BlockSpec(
            (1, qc, cap * window), lambda c, b, u_pre: (c, 0, 0)
        )
        out_shape = jax.ShapeDtypeStruct(
            (chunks, qc, cap * window), jnp.int32)
        out_bytes = chunks * qc * cap * window * 4
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(chunks, nb),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=[pltpu.VMEM((cap, qc, window), jnp.int32)],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(
            flops=2 * chunks * qc * u * window * d,
            bytes_accessed=(
                chunks * u * window * d * qs.dtype.itemsize
                + chunks * qc * d * qs.dtype.itemsize
                + out_bytes
            ),
            transcendentals=0,
        ),
        interpret=interpret,
    )(u_all, qs, *([codes3] * bb), *([aux] * bb))


def decode_topk(
    packed: jax.Array,     # (chunks, QC, cap*window) int32 from union_scan
    u_all: jax.Array,      # (chunks, U) int32
    sorted_ids: jax.Array,  # ((nlist+1)*window,) int32
    *,
    window: int,
    k: int,
) -> Tuple[jax.Array, jax.Array]:
    """Exact top-k per query over the packed candidates, then decode ONLY
    the winners. The packed int32s are order-mapped scores, so ``top_k``
    runs on them directly; decoding (bit untwiddle, union lookup, row-id
    gather) touches k elements per query instead of cap*window — decoding
    the full candidate array first cost 9.7 of the path's 10 ms at the 1M
    config (benchmarks/pallas_kernel_probe2.py).

    Returns (scores, global row ids), both (chunks*QC, k), internal
    higher-better scale; invalid slots carry NEG_INF / id -1."""
    chunks, qc, capw = packed.shape
    u = u_all.shape[1]
    nbits = max(1, int(np.ceil(np.log2(max(u, 2)))))
    mask_lo = jnp.int32((1 << nbits) - 1)
    k_eff = min(k, capw)
    flat = packed.reshape(chunks * qc, capw)
    if k_eff <= 16:
        # sort-based top_k cost 0.24 ms of the 1.49 ms headline batch here
        from .distance import small_topk
        bv, pos = small_topk(flat, k_eff)
    else:
        bv, pos = lax.top_k(flat, k_eff)
    lane = pos % window                            # bin == slot-in-window
    jglob = bv & mask_lo
    chunk = lax.broadcasted_iota(
        jnp.int32, (chunks * qc, k_eff), 0
    ) // qc
    blk = u_all[chunk, jnp.minimum(jglob, u - 1)]
    ids = sorted_ids[blk * window + lane]
    vals = _unmonotone_f32(bv & ~mask_lo)
    valid = (vals > 0.5 * NEG_INF) & (ids >= 0)
    vals = jnp.where(valid, vals, NEG_INF)
    ids = jnp.where(valid, ids, -1)
    return vals, ids


def decode_selected(
    packed_k: jax.Array,   # (chunks, QC, kpad) int32 from union_scan(ktop=k)
    lanes: jax.Array,      # (chunks, QC, kpad) int32 flat candidate lanes
    u_all: jax.Array,      # (chunks, U) int32
    sorted_ids: jax.Array,  # ((nlist+1)*window,) int32
    *,
    window: int,
    k: int,
) -> Tuple[jax.Array, jax.Array]:
    """Decode the IN-KERNEL-selected top-k pairs (union_scan ``ktop`` mode):
    same bit untwiddle / union lookup / row-id gather as :func:`decode_topk`
    minus its XLA-side top_k (a sort on TPU — 0.29 ms of the 0.93 ms r04
    headline batch for a (1024, 512) tile). The flat lane encodes the
    candidate's position across the cap levels; position-within-window is
    ``lane % window`` (bins are slot-parallel across levels)."""
    chunks, qc, kpad = packed_k.shape
    u = u_all.shape[1]
    nbits = max(1, int(np.ceil(np.log2(max(u, 2)))))
    mask_lo = jnp.int32((1 << nbits) - 1)
    k_eff = min(k, kpad)
    bv = packed_k[..., :k_eff].reshape(chunks * qc, k_eff)
    lane = lanes[..., :k_eff].reshape(chunks * qc, k_eff) % window
    jglob = bv & mask_lo
    chunk = lax.broadcasted_iota(
        jnp.int32, (chunks * qc, k_eff), 0
    ) // qc
    blk = u_all[chunk, jnp.minimum(jglob, u - 1)]
    ids = sorted_ids[blk * window + lane]
    vals = _unmonotone_f32(bv & ~mask_lo)
    valid = (vals > 0.5 * NEG_INF) & (ids >= 0)
    vals = jnp.where(valid, vals, NEG_INF)
    ids = jnp.where(valid, ids, -1)
    return vals, ids


def pallas_eligible(
    *, platform: str, quantized: bool, window: int, dim: int, qc: int,
    shadow, interpret: bool = False,
) -> bool:
    """Dispatch guard for the Pallas backend: full-precision storage (the
    gated winner is bf16 — int8's shadow rerank stays on the XLA path),
    MXU/VPU-aligned shapes, and a real TPU (or explicit interpret mode)."""
    return (
        (platform == "tpu" or interpret)
        and not quantized
        and shadow is None
        and window % 128 == 0
        and dim % 128 == 0
        and qc >= 16
    )
