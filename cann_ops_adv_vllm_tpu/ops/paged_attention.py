"""Paged flash-decode attention Pallas kernel (dense and sparse).

TPU-native reimplementation of the reference's IncreFlashAttention /
SparsePagedAttention device kernels (incre_flash_attention_split_Bbn2s2_Us2.h,
sparse_paged_attention_split_Bbn2s2_Us2.h).  Architectural mapping:

* The reference's cube-side gather callbacks (``bmm1CopyB1``/``bmm2CopyB1``,
  split header :129-326) walk ``curSeqIdx → block_position → block_table →
  physical page``.  Here the indirection chain is resolved **ahead of the
  kernel** by a tiny XLA gather (:func:`_precompute_meta`) into flat
  ``(page id, token count)`` arrays that are **scalar-prefetched**; the
  kernel reads two scalars per page and issues one async DMA per page.
* K and V of a page are stored as one lane-interleaved record
  ``[page_size, 2*head_dim]`` (:func:`fuse_kv`) so a single DMA fetches
  both — DMA-issue rate, not bandwidth, is the binding constraint at page
  granularity — and the kernel recovers K/V as free lane slices, keeping
  the two matmuls a single full-width ``[G, bk]×[bk, D]`` pair.
* The reference's cube↔vector pipeline with GM ping-pong workspace
  (:2375-2397) becomes double-buffered VMEM page DMA overlapped with the
  MXU matmuls; its per-core (batch × kv-head) split (tiling.cc:1134-1346)
  becomes the Pallas grid ``(batch, kv_head, kv_block)``.
* Its FlashSoftmax-V2 running (max, sum, exp) state in UB (:2564-2720)
  becomes fp32 VMEM scratch carried across the kv_block grid dimension.
* Its sentinel (0x7FFFFFFF) + fix_length=30 tail hack (:293-307) is replaced
  by clean per-token length masking.
* Its MSD int8 antiquant residual-digit trick (:1752-1868) is replaced by
  direct per-channel dequantization folded around the matmuls — the TPU MXU
  takes bf16/f32 natively so int8×int8 emulation is unnecessary; int8 KV
  still halves page-DMA bytes, which is the actual bottleneck.

**Dense == sparse with identity positions**: the dense path passes
``positions[b, 0, i] = i`` so one kernel serves both IncreFlashAttention
and SparsePagedAttention capability (the ``H_pos`` axis broadcasts: 1 for
dense/shared, ``num_kv_heads`` for per-group sparse).

Shapes (TPU-native layouts, see config.KVCacheConfig):
  q:           [B, H_q, D]                 (H_q = H_kv * G)
  kv_pages:    [H_kv, P, page_size, 2*D]   fused records (K lanes | V lanes)
  block_table: [B, max_page] int32         logical slot → physical page
  seq_lens:    [B] int32                   true token counts
  positions:   [B, H_pos, max_blocks] int32  selected logical slots
  position_lens: [B, H_pos] int32          valid slot counts
  out:         [B, H_q, D]
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import MASK_VALUE, PAGE_SIZE
from ..utils import validation


def _cdiv(a, b):
    return (a + b - 1) // b


def fuse_kv(k_pages, v_pages):
    """Pack separate K/V page arrays into lane-interleaved fused records.

    [H_kv, P, ps, D] × 2  →  [H_kv, P, ps, 2*D] with K in lanes [:D] and V
    in lanes [D:].  The runtime KV cache maintains this layout natively:
    one DMA per page fetches both K and V, and the kernel recovers each
    with a free lane-dimension slice (D is a multiple of the 128-lane
    tile), keeping the Q·Kᵀ and P·V matmuls full-width.
    """
    return jnp.concatenate([k_pages, v_pages], axis=3)


def _precompute_meta(block_table, seq_lens, positions, position_lens,
                     page_size, num_pages_total):
    """Resolve the two-level indirection ahead of the kernel.

    Returns (page_ids [B,Hp,M] int32, counts [B,Hp,M] int32,
    nblk [B,Hp] int32 clamped ≥ 1).  Invalid entries get page 0 / count 0;
    the kernel skips their DMA and masks their tokens.
    """
    b, h_pos, max_blocks = positions.shape
    max_page = block_table.shape[1]
    idx_valid = (jnp.arange(max_blocks, dtype=jnp.int32)[None, None, :]
                 < position_lens[:, :, None])
    slots = jnp.clip(positions, 0, max_page - 1)
    pids = jnp.take_along_axis(
        jnp.broadcast_to(block_table[:, None, :].astype(jnp.int32),
                         (b, h_pos, max_page)),
        jnp.where(idx_valid, slots, 0), axis=2)
    pids = jnp.clip(pids, 0, num_pages_total - 1)
    counts = jnp.clip(
        seq_lens[:, None, None].astype(jnp.int32) - slots * page_size,
        0, page_size)
    counts = jnp.where(idx_valid, counts, 0)
    nblk = jnp.maximum(position_lens.astype(jnp.int32), 1)
    return (pids.astype(jnp.int32), counts.astype(jnp.int32), nblk)


def _kernel(
    # --- scalar prefetch ---
    nblk_ref,       # [B, H_pos] int32
    pid_ref,        # [B, H_pos, M] int32
    cnt_ref,        # [B, H_pos, M] int32
    # --- inputs ---
    q_ref,          # [1, 1, Gp, D] VMEM
    kv_pages_ref,   # [H_kv, P, ps, 2*D] ANY (HBM) — lane-interleaved K|V
    k_scale_ref,    # [H_kv, D] VMEM (full array; indexed by kv head)
    k_offset_ref,
    v_scale_ref,
    v_offset_ref,
    # --- outputs ---
    o_ref,          # [1, 1, Gp, D] VMEM
    lse_ref,        # [1, 1, Gp, 128] VMEM (fp32) or None
    # --- scratch ---
    kv_buf,         # [2, ppcb*ps, 2*D] VMEM, kv dtype
    sem,            # DMA sems [2, ppcb]
    m_scr,          # [Gp, 128] f32
    l_scr,          # [Gp, 128] f32
    acc_scr,        # [Gp, D] f32
    slot_ref,       # SMEM [1] int32 — double-buffer index
    *,
    ppcb: int,
    page_size: int,
    sm_scale: float,
    batch: int,
    h_kv: int,
    h_pos: int,
    quantized: bool,
):
    b = pl.program_id(0)
    hk = pl.program_id(1)
    i = pl.program_id(2)
    bk = ppcb * page_size

    def hp_of(hh):
        return jax.lax.rem(hh, h_pos)

    def block_dmas(bb, hh, ii, slot):
        hp = hp_of(hh)
        copies = []
        for j in range(ppcb):
            idx = ii * ppcb + j
            copies.append((
                cnt_ref[bb, hp, idx] > 0,
                pltpu.make_async_copy(
                    kv_pages_ref.at[hh, pid_ref[bb, hp, idx]],
                    kv_buf.at[slot, pl.ds(j * page_size, page_size), :],
                    sem.at[slot, j],
                ),
            ))
        return copies

    def start_block(bb, hh, ii, slot):
        for cond, dma in block_dmas(bb, hh, ii, slot):
            @pl.when(cond)
            def _():
                dma.start()

    def wait_block(bb, hh, ii, slot):
        for cond, dma in block_dmas(bb, hh, ii, slot):
            @pl.when(cond)
            def _():
                dma.wait()

    active = i * ppcb < nblk_ref[b, hp_of(hk)]

    @pl.when(active)
    def _run():
        # --- warm-up: very first grid step prefetches its own block ---
        @pl.when((b == 0) & (hk == 0) & (i == 0))
        def _():
            slot_ref[0] = 0
            start_block(b, hk, i, 0)

        slot = slot_ref[0]

        # --- per-(b,hk) init of flash state ---
        @pl.when(i == 0)
        def _():
            m_scr[...] = jnp.full_like(m_scr, MASK_VALUE)
            l_scr[...] = jnp.zeros_like(l_scr)
            acc_scr[...] = jnp.zeros_like(acc_scr)

        # --- prefetch the next active block into the other buffer ---
        n_i_here = jax.lax.div(nblk_ref[b, hp_of(hk)] + (ppcb - 1), ppcb)
        last_here = i + 1 >= n_i_here
        nxt_hk = jnp.where(last_here, jnp.where(hk + 1 < h_kv, hk + 1, 0), hk)
        nxt_b = jnp.where(last_here & (hk + 1 >= h_kv), b + 1, b)
        nxt_i = jnp.where(last_here, 0, i + 1)

        @pl.when(nxt_b < batch)
        def _():
            start_block(nxt_b, nxt_hk, nxt_i, 1 - slot)
        slot_ref[0] = 1 - slot

        wait_block(b, hk, i, slot)

        hp = hp_of(hk)
        d = acc_scr.shape[-1]

        # --- token validity masks from prefetched counts ---
        tok_c = jax.lax.broadcasted_iota(jnp.int32, (1, bk), 1)
        tok_r = jax.lax.broadcasted_iota(jnp.int32, (bk, 1), 0)
        col_valid = jnp.zeros((1, bk), dtype=jnp.bool_)
        row_valid = jnp.zeros((bk, 1), dtype=jnp.bool_)
        for j in range(ppcb):
            cnt = cnt_ref[b, hp, i * ppcb + j]
            lo = j * page_size
            col_valid = col_valid | ((tok_c >= lo) & (tok_c < lo + cnt))
            row_valid = row_valid | ((tok_r >= lo) & (tok_r < lo + cnt))

        q = q_ref[0, 0].astype(jnp.float32)                    # [Gp, D]
        kvb = kv_buf[slot]                                     # [bk, 2D]
        k = kvb[:, :d].astype(jnp.float32)                     # lane slice
        v = kvb[:, d:].astype(jnp.float32)
        # rows of skipped-DMA pages are uninitialized (NaN/inf): zero them
        # so 0-weight × garbage can't poison the matmuls
        k = jnp.where(row_valid, k, 0.0)
        v = jnp.where(row_valid, v, 0.0)
        if quantized:
            k = (k * k_scale_ref[pl.ds(hk, 1), :]
                 + k_offset_ref[pl.ds(hk, 1), :])
            v = (v * v_scale_ref[pl.ds(hk, 1), :]
                 + v_offset_ref[pl.ds(hk, 1), :])

        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * sm_scale                                            # [Gp, bk]
        s = jnp.where(col_valid, s, MASK_VALUE)

        # --- online softmax update (FlashSoftmax-V2 analog) ---
        m_prev = m_scr[...]
        l_prev = l_scr[...]
        m_curr = jnp.max(s, axis=1, keepdims=True)             # [Gp, 1]
        m_next = jnp.maximum(m_prev[:, :1], m_curr)
        alpha = jnp.exp(m_prev[:, :1] - m_next)
        p = jnp.exp(s - m_next)                                # [Gp, bk]
        p = jnp.where(col_valid, p, 0.0)
        l_next = alpha * l_prev[:, :1] + jnp.sum(p, axis=1, keepdims=True)
        m_scr[...] = jnp.broadcast_to(m_next, m_scr.shape)
        l_scr[...] = jnp.broadcast_to(l_next, l_scr.shape)

        o_curr = jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc_scr[...] = acc_scr[...] * alpha + o_curr

        # --- final block for this (b, hk): normalize and emit ---
        @pl.when(last_here)
        def _():
            l = l_scr[:, :1]
            l_inv = jnp.where(l == 0.0, 0.0, 1.0 / l)
            o_ref[0, 0] = (acc_scr[...] * l_inv).astype(o_ref.dtype)
            if lse_ref is not None:
                lse = m_scr[:, :1] + jnp.log(jnp.maximum(l, 1e-30))
                lse = jnp.where(l == 0.0, MASK_VALUE, lse)
                lse_ref[0, 0] = jnp.broadcast_to(lse, lse_ref.shape[2:])


@functools.partial(
    jax.jit,
    static_argnames=("sm_scale", "page_size", "ppcb", "return_lse",
                     "interpret"),
)
def paged_flash_decode(
    q,
    k_pages,
    v_pages=None,
    block_table=None,
    seq_lens=None,
    positions=None,
    position_lens=None,
    *,
    kv_scales=None,
    sm_scale=None,
    page_size=PAGE_SIZE,
    ppcb=8,
    return_lse=False,
    interpret=None,
):
    """Flash-decode paged attention over (optionally) selected pages.

    Dense (IncreFlashAttention parity): omit ``positions`` — every logical
    page up to ``ceil(seq_len/page_size)`` is attended.

    Sparse (SparsePagedAttention parity): pass ``positions``
    [B, H_pos, max_blocks] int32 (ascending logical slots, from
    :func:`..ops.cent_select.cent_select`) and ``position_lens``
    [B, H_pos] int32.  ``H_pos`` is 1 (shared) or ``H_kv`` (per KV head).

    KV may be passed as separate ``k_pages``/``v_pages`` [H_kv, P, ps, D]
    (fused on the fly — costs a copy) or as pre-fused lane-interleaved
    records ``k_pages`` [H_kv, P, ps, 2*D] with ``v_pages=None`` (the
    runtime cache layout; zero-copy).

    Quantized KV: int8 pages plus ``kv_scales=(k_scale, k_offset, v_scale,
    v_offset)`` each [H_kv, D] (per-channel antiquant, reference dequant
    convention ``x*scale + offset``).

    Returns [B, H_q, D] in q's dtype (and optionally LSE [B, H_q] fp32).
    """
    b, h_q, d = q.shape
    if v_pages is not None:
        kv_pages = fuse_kv(k_pages, v_pages)
    else:
        kv_pages = k_pages
    validation.check_attention_inputs(
        "paged_flash_decode", q, kv_pages, block_table, seq_lens,
        page_size=page_size, quantized=kv_scales is not None)
    h_kv, num_pages_total, _, _ = kv_pages.shape
    g = h_q // h_kv
    gp = max(g, 8)
    if sm_scale is None:
        sm_scale = float(1.0 / (d ** 0.5))

    max_page = block_table.shape[1]
    if positions is None:
        max_blocks = max_page
        positions = jnp.broadcast_to(
            jnp.arange(max_blocks, dtype=jnp.int32)[None, None, :],
            (b, 1, max_blocks))
        page_len = (seq_lens.astype(jnp.int32) + page_size - 1) // page_size
        position_lens = page_len[:, None]
    else:
        max_blocks = positions.shape[2]
    h_pos = positions.shape[1]

    pids, counts, nblk = _precompute_meta(
        block_table, seq_lens, positions.astype(jnp.int32),
        position_lens.astype(jnp.int32), page_size, num_pages_total)

    # pad the block axis to a multiple of ppcb so the kernel's tail
    # compute-block never indexes past the metadata arrays
    m_pad = _cdiv(max_blocks, ppcb) * ppcb
    if m_pad != max_blocks:
        pad = ((0, 0), (0, 0), (0, m_pad - max_blocks))
        pids = jnp.pad(pids, pad)
        counts = jnp.pad(counts, pad)

    # pad the group dim to the fp32 sublane minimum (8)
    qg = q.reshape(b, h_kv, g, d)
    if gp != g:
        qg = jnp.pad(qg, ((0, 0), (0, 0), (0, gp - g), (0, 0)))

    quantized = kv_scales is not None
    if quantized:
        k_scale, k_offset, v_scale, v_offset = (
            s.astype(jnp.float32) for s in kv_scales)
    else:
        zeros = jnp.zeros((h_kv, d), jnp.float32)
        k_scale = k_offset = v_scale = v_offset = zeros

    if interpret is None:
        interpret = jax.default_backend() == "cpu"

    grid = (b, h_kv, _cdiv(max_blocks, ppcb))

    def head_spec(width):
        return pl.BlockSpec((1, 1, gp, width),
                            lambda bb, hh, ii, *refs: (bb, hh, 0, 0))

    kernel = functools.partial(
        _kernel,
        ppcb=ppcb,
        page_size=page_size,
        sm_scale=sm_scale,
        batch=b,
        h_kv=h_kv,
        h_pos=h_pos,
        quantized=quantized,
    )

    out_shapes = [jax.ShapeDtypeStruct((b, h_kv, gp, d), q.dtype)]
    out_specs = [head_spec(d)]
    if return_lse:
        out_shapes.append(jax.ShapeDtypeStruct((b, h_kv, gp, 128),
                                               jnp.float32))
        out_specs.append(head_spec(128))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=grid,
        in_specs=[
            head_spec(d),                               # q
            pl.BlockSpec(memory_space=pl.ANY),          # kv_pages (HBM)
            pl.BlockSpec(memory_space=pltpu.VMEM),      # k_scale
            pl.BlockSpec(memory_space=pltpu.VMEM),      # k_offset
            pl.BlockSpec(memory_space=pltpu.VMEM),      # v_scale
            pl.BlockSpec(memory_space=pltpu.VMEM),      # v_offset
        ],
        out_specs=out_specs if return_lse else out_specs[0],
        scratch_shapes=[
            pltpu.VMEM((2, ppcb * page_size, 2 * d), kv_pages.dtype),
            pltpu.SemaphoreType.DMA((2, ppcb)),
            pltpu.VMEM((gp, 128), jnp.float32),
            pltpu.VMEM((gp, 128), jnp.float32),
            pltpu.VMEM((gp, d), jnp.float32),
            pltpu.SMEM((1,), jnp.int32),
        ],
    )

    def wrapped_kernel(*args):
        if return_lse:
            (nblk_r, pid_r, cnt_r, q_r, kv_r, ks_r, ko_r, vs_r, vo_r,
             o_r, lse_r, *scratch) = args
        else:
            (nblk_r, pid_r, cnt_r, q_r, kv_r, ks_r, ko_r, vs_r, vo_r,
             o_r, *scratch) = args
            lse_r = None
        kernel(nblk_r, pid_r, cnt_r, q_r, kv_r, ks_r, ko_r, vs_r, vo_r,
               o_r, lse_r, *scratch)

    result = pl.pallas_call(
        wrapped_kernel,
        out_shape=out_shapes if return_lse else out_shapes[0],
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(
        nblk, pids, counts,
        qg, kv_pages,
        k_scale, k_offset, v_scale, v_offset,
    )

    if return_lse:
        out, lse = result
        out = out[:, :, :g, :].reshape(b, h_q, d)
        lse = lse[:, :, :g, 0].reshape(b, h_q)
        return out, lse
    return result[:, :, :g, :].reshape(b, h_q, d)


def paged_attention_xla(q, k_pages, v_pages, block_table, seq_lens,
                        positions=None, position_lens=None, *,
                        kv_scales=None, sm_scale=None, page_size=PAGE_SIZE):
    """Pure-XLA fallback implementation (gather + masked softmax).

    Semantically identical to :func:`paged_flash_decode`; used for
    cross-checking the kernel on-device and as the non-Pallas baseline in
    benchmarks.  Materializes the gathered KV — O(B·H·S·D) memory.
    """
    b, h_q, d = q.shape
    h_kv, num_pages_total, ps, _ = k_pages.shape
    g = h_q // h_kv
    if sm_scale is None:
        sm_scale = float(1.0 / (d ** 0.5))

    max_page = block_table.shape[1]
    if positions is None:
        max_blocks = max_page
        positions = jnp.broadcast_to(
            jnp.arange(max_blocks, dtype=jnp.int32)[None, None, :],
            (b, 1, max_blocks))
        page_len = (seq_lens.astype(jnp.int32) + page_size - 1) // page_size
        position_lens = page_len[:, None]
    else:
        max_blocks = positions.shape[2]
    h_pos = positions.shape[1]

    kq = k_pages.astype(jnp.float32)
    vq = v_pages.astype(jnp.float32)
    if kv_scales is not None:
        k_scale, k_offset, v_scale, v_offset = (
            s.astype(jnp.float32) for s in kv_scales)
        kq = kq * k_scale[:, None, None, :] + k_offset[:, None, None, :]
        vq = vq * v_scale[:, None, None, :] + v_offset[:, None, None, :]

    idx_valid = (jnp.arange(max_blocks)[None, None, :]
                 < position_lens[:, :, None])                       # [B,Hp,M]
    slots = jnp.clip(positions, 0, max_page - 1)
    pids = jnp.take_along_axis(
        block_table[:, None, :].astype(jnp.int32),
        jnp.where(idx_valid, slots, 0), axis=2)                     # [B,Hp,M]
    pids = jnp.clip(pids, 0, num_pages_total - 1)

    # token validity per slot: [B, Hp, M, ps]
    tok = jnp.arange(ps)[None, None, None, :]
    count = jnp.clip(seq_lens[:, None, None].astype(jnp.int32)
                     - slots * page_size, 0, page_size)
    tok_valid = idx_valid[..., None] & (tok < count[..., None])

    def gather(pages):                                              # [Hkv,P,ps,D]
        hk_of = jnp.arange(h_kv)
        hp_of = hk_of % h_pos
        # [B, Hkv, M, ps, D]
        return pages[hk_of[None, :, None], pids[:, hp_of, :], :, :]

    keys = gather(kq)
    vals = gather(vq)
    hp_of = jnp.arange(h_kv) % h_pos
    tv = tok_valid[:, hp_of]                                        # [B,Hkv,M,ps]

    qg = q.reshape(b, h_kv, g, d).astype(jnp.float32)
    s = jnp.einsum("bhgd,bhmpd->bhgmp", qg, keys,
                   preferred_element_type=jnp.float32) * sm_scale
    s = jnp.where(tv[:, :, None], s, MASK_VALUE)
    s = s.reshape(b, h_kv, g, -1)
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    e = jnp.where(tv[:, :, None].reshape(b, h_kv, 1, -1), e, 0.0)
    denom = jnp.sum(e, axis=-1, keepdims=True)
    w = e / jnp.where(denom == 0.0, 1.0, denom)
    out = jnp.einsum("bhgm,bhmd->bhgd", w,
                     vals.reshape(b, h_kv, -1, d),
                     preferred_element_type=jnp.float32)
    return out.reshape(b, h_q, d).astype(q.dtype)
