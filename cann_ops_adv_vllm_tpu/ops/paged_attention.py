"""Paged flash-decode attention Pallas kernel (dense and sparse).

TPU-native reimplementation of the reference's IncreFlashAttention /
SparsePagedAttention device kernels (incre_flash_attention_split_Bbn2s2_Us2.h,
sparse_paged_attention_split_Bbn2s2_Us2.h).  Architectural mapping:

* The reference's cube-side gather callbacks (``bmm1CopyB1``/``bmm2CopyB1``,
  split header :129-326) walk ``curSeqIdx → block_position → block_table →
  physical page``.  Here the indirection chain is resolved **ahead of the
  kernel** by a tiny XLA gather (:func:`_precompute_meta`) into flat
  ``(page id, token begin/end)`` arrays that are **scalar-prefetched**; the
  kernel reads a few scalars per page and issues one async DMA per page.
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
  direct dequantization folded around the matmuls — the TPU MXU takes
  bf16/f32 natively so int8×int8 emulation is unnecessary; int8 KV still
  halves page-DMA bytes, which is the actual bottleneck.  Per-channel
  scales live in VMEM; per-token scales travel as one small extra DMA per
  page (analog of the reference's per-token antiquant rows).

Reference IFA misc-feature parity (SURVEY.md §2.2):

* **attention mask / pse_shift** — an additive score-bias page array
  ``[B, H_b, max_blocks, page_size]`` fed as a pipelined block input (the
  reference loads mask/pse tiles in Vec1, pse.h).  ``api.py`` gathers the
  user-facing ``atten_mask``/``pse_shift`` tensors into this layout.
* **ALiBi** — computed in-kernel from per-head slopes and the prefetched
  logical slot ids (the reference synthesizes pse from slopes in pse.h
  rather than materializing it); exact for arbitrary selected pages.
* **kv left padding** — ``kv_start[B]`` offsets the valid token window to
  ``[kv_start, kv_start + seq_len)`` (ComputeKVPaddingBeginOffset analog,
  split header :993+); realized as per-page (begin, end) scalar pairs.
* **post-quant int8 output** — ``out_quant=(scale2, offset2)`` quantizes
  the normalized output tile to int8 at emit time (quant_scale2/offset2,
  incre_flash_attention_def.cpp dtype matrix rows with int8 out).
* **empty tensors** — ``seq_len == 0`` rows emit exact zeros
  (InitAllZeroOutput analog, split header :879).

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
                     page_size, num_pages_total, kv_start=None):
    """Resolve the two-level indirection ahead of the kernel.

    Returns (page_ids [B,Hp,M] int32, begins [B,Hp,M] int32,
    ends [B,Hp,M] int32, nblk [B,Hp] int32 clamped ≥ 1).  Valid tokens of
    page slot ``s`` are rows ``[begin, end)``; with ``kv_start`` (left
    padding) the sequence occupies logical tokens
    ``[kv_start, kv_start + seq_len)``.  Invalid entries get page 0 and an
    empty window; the kernel skips their DMA and masks their tokens.
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
    if kv_start is None:
        start = jnp.zeros((b, 1, 1), jnp.int32)
    else:
        start = kv_start.astype(jnp.int32)[:, None, None]
    begins = jnp.clip(start - slots * page_size, 0, page_size)
    ends = jnp.clip(
        start + seq_lens[:, None, None].astype(jnp.int32)
        - slots * page_size, 0, page_size)
    begins = jnp.where(idx_valid, begins, 0)
    ends = jnp.where(idx_valid, ends, 0)
    # clamp to the position capacity: an over-long sequence (user error —
    # kv_start + seq_len past the block table) must not push the kernel's
    # next-block prefetch past the metadata arrays
    nblk = jnp.clip(position_lens.astype(jnp.int32), 1, max_blocks)
    return (pids.astype(jnp.int32), begins.astype(jnp.int32),
            ends.astype(jnp.int32), nblk)


def _coalesce_runs(pids, begs, ends, ppcb, rmax):
    """Run-length DMA descriptor plan over page lists.

    The per-(head, page) gather is DMA-descriptor-rate-bound (~190 ns
    each on v5e) at the capped k<C sparse config; when the *physical* ids
    of adjacent selected pages are consecutive (sequence-contiguous
    allocation + temporally-clustered selection), one descriptor can
    fetch the whole run.  This computes a greedy power-of-two
    decomposition — descriptor lengths {1, 2, 4, 8} capped at ``rmax`` —
    of every maximal run of physically-consecutive valid pages, broken at
    compute-block boundaries (each block owns its own VMEM slab).

    Returns dlen [B, H, M] int32: at descriptor boundaries the number of
    pages that descriptor fetches (the following dlen-1 entries belong to
    it and carry 0); 0 also at invalid (empty-window) entries.

    Exactness: a descriptor covers exactly the run's pages — every
    (head, token) pair fetched/attended is unchanged vs per-page DMA.
    """
    b, h, m = pids.shape
    i = jnp.arange(m, dtype=jnp.int32)[None, None, :]
    valid = ends > begs
    prev_valid = jnp.concatenate(
        [jnp.zeros((b, h, 1), bool), valid[:, :, :-1]], axis=2)
    prev_pid = jnp.concatenate(
        [jnp.full((b, h, 1), -2, jnp.int32), pids[:, :, :-1]], axis=2)
    run_start = valid & ((i % ppcb == 0) | ~prev_valid
                         | (pids != prev_pid + 1))
    start_idx = jax.lax.cummax(jnp.where(run_start, i, -1), axis=2)
    term = (~valid) | run_start
    t_pos = jnp.where(term, i, m)
    suf = jax.lax.cummin(t_pos[:, :, ::-1], axis=2)[:, :, ::-1]
    end_excl = jnp.concatenate(
        [suf[:, :, 1:], jnp.full((b, h, 1), m, jnp.int32)], axis=2)
    run_len = end_excl - start_idx
    o = i - start_idx
    # greedy decomposition: rmax-sized descriptors over the run body,
    # then MSB-first powers of two over the tail (< rmax ≤ 8)
    body_end = (run_len // rmax) * rmax
    in_body = o < body_end
    rem = run_len - body_end
    op = o - body_end
    tail_b = jnp.zeros_like(in_body)
    for t in range(4):      # rem < rmax ≤ 8 → MSB-prefix sums need t ≤ 3
        tail_b = tail_b | (op == (rem & ~((1 << t) - 1)))
    tail_b = tail_b & (op < rem)
    boundary = valid & jnp.where(in_body, op % rmax == 0, tail_b)
    left = jnp.where(in_body, rmax, rem - op)
    dlen = jnp.where(left >= 8, 8,
                     jnp.where(left >= 4, 4, jnp.where(left >= 2, 2, 1)))
    return jnp.where(boundary, dlen, 0).astype(jnp.int32)


def _unpack_or_slice_kv(kvb, *, packed_int4, k_width, d_v, v_off):
    """Recover (K, V) from one VMEM record block.

    packed_int4: [bk, D] int8 nibble-packed (K low, V high) — two integer
    ops per element, no lane relayout.  Otherwise lane slices of the fused
    record.
    """
    if packed_int4:
        x4 = kvb.astype(jnp.int32)
        k = ((x4 & 0xF) - ((x4 & 0x8) << 1)).astype(jnp.bfloat16)
        v = (x4 >> 4).astype(jnp.bfloat16)
        return k, v
    return kvb[:, :k_width], kvb[:, v_off:v_off + d_v]


def _flash_block_update(
    q32, k, v, col_valid, m_prev, l_prev, acc_prev, *,
    sm_scale, ppcb, page_size,
    quantized, k_token, v_token,
    k_scale_row=None, k_offset_row=None,     # [1, D] (per-channel K)
    v_scale_row=None, v_offset_row=None,     # [1, D_v] (per-channel V)
    ts_page=None,      # callable j -> [n_rows, ps] f32 per-token scales
    seg_window=None,   # callable j -> (beg, end) scalars (token validity)
    bias_row=None,     # callable j -> [1, ps] f32 additive score bias
    alibi=None,        # (slope_col [Gp or 1, 1], dist [1, bk]) f32
):
    """One flash-attention block update — the math shared by `_kernel` and
    `_slab_kernel` (FlashSoftmax-V2 running state + the antiquant folding
    identities; reference split header :2564-2720, :1752-1868).

    K and V antiquant modes are independent (reference
    PER_CHANNEL_TOKEN_MODE = 2 — K per-channel + V per-token, split header
    :71-82): a per-channel half folds around its matmul; a per-token half
    applies to per-page column segments post-matmul.

    Returns (m_next, l_next, acc_next) with the same shapes as the inputs.
    """
    chan_k = quantized and not k_token
    chan_v = quantized and not v_token
    if quantized:
        if chan_k:
            # fold per-channel antiquant around the matmul: no [bk, D]
            # dequant pass, and int8/int4 values are exact in bf16 so the
            # matmuls stay on the native bf16 MXU path (fp32 matmuls are
            # ~8x slower); scale folding happens in fp32, then q rounds to
            # bf16 — the same rounding as standard bf16 attention
            q = (q32 * k_scale_row).astype(jnp.bfloat16)
            q_koff = jnp.sum(q32 * k_offset_row, axis=1,
                             keepdims=True)                    # [Gp, 1]
        else:
            q = q32.astype(jnp.bfloat16)
        k = k.astype(jnp.bfloat16)
        v = v.astype(jnp.bfloat16)
    else:
        q = q32.astype(k.dtype)

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                           # [Gp, bk]
    if chan_k:
        s = s + q_koff

    # Per-token dequant and score bias act on per-page column segments
    # ([1, page_size] row vectors — lane-aligned, no relayout).  The
    # per-token antiquant identity q·(k_q·s + o)ᵀ = (q·k_qᵀ)·s_col +
    # (Σ_d q)·o_col moves the scales behind the matmul (the TPU analog of
    # the reference's MSD recombination, split header :1752-1868).
    vt_row = 2 if k_token else 0       # static ts row layout
    if k_token or bias_row is not None:
        tok_s = jax.lax.broadcasted_iota(jnp.int32, (1, page_size), 1)
        if k_token:
            qsum = jnp.sum(q32, axis=1, keepdims=True)          # [Gp, 1]
        segs = []
        for j in range(ppcb):
            seg = s[:, j * page_size:(j + 1) * page_size]
            if k_token:
                # skipped-DMA pages hold garbage scales (NaN/inf):
                # neutralize them so 0-weight columns stay finite
                beg, end = seg_window(j)
                sv = (tok_s >= beg) & (tok_s < end)
                ts = ts_page(j)
                ks = jnp.where(sv, ts[0:1, :], 1.0)
                ko = jnp.where(sv, ts[1:2, :], 0.0)
                seg = seg * ks + qsum * ko
            seg = seg * sm_scale
            if bias_row is not None:
                seg = seg + bias_row(j)
            segs.append(seg)
        s = jnp.concatenate(segs, axis=1)
    else:
        s = s * sm_scale
    if alibi is not None:
        slope_col, dist = alibi
        s = s + slope_col * dist
    s = jnp.maximum(s, MASK_VALUE)
    s = jnp.where(col_valid, s, MASK_VALUE)

    # --- online softmax update (FlashSoftmax-V2 analog) ---
    m_curr = jnp.max(s, axis=1, keepdims=True)                  # [Gp, 1]
    m_next = jnp.maximum(m_prev[:, :1], m_curr)
    alpha = jnp.exp(m_prev[:, :1] - m_next)
    p = jnp.exp(s - m_next)                                     # [Gp, bk]
    p = jnp.where(col_valid, p, 0.0)
    l_next = alpha * l_prev[:, :1] + jnp.sum(p, axis=1, keepdims=True)

    if v_token:
        # p·(v_q·s + o) = (p·s_col)·v_q + (Σ_t p_t·o_t) — the offset term
        # broadcasts over the head dim
        tok_s = jax.lax.broadcasted_iota(jnp.int32, (1, page_size), 1)
        p_segs, vo_acc = [], jnp.zeros((p.shape[0], 1), jnp.float32)
        for j in range(ppcb):
            beg, end = seg_window(j)
            sv = (tok_s >= beg) & (tok_s < end)
            ts = ts_page(j)
            vs = jnp.where(sv, ts[vt_row:vt_row + 1, :], 0.0)
            vo = jnp.where(sv, ts[vt_row + 1:vt_row + 2, :], 0.0)
            pseg = p[:, j * page_size:(j + 1) * page_size]
            p_segs.append(pseg * vs)
            vo_acc = vo_acc + jnp.sum(pseg * vo, axis=1, keepdims=True)
        o_curr = jax.lax.dot_general(
            jnp.concatenate(p_segs, axis=1).astype(v.dtype), v,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + vo_acc
    else:
        o_curr = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if chan_v:
            # p·(v_q·s + o) = (p·v_q)·s_chan + (Σp)·o_chan
            p_sum = jnp.sum(p, axis=1, keepdims=True)           # [Gp, 1]
            o_curr = o_curr * v_scale_row + p_sum * v_offset_row

    return (jnp.broadcast_to(m_next, m_prev.shape),
            jnp.broadcast_to(l_next, l_prev.shape),
            acc_prev * alpha + o_curr)


def _finalize_head(acc, m, l, oq_scale, oq_off, out_dtype, lse_shape):
    """Normalize the flash accumulator and (optionally) post-quantize.

    Returns (o, lse) — lse is None when lse_shape is None.
    """
    l1 = l[:, :1]
    l_inv = jnp.where(l1 == 0.0, 0.0, 1.0 / l1)
    o = acc * l_inv
    if oq_scale is not None:
        # post-quant int8 out: y = round(x*scale2 + offset2)
        o = jnp.round(o * oq_scale + oq_off)
        o = jnp.clip(o, -128.0, 127.0)
    lse = None
    if lse_shape is not None:
        lse = m[:, :1] + jnp.log(jnp.maximum(l1, 1e-30))
        lse = jnp.where(l1 == 0.0, MASK_VALUE, lse)
        lse = jnp.broadcast_to(lse, lse_shape)
    return o.astype(out_dtype), lse


def _kernel(
    # --- scalar prefetch ---
    layer_ref,      # [1] int32 — layer index into the leading cache axis
    nblk_ref,       # [B, H_pos] int32
    pid_ref,        # [B, H_pos, M] int32
    beg_ref,        # [B, H_pos, M] int32
    end_ref,        # [B, H_pos, M] int32
    slotid_ref,     # [B, H_pos, M] int32 (logical slots; alibi only) or None
    qpos_ref,       # [B] int32 (query logical position; alibi only) or None
    # --- inputs ---
    q_ref,          # [1, 1, Gp, D] VMEM
    kv_pages_ref,   # [L, H_kv, P, ps, 2*D] ANY (HBM) — lane-interleaved K|V
    k_scale_ref,    # [H_kv, D] VMEM (per-channel quant; zeros otherwise)
    k_offset_ref,
    v_scale_ref,
    v_offset_ref,
    tok_scale_ref,  # [L, H_kv, 4, P, ps] ANY (per-token quant) or None
    bias_ref,       # [1, 1, 1, ppcb, ps] VMEM (score bias) or None
    slopes_ref,     # [H_kv, Gp, 128] VMEM f32 (alibi) or None
    oq_scale_ref,   # [H_kv, Gp, D] VMEM f32 (post-quant out) or None
    oq_off_ref,
    # --- outputs ---
    o_ref,          # [1, 1, Gp, D] VMEM
    lse_ref,        # [1, 1, Gp, 128] VMEM (fp32) or None
    # --- scratch ---
    kv_buf,         # [2, ppcb*ps, 2*D] VMEM, kv dtype
    sem,            # DMA sems [2, ppcb]
    ts_buf,         # [2, ppcb, 4, ps] VMEM f32 (per-token scales) or None
    ts_sem,         # DMA sems [2, ppcb] or None
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
    k_token: bool,
    v_token: bool,
    packed_int4: bool = False,
):
    token_quant = k_token or v_token
    b = pl.program_id(0)
    hk = pl.program_id(1)
    i = pl.program_id(2)
    bk = ppcb * page_size

    def hp_of(hh):
        return jax.lax.rem(hh, h_pos)

    def block_dmas(bb, hh, ii, slot):
        hp = hp_of(hh)
        li = layer_ref[0]
        copies = []
        for j in range(ppcb):
            idx = ii * ppcb + j
            cond = end_ref[bb, hp, idx] > beg_ref[bb, hp, idx]
            copies.append((
                cond, j,
                pltpu.make_async_copy(
                    kv_pages_ref.at[li, hh, pid_ref[bb, hp, idx]],
                    kv_buf.at[slot, pl.ds(j * page_size, page_size), :],
                    sem.at[slot, j],
                ),
            ))
            if token_quant:
                copies.append((
                    cond, None,
                    pltpu.make_async_copy(
                        tok_scale_ref.at[li, hh, :, pid_ref[bb, hp, idx]],
                        ts_buf.at[slot, j],
                        ts_sem.at[slot, j],
                    ),
                ))
        return copies

    def start_block(bb, hh, ii, slot):
        for cond, j, dma in block_dmas(bb, hh, ii, slot):
            @pl.when(cond)
            def _():
                dma.start()

            if j is not None:
                # skipped pages would otherwise leave NaN/inf garbage from
                # an earlier block in the buffer; zero them (rare: only
                # tail slots of the last active block)
                @pl.when(jnp.logical_not(cond))
                def _():
                    kv_buf[slot, pl.ds(j * page_size, page_size), :] = (
                        jnp.zeros((page_size, kv_buf.shape[-1]),
                                  kv_buf.dtype))

    def wait_block(bb, hh, ii, slot):
        for cond, _, dma in block_dmas(bb, hh, ii, slot):
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

        # --- token validity masks from prefetched (begin, end) windows ---
        tok_c = jax.lax.broadcasted_iota(jnp.int32, (1, bk), 1)
        col_valid = jnp.zeros((1, bk), dtype=jnp.bool_)
        pos_c = tok_c if slopes_ref is not None else None
        for j in range(ppcb):
            beg = beg_ref[b, hp, i * ppcb + j]
            end = end_ref[b, hp, i * ppcb + j]
            lo = j * page_size
            in_c = (tok_c >= lo + beg) & (tok_c < lo + end)
            col_valid = col_valid | in_c
            if slopes_ref is not None:
                # logical token position = slot*page_size + (tok - lo)
                shift = slotid_ref[b, hp, i * ppcb + j] * page_size - lo
                pos_c = jnp.where(in_c, pos_c + shift, pos_c)

        q32 = q_ref[0, 0].astype(jnp.float32)                  # [Gp, D]
        kvb = kv_buf[slot]                                     # [bk, 2D]
        # skipped-DMA pages were zeroed at issue time; out-of-window rows
        # of real pages hold stale-but-finite data that the column masks
        # neutralize (p = 0 there)
        k, v = _unpack_or_slice_kv(kvb, packed_int4=packed_int4,
                                   k_width=d, d_v=d, v_off=d)

        m_new, l_new, acc_new = _flash_block_update(
            q32, k, v, col_valid, m_scr[...], l_scr[...], acc_scr[...],
            sm_scale=sm_scale, ppcb=ppcb, page_size=page_size,
            quantized=quantized, k_token=k_token, v_token=v_token,
            k_scale_row=(k_scale_ref[pl.ds(hk, 1), :] if quantized
                         else None),
            k_offset_row=(k_offset_ref[pl.ds(hk, 1), :] if quantized
                          else None),
            v_scale_row=(v_scale_ref[pl.ds(hk, 1), :] if quantized
                         else None),
            v_offset_row=(v_offset_ref[pl.ds(hk, 1), :] if quantized
                          else None),
            ts_page=(lambda j: ts_buf[slot, j]) if token_quant else None,
            seg_window=(lambda j: (beg_ref[b, hp, i * ppcb + j],
                                   end_ref[b, hp, i * ppcb + j])),
            bias_row=((lambda j: bias_ref[0, 0, 0, j:j + 1, :])
                      if bias_ref is not None else None),
            alibi=((slopes_ref[hk, :, :1],
                    (pos_c - qpos_ref[b]).astype(jnp.float32))
                   if slopes_ref is not None else None),
        )
        m_scr[...] = m_new
        l_scr[...] = l_new
        acc_scr[...] = acc_new

        # --- final block for this (b, hk): normalize and emit ---
        @pl.when(last_here)
        def _():
            o, lse = _finalize_head(
                acc_scr[...], m_scr[...], l_scr[...],
                oq_scale_ref[hk] if oq_scale_ref is not None else None,
                oq_off_ref[hk] if oq_scale_ref is not None else None,
                o_ref.dtype,
                lse_ref.shape[2:] if lse_ref is not None else None)
            o_ref[0, 0] = o
            if lse_ref is not None:
                lse_ref[0, 0] = lse


def _slab_kernel(
    # --- scalar prefetch ---
    layer_ref,      # [1] int32 — layer index into the leading cache axis
    nblk_ref,       # [B, H_pos] int32
    pid_ref,        # [B, H_pos, M] int32
    beg_ref,        # [B, H_pos, M] int32
    end_ref,        # [B, H_pos, M] int32
    dlen_ref,       # [B, H_pos, M] int32 (run-descriptor plan) or None
    slotid_ref,     # [B, H_pos, M] int32 (logical slots; alibi only) or None
    qpos_ref,       # [B] int32 (query logical position; alibi only) or None
    # --- inputs ---
    q_ref,          # [1, H_kv, Gp, D] VMEM
    kv_pages_ref,   # [L, H_kv, P, ps, 2*D] ANY (HBM)
    k_scale_ref,    # [H_kv, D] VMEM (per-channel quant; zeros otherwise)
    k_offset_ref,
    v_scale_ref,
    v_offset_ref,
    tok_scale_ref,  # [L, H_kv, n_rows, P, ps] ANY (per-token quant) or None
    bias_ref,       # [1, H_b, 1, ppcb, ps] VMEM (score bias) or None
    slopes_ref,     # [H_kv, Gp, 128] VMEM f32 (alibi) or None
    oq_scale_ref,   # [H_kv, Gp, D] VMEM f32 (post-quant out) or None
    oq_off_ref,
    # --- outputs ---
    o_ref,          # [1, H_kv, Gp, D] VMEM
    lse_ref,        # [1, H_kv, Gp, 128] VMEM (fp32) or None
    # --- scratch ---
    kv_buf,         # [2, H_kv, ppcb, ps, 2*D] VMEM, kv dtype
    sem,            # DMA sems [2, 1 | H_kv, ppcb]
    ts_buf,         # [2, H_kv, n_rows, ppcb, ps] VMEM f32 or None
    ts_sem,         # DMA sems [2, 1 | H_kv, ppcb] or None
    m_scr,          # [H_kv, Gp, 128] f32
    l_scr,          # [H_kv, Gp, 128] f32
    acc_scr,        # [H_kv, Gp, D] f32
    slot_ref,       # SMEM [1] int32
    *,
    ppcb: int,
    page_size: int,
    sm_scale: float,
    batch: int,
    h_kv: int,
    h_pos: int,
    h_b: int,
    quantized: bool,
    k_token: bool,
    v_token: bool,
    k_width: int,
    d_v: int,
    v_off: int,
    packed_int4: bool = False,
    shared_pages: bool = False,
):
    """All-heads-per-step flash decode (the fast path).

    Record geometry is parameterized: K is lanes [:k_width] of each row,
    V is lanes [v_off : v_off+d_v].  Standard fused records use
    (k_width, d_v, v_off) = (D, D, D); MLA latent records use
    (W, c_kv, 0) — V aliases K's latent prefix
    (ops.mla; reference MLA scaffold incre_flash_attention_tiling_mla.h).

    ``packed_int4``: the record is [ps, D] int8 with the K lane in the low
    nibble and the V lane in the high nibble (ops.quant.pack_int4_fused);
    unpacking is two integer ops per element with no lane relayout, and
    page DMA bytes halve again vs int8 (reference int4 KV,
    incre_flash_attention.cpp:431-438).

    The grid is (batch, kv_block) — every KV head of a block is processed
    in one grid step (statically unrolled; flash state in per-head VMEM
    scratch rows).  Two page-list regimes:

    * ``H_pos == 1`` (dense / shared-positions sparse): all heads walk the
      same logical pages, so ONE strided DMA per page —
      ``kv_pages[:, pid]`` is a slab of H_kv contiguous 64 KB records —
      fetches every head's record.  H_kv× fewer DMA descriptors on a
      DMA-issue-rate-bound workload (~190 ns/descriptor on v5e): the
      difference between ~20% and near-peak effective HBM bandwidth.
    * ``H_pos == H_kv`` (per-head sparse): one DMA per (head, page) as in
      the reference's gather, but grouped H_kv·ppcb to a grid step, so
      per-step sequencing overhead is paid once per block rather than
      once per (head, block) — the big win for the capped sparse path
      whose total bytes are small.

    Per-head block counts may differ (sparse): each head finalizes at its
    own last block under ``pl.when``; the grid runs to the max.
    """
    token_quant = k_token or v_token
    b = pl.program_id(0)
    i = pl.program_id(1)
    bk = ppcb * page_size
    width = kv_buf.shape[-1]
    shared = h_pos == 1
    # union mode (shared_pages): every head's pid row is the SAME unioned
    # page list, so the DMA side runs the one-slab-descriptor-per-page
    # fast path while the compute side keeps per-head (beg, end) windows —
    # a page a head did not select has an empty window there.  DMA
    # condition = any head's window non-empty (= page in the union).
    slab_dma = shared or shared_pages
    coalesced = dlen_ref is not None
    sizes = tuple(s for s in (8, 4, 2, 1) if s <= ppcb)

    def block_dmas(bb, ii, slot):
        """(cond, zero_target | None, dma) triples for one block.

        With ``dlen_ref`` (run coalescing), each descriptor slot j issues
        a dlen[j]-page copy when j is a run boundary (_coalesce_runs);
        slots inside a run issue nothing.  One size-specialized copy per
        power of two keeps every make_async_copy shape static.
        """
        li = layer_ref[0]
        copies = []
        for j in range(ppcb):
            idx = ii * ppcb + j
            if slab_dma:
                cond = end_ref[bb, 0, idx] > beg_ref[bb, 0, idx]
                if not shared:
                    for h in range(1, h_kv):
                        cond = cond | (end_ref[bb, h, idx]
                                       > beg_ref[bb, h, idx])
                if coalesced:
                    dl = dlen_ref[bb, 0, idx]
                    for sz in sizes:
                        if j + sz > ppcb:     # impossible at runtime
                            continue
                        copies.append((
                            cond & (dl == sz), None,
                            pltpu.make_async_copy(
                                kv_pages_ref.at[
                                    li, :,
                                    pl.ds(pid_ref[bb, 0, idx], sz)],
                                kv_buf.at[slot, :, pl.ds(j, sz)],
                                sem.at[slot, 0, j],
                            ),
                        ))
                        if token_quant:
                            copies.append((
                                cond & (dl == sz), None,
                                pltpu.make_async_copy(
                                    tok_scale_ref.at[
                                        li, :, :,
                                        pl.ds(pid_ref[bb, 0, idx], sz)],
                                    ts_buf.at[slot, :, :, pl.ds(j, sz)],
                                    ts_sem.at[slot, 0, j],
                                ),
                            ))
                else:
                    copies.append((
                        cond, None,
                        pltpu.make_async_copy(
                            kv_pages_ref.at[li, :, pid_ref[bb, 0, idx]],
                            kv_buf.at[slot, :, j],
                            sem.at[slot, 0, j],
                        ),
                    ))
                    if token_quant:
                        # one strided descriptor fetches every head's
                        # scale rows for this page, like the KV slab
                        copies.append((
                            cond, None,
                            pltpu.make_async_copy(
                                tok_scale_ref.at[li, :, :,
                                                 pid_ref[bb, 0, idx]],
                                ts_buf.at[slot, :, :, j],
                                ts_sem.at[slot, 0, j],
                            ),
                        ))
            else:
                for h in range(h_kv):
                    cond = end_ref[bb, h, idx] > beg_ref[bb, h, idx]
                    if coalesced:
                        dl = dlen_ref[bb, h, idx]
                        for sz in sizes:
                            if j + sz > ppcb:  # impossible at runtime
                                continue
                            copies.append((
                                cond & (dl == sz), None,
                                pltpu.make_async_copy(
                                    kv_pages_ref.at[
                                        li, h,
                                        pl.ds(pid_ref[bb, h, idx], sz)],
                                    kv_buf.at[slot, h, pl.ds(j, sz)],
                                    sem.at[slot, h, j],
                                ),
                            ))
                            if token_quant:
                                copies.append((
                                    cond & (dl == sz), None,
                                    pltpu.make_async_copy(
                                        tok_scale_ref.at[
                                            li, h, :,
                                            pl.ds(pid_ref[bb, h, idx],
                                                  sz)],
                                        ts_buf.at[slot, h, :,
                                                  pl.ds(j, sz)],
                                        ts_sem.at[slot, h, j],
                                    ),
                                ))
                    else:
                        copies.append((
                            cond, None,
                            pltpu.make_async_copy(
                                kv_pages_ref.at[li, h,
                                                pid_ref[bb, h, idx]],
                                kv_buf.at[slot, h, j],
                                sem.at[slot, h, j],
                            ),
                        ))
                        if token_quant:
                            copies.append((
                                cond, None,
                                pltpu.make_async_copy(
                                    tok_scale_ref.at[li, h, :,
                                                     pid_ref[bb, h, idx]],
                                    ts_buf.at[slot, h, :, j],
                                    ts_sem.at[slot, h, j],
                                ),
                            ))
        return copies

    def zero_skipped(bb, ii, slot):
        """Zero pages whose window is empty inside still-active blocks —
        they would otherwise hold NaN/inf garbage from an earlier block
        (rare: tail slots).  Fully-inactive heads skip compute, so their
        garbage is never read."""
        for j in range(ppcb):
            idx = ii * ppcb + j
            if slab_dma:
                cond = end_ref[bb, 0, idx] > beg_ref[bb, 0, idx]
                if not shared:
                    for h in range(1, h_kv):
                        cond = cond | (end_ref[bb, h, idx]
                                       > beg_ref[bb, h, idx])
                zero_cond = (jnp.logical_not(cond)
                             & (ii * ppcb < nblk_ref[bb, 0]))

                @pl.when(zero_cond)
                def _(j=j):
                    kv_buf[slot, :, j] = jnp.zeros(
                        (h_kv, page_size, width), kv_buf.dtype)
            else:
                for h in range(h_kv):
                    cond = end_ref[bb, h, idx] > beg_ref[bb, h, idx]
                    zero_cond = (jnp.logical_not(cond)
                                 & (ii * ppcb < nblk_ref[bb, h]))

                    @pl.when(zero_cond)
                    def _(h=h, j=j):
                        kv_buf[slot, h, j] = jnp.zeros(
                            (page_size, width), kv_buf.dtype)

    def start_block(bb, ii, slot):
        for cond, _, dma in block_dmas(bb, ii, slot):
            @pl.when(cond)
            def _():
                dma.start()
        zero_skipped(bb, ii, slot)

    def wait_block(bb, ii, slot):
        for cond, _, dma in block_dmas(bb, ii, slot):
            @pl.when(cond)
            def _():
                dma.wait()

    def n_i_of(bb, hp):
        return jax.lax.div(nblk_ref[bb, hp] + (ppcb - 1), ppcb)

    n_i_max = n_i_of(b, 0)
    for hp in range(1, h_pos):
        n_i_max = jnp.maximum(n_i_max, n_i_of(b, hp))
    active = i < n_i_max

    @pl.when(active)
    def _run():
        @pl.when((b == 0) & (i == 0))
        def _():
            slot_ref[0] = 0
            start_block(b, i, 0)

        slot = slot_ref[0]

        @pl.when(i == 0)
        def _():
            m_scr[...] = jnp.full_like(m_scr, MASK_VALUE)
            l_scr[...] = jnp.zeros_like(l_scr)
            acc_scr[...] = jnp.zeros_like(acc_scr)

        last_here = i + 1 >= n_i_max
        nxt_b = jnp.where(last_here, b + 1, b)
        nxt_i = jnp.where(last_here, 0, i + 1)

        @pl.when(nxt_b < batch)
        def _():
            start_block(nxt_b, nxt_i, 1 - slot)
        slot_ref[0] = 1 - slot

        wait_block(b, i, slot)

        tok_c = jax.lax.broadcasted_iota(jnp.int32, (1, bk), 1)
        use_alibi = slopes_ref is not None

        def col_mask(hp):
            """Column validity (and, for alibi, logical token positions)."""
            valid = jnp.zeros((1, bk), dtype=jnp.bool_)
            pos_c = tok_c if use_alibi else None
            for j in range(ppcb):
                beg = beg_ref[b, hp, i * ppcb + j]
                end = end_ref[b, hp, i * ppcb + j]
                lo = j * page_size
                in_c = (tok_c >= lo + beg) & (tok_c < lo + end)
                valid = valid | in_c
                if use_alibi:
                    # logical token position = slot*page_size + (tok - lo)
                    shift = slotid_ref[b, hp, i * ppcb + j] * page_size - lo
                    pos_c = jnp.where(in_c, pos_c + shift, pos_c)
            return valid, pos_c

        shared_mask = col_mask(0) if shared else None

        for h in range(h_kv):                      # static unroll
            hp = 0 if shared else h
            head_active = i < n_i_of(b, hp)

            @pl.when(head_active)
            def _(h=h, hp=hp):
                col_valid, pos_c = (shared_mask if shared
                                    else col_mask(hp))
                kvb = kv_buf[slot, h].reshape(bk, width)   # kv dtype
                k, v = _unpack_or_slice_kv(
                    kvb, packed_int4=packed_int4, k_width=k_width,
                    d_v=d_v, v_off=v_off)
                q32 = q_ref[0, h].astype(jnp.float32)

                m_new, l_new, acc_new = _flash_block_update(
                    q32, k, v, col_valid, m_scr[h], l_scr[h], acc_scr[h],
                    sm_scale=sm_scale, ppcb=ppcb, page_size=page_size,
                    quantized=quantized, k_token=k_token, v_token=v_token,
                    k_scale_row=(k_scale_ref[h:h + 1, :] if quantized
                                 else None),
                    k_offset_row=(k_offset_ref[h:h + 1, :] if quantized
                                  else None),
                    v_scale_row=(v_scale_ref[h:h + 1, :] if quantized
                                 else None),
                    v_offset_row=(v_offset_ref[h:h + 1, :] if quantized
                                  else None),
                    ts_page=((lambda j: ts_buf[slot, h, :, j])
                             if token_quant else None),
                    seg_window=(lambda j: (beg_ref[b, hp, i * ppcb + j],
                                           end_ref[b, hp, i * ppcb + j])),
                    bias_row=((lambda j: bias_ref[
                        0, h if h_b == h_kv else 0, 0, j:j + 1, :])
                        if bias_ref is not None else None),
                    alibi=((slopes_ref[h, :, :1],
                            (pos_c - qpos_ref[b]).astype(jnp.float32))
                           if use_alibi else None),
                )
                m_scr[h] = m_new
                l_scr[h] = l_new
                acc_scr[h] = acc_new

            # each head finalizes at its own last block
            @pl.when(head_active & (i + 1 >= n_i_of(b, hp)))
            def _(h=h):
                o, lse = _finalize_head(
                    acc_scr[h], m_scr[h], l_scr[h],
                    oq_scale_ref[h] if oq_scale_ref is not None else None,
                    oq_off_ref[h] if oq_scale_ref is not None else None,
                    o_ref.dtype,
                    lse_ref.shape[2:] if lse_ref is not None else None)
                o_ref[0, h] = o
                if lse_ref is not None:
                    lse_ref[0, h] = lse


def _slab_vmem_budget_ppcb(ppcb, h_kv, page_size, width, kv_dtype,
                           shared, sem_arrays=1):
    """Clamp slab ppcb so the double-buffered all-heads slab fits VMEM and
    the DMA semaphore arrays fit sflag memory (~2 KB: ~500 semaphores; we
    budget 384 to leave headroom for the grid/barrier semaphores).
    ``sem_arrays`` is 2 when per-token scales add their own DMA sems."""
    bytes_per_page = h_kv * page_size * width * jnp.dtype(kv_dtype).itemsize
    budget = 10 * 1024 * 1024          # of the ~16 MiB VMEM
    sem_rows = 1 if shared else h_kv   # sem shape [2, sem_rows, ppcb]
    sem_cap = max(1, 384 // (2 * sem_rows * sem_arrays))
    return max(1, min(ppcb, budget // (2 * bytes_per_page), sem_cap))


def _slab_call(qg, kv_pages, pids, begs, ends, nblk, *, kv_scales,
               out_quant, sm_scale, page_size, ppcb, return_lse, interpret,
               dims=None, packed_int4=False, tok_scales=None, bias=None,
               slopes=None, slot_pad=None, qpos=None,
               k_token=False, v_token=False, layer_idx=None,
               shared_pages=False, coalesce=False):
    """Build + run the all-heads-per-step pallas_call (H_pos ∈ {1, H_kv}).

    ``dims=(k_width, d_v, v_off)`` sets the record geometry (default: the
    standard fused K|V record (D, D, D)).  Optional features (bias tiles,
    per-token scales, ALiBi, post-quant out) all stay on this path — the
    per-(head, block) `_kernel` remains only as an explicitly requested
    fallback for A/B comparison.
    """
    b, h_kv, gp, k_width = qg.shape
    # The kernel always sees a leading layer axis on the HBM cache operand
    # and a layer scalar — callers without one get a free [1, ...] reshape.
    # Passing the FULL [L, ...] cache + layer_idx lets the model layer
    # loop read pages straight from one persistent (donated) cache buffer:
    # no per-layer slice materialization, no per-step cache copies.
    if kv_pages.ndim == 4:
        kv_pages = kv_pages[None]
        if tok_scales is not None:
            tok_scales = tok_scales[None]
    layer_arr = jnp.reshape(
        jnp.asarray(layer_idx if layer_idx is not None else 0, jnp.int32),
        (1,))
    width = kv_pages.shape[-1]
    if dims is None:
        dims = (k_width, k_width, k_width)
    k_width, d_v, v_off = dims
    h_pos = pids.shape[1]
    max_blocks = pids.shape[2]
    token_quant = k_token or v_token
    ppcb = _slab_vmem_budget_ppcb(ppcb, h_kv, page_size, width,
                                  kv_pages.dtype,
                                  h_pos == 1 or shared_pages,
                                  sem_arrays=2 if token_quant else 1)
    m_pad = _cdiv(max_blocks, ppcb) * ppcb
    if m_pad != max_blocks:
        pad = ((0, 0), (0, 0), (0, m_pad - max_blocks))
        pids = jnp.pad(pids, pad)
        begs = jnp.pad(begs, pad)
        ends = jnp.pad(ends, pad)
        if slot_pad is not None:
            slot_pad = jnp.pad(slot_pad, pad)

    # run-coalescing plan (computed on the FINAL ppcb so runs never cross
    # a compute block); union mode keeps per-page descriptors — its DMA
    # condition is an any-head OR that the plan doesn't model
    coalesce = coalesce and not shared_pages
    dlen = (_coalesce_runs(pids, begs, ends, ppcb, min(8, ppcb))
            if coalesce else None)

    quantized = kv_scales is not None
    if quantized:
        k_scale, k_offset, v_scale, v_offset = (
            s.astype(jnp.float32) for s in kv_scales)
    else:
        k_scale = k_offset = jnp.zeros((h_kv, k_width), jnp.float32)
        v_scale = v_offset = jnp.zeros((h_kv, d_v), jnp.float32)

    out_quantized = out_quant is not None
    if out_quantized:
        oq_scale, oq_off = out_quant     # pre-shaped [H_kv, Gp, D_v] f32
        out_dtype = jnp.int8
    else:
        oq_scale = oq_off = None
        out_dtype = qg.dtype

    use_alibi = slopes is not None
    has_bias = bias is not None
    if has_bias:
        # tile flat page-major bias [B, H_b, M, ps] to compute blocks
        h_b = bias.shape[1]
        if bias.shape[2] != m_pad:
            bias = jnp.pad(
                bias, ((0, 0), (0, 0), (0, m_pad - bias.shape[2]),
                       (0, 0)))
        bias = bias.reshape(b, h_b, m_pad // ppcb, ppcb, page_size)
    else:
        h_b = 1

    grid = (b, m_pad // ppcb)

    def full_spec(width):
        return pl.BlockSpec((1, h_kv, gp, width),
                            lambda bb, ii, *refs: (bb, 0, 0, 0))

    scalar_ops = [layer_arr, nblk, pids, begs, ends]
    if coalesce:
        scalar_ops.append(dlen)
    if use_alibi:
        scalar_ops += [slot_pad, qpos]
    n_scalar = len(scalar_ops)

    in_ops = [qg, kv_pages, k_scale, k_offset, v_scale, v_offset]
    in_specs = [
        full_spec(k_width),
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
    ]
    if token_quant:
        in_ops.append(tok_scales)
        in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
    if has_bias:
        in_ops.append(bias)
        in_specs.append(pl.BlockSpec(
            (1, h_b, 1, ppcb, page_size),
            lambda bb, ii, *refs: (bb, 0, ii, 0, 0)))
    if use_alibi:
        in_ops.append(slopes)
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
    if out_quantized:
        in_ops += [oq_scale, oq_off]
        in_specs += [pl.BlockSpec(memory_space=pltpu.VMEM)] * 2

    out_shapes = [jax.ShapeDtypeStruct((b, h_kv, gp, d_v), out_dtype)]
    out_specs = [full_spec(d_v)]
    if return_lse:
        out_shapes.append(
            jax.ShapeDtypeStruct((b, h_kv, gp, 128), jnp.float32))
        out_specs.append(pl.BlockSpec((1, h_kv, gp, 128),
                                      lambda bb, ii, *refs: (bb, 0, 0, 0)))

    kernel = functools.partial(
        _slab_kernel,
        ppcb=ppcb, page_size=page_size, sm_scale=sm_scale,
        batch=b, h_kv=h_kv, h_pos=h_pos, h_b=h_b, quantized=quantized,
        k_token=k_token, v_token=v_token,
        k_width=k_width, d_v=d_v, v_off=v_off, packed_int4=packed_int4,
        shared_pages=shared_pages)

    def wrapped(*args):
        args = list(args)

        def take(n):
            vals = args[:n]
            del args[:n]
            return vals

        layer_r, nblk_r, pid_r, beg_r, end_r = take(5)
        (dlen_r,) = take(1) if coalesce else (None,)
        slotid_r, qpos_r = take(2) if use_alibi else (None, None)
        q_r, kv_r, ks_r, ko_r, vs_r, vo_r = take(6)
        (ts_r,) = take(1) if token_quant else (None,)
        (bias_r,) = take(1) if has_bias else (None,)
        (slopes_r,) = take(1) if use_alibi else (None,)
        oqs_r, oqo_r = take(2) if out_quantized else (None, None)
        o_r = take(1)[0]
        lse_r = take(1)[0] if return_lse else None
        kvb_r, sem_r = take(2)
        tsb_r, tss_r = take(2) if token_quant else (None, None)
        m_r, l_r, acc_r, sl_r = take(4)
        kernel(layer_r, nblk_r, pid_r, beg_r, end_r, dlen_r, slotid_r,
               qpos_r,
               q_r, kv_r, ks_r, ko_r, vs_r, vo_r, ts_r, bias_r, slopes_r,
               oqs_r, oqo_r, o_r, lse_r,
               kvb_r, sem_r, tsb_r, tss_r, m_r, l_r, acc_r, sl_r)

    sem_rows = 1 if (h_pos == 1 or shared_pages) else h_kv
    scratch_shapes = [
        pltpu.VMEM((2, h_kv, ppcb, page_size, width), kv_pages.dtype),
        pltpu.SemaphoreType.DMA((2, sem_rows, ppcb)),
    ]
    if token_quant:
        n_rows = tok_scales.shape[-3]
        scratch_shapes += [
            pltpu.VMEM((2, h_kv, n_rows, ppcb, page_size), jnp.float32),
            pltpu.SemaphoreType.DMA((2, sem_rows, ppcb)),
        ]
    scratch_shapes += [
        pltpu.VMEM((h_kv, gp, 128), jnp.float32),
        pltpu.VMEM((h_kv, gp, 128), jnp.float32),
        pltpu.VMEM((h_kv, gp, d_v), jnp.float32),
        pltpu.SMEM((1,), jnp.int32),
    ]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=n_scalar,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs if return_lse else out_specs[0],
        scratch_shapes=scratch_shapes,
    )
    return pl.pallas_call(
        wrapped,
        out_shape=out_shapes if return_lse else out_shapes[0],
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(*scalar_ops, *in_ops)


@functools.partial(
    jax.jit,
    static_argnames=("sm_scale", "page_size", "ppcb", "return_lse",
                     "interpret", "kv_int4", "slab", "union_pages",
                     "coalesce"),
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
    kv_start=None,
    bias_pages=None,
    alibi_slopes=None,
    out_quant=None,
    sm_scale=None,
    page_size=PAGE_SIZE,
    ppcb=None,
    return_lse=False,
    interpret=None,
    kv_int4=False,
    slab=True,
    layer_idx=None,
    union_pages=False,
    coalesce=None,
):
    """Flash-decode paged attention over (optionally) selected pages.

    Dense (IncreFlashAttention parity): omit ``positions`` — every logical
    page up to ``ceil((kv_start + seq_len)/page_size)`` is attended.

    Sparse (SparsePagedAttention parity): pass ``positions``
    [B, H_pos, max_blocks] int32 (ascending logical slots, from
    :func:`..ops.cent_select.cent_select`) and ``position_lens``
    [B, H_pos] int32.  ``H_pos`` is 1 (shared) or ``H_kv`` (per KV head).

    KV may be passed as separate ``k_pages``/``v_pages`` [H_kv, P, ps, D]
    (fused on the fly — costs a copy) or as pre-fused lane-interleaved
    records ``k_pages`` [H_kv, P, ps, 2*D] with ``v_pages=None`` (the
    runtime cache layout; zero-copy).

    Quantized KV: int8 pages plus ``kv_scales=(k_scale, k_offset, v_scale,
    v_offset)``, either per-channel ([H_kv, D] each; reference antiquant
    convention ``x*scale + offset``) or per-token ([H_kv, P, page_size]
    each — one scalar per cached row, reference per-token antiquant mode).

    INT4 KV: pass ``kv_int4=True`` with packed pages [H_kv, P, ps, D] int8
    (ops.quant.pack_int4_fused layout: K lane in the low nibble, V lane in
    the high nibble) plus ``kv_scales`` as above.  Page DMA bytes halve
    again vs int8 (reference int4b_t KV,
    incre_flash_attention.cpp:431-438).

    Optional IFA misc features:
      kv_start:      [B] int32 — kv-left-padding: valid tokens occupy
                     logical positions [kv_start, kv_start + seq_len).
      bias_pages:    [B, H_b, max_blocks, page_size] f32 additive score
                     bias (materialized atten_mask / pse_shift; H_b ∈ {1,
                     H_kv}; entry (b, h, i, t) biases the token at selected
                     slot index i, row t).  See api.make_bias_pages.
      alibi_slopes:  [H_q] f32 — in-kernel ALiBi: adds
                     slope·(token_pos − query_pos) to the scores.
      out_quant:     (scale2, offset2) each [H_q, D] (or scalar) → output
                     is int8: round(out·scale2 + offset2).

    Layered cache (the model hot path): pass the FULL per-layer cache
    ``k_pages`` [L, H_kv, P, ps, 2*D] with ``layer_idx`` (traced int32
    scalar) and, for the int8 cache, pre-stacked ``kv_scales``
    [L, H_kv, 4, P, ps].  The kernel DMAs pages of layer ``layer_idx``
    straight out of the persistent cache buffer — no per-layer slice is
    ever materialized, so a donated cache is updated fully in place
    across a model step (the O(pool)-copy-per-step failure mode of the
    stacked functional update is gone).

    Returns [B, H_q, D] in q's dtype (int8 with ``out_quant``), and
    optionally LSE [B, H_q] fp32.
    """
    b, h_q, d = q.shape
    if v_pages is not None:
        if kv_int4:
            raise ValueError(
                "paged_flash_decode: kv_int4 pages are nibble-packed K|V "
                "records; pass them as k_pages with v_pages=None")
        kv_pages = fuse_kv(k_pages, v_pages)
    else:
        kv_pages = k_pages
    layered = kv_pages.ndim == 5
    if layered and layer_idx is None:
        raise ValueError("paged_flash_decode: a [L, ...] layered cache "
                         "needs layer_idx")
    validation.check_attention_inputs(
        "paged_flash_decode", q, kv_pages[0] if layered else kv_pages,
        block_table, seq_lens,
        page_size=page_size, quantized=kv_scales is not None,
        kv_int4=kv_int4)
    h_kv, num_pages_total = kv_pages.shape[-4], kv_pages.shape[-3]
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
        total = seq_lens.astype(jnp.int32)
        if kv_start is not None:
            total = total + kv_start.astype(jnp.int32)
        page_len = (total + page_size - 1) // page_size
        position_lens = page_len[:, None]
    else:
        max_blocks = positions.shape[2]
    h_pos = positions.shape[1]

    pids, begs, ends, nblk = _precompute_meta(
        block_table, seq_lens, positions.astype(jnp.int32),
        position_lens.astype(jnp.int32), page_size, num_pages_total,
        kv_start=kv_start)

    # Union mode (``union_pages``) for per-KV-head selections: merge the
    # heads' page lists into ONE shared ascending list and keep per-head
    # validity via the (beg, end) windows — a page a head did not select
    # gets an empty window there.  The DMA side then runs the
    # one-strided-slab-descriptor-per-page fast path (the kernel's
    # ``shared_pages`` mode) instead of one descriptor per (head, page):
    # the reference's standalone chain (cent_select k=64,
    # cent_select_tiling.cpp:58) is descriptor-bound without this.
    # Exact: every (head, token) pair attended is unchanged.
    shared_pages = False
    if (union_pages and slab and h_pos == h_kv and h_kv > 1
            and bias_pages is None and alibi_slopes is None):
        shared_pages = True
        bi = jnp.arange(b)[:, None, None]
        hi = jnp.arange(h_kv)[None, :, None]
        slot_ok = (jnp.arange(max_blocks, dtype=jnp.int32)[None, None, :]
                   < position_lens[:, :, None].astype(jnp.int32))
        slots = jnp.clip(positions.astype(jnp.int32), 0, max_page - 1)
        drop = jnp.where(slot_ok, slots, max_page)          # OOB → dropped
        head_mask = jnp.zeros((b, h_kv, max_page), jnp.bool_)
        head_mask = head_mask.at[
            jnp.broadcast_to(bi, drop.shape),
            jnp.broadcast_to(hi, drop.shape), drop].set(True, mode="drop")
        union_mask = jnp.any(head_mask, axis=1)             # [B, max_page]
        from .cent_select import _compact_positions
        u_pos = _compact_positions(union_mask, max_page)    # [B, max_page]
        u_len = jnp.sum(union_mask, axis=1).astype(jnp.int32)
        pids_u, begs_u, ends_u, nblk_u = _precompute_meta(
            block_table, seq_lens, u_pos[:, None, :], u_len[:, None],
            page_size, num_pages_total, kv_start=kv_start)
        member = jnp.take_along_axis(
            head_mask,
            jnp.broadcast_to(jnp.clip(u_pos, 0, max_page - 1)[:, None, :],
                             (b, h_kv, max_page)), axis=2)
        pids = jnp.broadcast_to(pids_u, (b, h_kv, max_page))
        begs = jnp.broadcast_to(begs_u, (b, h_kv, max_page))
        ends = jnp.where(member,
                         jnp.broadcast_to(ends_u, (b, h_kv, max_page)),
                         begs)
        nblk = jnp.broadcast_to(nblk_u, (b, h_kv))
        max_blocks = max_page

    # ppcb (pages per compute block): the slab path wants large blocks —
    # its per-step cost is near-fixed, and the VMEM budget clamp already
    # adapts to dtype (int8 slabs fit ~2x more pages than bf16).  Interpret
    # mode (CPU CI) costs scale with ppcb, so keep it small there.
    auto_interp = (interpret if interpret is not None
                   else jax.default_backend() == "cpu")
    ppcb_slab = ppcb if ppcb is not None else (8 if auto_interp else 32)
    ppcb = ppcb if ppcb is not None else 8

    # pad the block axis to a multiple of ppcb so the kernel's tail
    # compute-block never indexes past the metadata arrays
    m_pad = _cdiv(max_blocks, ppcb) * ppcb
    if m_pad != max_blocks:
        pad = ((0, 0), (0, 0), (0, m_pad - max_blocks))
        pids = jnp.pad(pids, pad)
        begs = jnp.pad(begs, pad)
        ends = jnp.pad(ends, pad)

    # pad the group dim to the fp32 sublane minimum (8)
    qg = q.reshape(b, h_kv, g, d)
    if gp != g:
        qg = jnp.pad(qg, ((0, 0), (0, 0), (0, gp - g), (0, 0)))

    # K and V antiquant modes are detected independently from the scale
    # ranks: [H_kv, D] = per-channel, [H_kv, P, ps] = per-token.  Mixing
    # them gives the reference's PER_CHANNEL_TOKEN_MODE = 2 (K per-channel
    # + V per-token, split header :71-72, used at :1266,:3049,:3462).
    # A single pre-stacked array [H_kv, 4, P, ps] (rows: k_scale, k_offset,
    # v_scale, v_offset) is the zero-copy per-token form the runtime KV
    # cache maintains natively (models.llama int8 cache) — no per-step
    # restacking of an O(pool) array.
    quantized = kv_scales is not None
    if quantized and not isinstance(kv_scales, (tuple, list)):
        if kv_scales.ndim != 4 + layered or kv_scales.shape[-3] != 4:
            raise ValueError(
                "pre-stacked per-token kv_scales must be "
                f"[{'L, ' if layered else ''}H_kv, 4, P, ps]; got "
                f"{kv_scales.shape}")
        tok_scales = kv_scales.astype(jnp.float32)
        k_token = v_token = True
        token_quant = True
        zeros = jnp.zeros((h_kv, d), jnp.float32)
        k_scale = k_offset = v_scale = v_offset = zeros
    else:
        k_token = quantized and kv_scales[0].ndim == 3
        v_token = quantized and kv_scales[2].ndim == 3
        token_quant = k_token or v_token
        zeros = jnp.zeros((h_kv, d), jnp.float32)
        k_scale = k_offset = v_scale = v_offset = zeros
        if quantized and not k_token:
            k_scale = kv_scales[0].astype(jnp.float32)
            k_offset = kv_scales[1].astype(jnp.float32)
        if quantized and not v_token:
            v_scale = kv_scales[2].astype(jnp.float32)
            v_offset = kv_scales[3].astype(jnp.float32)
        if token_quant:
            # the token-mode halves stack into [H_kv, n_rows, P, ps] — one
            # extra (slab) DMA per page; row layout is static (K rows
            # first).  Rows axis BEFORE the page axis: see
            # models.llama.init_kv_cache (layout-matched to the kernel
            # operand, no transpose)
            rows = []
            if k_token:
                rows += [kv_scales[0], kv_scales[1]]
            if v_token:
                rows += [kv_scales[2], kv_scales[3]]
            tok_scales = jnp.stack(
                [s.astype(jnp.float32) for s in rows], axis=1)
        else:
            tok_scales = None

    if token_quant and page_size > 128 and not (
            interpret if interpret is not None
            else jax.default_backend() == "cpu"):
        # Mosaic rejects the per-token scale-page DMA when ps spans more
        # than one lane tile (size-1 sublane slice of a [..., P, ps>128]
        # operand); per-channel scales and ps=128 (the engine default)
        # are unaffected.  Fail with guidance instead of a compiler
        # internal error.
        raise ValueError(
            "per-token kv_scales require page_size <= 128 on TPU "
            "(scale-page slab DMA tiling); use per-channel scales or "
            "page_size=128")

    use_alibi = alibi_slopes is not None
    if use_alibi:
        slopes = jnp.asarray(alibi_slopes, jnp.float32).reshape(h_kv, g)
        if gp != g:
            slopes = jnp.pad(slopes, ((0, 0), (0, gp - g)))
        slopes = jnp.broadcast_to(slopes[:, :, None], (h_kv, gp, 128))
        slot_pad = jnp.pad(
            jnp.clip(positions, 0, max_page - 1).astype(jnp.int32),
            ((0, 0), (0, 0), (0, m_pad - max_blocks))) \
            if m_pad != max_blocks else \
            jnp.clip(positions, 0, max_page - 1).astype(jnp.int32)
        qpos = seq_lens.astype(jnp.int32) - 1
        if kv_start is not None:
            qpos = qpos + kv_start.astype(jnp.int32)
    else:
        slopes = None
        slot_pad = None
        qpos = None

    has_bias = bias_pages is not None
    if has_bias:
        h_b = bias_pages.shape[1]
        if h_b not in (1, h_kv):
            raise ValueError(
                f"paged_flash_decode: bias_pages head axis must be 1 "
                f"(shared) or num_kv_heads={h_kv}, got {h_b}")
        if bias_pages.shape[2] < max_blocks:
            raise ValueError(
                f"paged_flash_decode: bias_pages covers "
                f"{bias_pages.shape[2]} page slots < max_blocks="
                f"{max_blocks}")
        bias_flat = bias_pages.astype(jnp.float32)   # [B, H_b, M, ps]
    else:
        h_b = 1
        bias_flat = None

    out_quantized = out_quant is not None
    if out_quantized:
        oq_scale = jnp.broadcast_to(
            jnp.asarray(out_quant[0], jnp.float32), (h_q, d)
        ).reshape(h_kv, g, d)
        oq_off = jnp.broadcast_to(
            jnp.asarray(out_quant[1], jnp.float32), (h_q, d)
        ).reshape(h_kv, g, d)
        if gp != g:
            pad_g = ((0, 0), (0, gp - g), (0, 0))
            oq_scale = jnp.pad(oq_scale, pad_g)
            oq_off = jnp.pad(oq_off, pad_g)
        out_dtype = jnp.int8
    else:
        oq_scale = oq_off = None
        out_dtype = q.dtype

    if interpret is None:
        interpret = jax.default_backend() == "cpu"

    # Fast path (the default): all heads of a block in one grid step.
    # Shared page lists (dense) additionally collapse the per-head DMAs
    # into one strided slab descriptor per page.  Every feature (bias
    # tiles, per-token scales, ALiBi, post-quant out, int4) runs here;
    # the per-(head, block) `_kernel` below remains only as an explicitly
    # requested fallback (``slab=False``) for A/B comparison.
    if slab and h_pos in (1, h_kv):
        # Run coalescing (multi-page DMA descriptors, _coalesce_runs) is
        # OPT-IN: measured on v5e at the canonical k<C config, the extra
        # per-slot size branches on the scalar core cost MORE than the
        # saved descriptor issues even at 100% run fraction (0.13 →
        # 0.18 ms; docs/evidence/coalesce_probe.jsonl) — the per-head
        # floor is scalar-sequencing-bound, not purely
        # descriptor-issue-bound.  Kept for A/B and for future
        # compacted-plan variants.
        do_coalesce = bool(coalesce)
        result = _slab_call(
            qg, kv_pages, pids, begs, ends, nblk,
            kv_scales=((k_scale, k_offset, v_scale, v_offset)
                       if quantized else None),
            out_quant=((oq_scale, oq_off) if out_quantized else None),
            sm_scale=sm_scale, page_size=page_size, ppcb=ppcb_slab,
            return_lse=return_lse, interpret=interpret,
            dims=(d, d, d) if kv_int4 else None, packed_int4=kv_int4,
            tok_scales=tok_scales, bias=bias_flat, slopes=slopes,
            slot_pad=slot_pad, qpos=qpos,
            k_token=k_token, v_token=v_token, layer_idx=layer_idx,
            shared_pages=shared_pages, coalesce=do_coalesce)
        if return_lse:
            out, lse = result
            out = out[:, :, :g, :].reshape(b, h_q, d)
            lse = lse[:, :, :g, 0].reshape(b, h_q)
            return out, lse
        return result[:, :, :g, :].reshape(b, h_q, d)

    if has_bias:
        # one tile per compute block: [B, H_b, m_pad/ppcb, ppcb, ps]
        bias = bias_flat
        if bias.shape[2] != m_pad:
            bias = jnp.pad(
                bias, ((0, 0), (0, 0), (0, m_pad - bias.shape[2]), (0, 0)))
        bias = bias.reshape(b, h_b, m_pad // ppcb, ppcb, page_size)
    else:
        bias = None

    grid = (b, h_kv, m_pad // ppcb)

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
        k_token=k_token,
        v_token=v_token,
        packed_int4=kv_int4,
    )

    # --- assemble the (feature-dependent) operand lists ---
    if kv_pages.ndim == 4:
        kv_pages = kv_pages[None]
        if tok_scales is not None:
            tok_scales = tok_scales[None]
    layer_arr = jnp.reshape(
        jnp.asarray(layer_idx if layer_idx is not None else 0, jnp.int32),
        (1,))
    scalar_ops = [layer_arr, nblk, pids, begs, ends]
    if use_alibi:
        scalar_ops += [slot_pad, qpos]
    n_scalar = len(scalar_ops)

    in_ops = [qg, kv_pages, k_scale, k_offset, v_scale, v_offset]
    in_specs = [
        head_spec(d),                               # q
        pl.BlockSpec(memory_space=pl.ANY),          # kv_pages (HBM)
        pl.BlockSpec(memory_space=pltpu.VMEM),      # k_scale
        pl.BlockSpec(memory_space=pltpu.VMEM),      # k_offset
        pl.BlockSpec(memory_space=pltpu.VMEM),      # v_scale
        pl.BlockSpec(memory_space=pltpu.VMEM),      # v_offset
    ]
    if token_quant:
        in_ops.append(tok_scales)
        in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
    if has_bias:
        in_ops.append(bias)
        if h_b == 1:
            bias_idx = lambda bb, hh, ii, *refs: (bb, 0, ii, 0, 0)
        else:
            bias_idx = lambda bb, hh, ii, *refs: (
                bb, jax.lax.rem(hh, h_b), ii, 0, 0)
        in_specs.append(
            pl.BlockSpec((1, 1, 1, ppcb, page_size), bias_idx))
    if use_alibi:
        in_ops.append(slopes)
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
    if out_quantized:
        in_ops += [oq_scale, oq_off]
        in_specs += [pl.BlockSpec(memory_space=pltpu.VMEM)] * 2

    out_shapes = [jax.ShapeDtypeStruct((b, h_kv, gp, d), out_dtype)]
    out_specs = [head_spec(d)]
    if return_lse:
        out_shapes.append(jax.ShapeDtypeStruct((b, h_kv, gp, 128),
                                               jnp.float32))
        out_specs.append(head_spec(128))

    scratch_shapes = [
        pltpu.VMEM((2, ppcb * page_size, kv_pages.shape[-1]),
                   kv_pages.dtype),
        pltpu.SemaphoreType.DMA((2, ppcb)),
    ]
    if token_quant:
        scratch_shapes += [
            pltpu.VMEM((2, ppcb, tok_scales.shape[-3], page_size),
                       jnp.float32),
            pltpu.SemaphoreType.DMA((2, ppcb)),
        ]
    scratch_shapes += [
        pltpu.VMEM((gp, 128), jnp.float32),
        pltpu.VMEM((gp, 128), jnp.float32),
        pltpu.VMEM((gp, d), jnp.float32),
        pltpu.SMEM((1,), jnp.int32),
    ]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=n_scalar,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs if return_lse else out_specs[0],
        scratch_shapes=scratch_shapes,
    )

    def wrapped_kernel(*args):
        args = list(args)

        def take(n):
            vals = args[:n]
            del args[:n]
            return vals

        layer_r, nblk_r, pid_r, beg_r, end_r = take(5)
        slotid_r, qpos_r = take(2) if use_alibi else (None, None)
        q_r, kv_r, ks_r, ko_r, vs_r, vo_r = take(6)
        (ts_r,) = take(1) if token_quant else (None,)
        (bias_r,) = take(1) if has_bias else (None,)
        (slopes_r,) = take(1) if use_alibi else (None,)
        oqs_r, oqo_r = take(2) if out_quantized else (None, None)
        o_r = take(1)[0]
        lse_r = take(1)[0] if return_lse else None
        kvb_r, sem_r = take(2)
        tsb_r, tss_r = take(2) if token_quant else (None, None)
        m_r, l_r, acc_r, sl_r = take(4)
        kernel(layer_r, nblk_r, pid_r, beg_r, end_r, slotid_r, qpos_r,
               q_r, kv_r, ks_r, ko_r, vs_r, vo_r, ts_r, bias_r, slopes_r,
               oqs_r, oqo_r, o_r, lse_r,
               kvb_r, sem_r, tsb_r, tss_r, m_r, l_r, acc_r, sl_r)

    result = pl.pallas_call(
        wrapped_kernel,
        out_shape=out_shapes if return_lse else out_shapes[0],
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(*scalar_ops, *in_ops)

    if return_lse:
        out, lse = result
        out = out[:, :, :g, :].reshape(b, h_q, d)
        lse = lse[:, :, :g, 0].reshape(b, h_q)
        return out, lse
    return result[:, :, :g, :].reshape(b, h_q, d)


def paged_attention_xla(q, k_pages, v_pages, block_table, seq_lens,
                        positions=None, position_lens=None, *,
                        kv_scales=None, kv_start=None, bias_pages=None,
                        alibi_slopes=None, out_quant=None,
                        sm_scale=None, page_size=PAGE_SIZE):
    """Pure-XLA fallback implementation (gather + masked softmax).

    Semantically identical to :func:`paged_flash_decode` (including the
    optional mask/pse/alibi/padding/quant features); used for
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
        total = seq_lens.astype(jnp.int32)
        if kv_start is not None:
            total = total + kv_start.astype(jnp.int32)
        page_len = (total + page_size - 1) // page_size
        position_lens = page_len[:, None]
    else:
        max_blocks = positions.shape[2]
    h_pos = positions.shape[1]

    kq = k_pages.astype(jnp.float32)
    vq = v_pages.astype(jnp.float32)
    if kv_scales is not None and not isinstance(kv_scales, (tuple, list)):
        # pre-stacked per-token form [H_kv, 4, P, ps] → 4-tuple view
        kv_scales = tuple(kv_scales[:, r] for r in range(4))
    if kv_scales is not None:
        # K and V antiquant modes are independent (rank 2 = per-channel,
        # rank 3 = per-token — reference PER_CHANNEL_TOKEN_MODE = 2)
        def dequant(pages, scale, offset):
            scale = scale.astype(jnp.float32)
            offset = offset.astype(jnp.float32)
            if scale.ndim == 3:                        # per-token
                return pages * scale[..., None] + offset[..., None]
            return (pages * scale[:, None, None, :]
                    + offset[:, None, None, :])
        kq = dequant(kq, kv_scales[0], kv_scales[1])
        vq = dequant(vq, kv_scales[2], kv_scales[3])

    idx_valid = (jnp.arange(max_blocks)[None, None, :]
                 < position_lens[:, :, None])                       # [B,Hp,M]
    slots = jnp.clip(positions, 0, max_page - 1)
    pids = jnp.take_along_axis(
        block_table[:, None, :].astype(jnp.int32),
        jnp.where(idx_valid, slots, 0), axis=2)                     # [B,Hp,M]
    pids = jnp.clip(pids, 0, num_pages_total - 1)

    # token validity per slot: [B, Hp, M, ps]
    tok = jnp.arange(ps)[None, None, None, :]
    start = (jnp.zeros((b,), jnp.int32) if kv_start is None
             else kv_start.astype(jnp.int32))[:, None, None]
    beg = jnp.clip(start - slots * page_size, 0, page_size)
    end = jnp.clip(start + seq_lens[:, None, None].astype(jnp.int32)
                   - slots * page_size, 0, page_size)
    tok_valid = idx_valid[..., None] & (tok >= beg[..., None]) \
        & (tok < end[..., None])

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
    if bias_pages is not None:
        h_b = bias_pages.shape[1]
        bias = bias_pages.astype(jnp.float32)[:, jnp.arange(h_kv) % h_b]
        s = s + bias[:, :, None]                                    # [B,Hkv,1,M,ps]
    if alibi_slopes is not None:
        slopes = jnp.asarray(alibi_slopes, jnp.float32).reshape(h_kv, g)
        pos = slots[:, hp_of, :, None] * page_size + tok             # [B,Hkv,M,ps]
        qpos = (seq_lens.astype(jnp.int32) - 1
                + (0 if kv_start is None else kv_start.astype(jnp.int32)))
        dist = (pos - qpos[:, None, None, None]).astype(jnp.float32)
        s = s + slopes[None, :, :, None, None] * dist[:, :, None]
    s = jnp.maximum(s, MASK_VALUE)
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
    out = out.reshape(b, h_q, d)
    if out_quant is not None:
        oq_scale = jnp.broadcast_to(
            jnp.asarray(out_quant[0], jnp.float32), (h_q, d))
        oq_off = jnp.broadcast_to(
            jnp.asarray(out_quant[1], jnp.float32), (h_q, d))
        return jnp.clip(jnp.round(out * oq_scale + oq_off),
                        -128.0, 127.0).astype(jnp.int8)
    return out.astype(q.dtype)
