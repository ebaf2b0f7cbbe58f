"""SparsePagedFusionAttention — the flagship fused op.

One device-resident launch performing centroid selection *and* sparse paged
attention, mirroring the reference's fused kernel
(sparse_paged_fusion_attention.cpp:56-76): CentSelect on all vector cores →
``SyncAll`` → per-batch max-reduce → ``TPipe::Reset`` → IFA-style sparse
attention consuming ``block_position``.

TPU realization: the selection subgraph (XLA ops) and the attention Pallas
kernel live in **one jit** — XLA compiles them into a single executable
where every intermediate (``block_position``, ``page_position_length``,
``max_page_position_length``) stays in HBM, the selection→attention
dependency is resolved by XLA's dataflow scheduling (the analog of the
reference's device-side SyncAll), and workspace reuse falls out of XLA
buffer assignment.  Control crosses the host↔device boundary exactly once
per decode step — the property the reference's fusion exists to guarantee
(SURVEY.md §3.1).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..config import MAX_PAGE_NUM, PAGE_SIZE, TOPK_FUSED
from .cent_select import cent_select
from .paged_attention import paged_flash_decode


@functools.partial(
    jax.jit,
    static_argnames=("k", "sm_scale", "page_size", "max_page_num",
                     "workload_cap_ratio", "force_sink_and_recent",
                     "group_mode", "ppcb", "interpret", "kv_int4"),
)
def sparse_paged_fusion_attention(
    q,
    kv_pages,
    block_table,
    l1_cent,
    block_ids,
    total_seq_len,
    *,
    kv_scales=None,
    k=TOPK_FUSED,
    sm_scale=None,
    page_size=PAGE_SIZE,
    max_page_num=MAX_PAGE_NUM,
    workload_cap_ratio=8,
    force_sink_and_recent=True,
    group_mode="kv_group",
    ppcb=None,
    interpret=None,
    kv_int4=False,
):
    """Fused centroid selection + sparse paged flash attention.

    Mirrors ``torch_npu.npu_sparse_paged_fusion_attention``
    (FlashAttentionKernelNpuOpApi.cpp:1873-1934): same inputs, same three
    outputs.  The reference hard-codes k=512 for the fused path
    (sparse_paged_fusion_attention_tiling.cc:1603); here it is an argument
    defaulting to the same value.

    Args:
      q:             [B, H_q, D].
      kv_pages:      [H_kv, P, page_size, 2*D] fused K/V records
                     (float, or int8 with ``kv_scales``).
      block_table:   [max_batch, max_page] int32.
      l1_cent:       [H_kv, C, D] centroid codebooks.
      block_ids:     [H_kv, P_logical] int32 cluster id per physical page.
      total_seq_len: [B] int32.
      group_mode:    "kv_group" (default — one page set per GQA group, the
                     layout a single fused KV gather requires) or
                     "per_qhead" (reference buffer layout; the attention
                     then consumes the first H_kv rows exactly as the
                     reference kernel does, split header :258).

    Returns:
      (attention_out [B, H_q, D],
       block_position [B, H_sel, max_page_num] int32,
       max_page_position_length [B, TPL_PAD] int64-ish)
    """
    bsz = total_seq_len.shape[0]
    h_kv = kv_pages.shape[0]

    positions, position_lens, max_len = cent_select(
        q, l1_cent, block_ids, block_table, total_seq_len,
        k=k, block_size=page_size, max_page_num=max_page_num,
        workload_cap_ratio=workload_cap_ratio,
        force_sink_and_recent=force_sink_and_recent,
        group_mode=group_mode,
    )

    # attention consumes one position list per KV head: in per_qhead mode
    # take the first H_kv rows (bitwise what the reference kernel reads —
    # blockPositionBaseOffset = b·kvHeadNum·maxPos, split header :258)
    if k >= l1_cent.shape[1] and group_mode == "kv_group":
        # k ≥ C selects every cluster, so every KV head's position list is
        # the same masked iota (see cent_select's k≥C fast path) — hand the
        # kernel ONE shared row (H_pos=1).  The slab kernel then fetches
        # each page's all-heads record with ONE strided DMA descriptor
        # instead of H_kv per-head descriptors; at the canonical 128K
        # config this lifts the sparse path out of its descriptor-rate
        # bound (8×128 → 128 descriptors per step).
        attn_positions = positions[:, :1, :]
        attn_lens = position_lens[:, :1, 0]
    else:
        attn_positions = positions[:, :h_kv, :]
        attn_lens = position_lens[:, :h_kv, 0]

    # the workload cap bounds attended pages at page_len/ratio ≤
    # max_page/ratio (static) — slice the position list so the kernel grid
    # has no permanently-inactive steps (positions beyond the per-head
    # length are never read)
    if workload_cap_ratio > 0:
        pp = ppcb if ppcb is not None else 8
        cap_bound = max(block_table.shape[1] // workload_cap_ratio, 1)
        cap_bound = ((cap_bound + pp - 1) // pp) * pp
        if cap_bound < attn_positions.shape[2]:
            attn_positions = attn_positions[:, :, :cap_bound]

    out = paged_flash_decode(
        q, kv_pages, None, block_table[:bsz], total_seq_len,
        attn_positions, attn_lens,
        kv_scales=kv_scales, sm_scale=sm_scale, page_size=page_size,
        ppcb=ppcb, interpret=interpret, kv_int4=kv_int4,
    )
    return out, positions, max_len
