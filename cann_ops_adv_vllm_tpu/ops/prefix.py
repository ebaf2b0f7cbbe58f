"""Shared-prefix (system prompt) attention — two-pass LSE combine.

Reference: IncreFlashAttention's SHARED_PREFIX template runs ``Process()``
twice — once over the shared prefix KV, once over the per-request user KV —
saving the softmax LSE of each pass, then merges the two partial attention
results with exp-weighted scales (``ProcessSysPrefixCombine`` /
``SysPrefixLseToScales``, incre_flash_attention_split_Bbn2s2_Us2.h:3650-3809;
INVOKE_IFA_GENERAL_OP_IMPL_PREFIX incre_flash_attention.cpp:26-43).

TPU realization: two invocations of the paged flash-decode kernel with
``return_lse=True`` inside one jit, merged by the standard flash-attention
log-sum-exp combine — the same machinery that powers cross-chip
flash-decode in ``parallel/sharded.py``.  The prefix page pool is shared by
every request in the batch (its block table broadcasts over the batch), so
a system prompt is stored once, matching the reference's motivation.

The serving runtime offers an alternative realization — ref-counted
copy-on-write pages (``runtime/allocator.py`` fork) — which shares prefix
*storage* inside one sequence's table; this op is the kernel-level parity
path that keeps prefix and user KV in separate pools.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..config import MASK_VALUE, PAGE_SIZE
from .paged_attention import paged_flash_decode


def merge_partial_attention(outs, lses):
    """Merge partial flash-attention results by their log-sum-exps.

    Args:
      outs: sequence of [B, H, D] partial outputs (already normalized by
            their own softmax sums).
      lses: matching [B, H] log-sum-exps (MASK_VALUE-ish for empty parts).

    Returns (out [B, H, D] fp32, lse [B, H] fp32).
    """
    lse = jnp.stack([l.astype(jnp.float32) for l in lses])      # [N, B, H]
    out = jnp.stack([o.astype(jnp.float32) for o in outs])      # [N, B, H, D]
    m = jnp.max(lse, axis=0)                                    # [B, H]
    w = jnp.exp(lse - m[None])                                  # [N, B, H]
    denom = jnp.sum(w, axis=0)
    # all-empty partials (every LSE at MASK_VALUE → denom 0, e.g.
    # prefix_lens = seq_lens = 0): emit exact zeros + MASK_VALUE LSE,
    # preserving the plain kernel's empty-tensor invariant
    # (InitAllZeroOutput analog)
    safe = jnp.where(denom == 0.0, 1.0, denom)
    merged = jnp.einsum("nbh,nbhd->bhd", w, out) / safe[..., None]
    merged = jnp.where(denom[..., None] == 0.0, 0.0, merged)
    lse_out = jnp.where(denom == 0.0, jnp.float32(MASK_VALUE),
                        m + jnp.log(safe))
    return merged, lse_out


@functools.partial(
    jax.jit,
    static_argnames=("sm_scale", "page_size", "ppcb", "return_lse",
                     "interpret"),
)
def shared_prefix_attention(
    q,
    prefix_pages,
    prefix_table,
    prefix_lens,
    kv_pages,
    block_table,
    seq_lens,
    *,
    prefix_positions=None,
    prefix_position_lens=None,
    positions=None,
    position_lens=None,
    kv_scales=None,
    prefix_kv_scales=None,
    sm_scale=None,
    page_size=PAGE_SIZE,
    ppcb=8,
    return_lse=False,
    interpret=None,
):
    """Decode attention over a shared prefix plus per-request user KV.

    Args:
      q:             [B, H_q, D].
      prefix_pages:  [H_kv, P_pre, ps, 2*D] fused records of the shared
                     prefix pool.
      prefix_table:  [1, max_pre_page] or [B, max_pre_page] int32 — a
                     single row broadcasts over the batch (one system
                     prompt for all requests, the reference's model).
      prefix_lens:   [1] or [B] int32 prefix token counts (0 = no prefix).
      kv_pages/block_table/seq_lens: the per-request user KV (as in
                     :func:`..ops.paged_attention.paged_flash_decode`).
      positions / prefix_positions: optional sparse selection for either
                     pass (SparsePagedAttention semantics).

    Returns [B, H_q, D] (and optionally merged LSE [B, H_q] fp32).
    """
    b = q.shape[0]
    if prefix_table.shape[0] == 1 and b > 1:
        prefix_table = jnp.broadcast_to(
            prefix_table, (b, prefix_table.shape[1]))
    if prefix_lens.shape[0] == 1 and b > 1:
        prefix_lens = jnp.broadcast_to(prefix_lens, (b,))

    o_pre, lse_pre = paged_flash_decode(
        q, prefix_pages, None, prefix_table, prefix_lens,
        prefix_positions, prefix_position_lens,
        kv_scales=prefix_kv_scales, sm_scale=sm_scale, page_size=page_size,
        ppcb=ppcb, return_lse=True, interpret=interpret)
    o_usr, lse_usr = paged_flash_decode(
        q, kv_pages, None, block_table, seq_lens,
        positions, position_lens,
        kv_scales=kv_scales, sm_scale=sm_scale, page_size=page_size,
        ppcb=ppcb, return_lse=True, interpret=interpret)

    merged, lse = merge_partial_attention([o_pre, o_usr], [lse_pre, lse_usr])
    merged = merged.astype(q.dtype)
    return (merged, lse) if return_lse else merged
