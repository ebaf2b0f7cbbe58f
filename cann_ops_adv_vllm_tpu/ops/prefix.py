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
    kv_start=None,
    bias_pages=None,
    prefix_bias_pages=None,
    alibi_slopes=None,
    out_quant=None,
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
      kv_start:      [B] int32 kv-left-padding of the *user* KV (the
                     prefix pool is dense from 0 by construction).
      bias_pages / prefix_bias_pages: additive score-bias tiles for the
                     user / prefix pass respectively (api.make_bias_pages
                     layout) — the reference's prefix path composes
                     mask/pse with SYS_PREFIX the same way
                     (incre_flash_attention.cpp INVOKE..._PREFIX carries
                     the full feature matrix).
      alibi_slopes:  [H_q] f32.  The user pass runs with its local
                     positions — local distances equal global distances
                     (both query and token shift by prefix_len).  The
                     prefix pass runs with prefix-local positions, whose
                     distances are uniformly short by seq_len; a uniform
                     logit shift leaves softmax weights (and the partial
                     output) unchanged and adds the constant to the LSE,
                     so the correction ``slope · (−seq_len)`` is applied
                     to the prefix LSE before the merge — exact.
      out_quant:     (scale2, offset2) → int8 output, applied after the
                     merge (post-quant happens once, on the combined
                     result, matching aclnn quant_scale2 semantics).

    Returns [B, H_q, D] (int8 with ``out_quant``; optionally merged LSE
    [B, H_q] fp32).
    """
    b, h_q, _ = q.shape
    if prefix_table.shape[0] == 1 and b > 1:
        prefix_table = jnp.broadcast_to(
            prefix_table, (b, prefix_table.shape[1]))
    if prefix_lens.shape[0] == 1 and b > 1:
        prefix_lens = jnp.broadcast_to(prefix_lens, (b,))

    o_pre, lse_pre = paged_flash_decode(
        q, prefix_pages, None, prefix_table, prefix_lens,
        prefix_positions, prefix_position_lens,
        kv_scales=prefix_kv_scales, bias_pages=prefix_bias_pages,
        alibi_slopes=alibi_slopes,
        sm_scale=sm_scale, page_size=page_size,
        ppcb=ppcb, return_lse=True, interpret=interpret)
    o_usr, lse_usr = paged_flash_decode(
        q, kv_pages, None, block_table, seq_lens,
        positions, position_lens,
        kv_scales=kv_scales, kv_start=kv_start, bias_pages=bias_pages,
        alibi_slopes=alibi_slopes,
        sm_scale=sm_scale, page_size=page_size,
        ppcb=ppcb, return_lse=True, interpret=interpret)

    if alibi_slopes is not None:
        # global-position correction for the prefix pass (see docstring):
        # its in-pass query position was prefix_len−1; globally it is
        # prefix_len + seq_len − 1, so every prefix logit is slope·seq_len
        # too large → subtract uniformly via the LSE.
        slopes = jnp.asarray(alibi_slopes, jnp.float32).reshape(1, h_q)
        shift = slopes * (-seq_lens.astype(jnp.float32)[:, None])
        # keep empty-prefix LSEs at MASK_VALUE-level so the merge's
        # zero-weight invariant holds
        lse_pre = jnp.where(lse_pre <= MASK_VALUE / 2, lse_pre,
                            lse_pre.astype(jnp.float32) + shift)

    merged, lse = merge_partial_attention([o_pre, o_usr], [lse_pre, lse_usr])
    if out_quant is not None:
        oq_scale = jnp.asarray(out_quant[0], jnp.float32)
        oq_off = jnp.asarray(out_quant[1], jnp.float32)
        merged = jnp.clip(jnp.round(merged * oq_scale + oq_off),
                          -128.0, 127.0).astype(jnp.int8)
    else:
        merged = merged.astype(q.dtype)
    return (merged, lse) if return_lse else merged
