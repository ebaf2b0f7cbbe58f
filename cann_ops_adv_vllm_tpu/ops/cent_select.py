"""Centroid selection ops: compute_cent, select_position, cent_select.

TPU-native (XLA) implementations of the reference's AIV-only selection
kernels.  On Ascend these are hand-written vector kernels (VMLA dot products
+ AscendC::TopK + CompareScalar/GatherMask compaction,
src/transformer/compute_cent/compute_cent.cpp,
src/transformer/cent_select/cent_select.cpp); on TPU the same math is a
small batched matmul + ``jax.lax.top_k`` + a one-hot-membership gather and a
sort-based compaction, all of which XLA fuses and tiles onto the MXU/VPU —
no hand kernel is warranted at these sizes (B·H ≤ 256 rows, C ≤ 512
centroids).  Everything is jittable, static-shaped, and stays on device.

Semantics are pinned by the oracles in ``ref/oracles.py`` (ported from the
reference's golden tests, tests/utils.py) and verified by exact equality in
``tests/test_cent_select.py``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..config import INT32_SENTINEL, MAX_PAGE_NUM, PAGE_SIZE, TPL_PAD
from ..utils import validation


@functools.partial(jax.jit, static_argnames=("k",))
def compute_cent(q, l1_cent, k=64):
    """Top-k centroid indices per query head.

    Reference: ComputeCent (compute_cent.cpp:143-253 — per-(b,h) VMLA dot
    products + BlockReduceSum + AscendC::TopK).

    Args:
      q:       [B, H_q, D] fp16/bf16/fp32 queries.
      l1_cent: [H_kv, C, D] centroid codebooks (one per KV head).
      k:       static top-k.

    Returns:
      indices [B, H_q, k] int32, scores descending (ties → lower index).
    """
    b, h_q, d = q.shape
    h_kv, c, _ = l1_cent.shape
    g = h_q // h_kv
    qg = q.reshape(b, h_kv, g, d).astype(jnp.float32)
    cent = l1_cent.astype(jnp.float32)
    # [B, H_kv, G, C] — one matmul per kv head over its group's queries.
    scores = jnp.einsum("bhgd,hcd->bhgc", qg, cent,
                        preferred_element_type=jnp.float32)
    scores = scores.reshape(b, h_q, c)
    _, idx = jax.lax.top_k(scores, k)
    return idx.astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("k",))
def compute_cent_scores_grouped(q, l1_cent, k=64):
    """Group-level top-k: sum the GQA group's scores before top-k.

    Used by the ``kv_group`` selection mode — every query head in a GQA
    group must share one page set for the fused KV gather, so the group's
    per-head similarities are summed (equivalently: the summed query row is
    matched against the codebook).  Returns [B, H_kv, k] int32.
    """
    b, h_q, d = q.shape
    h_kv, c, _ = l1_cent.shape
    g = h_q // h_kv
    q_sum = q.reshape(b, h_kv, g, d).astype(jnp.float32).sum(axis=2)
    scores = jnp.einsum("bhd,hcd->bhc", q_sum, l1_cent.astype(jnp.float32),
                        preferred_element_type=jnp.float32)
    _, idx = jax.lax.top_k(scores, k)
    return idx.astype(jnp.int32)


def _membership_mask(block_ids, block_table, seq_len, indices, block_size,
                     num_clusters=None):
    """[B, H, max_page] bool — slot's page cluster ∈ indices[b,h] and slot valid.

    With ``num_clusters`` (the static codebook size C), membership is a
    scatter-built one-hot table [B·H, C] plus a gather — O(max_page + K)
    instead of the O(max_page·K) broadcast compare (the TPU analog of the
    reference's CompareScalar×k loop, cent_select.cpp:340-362).  Without
    it, falls back to the broadcast compare.  Also returns
    (page_len [B], phys [B, max_page]).
    """
    bsz = seq_len.shape[0]
    h = indices.shape[1]
    h_kv, kv_page_len = block_ids.shape
    g = h // h_kv
    max_page = block_table.shape[1]

    page_len = (seq_len.astype(jnp.int32) + block_size - 1) // block_size
    phys = jnp.clip(block_table[:bsz].astype(jnp.int32), 0, kv_page_len - 1)

    # cluster id of each logical slot, per head: [B, H, max_page]
    cluster = block_ids[
        (jnp.arange(h) // g)[None, :, None], phys[:, None, :]
    ]

    k = indices.shape[2]
    if num_clusters is not None and k >= num_clusters:
        # every cluster selected (the reference's fused config: k = C =
        # 512, sparse_paged_fusion_attention_tiling.cc:1603) — membership
        # is trivially true; only the validity/cap/forcing logic applies
        mask = jnp.ones((bsz, h, max_page), jnp.bool_)
    elif num_clusters is not None:
        flat = jnp.clip(indices.reshape(bsz * h, k), 0, num_clusters - 1)
        table = jnp.zeros((bsz * h, num_clusters), jnp.bool_)
        table = table.at[jnp.arange(bsz * h)[:, None], flat].set(True)
        mask = jnp.take_along_axis(
            table.reshape(bsz, h, num_clusters),
            jnp.clip(cluster, 0, num_clusters - 1), axis=2)
    else:
        mask = jnp.any(cluster[..., None] == indices[:, :, None, :],
                       axis=-1)

    slot_valid = jnp.arange(max_page)[None, :] < page_len[:, None]
    mask = mask & slot_valid[:, None, :]
    return mask, page_len, phys


def _compact_positions(mask, out_size):
    """Ascending selected slot ids, sentinel-padded: [..., out_size] int32.

    The reference compacts with GatherMask over CreateVecIndex
    (cent_select.cpp:399-408) — O(selected), not O(max_page·log).  On TPU
    the equivalent is a *partial* selection: ``top_k`` of the negated keyed
    slots keeps only the ``out_size`` smallest (= first selected, ascending
    after re-negation) instead of fully sorting all ``max_page`` slots —
    the full bitonic sort was ~40% of the fused-step latency at 128K ctx.
    Slot keys are unique, so the compaction is exact.
    """
    max_page = mask.shape[-1]
    slots = jnp.arange(max_page, dtype=jnp.int32)
    keyed = jnp.where(mask, slots, INT32_SENTINEL)
    if out_size < max_page:
        neg_vals, _ = jax.lax.top_k(-keyed, out_size)
        return -neg_vals
    compacted = jnp.sort(keyed, axis=-1)
    if out_size == max_page:
        return compacted
    pad = [(0, 0)] * (compacted.ndim - 1) + [(0, out_size - max_page)]
    return jnp.pad(compacted, pad, constant_values=INT32_SENTINEL)


@functools.partial(jax.jit, static_argnames=("block_size", "out_size"))
def select_position(block_ids, block_table, seq_len, indices,
                    block_size=PAGE_SIZE, out_size=MAX_PAGE_NUM):
    """Resolve selected cluster ids to ascending logical page slots.

    Reference: SelectPosition (select_position.cpp:122-183 — Gather by
    block_table, CompareScalar×k membership, GatherMask compaction).

    Args:
      block_ids:   [H_kv, kv_page_len] int32 cluster id per physical page.
      block_table: [max_batch, max_page] int32.
      seq_len:     [B] int32.
      indices:     [B, H, K] int32 selected clusters.

    Returns:
      (token_position [B, H, out_size] int32 pad=INT32_MAX,
       token_position_length [B, H] int32)
    """
    mask, _, _ = _membership_mask(block_ids, block_table, seq_len, indices,
                                  block_size)
    positions = _compact_positions(mask, out_size)
    lengths = jnp.sum(mask, axis=-1).astype(jnp.int32)
    return positions, lengths


@functools.partial(
    jax.jit,
    static_argnames=("k", "block_size", "max_page_num", "workload_cap_ratio",
                     "force_sink_and_recent", "group_mode"),
)
def cent_select(q, l1_cent, block_ids, block_table, seq_len, *, k=64,
                block_size=PAGE_SIZE, max_page_num=MAX_PAGE_NUM,
                workload_cap_ratio=8, force_sink_and_recent=True,
                group_mode="per_qhead"):
    """Fused ComputeCent + SelectPosition with sink/recent forcing and cap.

    Reference: CentSelect kernel (cent_select.cpp:101-434).  One XLA
    subgraph, fully device-resident.

    Args follow :func:`compute_cent` / :func:`select_position`;
    ``group_mode`` picks per-q-head selection (reference layout, H = H_q)
    or per-kv-head group selection (H = H_kv — the layout the attention
    kernel consumes).

    Returns:
      (page_position [B, H, max_page_num] int32 pad=0x7FFFFFFF,
       page_position_length [B, H, TPL_PAD] int32 (workload-capped),
       max_page_position_length [B, TPL_PAD] int64 = max_h(len)·block_size)
    """
    validation.check_selection_inputs(
        "cent_select", q, l1_cent, block_ids, block_table, seq_len, k=k)
    c = l1_cent.shape[1]
    bsz = seq_len.shape[0]
    if group_mode not in ("per_qhead", "kv_group"):
        raise ValueError(group_mode)
    if k >= c:
        # The reference's fused config (k=512 = C,
        # sparse_paged_fusion_attention_tiling.cc:1603): every cluster is
        # selected, so the membership mask is *statically* all-true over
        # valid slots (and the forced sink/recent slots are a subset of
        # it).  The whole similarity → membership → compaction pipeline
        # collapses algebraically to a masked iota — positions ARE the
        # first ``max_page_num`` slot ids and counts ARE page_len.  This
        # removes the partial-top_k compaction (the dominant selection
        # cost at 128K ctx) from the fused hot path exactly.
        h = q.shape[1] if group_mode == "per_qhead" else l1_cent.shape[0]
        page_len = (seq_len.astype(jnp.int32) + block_size - 1) // block_size
        sl = jnp.arange(max_page_num, dtype=jnp.int32)
        pos_row = jnp.where(sl[None, :] < page_len[:, None], sl[None, :],
                            INT32_SENTINEL)                    # [B, M]
        positions = jnp.broadcast_to(pos_row[:, None, :],
                                     (bsz, h, max_page_num))
        counts = jnp.broadcast_to(page_len[:, None], (bsz, h))
    else:
        if group_mode == "per_qhead":
            indices = compute_cent(q, l1_cent, k)
        else:
            indices = compute_cent_scores_grouped(q, l1_cent, k)

        mask, page_len, _ = _membership_mask(block_ids, block_table,
                                             seq_len, indices, block_size,
                                             num_clusters=c)

        if force_sink_and_recent:
            # Force slots whose physical id equals the sink page's or the
            # two most recent pages' physical id (value equality, matching
            # CompareScalar at cent_select.cpp:350-362).
            table = block_table[:bsz].astype(jnp.int32)
            max_page = table.shape[1]
            slot_valid = jnp.arange(max_page)[None, :] < page_len[:, None]

            def forced_for(slot_idx):
                ref_val = jnp.take_along_axis(table, slot_idx[:, None],
                                              axis=1)
                return table == ref_val  # [B, max_page]

            last = jnp.maximum(page_len - 1, 0)
            second_last = jnp.maximum(page_len - 2, 0)
            forced = (forced_for(jnp.zeros_like(last))
                      | forced_for(second_last)
                      | forced_for(last))
            forced = forced & slot_valid
            mask = mask | forced[:, None, :]

        positions = _compact_positions(mask, max_page_num)
        counts = jnp.sum(mask, axis=-1).astype(jnp.int32)      # [B, H]
    if workload_cap_ratio > 0:
        # The reference caps the LENGTH only, leaving the ascending
        # GatherMask list untouched (cent_select.cpp:410-414:
        # pagePositionLength = min(rsvdCnt, workLoadThreshold)), so a
        # capped selection attends the FIRST len entries of the ascending
        # list — the sink page (slot 0) always survives, while forced
        # recent pages at the tail can be dropped.  Verified against the
        # reference source; this path reproduces that semantics exactly
        # (including in the k>=C masked-iota fast path, where the list is
        # the slot iota and a cap keeps the oldest pages).
        cap = jnp.maximum(page_len // workload_cap_ratio, 1)   # [B]
        lengths = jnp.minimum(counts, cap[:, None])
    else:
        lengths = counts

    page_position_length = jnp.broadcast_to(
        lengths[..., None], (*lengths.shape, TPL_PAD)).astype(jnp.int32)
    # the reference emits int64 here (FlashAttentionKernelNpuOpApi.cpp:1921);
    # values are ≤ max_page·block_size < 2^31, so use x64 only when enabled
    # (avoids a truncation warning on every call under JAX's default x32)
    i64 = jnp.int64 if jax.config.jax_enable_x64 else jnp.int32
    max_len = jnp.max(lengths, axis=1).astype(i64) * block_size
    max_page_position_length = jnp.broadcast_to(
        max_len[:, None], (bsz, TPL_PAD))
    return positions, page_position_length, max_page_position_length
