"""Chunked prefill attention over the paged KV cache.

The reference is decode-only (IFA = *incremental* flash attention); prefill
is vLLM's job above it.  A complete engine needs both, so this module adds
causal prefill over the same fused-record paged cache:

* :func:`write_prompt_chunk` — scatter T new tokens' K/V rows into pages.
* :func:`paged_prefill_attention` — causal attention of a T-token query
  chunk against all cached tokens ≤ its positions, computed as an XLA
  ``lax.scan`` over page blocks with running (m, l, acc) — flash-style
  memory behavior without a hand kernel (prefill is MXU-bound, which XLA
  already handles well; the decode path is where the Pallas kernel pays).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..config import MASK_VALUE, PAGE_SIZE


@functools.partial(jax.jit, static_argnames=("page_size",))
def write_prompt_chunk(kv_cache, k_new, v_new, block_table, start_pos,
                       page_size=PAGE_SIZE, valid_lens=None,
                       layer_idx=None):
    """Scatter a chunk of K/V rows into the fused paged cache.

    kv_cache: [H_kv, P, ps, 2D] one layer (or the int8 cache dict — rows
    are quantized per-token at write time, models.llama.init_kv_cache),
    or — with ``layer_idx`` — the FULL [L, H_kv, P, ps, 2D] cache,
    scattered in place at that layer (see models.llama.decode_step);
    k_new/v_new: [B, T, H_kv, D];
    start_pos: [B] — position of the chunk's first token.
    valid_lens: optional [B] int32 — only the first ``valid_lens[b]`` rows
    of lane b are written (tail-of-prompt chunks are zero-padded to the
    engine's fixed chunk length; invalid rows scatter to an out-of-range
    page id and are dropped).
    """
    b, t, h_kv, d = k_new.shape
    quantized = isinstance(kv_cache, dict)
    pages = kv_cache["kv"] if quantized else kv_cache
    num_pages = pages.shape[-3]
    pos = start_pos[:, None].astype(jnp.int32) + jnp.arange(t)[None, :]
    slot = pos // page_size                                   # [B, T]
    row = pos % page_size
    slot = jnp.clip(slot, 0, block_table.shape[1] - 1)
    pid = jnp.take_along_axis(block_table.astype(jnp.int32), slot, axis=1)
    if valid_lens is not None:
        valid = (jnp.arange(t, dtype=jnp.int32)[None, :]
                 < valid_lens[:, None].astype(jnp.int32))
        pid = jnp.where(valid, pid, num_pages)                # OOB → dropped

    h_idx = jnp.arange(h_kv)[None, None, :]
    hb = jnp.broadcast_to(h_idx, (b, t, h_kv))
    pb = jnp.broadcast_to(pid[:, :, None], (b, t, h_kv))
    rb = jnp.broadcast_to(row[:, :, None], (b, t, h_kv))
    lead = () if layer_idx is None else (layer_idx,)
    if quantized:
        from .quant import quantize_rows
        k_q, k_s = quantize_rows(k_new)               # [B,T,H,D], [B,T,H]
        v_q, v_s = quantize_rows(v_new)
        kv_row = jnp.concatenate([k_q, v_q], axis=-1)
        ts = kv_cache["ts"]
        ts = ts.at[(*lead, hb, 0, pb, rb)].set(k_s, mode="drop")
        ts = ts.at[(*lead, hb, 2, pb, rb)].set(v_s, mode="drop")
        return {"kv": pages.at[(*lead, hb, pb, rb)].set(kv_row,
                                                        mode="drop"),
                "ts": ts}
    kv_row = jnp.concatenate([k_new, v_new], axis=-1)         # [B, T, H, 2D]
    return pages.at[(*lead, hb, pb, rb)].set(
        kv_row.astype(pages.dtype), mode="drop")


@functools.partial(jax.jit, static_argnames=("page_size", "kv_block_pages",
                                             "sm_scale", "sliding_window"))
def paged_prefill_attention(q, kv_pages, block_table, start_pos, *,
                            kv_scales=None, sm_scale=None,
                            page_size=PAGE_SIZE, kv_block_pages=4,
                            sliding_window=0, layer_idx=None):
    """Causal attention of a query chunk against the paged cache.

    Args:
      q:           [B, T, H_q, D] — queries at positions start_pos + t.
      kv_pages:    [H_kv, P, ps, 2D] fused records (the chunk's own K/V
                   must already be written via :func:`write_prompt_chunk`).
      block_table: [B, max_page] int32.
      start_pos:   [B] int32.

    Returns [B, T, H_q, D] in q's dtype.
    """
    b, t, h_q, d = q.shape
    h_kv, num_pages, ps = (kv_pages.shape[-4], kv_pages.shape[-3],
                           kv_pages.shape[-2])
    g = h_q // h_kv
    if sm_scale is None:
        sm_scale = float(1.0 / (d ** 0.5))
    max_page = block_table.shape[1]
    n_blocks = (max_page + kv_block_pages - 1) // kv_block_pages
    bk = kv_block_pages * page_size

    # matmuls run in q's dtype (bf16 models hit the MXU's native bf16
    # path; fp32 inputs keep fp32 matmuls) with fp32 accumulation; the
    # softmax running state is always fp32
    mm_dt = q.dtype
    qg = (q.reshape(b, t, h_kv, g, d)
          .transpose(0, 2, 3, 1, 4))                      # [B,Hkv,G,T,D]
    q_pos = start_pos[:, None].astype(jnp.int32) + jnp.arange(t)[None, :]

    per_token = False
    if kv_scales is not None and not isinstance(kv_scales, (tuple, list)):
        # pre-stacked per-token scales [H_kv, 4, P, ps] (the int8 KV
        # cache's native layout, see models.llama.init_kv_cache)
        ts_pages = kv_scales.astype(jnp.float32)
        per_token = True
    elif kv_scales is not None:
        k_scale, k_offset, v_scale, v_offset = (
            s.astype(jnp.float32) for s in kv_scales)

    def body(blk, carry):
        m, l, acc = carry
        slot0 = blk * kv_block_pages
        slots = slot0 + jnp.arange(kv_block_pages)
        pids = block_table[:, :].astype(jnp.int32)
        pids = jax.lax.dynamic_slice_in_dim(pids, 0, max_page, axis=1)
        pids = jnp.take_along_axis(
            pids, jnp.clip(slots, 0, max_page - 1)[None, :].repeat(b, 0),
            axis=1)                                        # [B, kbp]
        pids = jnp.clip(pids, 0, num_pages - 1)
        if layer_idx is None:
            kv_blk = kv_pages[:, pids]              # [Hkv,B,kbp,ps,2D]
        else:
            # one fused gather (layer scalar + head + page indices) reads
            # only the addressed pages of the FULL cache — a slice-then-
            # gather would materialize the whole layer first
            h_ix = jnp.arange(h_kv)[:, None, None]
            kv_blk = kv_pages[layer_idx, h_ix, pids[None]]
        kv_blk = kv_blk.transpose(1, 0, 2, 3, 4).astype(
            jnp.float32 if kv_scales is not None else mm_dt)
        k = kv_blk[..., :d].reshape(b, h_kv, bk, d)
        v = kv_blk[..., d:].reshape(b, h_kv, bk, d)
        if per_token:
            # separated-advanced indexing: the scales-row slice sits
            # between the (head, page) index arrays, so the gathered
            # result is [Hkv, B, kbp, 4, ps] in BOTH the layered and
            # unlayered forms of the [.., H, 4, P, ps] scale pages
            h_ix = jnp.arange(h_kv)[:, None, None]
            if layer_idx is None:
                ts = ts_pages[h_ix, :, pids[None]]
            else:
                ts = ts_pages[layer_idx, h_ix, :, pids[None]]
            ts = ts.transpose(1, 0, 2, 3, 4).reshape(b, h_kv, kv_block_pages,
                                                     4, ps)
            ks = ts[:, :, :, 0].reshape(b, h_kv, bk)
            ko = ts[:, :, :, 1].reshape(b, h_kv, bk)
            vs = ts[:, :, :, 2].reshape(b, h_kv, bk)
            vo = ts[:, :, :, 3].reshape(b, h_kv, bk)
            k = (k * ks[..., None] + ko[..., None]).astype(mm_dt)
            v = (v * vs[..., None] + vo[..., None]).astype(mm_dt)
        elif kv_scales is not None:
            k = (k * k_scale[None, :, None, :]
                 + k_offset[None, :, None, :]).astype(mm_dt)
            v = (v * v_scale[None, :, None, :]
                 + v_offset[None, :, None, :]).astype(mm_dt)

        kv_pos = (slot0 * page_size
                  + jnp.arange(bk, dtype=jnp.int32))        # [bk]
        # causal: kv position ≤ query position
        mask = kv_pos[None, None, :] <= q_pos[:, :, None]   # [B,T,bk]
        if sliding_window:
            # Mistral-family: each query attends its last W positions only
            mask = mask & (kv_pos[None, None, :]
                           > q_pos[:, :, None] - sliding_window)

        s = jnp.einsum("bhgtd,bhkd->bhgtk", qg, k,
                       preferred_element_type=jnp.float32) * sm_scale
        s = jnp.where(mask[:, None, None], s, MASK_VALUE)

        m_curr = jnp.max(s, axis=-1, keepdims=True)
        m_next = jnp.maximum(m, m_curr)
        alpha = jnp.exp(m - m_next)
        p = jnp.exp(s - m_next)
        p = jnp.where(mask[:, None, None], p, 0.0)
        l_next = alpha * l + jnp.sum(p, axis=-1, keepdims=True)
        acc_next = acc * alpha + jnp.einsum(
            "bhgtk,bhkd->bhgtd", p.astype(mm_dt), v,
            preferred_element_type=jnp.float32)
        return (m_next, l_next, acc_next)

    m0 = jnp.full((b, h_kv, g, t, 1), MASK_VALUE, jnp.float32)
    l0 = jnp.zeros((b, h_kv, g, t, 1), jnp.float32)
    a0 = jnp.zeros((b, h_kv, g, t, d), jnp.float32)
    # only blocks overlapping the causal window [win_lo, max q_pos] hold
    # attendable tokens — chunked prefill then does triangular, not
    # rectangular, total work (chunk c touches ~c blocks, not max_page)
    hi_pos = jnp.max(start_pos.astype(jnp.int32)) + t      # 1 past last q
    blk_hi = jnp.minimum((hi_pos + bk - 1) // bk, n_blocks)
    if sliding_window:
        lo_pos = jnp.maximum(
            jnp.min(start_pos.astype(jnp.int32)) - sliding_window + 1, 0)
        blk_lo = lo_pos // bk
    else:
        blk_lo = jnp.int32(0)
    m, l, acc = jax.lax.fori_loop(blk_lo, blk_hi, body, (m0, l0, a0))
    l_inv = jnp.where(l == 0.0, 0.0, 1.0 / l)
    out = (acc * l_inv).transpose(0, 3, 1, 2, 4).reshape(b, t, h_q, d)
    return out.astype(q.dtype)
