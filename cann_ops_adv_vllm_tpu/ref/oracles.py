"""Pure-NumPy golden oracles for the sparse-attention op chain.

These pin the semantic contract of every op in the chain, ported from the
reference repo's golden tests (reference paths relative to
``yueliang13/cann-ops-adv-vllm``):

* :func:`compute_cent_oracle`    — tests/utils.py:87-123 (``torch_compute_cent``)
* :func:`select_position_oracle` — tests/utils.py:4-84 (``torch_select_position``)
* :func:`cent_select_oracle`     — src/transformer/cent_select/cent_select.cpp:101-434
  (adds sink+recent page forcing :350-362 and the page_len/8 workload cap
  :218,410-414 on top of compute_cent + select_position)
* :func:`paged_attention_oracle` — dense decode flash attention over a paged
  KV cache (IncreFlashAttention semantics,
  incre_flash_attention_split_Bbn2s2_Us2.h:3590-3648)
* :func:`sparse_paged_attention_oracle` — same, restricted to the pages
  selected in ``block_position`` (sparse_paged_attention_split_Bbn2s2_Us2.h:224-330)
* :func:`quantize_kv_oracle` / :func:`dequantize_kv_oracle` — INT8/INT4
  KV-cache pseudo-quantization via antiquant scale/offset (the reference's
  MSD residual-digit trick is an Ascend cube-unit workaround; on TPU we
  dequantize directly before the MXU, verified against the same fp32 oracle).

All oracles are intentionally slow, loopy, and fp32 — correctness only.
"""

from __future__ import annotations

import numpy as np

from ..config import INT32_SENTINEL, MAX_PAGE_NUM, PAGE_SIZE, TPL_PAD


def compute_cent_oracle(q, l1_cent, k):
    """Top-k centroid indices per query head.

    Args:
      q:        [B, H_q, D] queries.
      l1_cent:  [H_kv, C, D] per-KV-head centroid codebooks.
      k:        number of clusters to select.

    Returns:
      indices: [B, H_q, k] int32 — top-k cluster ids by ``q · centᵀ``
      (descending score; ties broken by ascending index, matching
      ``torch.topk`` / ``jax.lax.top_k``).
    """
    q = np.asarray(q, dtype=np.float32)
    l1_cent = np.asarray(l1_cent, dtype=np.float32)
    b, h_q, d = q.shape
    h_kv, c, _ = l1_cent.shape
    assert h_q % h_kv == 0
    g = h_q // h_kv

    indices = np.zeros((b, h_q, k), dtype=np.int32)
    for bi in range(b):
        for h in range(h_q):
            scores = q[bi, h] @ l1_cent[h // g].T  # [C]
            # stable descending sort => ties by ascending index
            order = np.argsort(-scores, kind="stable")[:k]
            indices[bi, h] = order.astype(np.int32)
    return indices


def _page_lens(seq_len, block_size):
    seq_len = np.asarray(seq_len, dtype=np.int64)
    return (seq_len + block_size - 1) // block_size


def select_position_oracle(block_ids, block_table, seq_len, indices,
                           block_size=PAGE_SIZE):
    """Resolve selected cluster ids to logical page positions.

    Args:
      block_ids:   [H_kv, kv_page_len] int32 — cluster id of each physical page.
      block_table: [max_batch, max_page] int32 — logical→physical page map.
      seq_len:     [B] int32 — per-sequence token counts.
      indices:     [B, H, K] int32 — selected cluster ids (per q-head or
                   per kv-head, depending on the caller's group mode).

    Returns:
      (token_position [B, H, max_page_len] int32 pad=INT32_MAX,
       token_position_length [B, H] int32)

    ``token_position[b, h]`` holds the ascending *logical* page slots whose
    physical page's cluster id is among ``indices[b, h]``.
    """
    block_ids = np.asarray(block_ids)
    block_table = np.asarray(block_table)
    indices = np.asarray(indices)
    b = np.asarray(seq_len).shape[0]
    h_kv, kv_page_len = block_ids.shape
    h = indices.shape[1]
    assert h % h_kv == 0
    g = h // h_kv

    page_lens = _page_lens(seq_len, block_size)
    max_page_len = int(page_lens.max())

    token_position = np.full((b, h, max_page_len), INT32_SENTINEL, dtype=np.int32)
    token_position_length = np.zeros((b, h), dtype=np.int32)

    for bi in range(b):
        pl = int(page_lens[bi])
        if pl <= 0:
            continue
        page_idx = np.clip(block_table[bi, :pl], 0, kv_page_len - 1)
        for hi in range(h):
            cluster_of_page = block_ids[hi // g, page_idx]           # [pl]
            mask = np.isin(cluster_of_page, indices[bi, hi])          # [pl]
            pos = np.nonzero(mask)[0]
            n = min(len(pos), pl)
            token_position[bi, hi, :n] = pos[:n].astype(np.int32)
            token_position_length[bi, hi] = n
    return token_position, token_position_length


def cent_select_oracle(q, l1_cent, block_ids, block_table, seq_len, *,
                       k, block_size=PAGE_SIZE, max_page_num=MAX_PAGE_NUM,
                       workload_cap_ratio=8, force_sink_and_recent=True):
    """Fused selection: ComputeCent + SelectPosition + forcing + cap.

    Matches the device kernel (cent_select.cpp) rather than the plain
    torch composition:

    * sink/recent forcing — the mask additionally includes every logical
      slot whose *physical page id* equals ``block_table[b, 0]``,
      ``block_table[b, page_len-2]`` or ``block_table[b, page_len-1]``
      (value equality, exactly as ``CompareScalar`` does at :350-362).
    * workload cap — the reported per-(b,h) length is clamped to
      ``page_len // workload_cap_ratio`` (:410-414); positions beyond the
      cap are still written to the buffer (GatherMask writes all matches).
    * fixed-size outputs — page_position padded to ``max_page_num`` with
      0x7FFFFFFF, lengths padded to ``TPL_PAD`` lanes, and
      ``max_page_position_length[b] = max_h(len[b,h]) * block_size`` int64
      (:123-152).

    Returns:
      (page_position [B, H, max_page_num] int32,
       page_position_length [B, H, TPL_PAD] int32,
       max_page_position_length [B, TPL_PAD] int64)
    """
    q = np.asarray(q)
    block_table = np.asarray(block_table)
    block_ids = np.asarray(block_ids)
    b = np.asarray(seq_len).shape[0]
    h = q.shape[1]
    h_kv, kv_page_len = block_ids.shape
    g = h // h_kv

    indices = compute_cent_oracle(q, l1_cent, k)
    page_lens = _page_lens(seq_len, block_size)

    page_position = np.full((b, h, max_page_num), INT32_SENTINEL, dtype=np.int32)
    page_position_length = np.zeros((b, h, TPL_PAD), dtype=np.int32)
    max_page_position_length = np.zeros((b, TPL_PAD), dtype=np.int64)

    for bi in range(b):
        pl = int(page_lens[bi])
        if pl <= 0:
            continue
        table = block_table[bi, :pl]
        page_idx = np.clip(table, 0, kv_page_len - 1)
        forced = np.zeros(pl, dtype=bool)
        if force_sink_and_recent:
            for slot in (0, max(pl - 2, 0), pl - 1):
                forced |= table == table[slot]
        cap = pl // workload_cap_ratio if workload_cap_ratio > 0 else pl
        cap = max(cap, 1)
        max_len = 0
        for hi in range(h):
            cluster_of_page = block_ids[hi // g, page_idx]
            mask = forced | np.isin(cluster_of_page, indices[bi, hi])
            pos = np.nonzero(mask)[0]
            n_written = min(len(pos), max_page_num)
            page_position[bi, hi, :n_written] = pos[:n_written].astype(np.int32)
            n = min(len(pos), cap)
            page_position_length[bi, hi, :] = n
            max_len = max(max_len, n)
        max_page_position_length[bi, :] = max_len * block_size
    return page_position, page_position_length, max_page_position_length


def _gather_kv(kv_pages, block_table_row, seq_len, kv_head, block_size):
    """Concatenate a sequence's tokens for one KV head from paged storage.

    kv_pages: [H_kv, num_pages, page_size, D] (TPU-native kv-head-major
    layout; see config.KVCacheConfig).
    """
    pl = (seq_len + block_size - 1) // block_size
    chunks = []
    for p in range(pl):
        page = kv_pages[kv_head, block_table_row[p]]
        start = p * block_size
        n = min(block_size, seq_len - start)
        chunks.append(page[:n])
    return np.concatenate(chunks, axis=0) if chunks else np.zeros((0, kv_pages.shape[-1]))


def paged_attention_oracle(q, k_pages, v_pages, block_table, seq_len, *,
                           scale=None, block_size=PAGE_SIZE, return_lse=False):
    """Dense decode-time paged attention (IncreFlashAttention semantics).

    Args:
      q:        [B, H_q, D]
      k_pages:  [H_kv, num_pages, page_size, D]
      v_pages:  [H_kv, num_pages, page_size, D]
      block_table: [B(+), max_page] int32
      seq_len:  [B] int32

    Returns:
      out [B, H_q, D] fp32 (and optionally lse [B, H_q] fp32 — natural-log
      sum-exp of the scaled scores, matching softmax_lse of the reference).
    """
    q = np.asarray(q, dtype=np.float32)
    k_pages = np.asarray(k_pages, dtype=np.float32)
    v_pages = np.asarray(v_pages, dtype=np.float32)
    block_table = np.asarray(block_table)
    seq_len = np.asarray(seq_len)
    b, h_q, d = q.shape
    h_kv = k_pages.shape[0]
    g = h_q // h_kv
    if scale is None:
        scale = 1.0 / np.sqrt(d)

    out = np.zeros((b, h_q, d), dtype=np.float32)
    lse = np.zeros((b, h_q), dtype=np.float32)
    for bi in range(b):
        sl = int(seq_len[bi])
        for hk in range(h_kv):
            keys = _gather_kv(k_pages, block_table[bi], sl, hk, block_size)
            vals = _gather_kv(v_pages, block_table[bi], sl, hk, block_size)
            for gi in range(g):
                hq = hk * g + gi
                s = scale * (q[bi, hq] @ keys.T)        # [sl]
                m = s.max() if sl else 0.0
                e = np.exp(s - m)
                denom = e.sum()
                out[bi, hq] = (e @ vals) / denom
                lse[bi, hq] = m + np.log(denom)
    return (out, lse) if return_lse else out


def sparse_paged_attention_oracle(q, k_pages, v_pages, block_table,
                                  block_position, position_length, seq_len, *,
                                  scale=None, block_size=PAGE_SIZE,
                                  return_lse=False):
    """Sparse decode attention over the selected logical pages only.

    Args:
      q:               [B, H_q, D]
      k_pages/v_pages: [H_kv, num_pages, page_size, D]
      block_table:     [B(+), max_page] int32
      block_position:  [B, H_pos, max_page_num] int32 — selected *logical*
                       page slots, ascending, sentinel-padded.  ``H_pos`` is
                       either ``H_kv`` (kv_group mode — the layout the
                       attention kernel consumes) or ``H_q``.
      position_length: [B, H_pos] int32 — number of valid slots (the
                       workload-capped count).
      seq_len:         [B] int32 — true sequence lengths (the final selected
                       page may be partial).

    Deviation from the reference: the reference pads past-the-end slots with
    0x7FFFFFFF and on hitting the sentinel copies a fixed 30 rows from the
    sequence tail (sparse split header :293-307, ``fix_length=30``) — an
    artifact of its matmul callback needing *some* rows.  We instead mask
    cleanly by ``position_length``; numerics are judged against this oracle.
    """
    q = np.asarray(q, dtype=np.float32)
    k_pages = np.asarray(k_pages, dtype=np.float32)
    v_pages = np.asarray(v_pages, dtype=np.float32)
    block_table = np.asarray(block_table)
    block_position = np.asarray(block_position)
    position_length = np.asarray(position_length)
    seq_len = np.asarray(seq_len)

    b, h_q, d = q.shape
    h_kv = k_pages.shape[0]
    h_pos = block_position.shape[1]
    g = h_q // h_kv
    if scale is None:
        scale = 1.0 / np.sqrt(d)

    out = np.zeros((b, h_q, d), dtype=np.float32)
    lse = np.zeros((b, h_q), dtype=np.float32)
    for bi in range(b):
        sl = int(seq_len[bi])
        for hq in range(h_q):
            hk = hq // g
            # H_pos broadcasting: 1 (shared), H_kv (per group), or H_q
            hp = hk % h_pos if h_pos in (1, h_kv) else hq
            n = int(position_length[bi, hp])
            keys, vals = [], []
            for i in range(n):
                slot = int(block_position[bi, hp, i])
                page = block_table[bi, slot]
                start = slot * block_size
                # a selected slot past the sequence end contributes
                # nothing (cent_select never emits one, but the kernel
                # masks it to an empty window — a negative cnt here would
                # silently slice from the wrong end instead)
                cnt = min(block_size, sl - start)
                if cnt <= 0:
                    continue
                keys.append(k_pages[hk, page, :cnt])
                vals.append(v_pages[hk, page, :cnt])
            if not keys:
                continue
            keys = np.concatenate(keys, axis=0)
            vals = np.concatenate(vals, axis=0)
            s = scale * (q[bi, hq] @ keys.T)
            m = s.max()
            e = np.exp(s - m)
            denom = e.sum()
            out[bi, hq] = (e @ vals) / denom
            lse[bi, hq] = m + np.log(denom)
    return (out, lse) if return_lse else out


# --- KV quantization --------------------------------------------------------

def quantize_kv_oracle(kv, mode="per_channel", bits=8):
    """Symmetric-range affine quantization of a KV page array.

    ``dequant(x) = x_q * scale + offset`` — the antiquant convention of the
    reference (aclnn antiquant_scale / antiquant_offset,
    incre_flash_attention_def.cpp dtype matrix).

    Args:
      kv:   [H_kv, num_pages, page_size, D] float.
      mode: "per_channel" — scale/offset shaped [H_kv, 1, 1, D];
            "per_token"   — scale/offset shaped [H_kv, num_pages, page_size, 1].
      bits: 8 or 4.

    Returns: (kv_q int8 (int4 values stored in int8), scale fp32, offset fp32)
    """
    kv = np.asarray(kv, dtype=np.float32)
    qmax = 2 ** (bits - 1) - 1
    if mode == "per_channel":
        axes = (1, 2)
    elif mode == "per_token":
        axes = (3,)
    else:
        raise ValueError(mode)
    hi = kv.max(axis=axes, keepdims=True)
    lo = kv.min(axis=axes, keepdims=True)
    offset = (hi + lo) / 2.0
    scale = np.maximum((hi - lo) / (2.0 * qmax), 1e-8)
    kv_q = np.clip(np.rint((kv - offset) / scale), -qmax - 1, qmax).astype(np.int8)
    return kv_q, scale.astype(np.float32), offset.astype(np.float32)


def dequantize_kv_oracle(kv_q, scale, offset):
    return kv_q.astype(np.float32) * scale + offset
