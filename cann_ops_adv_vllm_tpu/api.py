"""Reference-compatible operator API.

Mirrors the reference's user-facing op surface so a user of
``custom_ops`` / ``torch_npu`` (extension/custom_ops/add_custom.py:10-124;
op_plugin_functions.yaml:6962; torch_npu/utils/custom_ops.py:133) can
switch to this framework and find the same entry points:

  ==========================  =====================================
  reference                    here
  ==========================  =====================================
  custom_ops.compute_cent      :func:`compute_cent`
  custom_ops.select_position   :func:`select_position`
  custom_ops.cent_select       :func:`cent_select`
  custom_ops.sparse_paged_attention
                               :func:`sparse_paged_attention`
  custom_ops.sparse_paged_fusion_attention /
  npu_sparse_paged_fusion_attention
                               :func:`sparse_paged_fusion_attention`
  custom_ops.incre_flash_attention_v4 / aclnnIncreFlashAttentionV5
                               :func:`incre_flash_attention`
  (shared-prefix v4/v5 path)   :func:`incre_flash_attention`
                               with ``prefix_*`` arguments
  ==========================  =====================================

Differences by design (ARCHITECTURE.md):
* tensor layouts — ``input_layout`` accepts the reference's BSH / BSND /
  BNSD (with S=1 at decode); KV accepts the reference/vLLM page-pool
  layouts via ``kv_layout`` ("native" ``[H_kv, P, ps, D]``,
  "vllm" ``[P, ps, H]`` or ``[P, ps, N2, D]``) or continuous
  (non-paged) KV which is paginated internally.
* no two-phase workspace API — XLA owns workspaces; every function is a
  jittable pure function.
* ``atten_mask``/``pse_shift`` are gathered once into page-shaped bias
  tiles (:func:`make_bias_pages`) and streamed by the kernel; ALiBi comes
  in exactly (``alibi_slopes``) rather than via a materialized pse tensor.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .config import MASK_VALUE, MAX_PAGE_NUM, PAGE_SIZE, TOPK_FUSED, TOPK_STANDALONE
from .ops import cent_select as _sel
from .ops import fused as _fused
from .ops.paged_attention import fuse_kv, paged_flash_decode
from .ops.prefix import shared_prefix_attention

__all__ = [
    "compute_cent", "select_position", "cent_select",
    "incre_flash_attention", "sparse_paged_attention",
    "sparse_paged_fusion_attention",
    "make_bias_pages", "to_native_kv_pages", "paginate_kv",
    "paginate_kv_list",
]


# --- layout helpers ---------------------------------------------------------

def _q_to_bnd(query, num_heads, input_layout):
    """[B, H, D] from a reference-layout query (S must be 1 at decode)."""
    lay = input_layout.upper()
    if lay == "BSH":
        b, s, hd = query.shape
        if s != 1:
            raise ValueError(f"decode expects S=1, got S={s} (BSH)")
        return query.reshape(b, num_heads, hd // num_heads)
    if lay == "BSND":
        b, s, n, d = query.shape
        if s != 1:
            raise ValueError(f"decode expects S=1, got S={s} (BSND)")
        return query.reshape(b, n, d)
    if lay == "BNSD":
        b, n, s, d = query.shape
        if s != 1:
            raise ValueError(f"decode expects S=1, got S={s} (BNSD)")
        return query.reshape(b, n, d)
    raise ValueError(f"input_layout must be BSH/BSND/BNSD, got {input_layout}")


def _out_from_bnd(out, input_layout):
    lay = input_layout.upper()
    b, n, d = out.shape
    if lay == "BSH":
        return out.reshape(b, 1, n * d)
    if lay == "BSND":
        return out.reshape(b, 1, n, d)
    return out.reshape(b, n, 1, d)


def to_native_kv_pages(key, value, *, num_kv_heads, kv_layout="native"):
    """Convert a paged KV pool to the native fused-record layout.

    kv_layout:
      "native": key/value [H_kv, P, ps, D] (or fused key [H_kv, P, ps, 2D]
                with value=None) — returned zero-copy / fused on the fly.
      "vllm":   key/value [P, ps, H_kv*D] (reference vllm-layout tests,
                tests/ifa_v5_case.py:584+ ``key_shape=[block_num,
                block_size, H]``) or [P, ps, H_kv, D].
    Returns fused records [H_kv, P, ps, 2*D].
    """
    if kv_layout == "native":
        if value is None:
            return key
        return fuse_kv(key, value)
    if kv_layout == "vllm":
        p, ps = key.shape[:2]
        k4 = key.reshape(p, ps, num_kv_heads, -1)
        v4 = value.reshape(p, ps, num_kv_heads, -1)
        k_n = jnp.transpose(k4, (2, 0, 1, 3))
        v_n = jnp.transpose(v4, (2, 0, 1, 3))
        return fuse_kv(k_n, v_n)
    raise ValueError(f"kv_layout must be 'native' or 'vllm', got {kv_layout}")


def paginate_kv(key, value, *, num_kv_heads, page_size=PAGE_SIZE,
                input_layout="BSH"):
    """Paginate continuous (non-paged) KV into a pool + identity table.

    The reference's non-paged IFA path reads KV [B, S, H] directly; here
    continuous KV becomes pages so one kernel serves both
    (incre_flash_attention_def.cpp layouts).  S is zero-padded up to a
    page multiple.

    Returns (kv_pages [H_kv, B*mp, ps, 2D], block_table [B, mp] int32).
    """
    lay = input_layout.upper()
    if lay == "BSH":
        b, s, hd = key.shape
        k4 = key.reshape(b, s, num_kv_heads, hd // num_kv_heads)
        v4 = value.reshape(b, s, num_kv_heads, hd // num_kv_heads)
    elif lay == "BSND":
        b, s, _, _ = key.shape
        k4, v4 = key, value
    elif lay == "BNSD":
        b, _, s, _ = key.shape
        k4 = jnp.transpose(key, (0, 2, 1, 3))
        v4 = jnp.transpose(value, (0, 2, 1, 3))
    else:
        raise ValueError(input_layout)
    ps = page_size
    mp = (s + ps - 1) // ps
    pad = mp * ps - s
    if pad:
        k4 = jnp.pad(k4, ((0, 0), (0, pad), (0, 0), (0, 0)))
        v4 = jnp.pad(v4, ((0, 0), (0, pad), (0, 0), (0, 0)))
    d = k4.shape[-1]
    # [B, mp, ps, N2, D] → [N2, B*mp, ps, D]
    k_p = jnp.transpose(
        k4.reshape(b, mp, ps, num_kv_heads, d), (3, 0, 1, 2, 4)
    ).reshape(num_kv_heads, b * mp, ps, d)
    v_p = jnp.transpose(
        v4.reshape(b, mp, ps, num_kv_heads, d), (3, 0, 1, 2, 4)
    ).reshape(num_kv_heads, b * mp, ps, d)
    table = (jnp.arange(b, dtype=jnp.int32)[:, None] * mp
             + jnp.arange(mp, dtype=jnp.int32)[None, :])
    return fuse_kv(k_p, v_p), table


def paginate_kv_list(keys, values, *, num_kv_heads, page_size=PAGE_SIZE,
                     input_layout="BSH"):
    """Paginate a per-batch KV tensor *list* into one pool + block table.

    The reference's non-continuous KV batches pass each request's KV as
    its own tensor (tensor-list inputs, incre_flash_attention_tiling.cc:
    337-366 ``kvListSeqLens_`` — per-list seq lens read from each tensor's
    shape).  Here each list element is [1, S_i, ...] or [S_i, ...] in
    ``input_layout`` (S_i may differ per element); every element is
    paginated and the pools concatenate, so one kernel invocation serves
    the whole ragged batch.

    Returns (kv_pages [H_kv, ΣP_i, ps, 2D], block_table [B, max_mp] int32,
    seq_lens [B] int32).
    """
    if len(keys) != len(values):
        raise ValueError("tensor-list KV: len(keys) != len(values)")
    pools, rows, lens = [], [], []
    offset = 0
    for k_i, v_i in zip(keys, values):
        if k_i.ndim == 2:                      # [S, H] → [1, S, H]
            k_i, v_i = k_i[None], v_i[None]
        lay = input_layout.upper()
        s_i = k_i.shape[2] if lay == "BNSD" else k_i.shape[1]
        pages_i, _ = paginate_kv(k_i, v_i, num_kv_heads=num_kv_heads,
                                 page_size=page_size,
                                 input_layout=input_layout)
        mp_i = pages_i.shape[1]
        pools.append(pages_i)
        rows.append(offset + jnp.arange(mp_i, dtype=jnp.int32))
        lens.append(s_i)
        offset += mp_i
    max_mp = max(r.shape[0] for r in rows)
    table = jnp.stack([
        jnp.pad(r, (0, max_mp - r.shape[0])) for r in rows])
    return (jnp.concatenate(pools, axis=1), table,
            jnp.asarray(lens, jnp.int32))


def make_bias_pages(*, atten_mask=None, pse_shift=None, max_blocks,
                    page_size=PAGE_SIZE, positions=None,
                    mask_value=MASK_VALUE):
    """Gather user-facing mask/pse tensors into kernel bias tiles.

    Args:
      atten_mask: [B, S] or [B, 1, S] bool/int — nonzero means *masked*
                  (reference atten_mask convention,
                  incre_flash_attention_def.cpp bool/int8/uint8 rows).
      pse_shift:  [B, H_b, S] or [B, H_b, 1, S] float additive bias with
                  H_b ∈ {1, num_kv_heads}.  Per-q-head pse is expressed
                  via ``alibi_slopes`` (exact, in-kernel) — a GQA group
                  shares one KV stream here, so a per-q-head additive
                  bias tensor has no kernel-layout home; the reference
                  effectively assumes group-uniform pse for GQA too.
      max_blocks: page slots covered (dense: the block table width).
      positions:  optional [B, H_p, M] selected slots — produces bias
                  tiles aligned to the *selected* page list (sparse path).

    Returns bias_pages [B, H_out, max_blocks|M, page_size] fp32.
    """
    if atten_mask is None and pse_shift is None:
        return None
    ps = page_size
    parts = []
    if atten_mask is not None:
        m = jnp.asarray(atten_mask)
        if m.ndim == 3:
            m = m[:, 0]
        b, s = m.shape
        parts.append(jnp.where(m != 0, mask_value, 0.0).astype(jnp.float32)
                     [:, None, :])                             # [B, 1, S]
    if pse_shift is not None:
        p = jnp.asarray(pse_shift, jnp.float32)
        if p.ndim == 4:
            p = p[:, :, 0]
        parts.append(p)                                        # [B, Hb, S]
    h_out = max(x.shape[1] for x in parts)
    s = max(x.shape[2] for x in parts)
    bias = jnp.zeros((parts[0].shape[0], h_out, s), jnp.float32)
    for x in parts:
        bias = bias + x                                        # broadcasts
    bias = jnp.maximum(bias, mask_value)

    b = bias.shape[0]
    s_pad = max_blocks * ps
    if s < s_pad:
        bias = jnp.pad(bias, ((0, 0), (0, 0), (0, s_pad - s)))
    else:
        bias = bias[:, :, :s_pad]
    tiles = bias.reshape(b, h_out, max_blocks, ps)
    if positions is None:
        return tiles
    # sparse: re-index tiles by the selected slot list
    h_p = positions.shape[1]
    h_final = max(h_out, h_p)
    slots = jnp.clip(positions, 0, max_blocks - 1).astype(jnp.int32)
    hb_of = jnp.arange(h_final) % h_out
    hp_of = jnp.arange(h_final) % h_p
    return tiles[jnp.arange(b)[:, None, None], hb_of[None, :, None],
                 slots[:, hp_of, :]]                           # [B,Hf,M,ps]


def _split_antiquant(antiquant_scale, antiquant_offset, num_kv_heads):
    """Reference packs K and V antiquant params in one tensor, K first
    (aclnn antiquant_scale dim0 = 2).  Accepts [2, H_kv, D] per-channel or
    [2, H_kv, P, ps] per-token; returns the kernel's 4-tuple."""
    if antiquant_scale is None:
        return None
    sc = jnp.asarray(antiquant_scale)
    off = (jnp.zeros_like(sc) if antiquant_offset is None
           else jnp.asarray(antiquant_offset))
    if sc.shape[0] != 2:
        raise ValueError(
            f"antiquant_scale dim0 must be 2 (K then V), got {sc.shape}")
    return (sc[0], off[0], sc[1], off[1])


# --- selection ops ----------------------------------------------------------

def _dequant_query(q, dequant_scale1, op):
    """Fully-quantized int8-query path (reference QUANT template flag,
    incre_flash_attention.cpp:590-604; split header :77).

    On TPU the MXU consumes bf16 natively, so the int8 query is
    dequantized up front (q is [B, H, D] — a few KB, one VPU pass)
    instead of emulating int8×int8 matmuls; the reference's
    quant_scale1/dequant_scale2 exist only to service that emulation and
    have no TPU counterpart (documented deviation — the composition is
    mathematically the identity this realizes directly).

    ``dequant_scale1``: scalar, per-head [H_q], or per-channel [H_q, D].
    """
    if q.dtype != jnp.int8:
        return q
    if dequant_scale1 is None:
        raise ValueError(f"{op}: int8 query requires dequant_scale1")
    scale = jnp.asarray(dequant_scale1, jnp.float32)
    if scale.ndim == 1:
        scale = scale[None, :, None]
    elif scale.ndim == 2:
        scale = scale[None, :, :]
    return (q.astype(jnp.float32) * scale).astype(jnp.bfloat16)


def compute_cent(query, l1_cent, *, k=TOPK_STANDALONE, num_heads=None,
                 input_layout=None):
    """Top-k centroid indices — ``custom_ops.compute_cent`` parity
    (extension/csrc/add_custom.cpp:937-948).  query [B, H, D] (or a
    reference layout via ``input_layout``), l1_cent [H_kv, C, D]."""
    if input_layout is not None:
        query = _q_to_bnd(query, num_heads, input_layout)
    return _sel.compute_cent(query, l1_cent, k)


def select_position(block_ids, block_table, seq_len, indices, *,
                    block_size=PAGE_SIZE, out_size=MAX_PAGE_NUM):
    """Cluster→page-position resolution — ``custom_ops.select_position``
    parity (select_position.cpp:122-183)."""
    return _sel.select_position(block_ids, block_table, seq_len, indices,
                                block_size=block_size, out_size=out_size)


def cent_select(query, l1_cent, block_ids, block_table, seq_len, *,
                k=TOPK_STANDALONE, block_size=PAGE_SIZE,
                max_page_num=MAX_PAGE_NUM, workload_cap_ratio=8,
                force_sink_and_recent=True, group_mode="per_qhead",
                num_heads=None, input_layout=None):
    """Fused selection — ``custom_ops.cent_select`` parity
    (add_custom.cpp:979-1007; cent_select.cpp:101-161)."""
    if input_layout is not None:
        query = _q_to_bnd(query, num_heads, input_layout)
    return _sel.cent_select(
        query, l1_cent, block_ids, block_table, seq_len, k=k,
        block_size=block_size, max_page_num=max_page_num,
        workload_cap_ratio=workload_cap_ratio,
        force_sink_and_recent=force_sink_and_recent, group_mode=group_mode)


# --- attention ops ----------------------------------------------------------

def incre_flash_attention(
    query,
    key,
    value=None,
    *,
    num_heads,
    num_key_value_heads=None,
    input_layout="BSH",
    scale_value=None,
    actual_seq_lengths=None,
    block_table=None,
    block_size=PAGE_SIZE,
    kv_layout="native",
    atten_mask=None,
    pse_shift=None,
    alibi_slopes=None,
    antiquant_scale=None,
    antiquant_offset=None,
    dequant_scale1=None,
    kv_int4=False,
    kv_padding_size=None,
    quant_scale2=None,
    quant_offset2=None,
    softmax_lse_flag=False,
    prefix_key=None,
    prefix_table=None,
    prefix_lens=None,
    prefix_antiquant_scale=None,
    prefix_antiquant_offset=None,
    total_s_bias=None,
    ppcb=8,
    interpret=None,
):
    """Dense decode flash attention — aclnnIncreFlashAttentionV5 parity
    (aclnn_incre_flash_attention_v5.cpp:18-51; custom_ops.incre_flash_
    attention_v4, add_custom.py:106-124).

    Paged mode: pass ``block_table`` and a page-pool ``key``/``value``
    (``kv_layout``).  Non-paged mode: omit ``block_table`` and pass
    continuous KV in ``input_layout``; it is paginated internally.

    Shared-prefix mode (v4/v5 system-prompt path): pass ``prefix_key``
    (fused native records), ``prefix_table`` [1|B, mp] and
    ``prefix_lens``; the two-pass LSE combine of the reference
    (ProcessSysPrefixCombine) merges prefix and user attention.

    ``inner_precise`` (the reference's high-precision vs high-performance
    mode attribute, incre_flash_attention_def.cpp:288-293) has no knob
    here by design: the kernel always carries fp32 softmax running state
    and fp32 accumulators — permanently the high-precision mode, at no
    measured cost (the MXU takes bf16 operands either way and the
    elementwise state is VMEM-resident).

    Returns attention_out in ``input_layout`` (int8 if quant_scale2 is
    given), plus softmax LSE [B, H_q] if ``softmax_lse_flag``.
    """
    n2 = num_key_value_heads or num_heads
    q = _q_to_bnd(query, num_heads, input_layout)
    q = _dequant_query(q, dequant_scale1, "incre_flash_attention")
    b = q.shape[0]

    if isinstance(key, (list, tuple)):
        # tensor-list non-continuous KV batches (reference kvListSeqLens_)
        if block_table is not None:
            raise ValueError("tensor-list KV is a non-paged mode; do not "
                             "pass block_table")
        kv_pages, block_table, list_lens = paginate_kv_list(
            key, value, num_kv_heads=n2, page_size=block_size,
            input_layout=input_layout)
        if actual_seq_lengths is None:
            actual_seq_lengths = list_lens
    elif block_table is None:
        if actual_seq_lengths is None:
            raise ValueError("non-paged mode needs actual_seq_lengths "
                             "(or pass a block_table)")
        kv_pages, block_table = paginate_kv(
            key, value, num_kv_heads=n2, page_size=block_size,
            input_layout=input_layout)
    else:
        kv_pages = to_native_kv_pages(key, value, num_kv_heads=n2,
                                      kv_layout=kv_layout)
    seq_lens = jnp.asarray(actual_seq_lengths, jnp.int32)

    bias = make_bias_pages(
        atten_mask=atten_mask, pse_shift=pse_shift,
        max_blocks=block_table.shape[1], page_size=block_size)
    kv_scales = _split_antiquant(antiquant_scale, antiquant_offset, n2)
    out_quant = None
    if quant_scale2 is not None:
        out_quant = (quant_scale2,
                     jnp.zeros(()) if quant_offset2 is None else quant_offset2)
    kv_start = None
    if kv_padding_size is not None:
        kv_start = jnp.asarray(kv_padding_size, jnp.int32)
        if kv_start.ndim == 0:
            kv_start = jnp.broadcast_to(kv_start, (b,))

    if prefix_key is not None:
        prefix_scales = _split_antiquant(
            prefix_antiquant_scale, prefix_antiquant_offset, n2)
        if prefix_key.dtype == jnp.int8 and prefix_scales is None:
            if kv_scales is not None and kv_scales[0].ndim == 2:
                # per-channel scales are a property of the quantizer, not
                # of a page pool — the user-KV scales dequantize the prefix
                # pool too
                prefix_scales = kv_scales
            else:
                raise ValueError(
                    "int8 prefix_key needs prefix_antiquant_scale/offset "
                    "(per-token user-KV scales are pool-specific and "
                    "cannot dequantize the prefix pool)")
        # atten_mask / pse_shift indexing: the reference's prefix path
        # sizes them against totalS = prefixLen + userLen (its tiling
        # validates "total kv S Size (with shared prefix)"), i.e. they
        # index the CONCATENATED [prefix || user] KV.  When the tensors
        # are wider than the user-KV span, split them at the (uniform)
        # prefix length so reference-shaped inputs land on the right
        # tokens; narrow tensors address the user KV only (the shared
        # system prompt is fully visible by construction).
        prefix_bias = None
        user_span = block_table.shape[1] * block_size
        widths = [jnp.asarray(t).shape[-1]
                  for t in (atten_mask, pse_shift) if t is not None]
        # ``total_s_bias``: explicit caller declaration of the mask/pse
        # indexing — True = [prefix || user] (reference total-S layout),
        # False = user-KV only.  With the default None the split is
        # inferred from the width, which is ambiguous when a total-S
        # tensor still fits under the block-table CAPACITY: warn so a
        # silently mis-indexed bias is discoverable.
        split_total = (total_s_bias if total_s_bias is not None
                       else bool(widths) and max(widths) > user_span)
        if widths and total_s_bias is None and max(widths) <= user_span:
            import warnings
            warnings.warn(
                "incre_flash_attention: atten_mask/pse_shift width fits "
                "the user-KV table capacity, so it is treated as user-KV-"
                "indexed; if it is a [prefix || user] total-S tensor, pass "
                "total_s_bias=True (or False to silence this warning)",
                stacklevel=2)
        if widths and split_total:
            import numpy as _np
            if isinstance(prefix_lens, jax.core.Tracer):
                raise ValueError(
                    "total-S atten_mask/pse_shift with a traced "
                    "prefix_lens: the split point must be concrete — "
                    "pass prefix_bias via ops.prefix.shared_prefix_"
                    "attention directly")
            pl_arr = _np.asarray(prefix_lens)
            if pl_arr.max() != pl_arr.min():
                raise ValueError(
                    "total-S atten_mask/pse_shift require a uniform "
                    "prefix length (one shared system prompt); got "
                    f"prefix_lens={pl_arr.tolist()}")
            pl = int(pl_arr.max())
            mask_pre = mask_usr = pse_pre = pse_usr = None
            if atten_mask is not None:
                m = jnp.asarray(atten_mask)
                mask_pre, mask_usr = m[..., :pl], m[..., pl:]
            if pse_shift is not None:
                p = jnp.asarray(pse_shift)
                pse_pre, pse_usr = p[..., :pl], p[..., pl:]
            prefix_bias = make_bias_pages(
                atten_mask=mask_pre, pse_shift=pse_pre,
                max_blocks=prefix_table.shape[1], page_size=block_size)
            bias = make_bias_pages(
                atten_mask=mask_usr, pse_shift=pse_usr,
                max_blocks=block_table.shape[1], page_size=block_size)
        res = shared_prefix_attention(
            q, prefix_key, prefix_table, jnp.asarray(prefix_lens, jnp.int32),
            kv_pages, block_table, seq_lens, kv_scales=kv_scales,
            prefix_kv_scales=prefix_scales, kv_start=kv_start,
            bias_pages=bias, prefix_bias_pages=prefix_bias,
            alibi_slopes=alibi_slopes, out_quant=out_quant,
            sm_scale=scale_value, page_size=block_size, ppcb=ppcb,
            return_lse=softmax_lse_flag, interpret=interpret)
    else:
        res = paged_flash_decode(
            q, kv_pages, None, block_table, seq_lens,
            kv_scales=kv_scales, kv_start=kv_start, bias_pages=bias,
            alibi_slopes=alibi_slopes, out_quant=out_quant,
            sm_scale=scale_value, page_size=block_size, ppcb=ppcb,
            return_lse=softmax_lse_flag, interpret=interpret,
            kv_int4=kv_int4)

    if softmax_lse_flag:
        out, lse = res
        return _out_from_bnd(out, input_layout), lse
    return _out_from_bnd(res, input_layout)


def sparse_paged_attention(
    query,
    key,
    value=None,
    *,
    block_table,
    block_position,
    page_position_length,
    actual_seq_lengths,
    num_heads,
    num_key_value_heads=None,
    input_layout="BSH",
    scale_value=None,
    block_size=PAGE_SIZE,
    kv_layout="native",
    atten_mask=None,
    pse_shift=None,
    alibi_slopes=None,
    antiquant_scale=None,
    antiquant_offset=None,
    dequant_scale1=None,
    kv_int4=False,
    quant_scale2=None,
    quant_offset2=None,
    softmax_lse_flag=False,
    ppcb=8,
    interpret=None,
):
    """Sparse paged attention over pre-selected pages —
    ``custom_ops.sparse_paged_attention`` parity (add_custom.py:42-76;
    sparse_paged_attention.cpp:135).

    ``block_position`` [B, H, max_page_num] comes from
    :func:`cent_select` (per-q-head rows are accepted: like the reference
    kernel, only the first ``num_key_value_heads`` rows are consumed —
    split header :258).  ``page_position_length`` accepts [B, H] or the
    TPL_PAD-padded [B, H, 8].
    """
    n2 = num_key_value_heads or num_heads
    q = _q_to_bnd(query, num_heads, input_layout)
    q = _dequant_query(q, dequant_scale1, "sparse_paged_attention")
    kv_pages = to_native_kv_pages(key, value, num_kv_heads=n2,
                                  kv_layout=kv_layout)
    seq_lens = jnp.asarray(actual_seq_lengths, jnp.int32)
    plen = jnp.asarray(page_position_length, jnp.int32)
    if plen.ndim == 3:
        plen = plen[..., 0]
    positions = jnp.asarray(block_position, jnp.int32)[:, :n2, :]
    plen = plen[:, :n2]

    bias = make_bias_pages(
        atten_mask=atten_mask, pse_shift=pse_shift,
        max_blocks=block_table.shape[1], page_size=block_size,
        positions=positions)
    kv_scales = _split_antiquant(antiquant_scale, antiquant_offset, n2)
    out_quant = None
    if quant_scale2 is not None:
        out_quant = (quant_scale2,
                     jnp.zeros(()) if quant_offset2 is None else quant_offset2)

    res = paged_flash_decode(
        q, kv_pages, None, block_table, seq_lens, positions, plen,
        kv_scales=kv_scales, bias_pages=bias, alibi_slopes=alibi_slopes,
        out_quant=out_quant, sm_scale=scale_value, page_size=block_size,
        ppcb=ppcb, return_lse=softmax_lse_flag, interpret=interpret,
        kv_int4=kv_int4)
    if softmax_lse_flag:
        out, lse = res
        return _out_from_bnd(out, input_layout), lse
    return _out_from_bnd(res, input_layout)


def sparse_paged_fusion_attention(
    query,
    key,
    value=None,
    *,
    block_table,
    l1_cent,
    block_ids,
    total_seq_len,
    num_heads,
    num_key_value_heads=None,
    input_layout="BSH",
    scale_value=None,
    block_size=PAGE_SIZE,
    kv_layout="native",
    antiquant_scale=None,
    antiquant_offset=None,
    dequant_scale1=None,
    kv_int4=False,
    k=TOPK_FUSED,
    max_page_num=MAX_PAGE_NUM,
    workload_cap_ratio=8,
    force_sink_and_recent=True,
    group_mode="kv_group",
    ppcb=8,
    interpret=None,
):
    """Flagship fused selection + sparse attention —
    ``torch_npu.npu_sparse_paged_fusion_attention`` parity
    (FlashAttentionKernelNpuOpApi.cpp:1873-1934).

    Returns (attention_out in ``input_layout``, block_position,
    max_page_position_length) — the reference's three outputs.
    """
    n2 = num_key_value_heads or num_heads
    q = _q_to_bnd(query, num_heads, input_layout)
    q = _dequant_query(q, dequant_scale1, "sparse_paged_fusion_attention")
    kv_pages = to_native_kv_pages(key, value, num_kv_heads=n2,
                                  kv_layout=kv_layout)
    kv_scales = _split_antiquant(antiquant_scale, antiquant_offset, n2)
    out, positions, max_len = _fused.sparse_paged_fusion_attention(
        q, kv_pages, block_table, l1_cent, block_ids,
        jnp.asarray(total_seq_len, jnp.int32),
        kv_scales=kv_scales, k=k, sm_scale=scale_value,
        page_size=block_size, max_page_num=max_page_num,
        workload_cap_ratio=workload_cap_ratio,
        force_sink_and_recent=force_sink_and_recent,
        group_mode=group_mode, ppcb=ppcb, interpret=interpret,
        kv_int4=kv_int4)
    return _out_from_bnd(out, input_layout), positions, max_len
