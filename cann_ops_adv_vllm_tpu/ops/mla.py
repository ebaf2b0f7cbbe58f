"""MLA (Multi-head Latent Attention) decode over a paged latent cache.

The reference carries an MLA tiling scaffold (aclnn IncreFlashAttention v5,
ophost/incre_flash_attention_tiling_mla.h:27-79) that is not wired to a
kernel in its snapshot; here MLA decode is fully implemented, TPU-native.

MLA (DeepSeek-V2/V3) caches one shared latent row per token:
``[c_kv | k_rope]`` (c_kv = kv_lora_rank, e.g. 512; k_rope = rotary
sub-head, e.g. 64) instead of per-head K/V — an 8-50× KV-cache reduction.
Decode uses the **matrix-absorbed** form:

    score_h(t) = (q_nope_h · W_UKᵀ_h) · c_t  +  q_rope_h · k_rope_t
    out_h      = (Σ_t p_t c_t) · W_UV_h

so the kernel sees queries of width W = c_kv + rope (+pad) matched
against the latent record itself, and V *aliases* the record's latent
prefix — exactly the generalized record geometry of the slab kernel
(k_width = W, d_v = c_kv, v_off = 0).  All heads share the single latent
stream (h_kv = 1, shared page list → one strided DMA per page), and the
per-step matmuls are ``[H, bk] × [bk, W]`` with H = all query heads —
far better MXU utilization than GQA decode.

Record layout: ``latent_pages [1, P, page_size, W]`` with W a multiple of
the 128-lane tile; lanes [0, c_kv) hold the latent, [c_kv, c_kv+rope) the
roped key sub-head, the rest zero padding.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..config import PAGE_SIZE
from .paged_attention import _precompute_meta, _slab_call


@functools.partial(
    jax.jit,
    static_argnames=("d_v", "sm_scale", "page_size", "ppcb", "return_lse",
                     "interpret"),
)
def mla_flash_decode(q, latent_pages, block_table, seq_lens,
                     positions=None, position_lens=None, *, d_v,
                     sm_scale, page_size=PAGE_SIZE, ppcb=None,
                     return_lse=False, interpret=None, layer_idx=None):
    """Latent flash decode: softmax(q·recordᵀ)·record[:, :d_v].

    Args:
      q:            [B, H, W] — absorbed queries (latent-space).
      latent_pages: [P, page_size, W] or [1, P, page_size, W], or — with
                    ``layer_idx`` — the FULL [L, 1, P, page_size, W]
                    cache, read in place at that layer.
      block_table:  [B, max_page] int32; seq_lens: [B] int32.
      positions:    optional [B, 1, M] ascending selected slots
                    (sentinel-padded, from ops.cent_select over the
                    latent stream) with ``position_lens`` [B, 1] —
                    sparse MLA decode; the single shared row keeps the
                    slab-DMA fast path.
      d_v:          latent width (output is [B, H, d_v]).
      sm_scale:     softmax scale (MLA: 1/sqrt(qk_nope + qk_rope dims)).
    """
    if latent_pages.ndim == 3:
        latent_pages = latent_pages[None]
    b, h, w = q.shape
    num_pages = latent_pages.shape[-3]
    max_page = block_table.shape[1]
    gp = max(8, -(-h // 8) * 8)  # round UP to the fp32 sublane multiple
    qg = q.reshape(b, 1, h, w)
    if gp != h:
        qg = jnp.pad(qg, ((0, 0), (0, 0), (0, gp - h), (0, 0)))

    if positions is None:
        positions = jnp.broadcast_to(
            jnp.arange(max_page, dtype=jnp.int32)[None, None, :],
            (b, 1, max_page))
        page_len = (seq_lens.astype(jnp.int32)
                    + page_size - 1) // page_size
        position_lens = page_len[:, None]
    pids, begs, ends, nblk = _precompute_meta(
        block_table, seq_lens, positions.astype(jnp.int32),
        position_lens.astype(jnp.int32), page_size, num_pages)

    if interpret is None:
        interpret = jax.default_backend() == "cpu"

    result = _slab_call(
        qg, latent_pages, pids, begs, ends, nblk,
        kv_scales=None, out_quant=None, sm_scale=sm_scale,
        page_size=page_size,
        ppcb=ppcb if ppcb is not None else (8 if interpret else 32),
        return_lse=return_lse,
        interpret=interpret, dims=(w, d_v, 0), layer_idx=layer_idx)
    if return_lse:
        out, lse = result
        return out[:, 0, :h, :], lse[:, 0, :h, 0]
    return result[:, 0, :h, :]


def absorbed_queries(q_nope, q_rope, w_uk, *, width):
    """Fold W_UK into the queries (the MLA absorption trick).

    q_nope [..., H, dn] · w_uk [H, dn, c] → latent queries, concatenated
    with the roped sub-head and zero-padded to the record ``width``
    (leading dims pass through: decode uses [B, H, dn], chunked prefill
    [B, T, H, dn]).
    """
    q_lat = jnp.einsum("...hd,hdc->...hc", q_nope.astype(jnp.float32),
                       w_uk.astype(jnp.float32))
    q_eff = jnp.concatenate([q_lat, q_rope.astype(jnp.float32)], axis=-1)
    pad = width - q_eff.shape[-1]
    if pad:
        q_eff = jnp.pad(q_eff, [(0, 0)] * (q_eff.ndim - 1) + [(0, pad)])
    return q_eff


def mla_attention(q_nope, q_rope, latent_pages, block_table, seq_lens,
                  w_uk, w_uv, *, positions=None, position_lens=None,
                  sm_scale=None, page_size=PAGE_SIZE,
                  ppcb=None, interpret=None, layer_idx=None):
    """Full absorbed MLA decode attention.

    Args:
      q_nope: [B, H, dn]; q_rope: [B, H, dr] (already roped).
      latent_pages: [(1,) P, ps, W] — rows [c | k_rope | 0-pad], k_rope
                    already roped at cache-write time.
      w_uk: [H, dn, c] (per-head key up-projection, absorbed into q).
      w_uv: [H, c, dv] (per-head value up-projection, applied after).

    Returns [B, H, dv] fp32.
    """
    h, dn, c = w_uk.shape
    dr = q_rope.shape[-1]
    width = latent_pages.shape[-1]
    if sm_scale is None:
        sm_scale = float(1.0 / ((dn + dr) ** 0.5))
    q_eff = absorbed_queries(q_nope, q_rope, w_uk, width=width)
    o_lat = mla_flash_decode(
        q_eff, latent_pages, block_table, seq_lens,
        positions, position_lens, d_v=c,
        sm_scale=sm_scale, page_size=page_size, ppcb=ppcb,
        interpret=interpret, layer_idx=layer_idx)
    return jnp.einsum("bhc,hcd->bhd", o_lat.astype(jnp.float32),
                      w_uv.astype(jnp.float32))


def write_latent_rows(latent_pages, latent_new, block_table, seq_pos,
                      page_size=PAGE_SIZE, layer_idx=None):
    """Scatter one decode step's latent rows into the paged cache.

    latent_pages [(1,) P, ps, W] — or, with ``layer_idx``, the FULL
    [L, 1, P, ps, W] cache, scattered in place at that layer;
    latent_new [B, W] (pre-padded rows); seq_pos [B] — position written.
    """
    squeeze = latent_pages.ndim == 3
    if squeeze:
        latent_pages = latent_pages[None]
    pos = seq_pos.astype(jnp.int32)
    slot = jnp.maximum(pos, 0) // page_size
    row = jnp.maximum(pos, 0) % page_size
    pid = jnp.take_along_axis(block_table.astype(jnp.int32),
                              slot[:, None], axis=1)[:, 0]
    # idle lanes (seq_lens = 0 → pos = -1) scatter out of range → dropped
    # (same guard as models.llama.write_kv_page_rows)
    pid = jnp.where(pos >= 0, pid, latent_pages.shape[-3])
    lead = () if layer_idx is None else (layer_idx,)
    out = latent_pages.at[(*lead, 0, pid, row)].set(
        latent_new.astype(latent_pages.dtype), mode="drop")
    return out[0] if squeeze else out


@functools.partial(
    jax.jit,
    static_argnames=("page_size", "kv_block_pages", "d_v", "sm_scale"),
)
def mla_prefill_attention(q_eff, latent_pages, block_table, start_pos, *,
                          d_v, sm_scale, page_size=PAGE_SIZE,
                          kv_block_pages=4, layer_idx=None):
    """Causal latent attention of a prefill chunk (absorbed form).

    The latent analog of ops.prefill.paged_prefill_attention: an XLA
    ``lax.scan`` over page blocks with running flash state — prefill is
    MXU-bound, no hand kernel needed.

    Args:
      q_eff:        [B, T, H, W] absorbed queries (:func:`absorbed_queries`
                    applied per chunk position).
      latent_pages: [(1,) P, ps, W] — the chunk's own rows must already be
                    written (:func:`write_latent_chunk`).
      block_table:  [B, max_page] int32; start_pos: [B] int32 — position
                    of the chunk's first token.
      d_v:          latent width (output [B, T, H, d_v] fp32 — apply
                    ``w_uv`` outside).
    """
    if latent_pages.ndim == 3:
        latent_pages = latent_pages[None]
    b, t, h, w = q_eff.shape
    num_pages = latent_pages.shape[-3]
    ps = page_size
    max_page = block_table.shape[1]
    n_blocks = (max_page + kv_block_pages - 1) // kv_block_pages
    bk = kv_block_pages * ps
    from ..config import MASK_VALUE

    q32 = q_eff.astype(jnp.float32)
    q_pos = start_pos[:, None].astype(jnp.int32) + jnp.arange(t)[None, :]

    def body(blk, carry):
        m, l, acc = carry
        slots = blk * kv_block_pages + jnp.arange(kv_block_pages)
        pids = jnp.take_along_axis(
            block_table.astype(jnp.int32),
            jnp.broadcast_to(jnp.clip(slots, 0, max_page - 1)[None, :],
                             (b, kv_block_pages)), axis=1)   # [B, nb]
        pc = jnp.clip(pids, 0, num_pages - 1)
        rows = (latent_pages[0, pc] if layer_idx is None
                else latent_pages[layer_idx, 0, pc])
        rows = rows.reshape(b, bk, w).astype(jnp.float32)    # [B, bk, W]
        k_pos = (slots[:, None] * ps
                 + jnp.arange(ps)[None, :]).reshape(bk)      # [bk]
        s = sm_scale * jnp.einsum("bthw,bkw->bhtk", q32, rows,
                                  preferred_element_type=jnp.float32)
        valid = (k_pos[None, None, None, :] <= q_pos[:, None, :, None])
        valid = valid & (slots < max_page)[None, None, None,
                                           jnp.arange(bk) // ps]
        s = jnp.where(valid, s, MASK_VALUE)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1))
        p = jnp.exp(s - m_new[..., None])
        scale = jnp.exp(m - m_new)
        l_new = l * scale + jnp.sum(p, axis=-1)
        acc_new = (acc * scale[..., None]
                   + jnp.einsum("bhtk,bkc->bhtc", p, rows[..., :d_v],
                                preferred_element_type=jnp.float32))
        return (m_new, l_new, acc_new)

    m0 = jnp.full((b, h, t), MASK_VALUE, jnp.float32)
    l0 = jnp.zeros((b, h, t), jnp.float32)
    a0 = jnp.zeros((b, h, t, d_v), jnp.float32)
    # only blocks overlapping the causal window hold attendable tokens —
    # chunk c then touches ~c page blocks instead of max_page, making
    # chunked prefill triangular in total work (the same bound as
    # ops.prefill.paged_prefill_attention:195-206; a 128K-table DeepSeek
    # prefill otherwise pays O(max_page) per chunk from token 0)
    hi_pos = jnp.max(start_pos.astype(jnp.int32)) + t      # 1 past last q
    blk_hi = jnp.minimum((hi_pos + bk - 1) // bk, n_blocks)
    m, l, acc = jax.lax.fori_loop(0, blk_hi, body, (m0, l0, a0))
    out = acc / jnp.where(l == 0.0, 1.0, l)[..., None]
    return out.transpose(0, 2, 1, 3)                         # [B, T, H, dv]


@functools.partial(jax.jit, static_argnames=("page_size",))
def write_latent_chunk(latent_pages, rows, block_table, start_pos,
                       page_size=PAGE_SIZE, valid_lens=None,
                       layer_idx=None):
    """Scatter a chunk of latent rows into the paged cache.

    rows [B, T, W] at positions start_pos + t; invalid rows (t >=
    valid_lens[b]) scatter to an out-of-range page id and are dropped
    (the same idiom as ops.prefill.write_prompt_chunk).
    """
    squeeze = latent_pages.ndim == 3
    if squeeze:
        latent_pages = latent_pages[None]
    b, t, _ = rows.shape
    num_pages = latent_pages.shape[-3]
    pos = start_pos[:, None].astype(jnp.int32) + jnp.arange(t)[None, :]
    slot = jnp.clip(pos // page_size, 0, block_table.shape[1] - 1)
    row = pos % page_size
    pid = jnp.take_along_axis(block_table.astype(jnp.int32), slot, axis=1)
    if valid_lens is not None:
        valid = (jnp.arange(t, dtype=jnp.int32)[None, :]
                 < valid_lens[:, None].astype(jnp.int32))
        pid = jnp.where(valid, pid, num_pages)               # OOB → dropped
    lead = () if layer_idx is None else (layer_idx,)
    out = latent_pages.at[(*lead, 0, pid, row)].set(
        rows.astype(latent_pages.dtype), mode="drop")
    return out[0] if squeeze else out
