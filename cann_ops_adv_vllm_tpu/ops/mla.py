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
def mla_flash_decode(q, latent_pages, block_table, seq_lens, *, d_v,
                     sm_scale, page_size=PAGE_SIZE, ppcb=None,
                     return_lse=False, interpret=None):
    """Latent flash decode: softmax(q·recordᵀ)·record[:, :d_v].

    Args:
      q:            [B, H, W] — absorbed queries (latent-space).
      latent_pages: [P, page_size, W] or [1, P, page_size, W].
      block_table:  [B, max_page] int32; seq_lens: [B] int32.
      d_v:          latent width (output is [B, H, d_v]).
      sm_scale:     softmax scale (MLA: 1/sqrt(qk_nope + qk_rope dims)).
    """
    if latent_pages.ndim == 3:
        latent_pages = latent_pages[None]
    b, h, w = q.shape
    num_pages = latent_pages.shape[1]
    max_page = block_table.shape[1]
    gp = max(8, -(-h // 8) * 8)  # round UP to the fp32 sublane multiple
    qg = q.reshape(b, 1, h, w)
    if gp != h:
        qg = jnp.pad(qg, ((0, 0), (0, 0), (0, gp - h), (0, 0)))

    positions = jnp.broadcast_to(
        jnp.arange(max_page, dtype=jnp.int32)[None, None, :],
        (b, 1, max_page))
    page_len = (seq_lens.astype(jnp.int32) + page_size - 1) // page_size
    pids, begs, ends, nblk = _precompute_meta(
        block_table, seq_lens, positions, page_len[:, None], page_size,
        num_pages)

    if interpret is None:
        interpret = jax.default_backend() == "cpu"

    result = _slab_call(
        qg, latent_pages, pids, begs, ends, nblk,
        kv_scales=None, out_quant=None, sm_scale=sm_scale,
        page_size=page_size,
        ppcb=ppcb if ppcb is not None else (8 if interpret else 32),
        return_lse=return_lse,
        interpret=interpret, dims=(w, d_v, 0))
    if return_lse:
        out, lse = result
        return out[:, 0, :h, :], lse[:, 0, :h, 0]
    return result[:, 0, :h, :]


def absorbed_queries(q_nope, q_rope, w_uk, *, width):
    """Fold W_UK into the queries (the MLA absorption trick).

    q_nope [B, H, dn] · w_uk [H, dn, c] → latent queries, concatenated
    with the roped sub-head and zero-padded to the record ``width``.
    """
    b, h, _ = q_nope.shape
    q_lat = jnp.einsum("bhd,hdc->bhc", q_nope.astype(jnp.float32),
                       w_uk.astype(jnp.float32))
    q_eff = jnp.concatenate([q_lat, q_rope.astype(jnp.float32)], axis=-1)
    pad = width - q_eff.shape[-1]
    if pad:
        q_eff = jnp.pad(q_eff, ((0, 0), (0, 0), (0, pad)))
    return q_eff


def mla_attention(q_nope, q_rope, latent_pages, block_table, seq_lens,
                  w_uk, w_uv, *, sm_scale=None, page_size=PAGE_SIZE,
                  ppcb=None, interpret=None):
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
        q_eff, latent_pages, block_table, seq_lens, d_v=c,
        sm_scale=sm_scale, page_size=page_size, ppcb=ppcb,
        interpret=interpret)
    return jnp.einsum("bhc,hcd->bhd", o_lat.astype(jnp.float32),
                      w_uv.astype(jnp.float32))


def write_latent_rows(latent_pages, latent_new, block_table, seq_pos,
                      page_size=PAGE_SIZE):
    """Scatter one decode step's latent rows into the paged cache.

    latent_pages [(1,) P, ps, W]; latent_new [B, W] (pre-padded rows);
    seq_pos [B] — position being written.
    """
    squeeze = latent_pages.ndim == 3
    if squeeze:
        latent_pages = latent_pages[None]
    b = latent_new.shape[0]
    slot = seq_pos.astype(jnp.int32) // page_size
    row = seq_pos.astype(jnp.int32) % page_size
    pid = jnp.take_along_axis(block_table.astype(jnp.int32),
                              slot[:, None], axis=1)[:, 0]
    out = latent_pages.at[0, pid, row].set(
        latent_new.astype(latent_pages.dtype))
    return out[0] if squeeze else out
