"""Llama-class GQA decoder built on the sparse paged-attention op chain.

The reference is a kernel library consumed by vLLM-Ascend; the model layer
there lives in vLLM.  Here the framework is self-contained: a functional
JAX Llama implementation (RMSNorm → GQA attention with paged KV cache →
SwiGLU MLP, rotary embeddings) whose decode step calls
:func:`..ops.fused.sparse_paged_fusion_attention` (or the dense kernel) —
the op chain's production context.

Everything is a pytree of arrays + pure functions: jit/shard_map/vmap
compose freely, and the parallel layer (``parallel/``) adds mesh shardings
without touching this file.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any

import jax
import jax.numpy as jnp

from ..config import MAX_PAGE_NUM, PAGE_SIZE, TOPK_FUSED
from ..ops.cent_select import cent_select
from ..ops.paged_attention import paged_flash_decode


@dataclasses.dataclass(frozen=True)
class LlamaConfig:
    vocab_size: int = 32000
    hidden_size: int = 4096
    intermediate_size: int = 11008
    num_layers: int = 32
    num_heads: int = 32
    num_kv_heads: int = 32
    head_dim: int = 128
    rope_theta: float = 10000.0
    rms_eps: float = 1e-5
    dtype: Any = jnp.bfloat16
    #: add bias to q/k/v projections (Qwen2-family)
    attention_bias: bool = False
    #: sliding-window attention span (Mistral-family); 0 disables.
    #: Realized through the kernel's kv-left-padding window (kv_start),
    #: not a mask tensor.
    sliding_window: int = 0
    #: KV-cache storage: "auto" (model dtype) or "int8" — per-token
    #: symmetric quantization computed at write time (the reference's
    #: per-token antiquant mode; no calibration pass).  Halves cache HBM
    #: and page-DMA bytes; the kernel dequantizes via the score/PV
    #: identities (ops.paged_attention).
    kv_cache_dtype: str = "auto"

    # sparse-attention knobs (None → dense attention)
    num_centroids: int = 0          # 0 disables centroid sparsity
    top_k_clusters: int = TOPK_FUSED
    page_size: int = PAGE_SIZE
    max_page_num: int = MAX_PAGE_NUM
    workload_cap_ratio: int = 8

    @property
    def group_size(self):
        return self.num_heads // self.num_kv_heads


# Reference-scale configurations (BASELINE.json configs 4 and 5).
LLAMA_2_7B = LlamaConfig(num_layers=32, hidden_size=4096,
                         intermediate_size=11008, num_heads=32,
                         num_kv_heads=32)
LLAMA_3_8B = LlamaConfig(vocab_size=128256, num_layers=32, hidden_size=4096,
                         intermediate_size=14336, num_heads=32,
                         num_kv_heads=8, rope_theta=500000.0)
LLAMA_3_70B = LlamaConfig(vocab_size=128256, num_layers=80, hidden_size=8192,
                          intermediate_size=28672, num_heads=64,
                          num_kv_heads=8, rope_theta=500000.0)
TINY_LLAMA = LlamaConfig(vocab_size=256, num_layers=2, hidden_size=256,
                         intermediate_size=512, num_heads=4, num_kv_heads=2,
                         head_dim=128, num_centroids=16, top_k_clusters=4)


def init_params(cfg: LlamaConfig, key) -> dict:
    """Random-initialized parameter pytree (layout mirrors HF Llama names)."""
    h, hd = cfg.hidden_size, cfg.head_dim
    nq, nkv, im = cfg.num_heads, cfg.num_kv_heads, cfg.intermediate_size
    k_emb, k_out, *k_layers = jax.random.split(key, cfg.num_layers + 2)

    def dense(key, shape, scale=None):
        scale = scale or (1.0 / (shape[0] ** 0.5))
        return (jax.random.normal(key, shape, jnp.float32) * scale
                ).astype(cfg.dtype)

    def layer(key):
        ks = jax.random.split(key, 8)
        p = {
            "wq": dense(ks[0], (h, nq * hd)),
            "wk": dense(ks[1], (h, nkv * hd)),
            "wv": dense(ks[2], (h, nkv * hd)),
            **({"bq": jnp.zeros((nq * hd,), cfg.dtype),
                "bk": jnp.zeros((nkv * hd,), cfg.dtype),
                "bv": jnp.zeros((nkv * hd,), cfg.dtype)}
               if cfg.attention_bias else {}),
            "wo": dense(ks[3], (nq * hd, h)),
            "w_gate": dense(ks[4], (h, im)),
            "w_up": dense(ks[5], (h, im)),
            "w_down": dense(ks[6], (im, h)),
            "ln_attn": jnp.ones((h,), cfg.dtype),
            "ln_mlp": jnp.ones((h,), cfg.dtype),
        }
        if cfg.num_centroids:
            p["l1_cent"] = dense(ks[7], (nkv, cfg.num_centroids, hd), 1.0)
        return p

    return {
        "embed": dense(k_emb, (cfg.vocab_size, h), 1.0),
        "layers": [layer(k) for k in k_layers],
        "ln_f": jnp.ones((h,), cfg.dtype),
        "lm_head": dense(k_out, (h, cfg.vocab_size)),
    }


def rms_norm(x, w, eps):
    x32 = x.astype(jnp.float32)
    var = jnp.mean(x32 * x32, axis=-1, keepdims=True)
    return (x32 * jax.lax.rsqrt(var + eps)).astype(x.dtype) * w


def rope(x, pos, theta):
    """Rotary embedding.  x: [..., n_heads, head_dim]; pos: [...] int32."""
    hd = x.shape[-1]
    freqs = 1.0 / (theta ** (jnp.arange(0, hd, 2, dtype=jnp.float32) / hd))
    angles = pos.astype(jnp.float32)[..., None, None] * freqs  # [..., 1, hd/2]
    cos, sin = jnp.cos(angles), jnp.sin(angles)
    x1, x2 = x[..., : hd // 2], x[..., hd // 2:]
    out = jnp.concatenate(
        [x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1)
    return out.astype(x.dtype)


def _mm(x, w):
    """``x @ w`` where ``w`` may be a weight-only-int8 dict {"q", "s"}
    from :func:`quantize_params` — the int8→model-dtype convert fuses
    into the matmul's operand read, halving weight HBM bytes (decode is
    weight-bandwidth-bound below ~32K context)."""
    if isinstance(w, dict):
        return (x @ w["q"].astype(x.dtype)) * w["s"].astype(x.dtype)
    return x @ w


def quantize_params(params):
    """Weight-only int8 (per-output-channel) over every projection.

    Returns a params pytree of the same layout with each 2-D projection
    (wq/wk/wv/wo, the MLP trio, lm_head) replaced by {"q": int8,
    "s": f32[out]}.  Embeddings (1-row gathers), norms, biases and the
    centroid codebooks (selection quality) stay full precision.
    Tensor-parallel serving: parallel.mesh.param_specs(quantized=True)
    expands each projection spec to the {"q", "s"} pair (scale follows
    the out axis), and ShardedDecodeEngine detects quantized params
    automatically.
    """
    from ..ops.quant import quantize_weight

    def qw(w):
        q, sc = quantize_weight(w)
        return {"q": q, "s": sc}

    layers = []
    for lp in params["layers"]:
        lp = dict(lp)
        for k in ("wq", "wk", "wv", "wo", "w_gate", "w_up", "w_down"):
            lp[k] = qw(lp[k])
        layers.append(lp)
    return {**params, "layers": layers, "lm_head": qw(params["lm_head"])}


def init_kv_cache(cfg: LlamaConfig, num_pages: int, dtype=None):
    """Fused-record paged KV cache for every layer.

    [num_layers, H_kv, num_pages, page_size, 2*head_dim] — K in lanes
    [:head_dim], V in lanes [head_dim:] (the kernel's native
    lane-interleaved layout; see ops.paged_attention.fuse_kv).

    With ``cfg.kv_cache_dtype == "int8"`` the cache is a dict
    ``{"kv": int8 pages, "ts": [L, H_kv, 4, P, ps] fp32}`` — "ts" holds
    the kernel's pre-stacked per-token antiquant rows (k_scale, k_offset,
    v_scale, v_offset; offsets stay zero — symmetric quantization), so
    the attention consumes the cache zero-copy with no per-step
    restacking.  ~6% HBM overhead vs the int8 pages; total cache bytes
    ≈ 53% of bf16.
    """
    if cfg.kv_cache_dtype == "int8":
        return {
            "kv": jnp.zeros((cfg.num_layers, cfg.num_kv_heads, num_pages,
                             cfg.page_size, 2 * cfg.head_dim), jnp.int8),
            # scales-row axis BEFORE the page axis: the natural (8,128)
            # tiling then falls on (P, ps) — XLA's preferred layout and
            # the Pallas operand layout coincide, so no full-ts transpose
            # per kernel call (and no 4→8 sublane padding of the rows)
            "ts": jnp.zeros((cfg.num_layers, cfg.num_kv_heads, 4,
                             num_pages, cfg.page_size), jnp.float32),
        }
    dtype = dtype or cfg.dtype
    return jnp.zeros((cfg.num_layers, cfg.num_kv_heads, num_pages,
                      cfg.page_size, 2 * cfg.head_dim), dtype)


def write_kv_page_rows(kv_cache, k_new, v_new, block_table, seq_pos,
                       page_size, layer_idx=None):
    """Scatter one decode step's K/V rows into the fused paged cache.

    kv_cache: [H_kv, P, ps, 2*D] one layer (or the int8 dict), or — with
    ``layer_idx`` — the FULL [L, H_kv, P, ps, 2*D] cache, scattered at
    layer ``layer_idx`` (the in-place hot path: with the cache donated to
    the step's jit, XLA aliases the buffer and only the B·H touched rows
    are written); k_new/v_new: [B, H_kv, D]; block_table: [B, max_page];
    seq_pos: [B] (position being written).
    """
    b = k_new.shape[0]
    pos = seq_pos.astype(jnp.int32)
    slot = jnp.maximum(pos, 0) // page_size
    row = jnp.maximum(pos, 0) % page_size
    pid = jnp.take_along_axis(block_table.astype(jnp.int32),
                              slot[:, None], axis=1)[:, 0]   # [B]
    quantized = isinstance(kv_cache, dict)
    pages = kv_cache["kv"] if quantized else kv_cache
    # idle lanes (engine masks them with seq_lens = 0 → pos = -1) scatter
    # to an out-of-range page and are dropped — without this every idle
    # lane lands on the same wrapped (page, row) target, corrupting a live
    # page and violating the unique_indices contract below
    pid = jnp.where(pos >= 0, pid, pages.shape[-3])
    h_idx = jnp.arange(pages.shape[-4])[None, :]             # [1, H_kv]
    bi = jnp.broadcast_to(h_idx, (b, h_idx.shape[1]))
    pid_b = jnp.broadcast_to(pid[:, None], bi.shape)
    row_k = jnp.broadcast_to(row[:, None], bi.shape)
    lead = () if layer_idx is None else (layer_idx,)
    if quantized:
        from ..ops.quant import quantize_rows
        k_q, k_s = quantize_rows(k_new)                      # [B, H, D], [B, H]
        v_q, v_s = quantize_rows(v_new)
        kv_row = jnp.concatenate([k_q, v_q], axis=-1)
        ts = kv_cache["ts"]
        # unique_indices: every (layer, head, page, row) target is written
        # at most once per step — lets XLA's scatter take its in-place path
        ts = ts.at[(*lead, bi, 0, pid_b, row_k)].set(
            k_s, unique_indices=True, mode="drop")
        ts = ts.at[(*lead, bi, 2, pid_b, row_k)].set(
            v_s, unique_indices=True, mode="drop")
        return {"kv": pages.at[(*lead, bi, pid_b, row_k)].set(
                    kv_row, unique_indices=True, mode="drop"),
                "ts": ts}
    kv_row = jnp.concatenate([k_new, v_new], axis=-1)        # [B, H, 2D]
    return pages.at[(*lead, bi, pid_b, row_k)].set(
        kv_row.astype(pages.dtype), unique_indices=True, mode="drop")


def _attention(cfg, layer_params, x, kv_cache_layer, block_table, seq_lens,
               layer_block_ids=None, layer_idx=None):
    """Decode-step attention for one layer.  x: [B, hidden].

    When ``cfg.num_centroids`` and ``layer_block_ids`` are set, centroid
    selection runs on the same (post-RoPE) query the attention consumes —
    matching the reference's fused kernel, where CentSelect reads the
    query tensor handed to the attention phase
    (sparse_paged_fusion_attention.cpp:62-68).
    """
    b = x.shape[0]
    nq, nkv, hd = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    pos = seq_lens.astype(jnp.int32) - 1     # current token's position

    q = _mm(x, layer_params["wq"])
    k = _mm(x, layer_params["wk"])
    v = _mm(x, layer_params["wv"])
    if "bq" in layer_params:
        q = q + layer_params["bq"]
        k = k + layer_params["bk"]
        v = v + layer_params["bv"]
    q = rope(q.reshape(b, nq, hd), pos, cfg.rope_theta)
    k = rope(k.reshape(b, nkv, hd), pos, cfg.rope_theta)
    v = v.reshape(b, nkv, hd)

    kv_cache_layer = write_kv_page_rows(
        kv_cache_layer, k, v, block_table, pos, cfg.page_size,
        layer_idx=layer_idx)

    positions = position_lens = None
    if cfg.num_centroids and layer_block_ids is not None:
        positions, plen, _ = cent_select(
            q, layer_params["l1_cent"], layer_block_ids, block_table[:b],
            seq_lens, k=cfg.top_k_clusters, block_size=cfg.page_size,
            max_page_num=cfg.max_page_num,
            workload_cap_ratio=cfg.workload_cap_ratio,
            group_mode="kv_group")
        position_lens = plen[..., 0]

    attend_lens = seq_lens
    kv_start = None
    if cfg.sliding_window:
        # Mistral-family sliding window: attend only the last W tokens,
        # via the kernel's kv-left-padding window rather than a mask
        kv_start = jnp.maximum(
            seq_lens.astype(jnp.int32) - cfg.sliding_window, 0)
        attend_lens = seq_lens.astype(jnp.int32) - kv_start

    if isinstance(kv_cache_layer, dict):
        pages, kv_scales = kv_cache_layer["kv"], kv_cache_layer["ts"]
    else:
        pages, kv_scales = kv_cache_layer, None
    out = paged_flash_decode(
        q, pages, None, block_table[:b], attend_lens,
        positions, position_lens, kv_start=kv_start,
        kv_scales=kv_scales, page_size=cfg.page_size,
        layer_idx=layer_idx)
    out = out.reshape(b, nq * hd).astype(x.dtype)
    return _mm(out, layer_params["wo"]), kv_cache_layer


def _mlp(p, x):
    return _mm(jax.nn.silu(_mm(x, p["w_gate"])) * _mm(x, p["w_up"]),
               p["w_down"])


def decode_step(cfg: LlamaConfig, params, token_ids, kv_cache, block_table,
                seq_lens, block_ids=None, reduce=None):
    """One decode step over the whole model.

    Args:
      token_ids:   [B] int32 — current tokens (positions seq_lens-1).
      kv_cache:    [L, H_kv, P, 2*ps, D] (updated in place functionally).
      block_table: [B, max_page] int32.
      seq_lens:    [B] int32 — lengths *including* the current token.
      block_ids:   optional [L, H_kv, P] int32 cluster ids per layer for
                   centroid sparsity (None → dense attention).
      reduce:      optional callable applied to each residual branch
                   (attention o-proj and MLP down-proj outputs).  The
                   tensor-parallel path (parallel.sharded.tp_decode_step)
                   passes ``lambda t: psum(t, "tp")`` and a head-sharded
                   cfg; every other op in the chain is per-KV-head, so
                   these two reductions are TP's only collectives.

    Returns (logits [B, vocab], new_kv_cache).
    """
    reduce = reduce or (lambda t: t)
    x = params["embed"][token_ids].astype(cfg.dtype)
    # The full [L, ...] cache threads through the layer loop and every
    # layer scatters/reads AT its layer index (write_kv_page_rows /
    # paged_flash_decode layer_idx): with the cache donated to the step,
    # XLA aliases the buffer end-to-end and per-step cache traffic is
    # O(rows written + pages attended), NOT O(pool).  (The previous
    # slice-per-layer + stack design re-materialized the whole pool every
    # step — ~2 full-cache HBM passes that dwarfed the attention itself.)
    for li, lp in enumerate(params["layers"]):
        h = rms_norm(x, lp["ln_attn"], cfg.rms_eps)
        lbi = block_ids[li] if block_ids is not None else None
        attn, kv_cache = _attention(cfg, lp, h, kv_cache,
                                    block_table, seq_lens, lbi,
                                    layer_idx=li)
        x = x + reduce(attn).astype(cfg.dtype)
        h = rms_norm(x, lp["ln_mlp"], cfg.rms_eps)
        x = x + reduce(_mlp(lp, h)).astype(cfg.dtype)

    x = rms_norm(x, params["ln_f"], cfg.rms_eps)
    logits = _mm(x, params["lm_head"]).astype(jnp.float32)
    return logits, kv_cache


def stack_layer_params(params):
    """Stack the per-layer param list into one leading-L pytree.

    All layers share one structure, so ``params["layers"]`` (a list of
    dicts) stacks leaf-wise into a dict of [L, ...] arrays — the form
    :func:`decode_step_scan` scans over.  Embed / final-norm / lm_head
    pass through unchanged.
    """
    layers = params["layers"]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *layers)
    return {**params, "layers": stacked}


def decode_step_scan(cfg: LlamaConfig, params_stacked, token_ids, kv_cache,
                     block_table, seq_lens, block_ids=None, reduce=None):
    """:func:`decode_step` with the layer loop as ``lax.scan``.

    The Python-unrolled loop compiles an HLO whose size is O(num_layers);
    for deep models that dominates compile time (and can exceed remote-
    compile transport limits).  Scanning over stacked layer params, the
    per-layer KV cache and per-layer block_ids compiles the layer body
    ONCE — identical numerics, O(1)-in-depth program size.

    ``params_stacked`` comes from :func:`stack_layer_params`.
    ``reduce``: see :func:`decode_step`.
    """
    reduce = reduce or (lambda t: t)
    x = params_stacked["embed"][token_ids].astype(cfg.dtype)
    use_sparse = cfg.num_centroids and block_ids is not None
    wq = params_stacked["layers"]["wq"]
    num_layers = (wq["q"] if isinstance(wq, dict) else wq).shape[0]
    idxs = jnp.arange(num_layers, dtype=jnp.int32)
    xs = ((params_stacked["layers"], idxs, block_ids) if use_sparse
          else (params_stacked["layers"], idxs))

    # the cache is scan CARRY, not xs/ys: each iteration scatters/reads
    # at its layer index in the one persistent buffer (see decode_step) —
    # scanning the cache through xs/ys would stack a full O(pool) copy of
    # it per step
    def body(carry, per_layer):
        x, kv_c = carry
        if use_sparse:
            lp, li, lbi = per_layer
        else:
            (lp, li), lbi = per_layer, None
        h = rms_norm(x, lp["ln_attn"], cfg.rms_eps)
        attn, kv_c = _attention(cfg, lp, h, kv_c, block_table,
                                seq_lens, lbi, layer_idx=li)
        x = x + reduce(attn).astype(cfg.dtype)
        h = rms_norm(x, lp["ln_mlp"], cfg.rms_eps)
        x = x + reduce(_mlp(lp, h)).astype(cfg.dtype)
        return (x, kv_c), None

    (x, new_cache), _ = jax.lax.scan(body, (x, kv_cache), xs)
    x = rms_norm(x, params_stacked["ln_f"], cfg.rms_eps)
    logits = _mm(x, params_stacked["lm_head"]).astype(jnp.float32)
    return logits, new_cache


def make_decode_fn(cfg: LlamaConfig, scan_layers: bool = False):
    """jit-compiled decode step bound to a config.

    ``scan_layers=True`` compiles the layer loop as ``lax.scan`` (pass
    :func:`stack_layer_params`-stacked params) — same numerics, O(1)-in-
    depth program size; the right choice for deep models.
    """
    if scan_layers:
        @functools.partial(jax.jit, donate_argnums=(2,))
        def fn(params, token_ids, kv_cache, block_table, seq_lens,
               block_ids=None):
            return decode_step_scan(cfg, params, token_ids, kv_cache,
                                    block_table, seq_lens, block_ids)
        return fn

    # the cache is donated: the step's output cache aliases the input
    # buffer, so the in-place layer-indexed scatters truly are in place
    @functools.partial(jax.jit, donate_argnums=(2,))
    def fn(params, token_ids, kv_cache, block_table, seq_lens,
           block_ids=None):
        return decode_step(cfg, params, token_ids, kv_cache, block_table,
                           seq_lens, block_ids)
    return fn


def prefill(cfg: LlamaConfig, params, token_ids, kv_cache, block_table,
            block_ids=None):
    """Naive prefill: run decode_step over positions sequentially.

    Correct but O(S) kernel launches — used as the oracle for
    :func:`prefill_chunk_step` and by small tests.
    """
    b, s = token_ids.shape
    logits = None
    for t in range(s):
        seq_lens = jnp.full((b,), t + 1, jnp.int32)
        logits, kv_cache = decode_step(cfg, params, token_ids[:, t],
                                       kv_cache, block_table, seq_lens,
                                       block_ids)
    return logits, kv_cache


def prefill_chunk_step(cfg: LlamaConfig, params, token_ids, kv_cache,
                       block_table, start_pos, valid_lens=None,
                       reduce=None):
    """Process a chunk of T prompt tokens through every layer at once.

    Dense causal attention via ops.prefill.paged_prefill_attention (the
    reference is decode-only; prefill sparsity is out of scope — dense
    prefill feeds the cache the selection ops then sparsify at decode).

    Args:
      token_ids: [B, T]; start_pos: [B] — position of the chunk's first
      token (chunks must be page-aligned or contiguous per sequence).
      valid_lens: optional [B] int32 — rows ≥ valid_lens[b] of lane b are
      zero padding: their KV rows are not written, and the returned logits
      row is the last *valid* token's (causality already keeps valid
      queries from attending padding positions: padding sits strictly
      after every valid position).  0 marks an inactive lane.

    Returns (logits of the chunk's last valid token [B, vocab],
    new kv_cache).  ``reduce``: see :func:`decode_step`.
    """
    from ..ops.prefill import paged_prefill_attention, write_prompt_chunk

    reduce = reduce or (lambda t: t)
    b, t = token_ids.shape
    nq, nkv, hd = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    x = params["embed"][token_ids].astype(cfg.dtype)        # [B, T, H]
    pos = start_pos[:, None].astype(jnp.int32) + jnp.arange(t)[None, :]

    # full cache threads through the loop, written/read at layer_idx in
    # place (see decode_step)
    for li, lp in enumerate(params["layers"]):
        h = rms_norm(x, lp["ln_attn"], cfg.rms_eps)
        q = _mm(h, lp["wq"])
        k = _mm(h, lp["wk"])
        v = _mm(h, lp["wv"])
        if "bq" in lp:
            q, k, v = q + lp["bq"], k + lp["bk"], v + lp["bv"]
        q = rope(q.reshape(b, t, nq, hd), pos, cfg.rope_theta)
        k = rope(k.reshape(b, t, nkv, hd), pos, cfg.rope_theta)
        v = v.reshape(b, t, nkv, hd)
        kv_cache = write_prompt_chunk(kv_cache, k, v, block_table,
                                      start_pos, page_size=cfg.page_size,
                                      valid_lens=valid_lens, layer_idx=li)
        if isinstance(kv_cache, dict):
            pages, kv_scales = kv_cache["kv"], kv_cache["ts"]
        else:
            pages, kv_scales = kv_cache, None
        attn = paged_prefill_attention(q, pages, block_table, start_pos,
                                       kv_scales=kv_scales,
                                       page_size=cfg.page_size,
                                       sliding_window=cfg.sliding_window,
                                       layer_idx=li)
        attn = attn.reshape(b, t, nq * hd).astype(cfg.dtype)
        x = x + reduce(_mm(attn, lp["wo"])).astype(cfg.dtype)
        h = rms_norm(x, lp["ln_mlp"], cfg.rms_eps)
        x = x + reduce(_mlp(lp, h)).astype(cfg.dtype)

    if valid_lens is None:
        last = x[:, -1]
    else:
        idx = jnp.clip(valid_lens.astype(jnp.int32) - 1, 0, t - 1)
        last = jnp.take_along_axis(
            x, idx[:, None, None], axis=1)[:, 0]
    last = rms_norm(last, params["ln_f"], cfg.rms_eps)
    logits = _mm(last, params["lm_head"]).astype(jnp.float32)
    return logits, kv_cache


def prefill_chunk_step_scan(cfg: LlamaConfig, params_stacked, token_ids,
                            kv_cache, block_table, start_pos,
                            valid_lens=None, reduce=None):
    """:func:`prefill_chunk_step` with the layer loop as ``lax.scan``
    (stacked params from :func:`stack_layer_params`) — identical
    numerics, O(1)-in-depth program size (see :func:`decode_step_scan`).
    ``reduce``: see :func:`decode_step`.
    """
    from ..ops.prefill import paged_prefill_attention, write_prompt_chunk

    reduce = reduce or (lambda t: t)
    b, t = token_ids.shape
    nq, nkv, hd = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    x = params_stacked["embed"][token_ids].astype(cfg.dtype)
    pos = start_pos[:, None].astype(jnp.int32) + jnp.arange(t)[None, :]

    wq = params_stacked["layers"]["wq"]
    num_layers = (wq["q"] if isinstance(wq, dict) else wq).shape[0]
    idxs = jnp.arange(num_layers, dtype=jnp.int32)

    # cache as scan CARRY, layer-indexed in place (see decode_step_scan)
    def body(carry, per_layer):
        x, kv_c = carry
        lp, li = per_layer
        h = rms_norm(x, lp["ln_attn"], cfg.rms_eps)
        q = _mm(h, lp["wq"])
        k = _mm(h, lp["wk"])
        v = _mm(h, lp["wv"])
        if "bq" in lp:
            q, k, v = q + lp["bq"], k + lp["bk"], v + lp["bv"]
        q = rope(q.reshape(b, t, nq, hd), pos, cfg.rope_theta)
        k = rope(k.reshape(b, t, nkv, hd), pos, cfg.rope_theta)
        v = v.reshape(b, t, nkv, hd)
        kv_c = write_prompt_chunk(kv_c, k, v, block_table,
                                  start_pos, page_size=cfg.page_size,
                                  valid_lens=valid_lens, layer_idx=li)
        if isinstance(kv_c, dict):
            pages, kv_scales = kv_c["kv"], kv_c["ts"]
        else:
            pages, kv_scales = kv_c, None
        attn = paged_prefill_attention(q, pages, block_table, start_pos,
                                       kv_scales=kv_scales,
                                       page_size=cfg.page_size,
                                       sliding_window=cfg.sliding_window,
                                       layer_idx=li)
        attn = attn.reshape(b, t, nq * hd).astype(cfg.dtype)
        x = x + reduce(_mm(attn, lp["wo"])).astype(cfg.dtype)
        h = rms_norm(x, lp["ln_mlp"], cfg.rms_eps)
        x = x + reduce(_mlp(lp, h)).astype(cfg.dtype)
        return (x, kv_c), None

    (x, new_cache), _ = jax.lax.scan(body, (x, kv_cache),
                                     (params_stacked["layers"], idxs))
    if valid_lens is None:
        last = x[:, -1]
    else:
        idx = jnp.clip(valid_lens.astype(jnp.int32) - 1, 0, t - 1)
        last = jnp.take_along_axis(
            x, idx[:, None, None], axis=1)[:, 0]
    last = rms_norm(last, params_stacked["ln_f"], cfg.rms_eps)
    logits = _mm(last, params_stacked["lm_head"]).astype(jnp.float32)
    return logits, new_cache


def make_prefill_fn(cfg: LlamaConfig, scan_layers: bool = False):
    """jit-compiled chunked-prefill step bound to a config.

    ``scan_layers=True``: pass :func:`stack_layer_params`-stacked params.
    """
    if scan_layers:
        @functools.partial(jax.jit, donate_argnums=(2,))
        def fn(params, token_ids, kv_cache, block_table, start_pos,
               valid_lens):
            return prefill_chunk_step_scan(cfg, params, token_ids,
                                           kv_cache, block_table,
                                           start_pos, valid_lens)
        return fn

    @functools.partial(jax.jit, donate_argnums=(2,))
    def fn(params, token_ids, kv_cache, block_table, start_pos, valid_lens):
        return prefill_chunk_step(cfg, params, token_ids, kv_cache,
                                  block_table, start_pos, valid_lens)
    return fn
