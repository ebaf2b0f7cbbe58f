"""DeepSeek-class decoder: MLA attention + (optional) MoE MLP.

Model family counterpart to :mod:`.llama` for latent-attention models
(DeepSeek-V2/V3 architecture): MLA with a paged shared-latent cache
(ops.mla — the realized form of the reference's MLA scaffold,
incre_flash_attention_tiling_mla.h) and a top-k routed mixture-of-experts
MLP with shared experts (set ``num_experts=0`` for a dense MLP).

Functional pytree + pure functions, same contract as llama.py; the
parallel layer adds mesh shardings (experts shard over the ``ep`` axis)
without touching this file.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from ..config import PAGE_SIZE
from ..ops import mla as mla_ops
from .llama import _mm, rms_norm, rope


def _round_up(x, m):
    return (x + m - 1) // m * m


@dataclasses.dataclass(frozen=True)
class DeepSeekConfig:
    vocab_size: int = 1024
    hidden_size: int = 256
    intermediate_size: int = 512
    num_layers: int = 2
    num_heads: int = 16
    #: latent (compressed KV) width — the shared per-token cache row
    kv_lora_rank: int = 512
    #: optional low-rank query path (0 → direct q projection)
    q_lora_rank: int = 0
    qk_nope_head_dim: int = 128
    qk_rope_head_dim: int = 64
    v_head_dim: int = 128
    rope_theta: float = 10000.0
    rms_eps: float = 1e-6
    dtype: Any = jnp.bfloat16
    page_size: int = PAGE_SIZE
    #: engine-contract fields (DecodeEngine reads these off any model
    #: config): latent rows keep the model dtype (the latent cache is
    #: already 8-50× smaller than per-head KV); no sliding window.
    #: ``num_centroids`` enables centroid sparsity over LATENT pages —
    #: one codebook per layer in record space ([1, C, record_width]); the
    #: shared latent stream (h_kv = 1) means selection hands the kernel
    #: one shared position row, so sparse MLA keeps the slab-DMA fast
    #: path unconditionally
    kv_cache_dtype: str = "auto"
    sliding_window: int = 0
    num_centroids: int = 0
    top_k_clusters: int = 64
    max_page_num: int = 256
    workload_cap_ratio: int = 8

    @property
    def num_kv_heads(self):
        """Engine contract: the latent cache is one shared stream."""
        return 1
    # --- MoE (0 experts → dense MLP) ---
    num_experts: int = 0
    num_experts_per_tok: int = 2
    moe_intermediate_size: int = 128
    n_shared_experts: int = 1

    @property
    def record_width(self):
        """Latent cache row width, padded to the 128-lane tile."""
        return _round_up(self.kv_lora_rank + self.qk_rope_head_dim, 128)

    @property
    def sm_scale(self):
        return float(1.0 / ((self.qk_nope_head_dim
                             + self.qk_rope_head_dim) ** 0.5))


TINY_DEEPSEEK = DeepSeekConfig()
TINY_DEEPSEEK_MOE = DeepSeekConfig(num_experts=4, num_experts_per_tok=2,
                                   moe_intermediate_size=128,
                                   n_shared_experts=1)


def init_params(cfg: DeepSeekConfig, key) -> dict:
    h = cfg.hidden_size
    nh, dn, dr, dv = (cfg.num_heads, cfg.qk_nope_head_dim,
                      cfg.qk_rope_head_dim, cfg.v_head_dim)
    c = cfg.kv_lora_rank
    keys = jax.random.split(key, cfg.num_layers + 2)

    def dense(key, shape, scale=None):
        scale = scale or (1.0 / (shape[0] ** 0.5))
        return (jax.random.normal(key, shape, jnp.float32) * scale
                ).astype(cfg.dtype)

    def layer(key):
        ks = jax.random.split(key, 13)
        p = {
            "w_dkv": dense(ks[1], (h, c + dr)),
            "kv_ln": jnp.ones((c,), cfg.dtype),
            "w_uk": dense(ks[2], (nh, dn, c), 1.0 / (dn ** 0.5)),
            "w_uv": dense(ks[3], (nh, c, dv), 1.0 / (c ** 0.5)),
            "wo": dense(ks[4], (nh * dv, h)),
            "ln_attn": jnp.ones((h,), cfg.dtype),
            "ln_mlp": jnp.ones((h,), cfg.dtype),
        }
        if cfg.num_centroids:
            p["l1_cent"] = dense(ks[5], (1, cfg.num_centroids,
                                         cfg.record_width), 1.0)
        if cfg.q_lora_rank:
            p["w_dq"] = dense(ks[0], (h, cfg.q_lora_rank))
            p["q_ln"] = jnp.ones((cfg.q_lora_rank,), cfg.dtype)
            p["w_uq"] = dense(ks[5], (cfg.q_lora_rank, nh * (dn + dr)))
        else:
            p["wq"] = dense(ks[0], (h, nh * (dn + dr)))
        if cfg.num_experts:
            e, im = cfg.num_experts, cfg.moe_intermediate_size
            p["router"] = dense(ks[6], (h, e), 1.0)
            p["e_gate"] = dense(ks[7], (e, h, im))
            p["e_up"] = dense(ks[8], (e, h, im))
            p["e_down"] = dense(ks[9], (e, im, h))
            if cfg.n_shared_experts:
                sim = im * cfg.n_shared_experts
                p["s_gate"] = dense(ks[10], (h, sim))
                p["s_up"] = dense(ks[11], (h, sim))
                p["s_down"] = dense(ks[12], (sim, h))
        else:
            p["w_gate"] = dense(ks[6], (h, cfg.intermediate_size))
            p["w_up"] = dense(ks[7], (h, cfg.intermediate_size))
            p["w_down"] = dense(ks[8], (cfg.intermediate_size, h))
        return p

    return {
        "embed": dense(keys[0], (cfg.vocab_size, h), 1.0),
        "layers": [layer(k) for k in keys[2:]],
        "ln_f": jnp.ones((h,), cfg.dtype),
        "lm_head": dense(keys[1], (h, cfg.vocab_size)),
    }


def quantize_params(cfg: DeepSeekConfig, params):
    """Weight-only int8 over the MLA projections (llama.quantize_params
    analog).  The per-head low-rank factors (w_uk/w_uv — absorbed into
    activations, small), router, expert tables and norms stay full
    precision."""
    from ..ops.quant import quantize_weight

    def qw(w):
        q, sc = quantize_weight(w)
        return {"q": q, "s": sc}

    keys = ["w_dkv", "wo"]
    keys += (["w_dq", "w_uq"] if cfg.q_lora_rank else ["wq"])
    if not cfg.num_experts:
        keys += ["w_gate", "w_up", "w_down"]
    layers = []
    for lp in params["layers"]:
        lp = dict(lp)
        for k in keys:
            lp[k] = qw(lp[k])
        layers.append(lp)
    return {**params, "layers": layers, "lm_head": qw(params["lm_head"])}


def init_latent_cache(cfg: DeepSeekConfig, num_pages: int, dtype=None):
    """[num_layers, 1, num_pages, page_size, record_width]."""
    dtype = dtype or cfg.dtype
    return jnp.zeros((cfg.num_layers, 1, num_pages, cfg.page_size,
                      cfg.record_width), dtype)


def _mla_qkv(cfg, lp, x, pos):
    """Project + rope queries and the latent row.

    x [..., hidden], pos [...] (decode: [B]; chunked prefill: [B, T]) →
    (q_nope [..., H, dn], q_pe [..., H, dr], row [..., record_width]).
    """
    nh, dn, dr = cfg.num_heads, cfg.qk_nope_head_dim, cfg.qk_rope_head_dim
    if cfg.q_lora_rank:
        q = _mm(rms_norm(_mm(x, lp["w_dq"]), lp["q_ln"], cfg.rms_eps),
                lp["w_uq"])
    else:
        q = _mm(x, lp["wq"])
    q = q.reshape(*x.shape[:-1], nh, dn + dr)
    q_nope, q_pe = q[..., :dn], q[..., dn:]
    q_pe = rope(q_pe, pos, cfg.rope_theta)

    kv = _mm(x, lp["w_dkv"])                               # [..., c+dr]
    c_kv = rms_norm(kv[..., :cfg.kv_lora_rank], lp["kv_ln"], cfg.rms_eps)
    k_pe = rope(kv[..., None, cfg.kv_lora_rank:], pos,
                cfg.rope_theta)[..., 0, :]                 # shared head
    row = jnp.concatenate([c_kv, k_pe], axis=-1)
    pad = cfg.record_width - row.shape[-1]
    if pad:
        row = jnp.pad(row, [(0, 0)] * (row.ndim - 1) + [(0, pad)])
    return q_nope, q_pe, row


def _moe(cfg, lp, x, ep_axis=None):
    """Top-k routed MoE + shared experts (decode-batch sized).

    x [..., hidden] — chunked prefill passes [B, T, hidden]; the routed
    path flattens tokens (routing is per-token).

    ``ep_axis``: expert-parallel mesh axis name.  The expert tables in
    ``lp`` are then the LOCAL shard ([E/ep, ...]); routing runs
    replicated against the full-width router, each shard evaluates only
    the selected experts it owns, and partial outputs combine with one
    ``psum`` over ICI (shared experts are added on shard 0 only so the
    psum doesn't multiply them) — the engine-integrated form of
    parallel.sharded.ep_moe.
    """
    lead = x.shape[:-1]
    x = x.reshape(-1, x.shape[-1])
    scores = jax.nn.softmax((x.astype(jnp.float32) @ lp["router"]
                             .astype(jnp.float32)), axis=-1)     # [B, E]
    top_w, top_i = jax.lax.top_k(scores, cfg.num_experts_per_tok)
    top_w = top_w / jnp.sum(top_w, axis=-1, keepdims=True)

    if ep_axis is not None:
        e_local = lp["e_gate"].shape[0]
        lo = jax.lax.axis_index(ep_axis) * e_local
        local = top_i - lo                                  # [B, K]
        mine = (local >= 0) & (local < e_local)
        sel = jnp.clip(local, 0, e_local - 1)
        top_w = jnp.where(mine, top_w, 0.0)
    else:
        sel = top_i

    # gather the selected experts' weights (decode batches are small)
    eg = lp["e_gate"][sel]                                  # [B, K, h, im]
    eu = lp["e_up"][sel]
    ed = lp["e_down"][sel]
    hmid = (jax.nn.silu(jnp.einsum("bh,bkhi->bki", x, eg))
            * jnp.einsum("bh,bkhi->bki", x, eu))
    y = jnp.einsum("bki,bkih->bkh", hmid, ed)
    y = jnp.einsum("bk,bkh->bh", top_w.astype(y.dtype), y)
    if cfg.n_shared_experts:
        shared = (jax.nn.silu(x @ lp["s_gate"]) * (x @ lp["s_up"])
                  ) @ lp["s_down"]
        if ep_axis is not None:
            shared = shared * jnp.where(
                jax.lax.axis_index(ep_axis) == 0, 1.0, 0.0
            ).astype(shared.dtype)
        y = y + shared
    if ep_axis is not None:
        y = jax.lax.psum(y, ep_axis)
    return y.reshape(*lead, y.shape[-1])


def _mlp(cfg, lp, x, ep_axis=None):
    if cfg.num_experts:
        return _moe(cfg, lp, x, ep_axis=ep_axis)
    return _mm(jax.nn.silu(_mm(x, lp["w_gate"])) * _mm(x, lp["w_up"]),
               lp["w_down"])


def _decode_layer(cfg: DeepSeekConfig, lp, x, latent_cache, block_table,
                  seq_lens, layer_block_ids, layer_idx, reduce,
                  ep_axis=None):
    """One MLA decoder layer (decode step).  x: [B, hidden].

    ``reduce`` is applied to the attention output projection and the
    dense-MLP down projection (the tensor-parallel psum seam —
    models.llama.decode_step's contract); the MoE path carries its own
    optional ep reduction (see :func:`_moe`).
    """
    from ..ops.cent_select import cent_select

    b = x.shape[0]
    pos = seq_lens.astype(jnp.int32) - 1
    width = cfg.record_width
    h = rms_norm(x, lp["ln_attn"], cfg.rms_eps)
    q_nope, q_pe, row = _mla_qkv(cfg, lp, h, pos)
    latent_cache = mla_ops.write_latent_rows(
        latent_cache, row, block_table[:b], pos,
        page_size=cfg.page_size, layer_idx=layer_idx)
    positions = position_lens = None
    if cfg.num_centroids and layer_block_ids is not None:
        # centroid-sparse MLA: selection runs in RECORD space — the
        # absorbed query already scores rows by q_eff · record, so
        # the codebook lives there too; the GQA-group analog of
        # kv_group mode is the mean absorbed query (all heads share
        # the one latent stream)
        q_eff = mla_ops.absorbed_queries(q_nope, q_pe, lp["w_uk"],
                                         width=width)
        q_sel = jnp.mean(q_eff, axis=1, keepdims=True)   # [B, 1, W]
        positions, plen, _ = cent_select(
            q_sel, lp["l1_cent"], layer_block_ids, block_table[:b],
            seq_lens, k=cfg.top_k_clusters, block_size=cfg.page_size,
            max_page_num=cfg.max_page_num,
            workload_cap_ratio=cfg.workload_cap_ratio,
            group_mode="per_qhead")
        position_lens = plen[..., 0]
    attn = mla_ops.mla_attention(
        q_nope, q_pe, latent_cache, block_table[:b], seq_lens,
        lp["w_uk"], lp["w_uv"], positions=positions,
        position_lens=position_lens, sm_scale=cfg.sm_scale,
        page_size=cfg.page_size, layer_idx=layer_idx)
    attn = attn.reshape(b, -1).astype(cfg.dtype)
    x = x + reduce(_mm(attn, lp["wo"])).astype(cfg.dtype)
    h = rms_norm(x, lp["ln_mlp"], cfg.rms_eps)
    if cfg.num_experts:
        x = x + _mlp(cfg, lp, h, ep_axis=ep_axis).astype(cfg.dtype)
    else:
        x = x + reduce(_mlp(cfg, lp, h)).astype(cfg.dtype)
    return x, latent_cache


def decode_step(cfg: DeepSeekConfig, params, token_ids, latent_cache,
                block_table, seq_lens, block_ids=None, reduce=None,
                ep_axis=None):
    """One decode step.  Mirrors llama.decode_step but with the MLA chain.

    latent_cache: [L, 1, P, ps, W]; block_ids: optional [L, 1, P] int32
    latent-page cluster ids for centroid-sparse MLA (cfg.num_centroids).
    ``reduce``: tensor-parallel reduction seam (see llama.decode_step).
    Returns (logits [B, V], new cache).
    """
    reduce = reduce or (lambda t: t)
    x = params["embed"][token_ids].astype(cfg.dtype)
    # full [L, 1, P, ps, W] cache written/read in place at each layer
    # index (models.llama.decode_step rationale: no per-step pool copies)
    for li, lp in enumerate(params["layers"]):
        lbi = block_ids[li] if block_ids is not None else None
        x, latent_cache = _decode_layer(cfg, lp, x, latent_cache,
                                        block_table, seq_lens, lbi, li,
                                        reduce, ep_axis=ep_axis)
    x = rms_norm(x, params["ln_f"], cfg.rms_eps)
    logits = _mm(x, params["lm_head"]).astype(jnp.float32)
    return logits, latent_cache


def stack_layer_params(params):
    """Stack the per-layer param list leaf-wise (llama.stack_layer_params
    for the DeepSeek pytree — all layers share one structure)."""
    layers = params["layers"]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *layers)
    return {**params, "layers": stacked}


def _num_layers_of(stacked_layers):
    return jax.tree.leaves(stacked_layers)[0].shape[0]


def decode_step_scan(cfg: DeepSeekConfig, params_stacked, token_ids,
                     latent_cache, block_table, seq_lens, block_ids=None,
                     reduce=None, ep_axis=None):
    """:func:`decode_step` with the layer loop as ``lax.scan``.

    Identical numerics, O(1)-in-depth HLO — the fix for DeepSeek-V3-scale
    depth (61 layers) that llama.decode_step_scan provides for Llama
    (reference MLA scaffold: incre_flash_attention_tiling_mla.h:27-79).
    ``params_stacked`` from :func:`stack_layer_params`; the cache is scan
    CARRY, scattered/read at each layer index in place.
    """
    reduce = reduce or (lambda t: t)
    x = params_stacked["embed"][token_ids].astype(cfg.dtype)
    num_layers = _num_layers_of(params_stacked["layers"])
    idxs = jnp.arange(num_layers, dtype=jnp.int32)
    use_sparse = cfg.num_centroids and block_ids is not None
    xs = ((params_stacked["layers"], idxs, block_ids) if use_sparse
          else (params_stacked["layers"], idxs))

    def body(carry, per_layer):
        x, cache = carry
        if use_sparse:
            lp, li, lbi = per_layer
        else:
            (lp, li), lbi = per_layer, None
        x, cache = _decode_layer(cfg, lp, x, cache, block_table,
                                 seq_lens, lbi, li, reduce,
                                 ep_axis=ep_axis)
        return (x, cache), None

    (x, new_cache), _ = jax.lax.scan(body, (x, latent_cache), xs)
    x = rms_norm(x, params_stacked["ln_f"], cfg.rms_eps)
    logits = _mm(x, params_stacked["lm_head"]).astype(jnp.float32)
    return logits, new_cache


def make_decode_fn(cfg: DeepSeekConfig, scan_layers: bool = False):
    import functools

    step = decode_step_scan if scan_layers else decode_step

    @functools.partial(jax.jit, donate_argnums=(2,))
    def fn(params, token_ids, latent_cache, block_table, seq_lens,
           block_ids=None):
        return step(cfg, params, token_ids, latent_cache,
                    block_table, seq_lens, block_ids)
    return fn


def _prefill_layer(cfg: DeepSeekConfig, lp, x, latent_cache, block_table,
                   start_pos, valid_lens, pos, layer_idx, reduce,
                   ep_axis=None):
    """One MLA decoder layer over a prefill chunk.  x: [B, T, hidden]."""
    b, t = x.shape[:2]
    width = cfg.record_width
    h = rms_norm(x, lp["ln_attn"], cfg.rms_eps)
    q_nope, q_pe, row = _mla_qkv(cfg, lp, h, pos)
    latent_cache = mla_ops.write_latent_chunk(
        latent_cache, row, block_table[:b], start_pos,
        page_size=cfg.page_size, valid_lens=valid_lens,
        layer_idx=layer_idx)
    q_eff = mla_ops.absorbed_queries(q_nope, q_pe, lp["w_uk"],
                                     width=width)
    o_lat = mla_ops.mla_prefill_attention(
        q_eff, latent_cache, block_table[:b], start_pos,
        d_v=cfg.kv_lora_rank, sm_scale=cfg.sm_scale,
        page_size=cfg.page_size, layer_idx=layer_idx)     # [B, T, H, c]
    attn = jnp.einsum("bthc,hcd->bthd", o_lat,
                      lp["w_uv"].astype(jnp.float32))
    attn = attn.reshape(b, t, -1).astype(cfg.dtype)
    x = x + reduce(_mm(attn, lp["wo"])).astype(cfg.dtype)
    h = rms_norm(x, lp["ln_mlp"], cfg.rms_eps)
    if cfg.num_experts:
        x = x + _mlp(cfg, lp, h, ep_axis=ep_axis).astype(cfg.dtype)
    else:
        x = x + reduce(_mlp(cfg, lp, h)).astype(cfg.dtype)
    return x, latent_cache


def _last_valid_logits(cfg, params, x, valid_lens):
    t = x.shape[1]
    if valid_lens is None:
        last = x[:, -1]
    else:
        idx = jnp.clip(valid_lens.astype(jnp.int32) - 1, 0, t - 1)
        last = jnp.take_along_axis(x, idx[:, None, None], axis=1)[:, 0]
    last = rms_norm(last, params["ln_f"], cfg.rms_eps)
    return _mm(last, params["lm_head"]).astype(jnp.float32)


def prefill_chunk_step(cfg: DeepSeekConfig, params, token_ids, latent_cache,
                       block_table, start_pos, valid_lens=None,
                       reduce=None, ep_axis=None):
    """Process a chunk of T prompt tokens through every layer at once.

    The MLA analog of llama.prefill_chunk_step: absorbed causal latent
    attention (ops.mla.mla_prefill_attention) over the shared paged
    latent cache.  Same contract: token_ids [B, T], start_pos [B],
    valid_lens [B] (0 = inactive lane); returns (last-valid-token logits
    [B, V], new cache).  ``reduce``: see :func:`decode_step`.
    """
    reduce = reduce or (lambda t: t)
    pos = start_pos[:, None].astype(jnp.int32) + jnp.arange(
        token_ids.shape[1])[None, :]
    x = params["embed"][token_ids].astype(cfg.dtype)           # [B, T, H]
    for li, lp in enumerate(params["layers"]):
        x, latent_cache = _prefill_layer(cfg, lp, x, latent_cache,
                                         block_table, start_pos,
                                         valid_lens, pos, li, reduce,
                                         ep_axis=ep_axis)
    return _last_valid_logits(cfg, params, x, valid_lens), latent_cache


def prefill_chunk_step_scan(cfg: DeepSeekConfig, params_stacked, token_ids,
                            latent_cache, block_table, start_pos,
                            valid_lens=None, reduce=None, ep_axis=None):
    """:func:`prefill_chunk_step` with the layer loop as ``lax.scan``
    (stacked params from :func:`stack_layer_params`) — identical
    numerics, O(1)-in-depth program size."""
    reduce = reduce or (lambda t: t)
    pos = start_pos[:, None].astype(jnp.int32) + jnp.arange(
        token_ids.shape[1])[None, :]
    x = params_stacked["embed"][token_ids].astype(cfg.dtype)
    num_layers = _num_layers_of(params_stacked["layers"])
    idxs = jnp.arange(num_layers, dtype=jnp.int32)

    def body(carry, per_layer):
        x, cache = carry
        lp, li = per_layer
        x, cache = _prefill_layer(cfg, lp, x, cache, block_table,
                                  start_pos, valid_lens, pos, li, reduce,
                                  ep_axis=ep_axis)
        return (x, cache), None

    (x, new_cache), _ = jax.lax.scan(body, (x, latent_cache),
                                     (params_stacked["layers"], idxs))
    return (_last_valid_logits(cfg, params_stacked, x, valid_lens),
            new_cache)


def make_prefill_fn(cfg: DeepSeekConfig, scan_layers: bool = False):
    import functools

    step = prefill_chunk_step_scan if scan_layers else prefill_chunk_step

    @functools.partial(jax.jit, donate_argnums=(2,))
    def fn(params, token_ids, latent_cache, block_table, start_pos,
           valid_lens):
        return step(cfg, params, token_ids, latent_cache,
                    block_table, start_pos, valid_lens)
    return fn
