"""shard_map-wrapped multi-chip decode paths.

Three composable strategies over a (dp, tp, sp) mesh (see mesh.py):

* :func:`tp_decode_step` — tensor-parallel full-model decode step: heads
  (and their codebooks, block_ids, KV pages) sharded over ``tp``; the only
  collectives are the psums after the attention output projection and the
  MLP down projection, riding ICI.
* :func:`sp_sparse_attention` — sequence-parallel sparse attention: the
  physical page pool is striped over ``sp`` (page p on shard p % sp); each
  shard compacts the selected slots it owns (the same GatherMask-style
  compaction as SelectPosition, reused from ops.cent_select), runs the
  flash-decode kernel over its local pages, and partial (out, LSE) pairs
  merge with the log-sum-exp combine — cross-chip flash-decode, the ICI
  generalization of the reference's intra-chip splitKV
  (CombineSplitKVRes, split header :2229-2323).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from ..config import INT32_SENTINEL, MASK_VALUE
from ..models import llama
from ..ops.cent_select import _compact_positions
from ..ops.paged_attention import paged_flash_decode
from .mesh import cache_specs, param_specs


def _psum_if(x, axis):
    return jax.lax.psum(x, axis) if axis else x


def _local_cfg(cfg: llama.LlamaConfig, mesh):
    tp = mesh.shape["tp"]
    if cfg.num_heads % tp or cfg.num_kv_heads % tp:
        raise ValueError(
            f"tp={tp} must divide num_heads={cfg.num_heads} and "
            f"num_kv_heads={cfg.num_kv_heads}")
    return dataclasses.replace(
        cfg, num_heads=cfg.num_heads // tp,
        num_kv_heads=cfg.num_kv_heads // tp)


def tp_decode_step(cfg: llama.LlamaConfig, mesh, scan_layers: bool = False,
                   quantized_weights: bool = False):
    """Build a tensor-parallel decode step over mesh axis "tp".

    Per-shard the model is just a narrower Llama (num_heads/tp,
    num_kv_heads/tp) — :func:`models.llama.decode_step` is reused
    verbatim with ``reduce=psum``, because every op in the chain is
    already per-KV-head; the o-proj and down-proj psums are TP's only
    collectives.  ``scan_layers=True`` expects stacked params
    (llama.stack_layer_params) and scans the layer body.
    """
    local_cfg = _local_cfg(cfg, mesh)
    pspecs = param_specs(cfg.num_layers, sparse=bool(cfg.num_centroids),
                         stacked=scan_layers,
                         quantized=quantized_weights)
    bids_spec = (P(None, "tp", "dp") if cfg.num_centroids else P())
    cspec = cache_specs(cfg.kv_cache_dtype == "int8")

    # dp shards the batch (tokens / block tables / seq_lens / logits) and
    # the page pool (contiguous slice per replica; block tables hold local
    # ids) — params replicated over dp, nothing inside the step changes:
    # shard_map hands each replica its local batch and local pool.
    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(pspecs, P("dp"), cspec, P("dp", None),
                  P("dp"), bids_spec),
        out_specs=(P("dp"), cspec),
        check_vma=False,
    )
    def step(params, tokens, kv_cache, block_table, seq_lens, block_ids):
        fn = llama.decode_step_scan if scan_layers else llama.decode_step
        bids = block_ids if local_cfg.num_centroids else None
        return fn(local_cfg, params, tokens, kv_cache, block_table,
                  seq_lens, bids, reduce=lambda t: _psum_if(t, "tp"))

    def wrapped(params, tokens, kv_cache, block_table, seq_lens,
                block_ids=None):
        if block_ids is None:
            block_ids = jnp.zeros((), jnp.int32)
        return step(params, tokens, kv_cache, block_table, seq_lens,
                    block_ids)

    # cache donated → the layer-indexed scatters inside decode_step stay
    # in place across the shard_map boundary too
    return jax.jit(wrapped, donate_argnums=(2,))


def tp_prefill_step(cfg: llama.LlamaConfig, mesh, scan_layers: bool = False,
                    quantized_weights: bool = False):
    """Tensor-parallel chunked-prefill step over mesh axes (dp, tp).

    The dp×tp layout of :func:`tp_decode_step` applied to
    :func:`models.llama.prefill_chunk_step`: token chunks / block tables /
    start positions sharded over dp, heads (and KV pages) over tp, the
    same two psums per layer.  Signature matches
    ``llama.make_prefill_fn``'s: (params, token_ids [B, T], kv_cache,
    block_table, start_pos [B], valid_lens [B]).
    """
    local_cfg = _local_cfg(cfg, mesh)
    pspecs = param_specs(cfg.num_layers, sparse=bool(cfg.num_centroids),
                         stacked=scan_layers,
                         quantized=quantized_weights)
    cspec = cache_specs(cfg.kv_cache_dtype == "int8")

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(pspecs, P("dp", None), cspec, P("dp", None),
                  P("dp"), P("dp")),
        out_specs=(P("dp"), cspec),
        check_vma=False,
    )
    def step(params, token_ids, kv_cache, block_table, start_pos,
             valid_lens):
        fn = (llama.prefill_chunk_step_scan if scan_layers
              else llama.prefill_chunk_step)
        return fn(local_cfg, params, token_ids, kv_cache, block_table,
                  start_pos, valid_lens,
                  reduce=lambda t: _psum_if(t, "tp"))

    return jax.jit(step, donate_argnums=(2,))


# --- DeepSeek / MLA tensor-parallel steps -----------------------------------

def _local_deepseek_cfg(cfg, mesh):
    tp = mesh.shape["tp"]
    ep = mesh.shape.get("ep", 1)
    if cfg.num_heads % tp:
        raise ValueError(
            f"tp={tp} must divide num_heads={cfg.num_heads}")
    if cfg.num_experts and cfg.num_experts % ep:
        raise ValueError(
            f"ep={ep} must divide num_experts={cfg.num_experts}")
    return dataclasses.replace(cfg, num_heads=cfg.num_heads // tp)


def _deepseek_specs(cfg, mesh, scan_layers, quantized_weights):
    from .mesh import deepseek_param_specs, latent_cache_spec
    del mesh
    pspecs = deepseek_param_specs(cfg, cfg.num_layers, stacked=scan_layers,
                                  quantized=quantized_weights)
    bids_spec = (P(None, None, "dp") if cfg.num_centroids else P())
    return pspecs, bids_spec, latent_cache_spec()


def tp_decode_step_deepseek(cfg, mesh, scan_layers: bool = False,
                            quantized_weights: bool = False):
    """DeepSeek/MLA tensor-parallel decode step over mesh axes (dp, tp,
    ep).

    Query heads shard over ``tp`` (the per-shard model is just a
    narrower DeepSeek — num_heads/tp — with the shared latent stream
    replicated, so every shard writes identical latent rows and the only
    tp collectives are the o-proj / down-proj psums); MoE expert tables
    shard over ``ep`` with the in-layer psum of models.deepseek._moe.
    The batch, block tables and latent page pool shard over ``dp``
    (private per-replica pools, local page ids — mesh.latent_cache_spec).
    """
    from ..models import deepseek
    local_cfg = _local_deepseek_cfg(cfg, mesh)
    pspecs, bids_spec, cspec = _deepseek_specs(
        cfg, mesh, scan_layers, quantized_weights)
    ep_axis = "ep" if cfg.num_experts else None

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(pspecs, P("dp"), cspec, P("dp", None),
                  P("dp"), bids_spec),
        out_specs=(P("dp"), cspec),
        check_vma=False,
    )
    def step(params, tokens, cache, block_table, seq_lens, block_ids):
        fn = (deepseek.decode_step_scan if scan_layers
              else deepseek.decode_step)
        bids = block_ids if local_cfg.num_centroids else None
        return fn(local_cfg, params, tokens, cache, block_table,
                  seq_lens, bids, reduce=lambda t: _psum_if(t, "tp"),
                  ep_axis=ep_axis)

    def wrapped(params, tokens, cache, block_table, seq_lens,
                block_ids=None):
        if block_ids is None:
            block_ids = jnp.zeros((), jnp.int32)
        return step(params, tokens, cache, block_table, seq_lens,
                    block_ids)

    return jax.jit(wrapped, donate_argnums=(2,))


def tp_prefill_step_deepseek(cfg, mesh, scan_layers: bool = False,
                             quantized_weights: bool = False):
    """DeepSeek/MLA tensor-parallel chunked-prefill step (dp × tp × ep);
    the dp/tp/ep layout of :func:`tp_decode_step_deepseek` applied to
    deepseek.prefill_chunk_step."""
    from ..models import deepseek
    local_cfg = _local_deepseek_cfg(cfg, mesh)
    pspecs, _, cspec = _deepseek_specs(
        cfg, mesh, scan_layers, quantized_weights)
    ep_axis = "ep" if cfg.num_experts else None

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(pspecs, P("dp", None), cspec, P("dp", None),
                  P("dp"), P("dp")),
        out_specs=(P("dp"), cspec),
        check_vma=False,
    )
    def step(params, token_ids, cache, block_table, start_pos,
             valid_lens):
        fn = (deepseek.prefill_chunk_step_scan if scan_layers
              else deepseek.prefill_chunk_step)
        return fn(local_cfg, params, token_ids, cache, block_table,
                  start_pos, valid_lens,
                  reduce=lambda t: _psum_if(t, "tp"), ep_axis=ep_axis)

    return jax.jit(step, donate_argnums=(2,))


# --- sequence-parallel sparse attention -------------------------------------

def _local_positions(positions, position_lens, block_table, sp_idx, sp_size):
    """Compact the selected slots whose physical page this shard owns.

    positions: [B, Hp, M] ascending logical slots (sentinel-padded);
    block_table: [B, max_page] GLOBAL physical ids.  Page p lives on shard
    p % sp_size at local id p // sp_size.  Returns (local_positions
    [B, Hp, M], local_lens [B, Hp], local_table [B, max_page]).
    """
    b, h_pos, m = positions.shape
    max_page = block_table.shape[1]
    idx_valid = (jnp.arange(m, dtype=jnp.int32)[None, None, :]
                 < position_lens[:, :, None])
    slots = jnp.clip(positions, 0, max_page - 1)
    pids = jnp.take_along_axis(
        jnp.broadcast_to(block_table[:, None, :].astype(jnp.int32),
                         (b, h_pos, max_page)), slots, axis=2)
    mine = idx_valid & (jax.lax.rem(pids, sp_size) == sp_idx)
    # compacted indices INTO the selected list (SelectPosition-style)
    sel_idx = _compact_positions(mine, m)                  # [B, Hp, M]
    valid = sel_idx != INT32_SENTINEL
    local_slots = jnp.take_along_axis(
        slots, jnp.where(valid, sel_idx, 0), axis=2)
    local_slots = jnp.where(valid, local_slots, INT32_SENTINEL)
    local_lens = jnp.sum(mine, axis=2).astype(jnp.int32)
    local_table = block_table.astype(jnp.int32) // sp_size
    return local_slots, local_lens, local_table


def ep_moe(mesh, cfg):
    """Expert-parallel MoE layer over mesh axis "ep".

    Expert weight tables ([E, …]) shard on the expert axis; routing runs
    replicated, each shard evaluates only the selected experts it owns
    (out-of-shard selections contribute zero), and the partial outputs
    combine with one ``psum`` over ICI.  Shared experts are replicated and
    added on shard 0 only (so the psum doesn't multiply them).

    cfg: models.deepseek.DeepSeekConfig with ``num_experts`` set.
    """
    ep = mesh.shape["ep"]
    if cfg.num_experts % ep:
        raise ValueError(f"num_experts {cfg.num_experts} not divisible by "
                         f"ep={ep}")

    expert_spec = P("ep", None, None)
    in_specs = (P(), {  # x replicated; layer params:
        "router": P(), "e_gate": expert_spec, "e_up": expert_spec,
        "e_down": expert_spec, "s_gate": P(), "s_up": P(), "s_down": P(),
    })

    @functools.partial(jax.shard_map, mesh=mesh, in_specs=in_specs,
                       out_specs=P(), check_vma=False)
    def moe(x, lp):
        e_local = lp["e_gate"].shape[0]
        lo = jax.lax.axis_index("ep") * e_local
        scores = jax.nn.softmax(
            x.astype(jnp.float32) @ lp["router"].astype(jnp.float32), -1)
        top_w, top_i = jax.lax.top_k(scores, cfg.num_experts_per_tok)
        top_w = top_w / jnp.sum(top_w, axis=-1, keepdims=True)

        local = top_i - lo                                  # [B, K]
        mine = (local >= 0) & (local < e_local)
        li = jnp.clip(local, 0, e_local - 1)
        eg, eu, ed = lp["e_gate"][li], lp["e_up"][li], lp["e_down"][li]
        hmid = (jax.nn.silu(jnp.einsum("bh,bkhi->bki", x, eg))
                * jnp.einsum("bh,bkhi->bki", x, eu))
        y_k = jnp.einsum("bki,bkih->bkh", hmid, ed)
        w = jnp.where(mine, top_w, 0.0).astype(y_k.dtype)
        y = jnp.einsum("bk,bkh->bh", w, y_k)
        if cfg.n_shared_experts:
            shared = (jax.nn.silu(x @ lp["s_gate"]) * (x @ lp["s_up"])
                      ) @ lp["s_down"]
            y = y + jnp.where(jax.lax.axis_index("ep") == 0, 1.0, 0.0
                              ).astype(y.dtype) * shared
        return jax.lax.psum(y, "ep")

    return moe


def sp_sparse_attention(mesh, *, page_size, sm_scale=None, ppcb=8):
    """Sequence-parallel sparse paged attention over mesh axis "sp".

    kv_pages sharded on the page axis ([H_kv, P/sp, ps, 2D] per shard,
    pages striped p → (p % sp, p // sp)); q and selection outputs
    replicated.  Each shard attends its own pages; partial results merge
    with the flash LSE combine (two psums over ICI).
    """

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(), P(None, "sp", None, None), P(), P(), P(), P()),
        out_specs=P(),
        check_vma=False,
    )
    def attend(q, kv_pages, block_table, seq_lens, positions, position_lens):
        sp_size = jax.lax.axis_size("sp")
        sp_idx = jax.lax.axis_index("sp")
        loc_pos, loc_len, loc_table = _local_positions(
            positions, position_lens, block_table, sp_idx, sp_size)

        def run(pos_list):
            out, lse = paged_flash_decode(
                q, kv_pages, None, loc_table, seq_lens, pos_list, loc_len,
                page_size=page_size, sm_scale=sm_scale, ppcb=ppcb,
                return_lse=True)
            return out, lse

        # Page striping spreads any selected set ~uniformly over shards
        # (page p → shard p % sp), so a shard's share is ~M/sp.  Run the
        # kernel over a 2×-margin slice of the compacted local list — the
        # grid shrinks by ~sp/2 vs the global width — and fall back to the
        # exact full-width path on the (distribution-dependent) overflow.
        m = loc_pos.shape[2]
        sp_static = mesh.shape["sp"]
        cap = min(m, 2 * ((m + sp_static - 1) // sp_static) + 8)
        if cap < m:
            overflow = jnp.any(loc_len > cap)
            out, lse = jax.lax.cond(
                overflow,
                lambda: run(loc_pos),
                lambda: run(loc_pos[:, :, :cap]),
            )
        else:
            out, lse = run(loc_pos)
        # flash-decode LSE merge across shards (reference:
        # CombineSplitKVRes — rescale by exp(lse_i - lse_tot) and sum)
        lse = lse.astype(jnp.float32)
        lse_max = jax.lax.pmax(lse, "sp")
        w = jnp.exp(lse - lse_max)
        denom = jax.lax.psum(w, "sp")
        out = out.astype(jnp.float32) * (w / denom)[..., None]
        return jax.lax.psum(out, "sp").astype(q.dtype)

    return attend
