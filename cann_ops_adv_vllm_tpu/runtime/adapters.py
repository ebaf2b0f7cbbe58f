"""Model adapters: bind a model family to the serving engine.

The engine's scheduler (admission, paged allocation, chunked prefill,
continuous batching) is model-agnostic; everything model-specific — cache
layout, the jitted decode/prefill step functions, centroid machinery —
lives behind this small interface.  The reference's analog is vLLM's
model-runner registry above the kernel library (reference README.md);
here it is a plain object because the steps are pure functions.

Contract (all hooks used by runtime.engine.DecodeEngine):
  * ``init_cache(num_pages)`` — paged cache pytree.
  * ``make_decode_fn(scan_layers)`` — jitted
    ``(params, tokens [B], cache, block_table, seq_lens, block_ids) ->
    (logits [B, V], cache)``; ``block_ids`` may be None.
  * ``make_prefill_fn(scan_layers)`` — jitted chunk step
    ``(params, tokens [B, T], cache, block_table, start_pos, valid_lens)``
    or None (engine falls back to token-at-a-time prefill).
  * ``prepare_params(params, scan_layers)`` — e.g. stack for lax.scan.
  * ``extract_cents(params)`` — stacked centroid codebooks or None.
  * ``assign_block_ids(cache, cents)`` — page → cluster id refresh.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..models import deepseek, llama


class LlamaAdapter:
    """Llama/Qwen/Mistral-family binding (GQA + fused-record paged KV)."""

    def __init__(self, cfg: llama.LlamaConfig):
        self.cfg = cfg

    def prepare_params(self, params, scan_layers):
        # accept already-stacked params (callers stack ahead of time to
        # avoid holding two full weight copies at once)
        if scan_layers and isinstance(params["layers"], list):
            return llama.stack_layer_params(params)
        return params

    def init_cache(self, num_pages):
        return llama.init_kv_cache(self.cfg, num_pages)

    def make_decode_fn(self, scan_layers):
        return llama.make_decode_fn(self.cfg, scan_layers=scan_layers)

    def make_prefill_fn(self, scan_layers):
        return llama.make_prefill_fn(self.cfg, scan_layers=scan_layers)

    def extract_cents(self, params):
        layers = params["layers"]
        if isinstance(layers, list) and "l1_cent" in layers[0]:
            return jnp.stack([lp["l1_cent"] for lp in layers])
        if isinstance(layers, dict) and "l1_cent" in layers:
            return layers["l1_cent"]            # already [L, H, C, D]
        return None

    def assign_block_ids(self, kv_cache, cents):
        from ..ops.clustering import assign_pages, assign_pages_quantized
        if isinstance(kv_cache, dict):
            return jax.vmap(assign_pages_quantized)(
                kv_cache["kv"], kv_cache["ts"], cents)
        return jax.vmap(assign_pages)(kv_cache, cents)


class DeepSeekAdapter:
    """DeepSeek-family binding (MLA shared-latent cache + MoE).

    The latent stream is h_kv = 1, so the cache is
    [L, 1, P, ps, record_width] and the slab kernel's shared-row fast
    path applies to every decode step (ops.mla) — including the
    centroid-sparse path (``cfg.num_centroids``): one codebook per layer
    in record space selects latent pages, one shared position row.
    """

    def __init__(self, cfg: deepseek.DeepSeekConfig):
        self.cfg = cfg

    def prepare_params(self, params, scan_layers):
        if scan_layers:
            raise NotImplementedError(
                "DeepSeek scan-over-layers serving is not wired yet")
        return params

    def init_cache(self, num_pages):
        return deepseek.init_latent_cache(self.cfg, num_pages)

    def make_decode_fn(self, scan_layers):
        del scan_layers
        return deepseek.make_decode_fn(self.cfg)

    def make_prefill_fn(self, scan_layers):
        del scan_layers
        return deepseek.make_prefill_fn(self.cfg)

    def extract_cents(self, params):
        layers = params["layers"]
        if isinstance(layers, list) and "l1_cent" in layers[0]:
            return jnp.stack([lp["l1_cent"] for lp in layers])
        return None

    def assign_block_ids(self, cache, cents):
        # latent pages assigned by mean record row vs the record-space
        # codebook — assign_pages with d = record_width reads the whole
        # row as "K"
        from ..ops.clustering import assign_pages
        return jax.vmap(assign_pages)(cache, cents)
