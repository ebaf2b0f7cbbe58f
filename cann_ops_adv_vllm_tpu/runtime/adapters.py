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
from jax.sharding import PartitionSpec as P

from ..models import deepseek, llama


def _first_layer(params):
    layers = params["layers"]
    return layers[0] if isinstance(layers, list) else layers


def _stacked_num_layers(params):
    if isinstance(params["layers"], list):
        return len(params["layers"])
    return jax.tree.leaves(params["layers"])[0].shape[0]


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

    def copy_page(self, cache, src, dst):
        """Copy physical page ``src`` → ``dst`` across all layers/heads
        (the device half of the allocator's copy-on-write: a forked
        sequence's shared partial last page is duplicated before its
        first write).  An out-of-range ``dst`` drops the write — the
        sharded engine uses that to no-op replicas with nothing to COW
        this tick."""
        if isinstance(cache, dict):
            return {
                "kv": cache["kv"].at[:, :, dst].set(
                    cache["kv"][:, :, jnp.clip(src, 0, None)],
                    mode="drop"),
                "ts": cache["ts"].at[:, :, :, dst].set(
                    cache["ts"][:, :, :, jnp.clip(src, 0, None)],
                    mode="drop"),
            }
        return cache.at[:, :, dst].set(
            cache[:, :, jnp.clip(src, 0, None)], mode="drop")

    # -- mesh-sharded serving hooks (ShardedDecodeEngine) --------------------

    def is_quantized(self, params):
        return isinstance(_first_layer(params)["wq"], dict)

    def param_specs(self, params):
        from ..parallel.mesh import param_specs
        return param_specs(
            _stacked_num_layers(params),
            sparse=bool(self.cfg.num_centroids),
            stacked=not isinstance(params["layers"], list),
            quantized=self.is_quantized(params))

    def cache_spec(self):
        from ..parallel.mesh import cache_specs
        return cache_specs(self.cfg.kv_cache_dtype == "int8")

    def block_ids_spec(self):
        return P(None, "tp", "dp")

    def cents_spec(self):
        return P(None, "tp", None, None)

    def make_tp_decode_fn(self, mesh, scan_layers, quantized_weights):
        from ..parallel.sharded import tp_decode_step
        return tp_decode_step(self.cfg, mesh, scan_layers=scan_layers,
                              quantized_weights=quantized_weights)

    def make_tp_prefill_fn(self, mesh, scan_layers, quantized_weights):
        from ..parallel.sharded import tp_prefill_step
        return tp_prefill_step(self.cfg, mesh, scan_layers=scan_layers,
                               quantized_weights=quantized_weights)


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
        if scan_layers and isinstance(params["layers"], list):
            return deepseek.stack_layer_params(params)
        return params

    def init_cache(self, num_pages):
        return deepseek.init_latent_cache(self.cfg, num_pages)

    def make_decode_fn(self, scan_layers):
        return deepseek.make_decode_fn(self.cfg, scan_layers=scan_layers)

    def make_prefill_fn(self, scan_layers):
        return deepseek.make_prefill_fn(self.cfg, scan_layers=scan_layers)

    def extract_cents(self, params):
        layers = params["layers"]
        if isinstance(layers, list) and "l1_cent" in layers[0]:
            return jnp.stack([lp["l1_cent"] for lp in layers])
        if isinstance(layers, dict) and "l1_cent" in layers:
            return layers["l1_cent"]            # already [L, 1, C, W]
        return None

    def assign_block_ids(self, cache, cents):
        # latent pages assigned by mean record row vs the record-space
        # codebook — assign_pages with d = record_width reads the whole
        # row as "K"
        from ..ops.clustering import assign_pages
        return jax.vmap(assign_pages)(cache, cents)

    def copy_page(self, cache, src, dst):
        """Latent-cache page copy (see LlamaAdapter.copy_page)."""
        return cache.at[:, :, dst].set(
            cache[:, :, jnp.clip(src, 0, None)], mode="drop")

    # -- mesh-sharded serving hooks (ShardedDecodeEngine) --------------------

    def is_quantized(self, params):
        return isinstance(_first_layer(params)["w_dkv"], dict)

    def param_specs(self, params):
        from ..parallel.mesh import deepseek_param_specs
        return deepseek_param_specs(
            self.cfg, _stacked_num_layers(params),
            stacked=not isinstance(params["layers"], list),
            quantized=self.is_quantized(params))

    def cache_spec(self):
        from ..parallel.mesh import latent_cache_spec
        return latent_cache_spec()

    def block_ids_spec(self):
        return P(None, None, "dp")

    def cents_spec(self):
        return P(None, None, None, None)      # record-space, replicated

    def make_tp_decode_fn(self, mesh, scan_layers, quantized_weights):
        from ..parallel.sharded import tp_decode_step_deepseek
        return tp_decode_step_deepseek(
            self.cfg, mesh, scan_layers=scan_layers,
            quantized_weights=quantized_weights)

    def make_tp_prefill_fn(self, mesh, scan_layers, quantized_weights):
        from ..parallel.sharded import tp_prefill_step_deepseek
        return tp_prefill_step_deepseek(
            self.cfg, mesh, scan_layers=scan_layers,
            quantized_weights=quantized_weights)
