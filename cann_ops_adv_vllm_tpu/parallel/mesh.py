"""Device-mesh construction and sharding specs.

The reference is single-chip (SURVEY.md §2.4: no HCCL/NCCL/MPI anywhere in
src/); every multi-chip strategy here is new, idiomatic-JAX work:

* **tp** — tensor parallelism over attention heads.  The whole op chain is
  per-KV-head (centroid codebooks, block_ids, KV pages, the kernel grid),
  so sharding ``H_kv`` gives zero-communication attention; only the output
  projection and MLP reductions need a ``psum`` over ICI.
* **dp** — data parallelism over the batch (each replica owns its page
  pool and block tables).
* **sp** — sequence parallelism: the physical page pool is striped across
  chips (page p lives on shard p % sp); each shard attends the selected
  pages it owns and partial (out, LSE) results are merged with the
  flash-decode log-sum-exp combine — the cross-chip generalization of the
  reference's intra-chip splitKV (tiling_check.cc:680-702, split header
  :2229-2323).
* **ep** — expert parallelism for MoE models (models.deepseek): the expert
  weight tables shard on the expert axis; every shard evaluates the
  routed experts it owns and contributions combine with one ``psum``.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(dp: int = 1, tp: int = 1, sp: int = 1, ep: int = 1,
              devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    need = dp * tp * sp * ep
    if len(devices) < need:
        raise ValueError(f"need {need} devices, have {len(devices)}")
    arr = np.asarray(devices[:need]).reshape(dp, tp, sp, ep)
    return Mesh(arr, axis_names=("dp", "tp", "sp", "ep"))


_WEIGHT_KEYS = ("wq", "wk", "wv", "wo", "w_gate", "w_up", "w_down",
                "lm_head")


def _qspec(spec: P):
    """Spec pair for a weight-only-int8 dict {"q", "s"}: the int8 matrix
    keeps the weight's spec; the per-output-channel scale follows the
    OUT axis (the weight's last axis)."""
    return {"q": spec, "s": P(*spec[:-2], spec[-1])}


def param_specs(num_layers: int, sparse: bool, stacked: bool = False,
                quantized: bool = False) -> dict:
    """PartitionSpecs for the Llama parameter pytree (TP over heads).

    ``stacked=True`` returns specs for the scan-over-layers form
    (models.llama.stack_layer_params): one dict of [L, ...] arrays, every
    layer spec gaining a leading replicated axis.  ``quantized=True``
    expands each projection spec to the {"q", "s"} pair of
    models.llama.quantize_params.
    """
    layer = {
        "wq": P(None, "tp"),       # columns = heads
        "wk": P(None, "tp"),
        "wv": P(None, "tp"),
        "wo": P("tp", None),       # rows = heads → psum after
        "w_gate": P(None, "tp"),
        "w_up": P(None, "tp"),
        "w_down": P("tp", None),
        "ln_attn": P(None),
        "ln_mlp": P(None),
    }
    if sparse:
        layer["l1_cent"] = P("tp", None, None)   # per-KV-head codebooks
    if stacked:
        layer = {k: P(None, *s) for k, s in layer.items()}
    if quantized:
        layer = {k: (_qspec(s) if k in _WEIGHT_KEYS else s)
                 for k, s in layer.items()}
    layers = layer if stacked else [dict(layer)
                                    for _ in range(num_layers)]
    lm_head = P(None, None)
    return {
        "embed": P(None, None),
        "layers": layers,
        "ln_f": P(None),
        "lm_head": _qspec(lm_head) if quantized else lm_head,
    }


_DS_WEIGHT_KEYS = ("wq", "w_dq", "w_uq", "w_dkv", "wo",
                   "w_gate", "w_up", "w_down", "lm_head")


def deepseek_param_specs(cfg, num_layers: int, stacked: bool = False,
                         quantized: bool = False) -> dict:
    """PartitionSpecs for the DeepSeek parameter pytree.

    MLA tensor parallelism shards the QUERY heads over ``tp`` (wq/w_uq
    columns, w_uk/w_uv head axis, wo rows → psum) while the shared latent
    stream (w_dkv, kv_ln, the record-space codebook, the latent cache)
    replicates over tp — the latent row is identical on every shard, so
    attention needs no collective beyond the o-proj psum.  MoE expert
    tables shard over ``ep`` (models.deepseek._moe ep_axis); router and
    shared experts replicate.
    """
    layer = {
        "w_dkv": P(None, None),
        "kv_ln": P(None),
        "w_uk": P("tp", None, None),
        "w_uv": P("tp", None, None),
        "wo": P("tp", None),       # rows = heads → psum after
        "ln_attn": P(None),
        "ln_mlp": P(None),
    }
    if cfg.q_lora_rank:
        layer["w_dq"] = P(None, None)
        layer["q_ln"] = P(None)
        layer["w_uq"] = P(None, "tp")
    else:
        layer["wq"] = P(None, "tp")
    if cfg.num_centroids:
        layer["l1_cent"] = P(None, None, None)   # record-space, shared
    if cfg.num_experts:
        expert = P("ep", None, None)
        layer.update({"router": P(None, None), "e_gate": expert,
                      "e_up": expert, "e_down": expert})
        if cfg.n_shared_experts:
            layer.update({"s_gate": P(None, None), "s_up": P(None, None),
                          "s_down": P(None, None)})
    else:
        layer.update({"w_gate": P(None, "tp"), "w_up": P(None, "tp"),
                      "w_down": P("tp", None)})
    if stacked:
        layer = {k: P(None, *s) for k, s in layer.items()}
    if quantized:
        layer = {k: (_qspec(s) if k in _DS_WEIGHT_KEYS else s)
                 for k, s in layer.items()}
    layers = layer if stacked else [dict(layer)
                                    for _ in range(num_layers)]
    lm_head = P(None, None)
    return {
        "embed": P(None, None),
        "layers": layers,
        "ln_f": P(None),
        "lm_head": _qspec(lm_head) if quantized else lm_head,
    }


def latent_cache_spec() -> P:
    """DeepSeek latent cache [L, 1, P, ps, W]: the shared-stream head axis
    cannot shard; the page pool shards over (sp, dp) exactly as the Llama
    pool (each dp replica owns a private contiguous slice with local
    block-table ids), and every tp shard holds a full replica of the
    (small) latent pages — each writes identical rows."""
    return P(None, None, ("sp", "dp"), None, None)


def kv_cache_spec() -> P:
    """[L, H_kv, P, ps, 2D]: heads over tp, page pool over (sp, dp).

    dp shards the pool in contiguous blocks: replica d owns pages
    [d·P/dp, (d+1)·P/dp) and its (dp-sharded) block-table rows hold LOCAL
    page ids into that slice — each data-parallel replica has its own
    private page pool, as a replicated serving deployment would.
    """
    return P(None, "tp", ("sp", "dp"), None, None)


def ts_spec() -> P:
    """Per-token scale pages [L, H_kv, 4, P, ps] (scales-row axis before
    the page axis — see models.llama.init_kv_cache): pool on axis 3."""
    return P(None, "tp", None, ("sp", "dp"), None)


def cache_specs(int8: bool):
    """PartitionSpec pytree matching the cache pytree: the int8 cache is
    a {"kv", "ts"} dict whose leaves shard the pool on different axes."""
    if int8:
        return {"kv": kv_cache_spec(), "ts": ts_spec()}
    return kv_cache_spec()


def shard_params(params, mesh: Mesh, sparse: bool):
    specs = param_specs(len(params["layers"]), sparse)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        params, specs,
        is_leaf=lambda x: not isinstance(x, (dict, list)))


def shard_params_global(params, mesh: Mesh, sparse: bool):
    """Process-portable params sharder.

    Unlike :func:`shard_params` (single-controller ``device_put``), this
    builds global arrays from per-process data with
    ``jax.make_array_from_process_local_data`` — every process holds the
    SAME host params (replicated model), so each feeds the full array and
    the result is a valid global array on a multi-process (DCN) mesh as
    well as on a single-controller virtual mesh.
    """
    stacked_tree = not isinstance(params["layers"], list)
    first = (params["layers"] if stacked_tree else params["layers"][0])
    quantized = isinstance(first["wq"], dict)
    wq = first["wq"]["q"] if quantized else first["wq"]
    num_layers = wq.shape[0] if stacked_tree else len(params["layers"])
    specs = param_specs(num_layers, sparse, stacked=stacked_tree,
                        quantized=quantized)
    return jax.tree.map(
        lambda x, s: jax.make_array_from_process_local_data(
            NamedSharding(mesh, s), np.asarray(x)),
        params, specs,
        is_leaf=lambda x: not isinstance(x, (dict, list)))
