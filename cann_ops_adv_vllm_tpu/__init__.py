"""cann_ops_adv_vllm_tpu — TPU-native sparse-attention decode engine.

A from-scratch JAX/XLA/Pallas framework with the capabilities of the Ascend
CANN operator library ``yueliang13/cann-ops-adv-vllm``: centroid-codebook
top-k cluster selection, device-side resolution of clusters to KV-cache page
positions, and flash-decoding paged attention over only the selected pages,
with INT8/INT4 KV-cache dequantization, GQA, fused single-launch selection +
attention, and mesh-level sharding for multi-chip TPU pods.

Layout:
  ref/       pure-NumPy golden oracles (the semantic contract)
  ops/       XLA + Pallas device ops (the compute path)
  models/    Llama-class GQA decode models built on the ops
  parallel/  mesh construction and shard_map wrappers
  runtime/   paged KV allocator, continuous-batching scheduler, engine
  utils/     shared helpers
"""

from .config import (
    INT32_SENTINEL,
    MAX_PAGE_NUM,
    PAGE_SIZE,
    TOPK_FUSED,
    TOPK_STANDALONE,
    TPL_PAD,
    KVCacheConfig,
    SparseConfig,
)

__version__ = "0.1.0"
