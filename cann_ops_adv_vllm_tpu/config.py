"""Configuration for the TPU sparse-attention decode engine.

The reference (yueliang13/cann-ops-adv-vllm) hard-codes a number of magic
constants across its tiling and kernel code; here they are first-class,
documented configuration.  Reference citations (paths relative to the
reference repo):

* ``PAGE_SIZE = 128``           — select_position.cpp:7 (``PAGESIZE``).
* ``MAX_PAGE_NUM = 256``        — extension/csrc/add_custom.cpp:958,987
  (``block_position`` padded to 256 page slots per (batch, head)).
* ``TPL_PAD = 8``               — page_position_length padded to 8 int32
  per (batch, head) (FlashAttentionKernelNpuOpApi.cpp:1906-1921).
* ``TOPK_STANDALONE = 64``      — cent_select_tiling.cpp:58 (standalone
  CentSelect / ComputeCent top-k clusters).
* ``TOPK_FUSED = 512``          — sparse_paged_fusion_attention_tiling.cc:1603
  (fused kernel top-k clusters).
* ``INT32_SENTINEL``            — 0x7FFFFFFF padding for unselected page
  slots (cent_select.cpp:406; sparse split header :293).
* workload cap ``page_len // 8``— cent_select.cpp:218,410-414
  (``workLoadThreshold``): the number of attended pages is clamped to
  1/8 of the sequence's logical pages.
* sink + recent forcing         — cent_select.cpp:350-362: pages whose
  physical id equals block_table[b,0], block_table[b,page_len-2] or
  block_table[b,page_len-1] are always attended.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

# --- Reference magic constants, now named ----------------------------------
PAGE_SIZE = 128
MAX_PAGE_NUM = 256
TPL_PAD = 8
TOPK_STANDALONE = 64
TOPK_FUSED = 512
INT32_SENTINEL = 2**31 - 1  # 0x7FFFFFFF

# Mask value used instead of -inf to avoid NaN from exp(-inf - (-inf)).
MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)


@dataclasses.dataclass(frozen=True)
class SparseConfig:
    """Configuration of the centroid-sparse attention op chain.

    Mirrors the knobs the reference exposes as op attributes
    (incre_flash_attention_def.cpp:288-293) plus its hard-coded constants.
    """

    page_size: int = PAGE_SIZE
    #: padded number of selected-page slots per (batch, head)
    max_page_num: int = MAX_PAGE_NUM
    #: top-k clusters taken from the centroid similarity scores
    top_k_clusters: int = TOPK_STANDALONE
    #: attended pages clamped to ``page_len // workload_cap_ratio``
    #: (reference: 8 → 1/8 sparsity).  ``0`` disables the cap.
    workload_cap_ratio: int = 8
    #: force-include the sink page (first logical page) and the two most
    #: recent logical pages (reference: cent_select.cpp:350-362)
    force_sink_and_recent: bool = True
    #: selection granularity for the attention path:
    #:   "per_qhead"  — one position list per query head (reference layout)
    #:   "kv_group"   — one position list per KV head; the group's query
    #:                  rows are summed before the centroid matmul so all
    #:                  G query heads in a GQA group share one page set
    #:                  (the only layout a single fused KV gather can
    #:                  honour; the reference implicitly does this by
    #:                  reading only the first ``num_kv_heads`` rows of
    #:                  its per-q-head buffer, split header :258).
    group_mode: str = "kv_group"

    def workload_cap(self, page_len: int) -> int:
        if self.workload_cap_ratio <= 0:
            return page_len
        return max(page_len // self.workload_cap_ratio, 1)


@dataclasses.dataclass(frozen=True)
class KVCacheConfig:
    """Paged KV cache layout.

    TPU-native layout is ``[num_kv_heads, num_pages, page_size, head_dim]``
    (kv-head major) so a page fetch is one contiguous DMA; the reference's
    vLLM layout ``[num_pages, page_size, num_kv_heads, head_dim]``
    (fused_ifa_v5_torch_case.py:49) strides across heads per page.
    """

    num_pages: int
    page_size: int = PAGE_SIZE
    num_kv_heads: int = 8
    head_dim: int = 128
    dtype: str = "bfloat16"  # "bfloat16" | "float16" | "int8" | "int4"
    #: quantization granularity for int8/int4 KV:
    #:   "per_channel" — one (scale, offset) per (kv_head, head_dim)
    #:   "per_token"   — one (scale, offset) per cached token
    quant_mode: str = "per_channel"

    @property
    def kv_shape(self):
        return (self.num_kv_heads, self.num_pages, self.page_size, self.head_dim)
