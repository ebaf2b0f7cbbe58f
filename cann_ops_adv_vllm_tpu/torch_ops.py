"""First-class torch dispatcher registration of the op surface.

The reference registers its kernels as real torch ops — op-plugin YAML
schemas (op_plugin_functions.yaml:6962) and ``TORCH_LIBRARY(myops, …)``
(extension/csrc/registration.cpp:43-79) — so vLLM/torch.compile graphs
*capture* them instead of graph-breaking on an opaque Python call.  This
module is the TPU analog: each op is a ``torch.library.custom_op`` under
the ``cann_ops_adv_vllm_tpu::`` namespace with a fake (meta) kernel, so

    torch.ops.cann_ops_adv_vllm_tpu.sparse_paged_fusion_attention(...)

traces cleanly under ``torch.compile`` / FX while the real implementation
crosses into JAX through :mod:`.torch_bridge` (dlpack both ways).

The registered schemas are the serving-path core (BNSD/BSH queries,
native fused-record KV pools, optional int8 antiquant scales); the full
feature matrix — tensor-list KV, shared prefix, ALiBi, post-quant out —
stays on the richer Python function surface (:mod:`.torch_bridge`),
exactly as the reference splits YAML-registered ops vs its python
``custom_ops`` wrappers.

Import this module for its registration side effect::

    from cann_ops_adv_vllm_tpu import torch_ops  # noqa: F401
    out, pos, max_len = torch.ops.cann_ops_adv_vllm_tpu.\
        sparse_paged_fusion_attention(q, kv, bt, cent, bids, seq, 32, 8)
"""

from __future__ import annotations

from typing import Optional

try:
    import torch
    from torch.library import custom_op, register_fake
except ImportError:                                  # pragma: no cover
    torch = None

if torch is not None:
    from . import torch_bridge
    from .config import MAX_PAGE_NUM, PAGE_SIZE, TOPK_FUSED, TPL_PAD

    _NS = "cann_ops_adv_vllm_tpu"

    # -- compute_cent --------------------------------------------------------

    @custom_op(f"{_NS}::compute_cent", mutates_args=())
    def compute_cent(query: torch.Tensor, l1_cent: torch.Tensor,
                     k: int) -> torch.Tensor:
        """indices[B, N1, k] = TopK_k(query · l1_centᵀ) (compute_cent.cpp)."""
        return torch_bridge.compute_cent(query, l1_cent, k=k)

    @register_fake(f"{_NS}::compute_cent")
    def _(query, l1_cent, k):
        b, n1 = query.shape[0], query.shape[1]
        return query.new_empty((b, n1, k), dtype=torch.int32)

    # -- cent_select ---------------------------------------------------------

    @custom_op(f"{_NS}::cent_select", mutates_args=())
    def cent_select(
        query: torch.Tensor, l1_cent: torch.Tensor,
        block_ids: torch.Tensor, block_table: torch.Tensor,
        seq_len: torch.Tensor, k: int = 64,
        block_size: int = PAGE_SIZE, max_page_num: int = MAX_PAGE_NUM,
        workload_cap_ratio: int = 8, group_mode: str = "per_qhead",
    ) -> tuple[torch.Tensor, torch.Tensor, torch.Tensor]:
        """Fused ComputeCent + SelectPosition (cent_select.cpp:101-161)."""
        return torch_bridge.cent_select(
            query, l1_cent, block_ids, block_table, seq_len, k=k,
            block_size=block_size, max_page_num=max_page_num,
            workload_cap_ratio=workload_cap_ratio, group_mode=group_mode)

    @register_fake(f"{_NS}::cent_select")
    def _(query, l1_cent, block_ids, block_table, seq_len, k=64,
          block_size=PAGE_SIZE, max_page_num=MAX_PAGE_NUM,
          workload_cap_ratio=8, group_mode="per_qhead"):
        b = query.shape[0]
        h_sel = query.shape[1] if group_mode == "per_qhead" \
            else l1_cent.shape[0]
        pos = query.new_empty((b, h_sel, max_page_num), dtype=torch.int32)
        lens = query.new_empty((b, h_sel, TPL_PAD), dtype=torch.int32)
        max_len = query.new_empty((b, TPL_PAD), dtype=torch.int64)
        return pos, lens, max_len

    # -- incre_flash_attention (dense IFA) -----------------------------------

    @custom_op(f"{_NS}::incre_flash_attention", mutates_args=())
    def incre_flash_attention(
        query: torch.Tensor, kv_pages: torch.Tensor,
        block_table: torch.Tensor, actual_seq_lengths: torch.Tensor,
        num_heads: int, num_key_value_heads: int,
        scale_value: Optional[float] = None,
        block_size: int = PAGE_SIZE, input_layout: str = "BNSD",
        antiquant_scale: Optional[torch.Tensor] = None,
        antiquant_offset: Optional[torch.Tensor] = None,
    ) -> torch.Tensor:
        """Dense paged decode attention (aclnnIncreFlashAttentionV5)."""
        return torch_bridge.incre_flash_attention(
            query, kv_pages, block_table=block_table,
            actual_seq_lengths=actual_seq_lengths, num_heads=num_heads,
            num_key_value_heads=num_key_value_heads,
            scale_value=scale_value, block_size=block_size,
            input_layout=input_layout, antiquant_scale=antiquant_scale,
            antiquant_offset=antiquant_offset)

    @register_fake(f"{_NS}::incre_flash_attention")
    def _(query, kv_pages, block_table, actual_seq_lengths, num_heads,
          num_key_value_heads, scale_value=None, block_size=PAGE_SIZE,
          input_layout="BNSD", antiquant_scale=None, antiquant_offset=None):
        return torch.empty_like(query)

    # -- sparse_paged_attention ----------------------------------------------

    @custom_op(f"{_NS}::sparse_paged_attention", mutates_args=())
    def sparse_paged_attention(
        query: torch.Tensor, kv_pages: torch.Tensor,
        block_table: torch.Tensor, block_position: torch.Tensor,
        page_position_length: torch.Tensor,
        actual_seq_lengths: torch.Tensor,
        num_heads: int, num_key_value_heads: int,
        scale_value: Optional[float] = None,
        block_size: int = PAGE_SIZE, input_layout: str = "BNSD",
        antiquant_scale: Optional[torch.Tensor] = None,
        antiquant_offset: Optional[torch.Tensor] = None,
    ) -> torch.Tensor:
        """IFA over selected pages (sparse_paged_attention.cpp:135)."""
        return torch_bridge.sparse_paged_attention(
            query, kv_pages, block_table=block_table,
            block_position=block_position,
            page_position_length=page_position_length,
            actual_seq_lengths=actual_seq_lengths, num_heads=num_heads,
            num_key_value_heads=num_key_value_heads,
            scale_value=scale_value, block_size=block_size,
            input_layout=input_layout, antiquant_scale=antiquant_scale,
            antiquant_offset=antiquant_offset)

    @register_fake(f"{_NS}::sparse_paged_attention")
    def _(query, kv_pages, block_table, block_position,
          page_position_length, actual_seq_lengths, num_heads,
          num_key_value_heads, scale_value=None, block_size=PAGE_SIZE,
          input_layout="BNSD", antiquant_scale=None, antiquant_offset=None):
        return torch.empty_like(query)

    # -- sparse_paged_fusion_attention (flagship) ----------------------------

    @custom_op(f"{_NS}::sparse_paged_fusion_attention", mutates_args=())
    def sparse_paged_fusion_attention(
        query: torch.Tensor, kv_pages: torch.Tensor,
        block_table: torch.Tensor, l1_cent: torch.Tensor,
        block_ids: torch.Tensor, total_seq_len: torch.Tensor,
        num_heads: int, num_key_value_heads: int,
        scale_value: Optional[float] = None,
        block_size: int = PAGE_SIZE, input_layout: str = "BNSD",
        k: int = TOPK_FUSED, max_page_num: int = MAX_PAGE_NUM,
        workload_cap_ratio: int = 8,
        antiquant_scale: Optional[torch.Tensor] = None,
        antiquant_offset: Optional[torch.Tensor] = None,
    ) -> tuple[torch.Tensor, torch.Tensor, torch.Tensor]:
        """One-launch selection + sparse attention
        (npu_sparse_paged_fusion_attention,
        FlashAttentionKernelNpuOpApi.cpp:1873-1934)."""
        return torch_bridge.sparse_paged_fusion_attention(
            query, kv_pages, block_table=block_table, l1_cent=l1_cent,
            block_ids=block_ids, total_seq_len=total_seq_len,
            num_heads=num_heads, num_key_value_heads=num_key_value_heads,
            scale_value=scale_value, block_size=block_size,
            input_layout=input_layout, k=k, max_page_num=max_page_num,
            workload_cap_ratio=workload_cap_ratio,
            antiquant_scale=antiquant_scale,
            antiquant_offset=antiquant_offset)

    @register_fake(f"{_NS}::sparse_paged_fusion_attention")
    def _(query, kv_pages, block_table, l1_cent, block_ids, total_seq_len,
          num_heads, num_key_value_heads, scale_value=None,
          block_size=PAGE_SIZE, input_layout="BNSD", k=TOPK_FUSED,
          max_page_num=MAX_PAGE_NUM, workload_cap_ratio=8,
          antiquant_scale=None, antiquant_offset=None):
        b = total_seq_len.shape[0]
        h_sel = l1_cent.shape[0]        # kv_group rows (ops/fused.py)
        out = torch.empty_like(query)
        pos = query.new_empty((b, h_sel, max_page_num), dtype=torch.int32)
        max_len = query.new_empty((b, TPL_PAD), dtype=torch.int64)
        return out, pos, max_len
