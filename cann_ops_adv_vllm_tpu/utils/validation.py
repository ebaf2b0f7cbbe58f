"""Input validation for the op chain.

The reference devotes ~845 lines per op to shape/dtype/layout legality
checks with detailed error messages (``*_tiling_check.cc`` — e.g.
incre_flash_attention_tiling_check.cc, CheckPABlockSize / CheckUbSpace in
sparse_paged_fusion_attention_tiling_check.cc:28,672).  These helpers give
the same guarantees at the Python boundary: every public op wrapper can
call them to fail fast with actionable messages instead of tracing into a
Mosaic shape error.
"""

from __future__ import annotations

import jax.numpy as jnp

_FLOAT_DTYPES = ("float32", "bfloat16", "float16")
_INT_KV_DTYPES = ("int8",)


def _fail(op, msg):
    raise ValueError(f"[{op}] {msg}")


def check_rank(op, name, arr, rank):
    if arr.ndim != rank:
        _fail(op, f"{name} must be rank-{rank}, got shape {arr.shape}")


def check_dtype(op, name, arr, allowed):
    if str(arr.dtype) not in allowed:
        _fail(op, f"{name} dtype {arr.dtype} not in {allowed}")


def check_attention_inputs(op, q, kv_pages, block_table, seq_lens, *,
                           page_size, quantized, kv_int4=False):
    check_rank(op, "q", q, 3)
    check_rank(op, "kv_pages", kv_pages, 4)
    check_rank(op, "block_table", block_table, 2)
    check_rank(op, "seq_lens", seq_lens, 1)
    check_dtype(op, "q", q, _FLOAT_DTYPES)
    if quantized:
        check_dtype(op, "kv_pages", kv_pages, _INT_KV_DTYPES)
    else:
        check_dtype(op, "kv_pages", kv_pages, _FLOAT_DTYPES)

    b, h_q, d = q.shape
    h_kv, num_pages, ps, two_d = kv_pages.shape
    if ps != page_size:
        _fail(op, f"kv_pages page dim {ps} != page_size {page_size} "
                  "(fused records are [H_kv, P, page_size, 2*D])")
    if kv_int4:
        if not quantized:
            _fail(op, "kv_int4 requires kv_scales (int4 KV is always "
                      "quantized)")
        if two_d != d:
            _fail(op, f"int4 kv_pages last dim {two_d} != head_dim {d} "
                      "(nibble-packed K|V records; see "
                      "ops.quant.pack_int4_fused)")
    elif two_d != 2 * d:
        _fail(op, f"kv_pages last dim {two_d} != 2*head_dim {2*d} "
                  "(lane-interleaved K|V records; see fuse_kv)")
    if h_q % h_kv:
        _fail(op, f"num q heads {h_q} not a multiple of kv heads {h_kv}")
    if seq_lens.shape[0] > block_table.shape[0]:
        _fail(op, f"batch {seq_lens.shape[0]} exceeds block_table rows "
                  f"{block_table.shape[0]}")
    if page_size % 8:
        _fail(op, f"page_size {page_size} must be a multiple of the TPU "
                  "sublane tile (8)")
    if d % 128:
        _fail(op, f"head_dim {d} must be a multiple of the 128-lane tile")
    for name, arr in (("block_table", block_table), ("seq_lens", seq_lens)):
        if not jnp.issubdtype(arr.dtype, jnp.integer):
            _fail(op, f"{name} must be integer, got {arr.dtype}")


def check_selection_inputs(op, q, l1_cent, block_ids, block_table, seq_len,
                           *, k):
    check_rank(op, "q", q, 3)
    check_rank(op, "l1_cent", l1_cent, 3)
    check_rank(op, "block_ids", block_ids, 2)
    check_rank(op, "block_table", block_table, 2)
    check_rank(op, "seq_len", seq_len, 1)
    b, h_q, d = q.shape
    h_kv, c, d2 = l1_cent.shape
    if d != d2:
        _fail(op, f"q head_dim {d} != centroid dim {d2}")
    if h_q % h_kv:
        _fail(op, f"num q heads {h_q} not a multiple of kv heads {h_kv}")
    if block_ids.shape[0] != h_kv:
        _fail(op, f"block_ids heads {block_ids.shape[0]} != {h_kv}")
    if k > c:
        _fail(op, f"top-k {k} exceeds number of centroids {c}")
    if seq_len.shape[0] > block_table.shape[0]:
        _fail(op, f"batch {seq_len.shape[0]} exceeds block_table rows "
                  f"{block_table.shape[0]}")
