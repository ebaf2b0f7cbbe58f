"""KV-cache quantization (INT8 / INT4) — antiquant scale/offset convention.

The reference supports int8/int4 KV via per-channel / per-token /
per-channel-token "antiquant" parameters and emulates fp16×int8 matmuls on
the Ascend cube unit with the MSD residual-digit expansion
(incre_flash_attention_split_Bbn2s2_Us2.h:1752-1868).  On TPU the MXU
consumes bf16/f32 natively, so quantization here is purely a **bandwidth**
optimization: int8 pages halve (int4: quarter) the page-DMA bytes and are
dequantized in VMEM right before the matmul.

Dequant convention matches the reference aclnn API:
    x = x_q * antiquant_scale + antiquant_offset

INT4 values are stored packed two-per-int8 (lo nibble = even token row).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("mode", "bits"))
def quantize_kv(kv, mode="per_channel", bits=8):
    """Quantize a KV page array.

    Args:
      kv:   [H_kv, P, rows, D] float pages (rows = page_size, or
            2*page_size for fused records).
      mode: "per_channel" → scale/offset [H_kv, D];
            "per_token"   → scale/offset [H_kv, P, rows] (one per cached row).
      bits: 8 or 4 (4 returns values in int8 range [-8, 7], unpacked).

    Returns (kv_q int8, scale fp32, offset fp32).
    """
    kv = kv.astype(jnp.float32)
    qmax = 2 ** (bits - 1) - 1
    if mode == "per_channel":
        axes = (1, 2)
    elif mode == "per_token":
        axes = (3,)
    else:
        raise ValueError(mode)
    hi = jnp.max(kv, axis=axes, keepdims=True)
    lo = jnp.min(kv, axis=axes, keepdims=True)
    offset = (hi + lo) / 2.0
    scale = jnp.maximum((hi - lo) / (2.0 * qmax), 1e-8)
    kv_q = jnp.clip(jnp.round((kv - offset) / scale), -qmax - 1, qmax)
    return (kv_q.astype(jnp.int8),
            jnp.squeeze(scale, axes).astype(jnp.float32),
            jnp.squeeze(offset, axes).astype(jnp.float32))


@jax.jit
def dequantize_kv(kv_q, scale, offset):
    """Inverse of :func:`quantize_kv` (per-channel [H_kv, D] params)."""
    return (kv_q.astype(jnp.float32)
            * scale[:, None, None, :] + offset[:, None, None, :])


@jax.jit
def pack_int4(values):
    """Pack int4 values (int8 storage, range [-8,7]) two-per-byte along the
    second-to-last axis.  [..., rows, D] → [..., rows//2, D] int8."""
    lo = values[..., 0::2, :] & 0xF
    hi = values[..., 1::2, :] & 0xF
    return (lo | (hi << 4)).astype(jnp.int8)


@jax.jit
def unpack_int4(packed):
    """[..., rows//2, D] int8 → [..., rows, D] int8 in [-8, 7]."""
    lo = (packed << 4).astype(jnp.int8) >> 4      # sign-extend low nibble
    hi = packed >> 4                               # arithmetic shift
    out = jnp.stack([lo, hi], axis=-2)             # [..., rows//2, 2, D]
    shape = packed.shape[:-2] + (packed.shape[-2] * 2, packed.shape[-1])
    return out.reshape(shape)
