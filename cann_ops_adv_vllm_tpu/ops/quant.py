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
def pack_int4_fused(kv_q):
    """Pack an int4-quantized fused K|V record into one byte per (row, lane).

    [..., rows, 2*D] int8 values in [-8, 7] → [..., rows, D] int8 with the
    K lane in the **low** nibble and the matching V lane in the **high**
    nibble: ``byte[..., j] = (V[..., D+j] << 4) | (K[..., j] & 0xF)``.

    This layout is chosen for the TPU kernel: unpacking is two integer ops
    per element with **no lane interleave/relayout** (K = sign-extended low
    nibble, V = arithmetic-shift high nibble), and page DMA bytes halve
    again vs int8 (reference int4 KV: incre_flash_attention.cpp:431-438,
    ``int4b_t``).
    """
    d = kv_q.shape[-1] // 2
    k = kv_q[..., :d].astype(jnp.int32)
    v = kv_q[..., d:].astype(jnp.int32)
    return ((k & 0xF) | (v << 4)).astype(jnp.int8)


@jax.jit
def unpack_int4_fused(packed):
    """Inverse of :func:`pack_int4_fused`: [..., rows, D] int8 →
    [..., rows, 2*D] int8 in [-8, 7] (K lanes first, V lanes after)."""
    x = packed.astype(jnp.int32)
    k = (x & 0xF) - ((x & 0x8) << 1)      # sign-extend low nibble
    v = x >> 4                             # arithmetic shift: high nibble
    return jnp.concatenate([k, v], axis=-1).astype(jnp.int8)


@functools.partial(jax.jit, static_argnames=("mode",))
def quantize_kv_int4(kv, mode="per_channel"):
    """Quantize fused K|V records to packed int4 pages.

    K and V lane halves are quantized independently (the kernel's 4-tuple
    ``kv_scales`` convention).

    Args:
      kv:   [H_kv, P, page_size, 2*D] float fused records.
      mode: "per_channel" or "per_token" (see :func:`quantize_kv`).

    Returns (packed [H_kv, P, page_size, D] int8,
             (k_scale, k_offset, v_scale, v_offset) fp32 —
             [H_kv, D] each for per_channel, [H_kv, P, page_size] each for
             per_token).
    """
    d = kv.shape[-1] // 2
    k_q, k_s, k_o = quantize_kv(kv[..., :d], mode=mode, bits=4)
    v_q, v_s, v_o = quantize_kv(kv[..., d:], mode=mode, bits=4)
    packed = pack_int4_fused(jnp.concatenate([k_q, v_q], axis=-1))
    return packed, (k_s, k_o, v_s, v_o)


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


@jax.jit
def quantize_rows(x):
    """Symmetric per-row int8 quantization for KV-cache writes.

    The runtime int8 KV cache (models.llama ``kv_cache_dtype="int8"``)
    quantizes each written K/V row with its own scale — the reference's
    per-token antiquant mode, computed online so no calibration pass is
    needed (offsets are zero by symmetry).

    x: [..., D] float → (q int8 [..., D], scale fp32 [...]).
    """
    a = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1)
    scale = jnp.maximum(a / 127.0, 1e-8)
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale[..., None]),
                 -127, 127).astype(jnp.int8)
    return q, scale


def quantize_weight(w):
    """Weight-only int8: per-output-channel symmetric quantization.

    w [in, out] float → (w_q [in, out] int8, scale [out] f32) with
    ``w ≈ w_q * scale``.  The consumer computes
    ``(x @ w_q.astype(x.dtype)) * scale`` — XLA fuses the int8→bf16
    convert into the matmul's operand read, so decode-time weight HBM
    traffic halves (the weight-dominated model step's main lever;
    vLLM's weight-only-quant role — absent in the reference, which
    quantizes only the KV cache).
    """
    w32 = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(w32), axis=0)                 # [out]
    scale = jnp.maximum(amax, 1e-12) / 127.0
    w_q = jnp.clip(jnp.round(w32 / scale[None, :]), -127, 127
                   ).astype(jnp.int8)
    return w_q, scale
