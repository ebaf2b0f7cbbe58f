"""Profile int8/bf16 × dense/sparse decode paths on the real TPU chip.

Round-2 diagnostic for the BASELINE headline (int8-KV sparse ≥ 2× int8
dense): times the four combinations at the canonical config plus the
fused-step selection/attention split.
"""

import argparse
import functools
import sys
import time
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from cann_ops_adv_vllm_tpu.ops.fused import sparse_paged_fusion_attention
from cann_ops_adv_vllm_tpu.ops.paged_attention import (
    fuse_kv, paged_flash_decode)
from cann_ops_adv_vllm_tpu.ops.quant import quantize_kv, quantize_kv_int4
from cann_ops_adv_vllm_tpu.ops.cent_select import cent_select


def chain_time(step, q, args, n=200):
    @functools.partial(jax.jit, static_argnames=("n",))
    def chain(qq, args, n):
        return jax.lax.fori_loop(0, n, lambda i, acc: step(acc, *args), qq)

    _ = np.asarray(chain(q, args, n))
    t0 = time.time()
    _ = np.asarray(chain(q, args, n))
    return (time.time() - t0) / n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ctx", type=int, default=128 * 1024)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--iters", type=int, default=200)
    args = ap.parse_args()

    B, HKV, G, D, PS, C = args.batch, 8, 4, 128, 128, 512
    HQ = HKV * G
    CTX = args.ctx
    rng = np.random.default_rng(0)
    num_pages = CTX // PS + 16
    max_page = CTX // PS

    q = jnp.asarray(rng.standard_normal((B, HQ, D)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((HKV, num_pages, PS, D)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((HKV, num_pages, PS, D)), jnp.bfloat16)
    kv = jax.jit(fuse_kv)(k, v)
    kv.block_until_ready()
    kv8, sc, off = jax.jit(lambda a: quantize_kv(a, mode="per_channel"))(kv)
    # fused record: K lanes [:D], V lanes [D:] share one scale row pair —
    # split back into the 4-tuple the kernel expects
    k8s = (sc[:, :D], off[:, :D], sc[:, D:], off[:, D:])
    kv8.block_until_ready()
    kv4, k4s = jax.jit(
        lambda a: quantize_kv_int4(a, mode="per_channel"))(kv)
    kv4.block_until_ready()
    del k, v

    bt = jnp.asarray(
        np.stack([rng.permutation(num_pages)[:max_page] for _ in range(B)]),
        jnp.int32)
    seq = jnp.full((B,), CTX, jnp.int32)
    cent = jnp.asarray(rng.standard_normal((HKV, C, D)), jnp.bfloat16)
    block_ids = jnp.asarray(rng.integers(0, C, (HKV, num_pages)), jnp.int32)

    def dense_step(qq, kv, bt, seq):
        o = paged_flash_decode(qq, kv, None, bt, seq)
        return qq + o.astype(qq.dtype) * jnp.bfloat16(1e-6)

    def dense8_step(qq, kv, bt, seq):
        o = paged_flash_decode(qq, kv, None, bt, seq, kv_scales=k8s)
        return qq + o.astype(qq.dtype) * jnp.bfloat16(1e-6)

    def sparse_step(qq, kv, bt, cent, bi, seq):
        o, _, _ = sparse_paged_fusion_attention(qq, kv, bt, cent, bi, seq,
                                                k=512)
        return qq + o.astype(qq.dtype) * jnp.bfloat16(1e-6)

    def sparse8_step(qq, kv, bt, cent, bi, seq):
        o, _, _ = sparse_paged_fusion_attention(qq, kv, bt, cent, bi, seq,
                                                k=512, kv_scales=k8s)
        return qq + o.astype(qq.dtype) * jnp.bfloat16(1e-6)

    def dense4_step(qq, kv, bt, seq):
        o = paged_flash_decode(qq, kv, None, bt, seq, kv_scales=k4s,
                               kv_int4=True)
        return qq + o.astype(qq.dtype) * jnp.bfloat16(1e-6)

    def sparse4_step(qq, kv, bt, cent, bi, seq):
        o, _, _ = sparse_paged_fusion_attention(qq, kv, bt, cent, bi, seq,
                                                k=512, kv_scales=k4s,
                                                kv_int4=True)
        return qq + o.astype(qq.dtype) * jnp.bfloat16(1e-6)

    def select_step(qq, bt, cent, bi, seq):
        p, pl_, ml = cent_select(qq, cent, bi, bt, seq, k=512,
                                 group_mode="kv_group")
        dep = (jnp.sum(p).astype(jnp.float32)
               + jnp.sum(pl_).astype(jnp.float32))
        return qq + dep.astype(jnp.bfloat16) * jnp.bfloat16(1e-12)

    n = args.iters
    res = {}
    res["dense_bf16_ms"] = chain_time(dense_step, q, (kv, bt, seq), n) * 1e3
    res["dense_int8_ms"] = chain_time(dense8_step, q, (kv8, bt, seq), n) * 1e3
    res["sparse_bf16_ms"] = chain_time(
        sparse_step, q, (kv, bt, cent, block_ids, seq), n) * 1e3
    res["sparse_int8_ms"] = chain_time(
        sparse8_step, q, (kv8, bt, cent, block_ids, seq), n) * 1e3
    res["dense_int4_ms"] = chain_time(dense4_step, q, (kv4, bt, seq),
                                      n) * 1e3
    res["sparse_int4_ms"] = chain_time(
        sparse4_step, q, (kv4, bt, cent, block_ids, seq), n) * 1e3
    res["select_only_ms"] = chain_time(
        select_step, q, (bt, cent, block_ids, seq), n) * 1e3

    for k_, v_ in res.items():
        print(f"{k_:>18}: {v_:.3f}")
    for name in ("int8", "int4", "bf16"):
        print(f"{name} sparse/dense speedup: "
              f"{res[f'dense_{name}_ms'] / res[f'sparse_{name}_ms']:.2f}x")
    print(f"int8 sparse tok/s/chip: {B / res['sparse_int8_ms'] * 1e3:.0f}")
    print(f"int4 sparse tok/s/chip: {B / res['sparse_int4_ms'] * 1e3:.0f}")
    import json
    print(json.dumps({k_: round(v_, 4) for k_, v_ in res.items()}))


if __name__ == "__main__":
    main()
