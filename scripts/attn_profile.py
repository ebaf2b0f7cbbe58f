"""Micro-profile: sparse/dense attention only (selection excluded), by
dtype and ppcb — isolates the int8 in-kernel dequant cost from DMA."""

import argparse
import functools
import sys
import time
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from cann_ops_adv_vllm_tpu.ops.paged_attention import (
    fuse_kv, paged_flash_decode)
from cann_ops_adv_vllm_tpu.ops.quant import quantize_kv, quantize_kv_int4
from cann_ops_adv_vllm_tpu.ops.cent_select import cent_select


def chain_time(step, q, args, n=300):
    """Two-length chain slope (dispatch exactly subtracted, best-of-2 per
    length) — the one timing methodology every harness in this repo
    uses.  Previously this harness divided a single chain's wall time by
    n, which carried the ~24 ms axon-tunnel dispatch as a +0.08 ms/step
    bias at n=300."""
    @functools.partial(jax.jit, static_argnames=("n",))
    def chain(qq, args, n):
        return jax.lax.fori_loop(0, n, lambda i, acc: step(acc, *args), qq)

    n1, n2 = max(n // 6, 10), n
    for m in (n1, n2):
        np.asarray(chain(q, args, m))
    best = {}
    for m in (n1, n2, n1, n2):
        t0 = time.time()
        np.asarray(chain(q, args, m))
        best[m] = min(best.get(m, float("inf")), time.time() - t0)
    return (best[n2] - best[n1]) / (n2 - n1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ctx", type=int, default=128 * 1024)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--iters", type=int, default=300)
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
    k8s = (sc[:, :D], off[:, :D], sc[:, D:], off[:, D:])
    kv4, k4s = jax.jit(lambda a: quantize_kv_int4(a, mode="per_channel"))(kv)
    kv4.block_until_ready()
    del k, v

    bt = jnp.asarray(
        np.stack([rng.permutation(num_pages)[:max_page] for _ in range(B)]),
        jnp.int32)
    seq = jnp.full((B,), CTX, jnp.int32)
    cent = jnp.asarray(rng.standard_normal((HKV, C, D)), jnp.bfloat16)
    block_ids = jnp.asarray(rng.integers(0, C, (HKV, num_pages)), jnp.int32)

    # precompute a fixed sparse selection (fused k=512 → capped page set)
    pos, plen3, _ = jax.jit(functools.partial(
        cent_select, k=512, group_mode="kv_group"))(
        q, cent, block_ids, bt, seq)
    plen = plen3[..., 0]
    pos.block_until_ready()
    print("selected pages/head:", np.asarray(plen)[0].tolist(),
          "of", max_page, "| positions M =", pos.shape[2])

    def mk_step(kvp, scales, int4, ppcb):
        def step(qq, kvp, bt, seq, pos, plen):
            o = paged_flash_decode(qq, kvp, None, bt, seq, pos, plen,
                                   kv_scales=scales, kv_int4=int4,
                                   ppcb=ppcb)
            return qq + o.astype(qq.dtype) * jnp.bfloat16(1e-6)
        return step

    n = args.iters
    for name, kvp, scales, int4 in (
            ("bf16", kv, None, False),
            ("int8", kv8, k8s, False),
            ("int4", kv4, k4s, True)):
        for ppcb in (None, 8, 16, 32):
            t = chain_time(mk_step(kvp, scales, int4, ppcb), q,
                           (kvp, bt, seq, pos, plen), n)
            print(f"sparse-attn {name} ppcb={str(ppcb):>4}: "
                  f"{t*1e3:7.3f} ms")
    for name, kvp, scales, int4 in (
            ("bf16", kv, None, False),
            ("int8", kv8, k8s, False),
            ("int4", kv4, k4s, True)):
        def dstep(qq, kvp, bt, seq, scales=scales, int4=int4):
            o = paged_flash_decode(qq, kvp, None, bt, seq,
                                   kv_scales=scales, kv_int4=int4)
            return qq + o.astype(qq.dtype) * jnp.bfloat16(1e-6)
        t = chain_time(dstep, q, (kvp, bt, seq), n)
        print(f"dense-attn  {name}: {t*1e3:7.3f} ms")


if __name__ == "__main__":
    main()
