"""Perf/accuracy sweep harness — reference op_eval parity.

Reproduces the reference's evaluation drivers on TPU:
* perf mode with warmup + timed iters (fused_ifa_v5_torch_case.py:139-168),
* the sweep axes of op_eval/run.sh:24-49 — B ∈ {1,2,4,6,8},
  KV ∈ {8K,16K,32K,64K,128K}, page ∈ {16,32,64,128},
* dense (IFA) vs sparse (fused) decode per configuration.

Emits one JSON line per configuration:
  {"B":…, "kv":…, "page":…, "dtype":…, "dense_ms":…, "sparse_ms":…,
   "dense_tps":…, "sparse_tps":…, "speedup":…}

Usage:
  python scripts/op_eval.py                       # canonical config only
  python scripts/op_eval.py --sweep               # full reference sweep
  python scripts/op_eval.py --batches 1,4 --kvs 8192,32768 --pages 128
  python scripts/op_eval.py --mode accuracy       # vs XLA fallback
  python scripts/op_eval.py --int8                # int8 KV pages
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from cann_ops_adv_vllm_tpu.ops.paged_attention import (
    fuse_kv, paged_attention_xla, paged_flash_decode)
from cann_ops_adv_vllm_tpu.ops.fused import sparse_paged_fusion_attention
from cann_ops_adv_vllm_tpu.ops.quant import quantize_kv

HKV, G, D, C = 8, 4, 128, 512
HQ = HKV * G


def chain_time(step, q, args, iters):
    """Per-step seconds via the two-length chain slope.

    Each chain is one jitted ``lax.fori_loop`` over the device-resident
    dependency chain; per-step cost is the slope between two chain lengths
    (t = dispatch + n·step), which subtracts the per-call dispatch fixed
    cost (~24 ms through the axon tunnel) exactly.  Best-of-2 per length
    de-noises host jitter.  ``args`` are jit operands (closed-over arrays
    would be baked into the program as constants — huge compile payloads).
    ``iters`` sets the long chain; the short chain is iters // 6.
    """
    import functools

    @functools.partial(jax.jit, static_argnames=("n",))
    def chain(qq, args, n):
        return jax.lax.fori_loop(0, n, lambda i, acc: step(acc, *args), qq)

    def slope(n1, n2):
        for n in (n1, n2):
            np.asarray(chain(q, args, n))      # compile + warm
        best = {}
        for n in (n1, n2, n1, n2):
            t0 = time.time()
            np.asarray(chain(q, args, n))
            best[n] = min(best.get(n, float("inf")), time.time() - t0)
        return (best[n2] - best[n1]) / (n2 - n1)

    n1, n2 = max(iters // 6, 10), iters
    t = slope(n1, n2)
    # fast steps (µs-scale) need the long chain to span ≳20 ms of device
    # time or host jitter swamps the slope — grow n2 and re-measure
    if t * n2 < 0.02:
        n2 = min(int(0.02 / max(t, 5e-7)), 40000)
        t = slope(max(n2 // 6, n1), n2)
    return t


def run_config(b, ctx, ps, *, int8, iters, warmup, mode, topk, cap_ratio,
               rng):
    max_page = ctx // ps
    num_pages = max_page * b + 16
    dt = jnp.bfloat16
    q = jnp.asarray(rng.standard_normal((b, HQ, D)), dt)
    k = jnp.asarray(rng.standard_normal((HKV, num_pages, ps, D)), dt)
    v = jnp.asarray(rng.standard_normal((HKV, num_pages, ps, D)), dt)
    kv_scales = None
    if int8:
        kq, ks, ko = quantize_kv(k)
        vq, vs, vo = quantize_kv(v)
        kv = jax.jit(fuse_kv)(kq, vq)
        kv_scales = (ks, ko, vs, vo)
        del kq, vq
    else:
        kv = jax.jit(fuse_kv)(k, v)
    kv.block_until_ready()
    bt = jnp.asarray(
        np.stack([rng.permutation(num_pages)[:max_page] for _ in range(b)]),
        jnp.int32)
    seq = jnp.full((b,), ctx, jnp.int32)
    cent = jnp.asarray(rng.standard_normal((HKV, C, D)), dt)
    bids = jnp.asarray(rng.integers(0, C, (HKV, num_pages)), jnp.int32)

    if mode == "accuracy":
        got = paged_flash_decode(q, kv, None, bt, seq, kv_scales=kv_scales,
                                 page_size=ps)
        want = paged_attention_xla(
            q.astype(jnp.float32), kv[..., :D], kv[..., D:], bt, seq,
            kv_scales=kv_scales, page_size=ps)
        err = float(jnp.abs(got.astype(jnp.float32) - want).max())
        return {"B": b, "kv": ctx, "page": ps, "max_abs_err": err}

    def dense_step(qq, kv, bt, seq, *scales):
        o = paged_flash_decode(qq, kv, None, bt, seq,
                               kv_scales=scales or None,
                               page_size=ps)
        return qq + o.astype(dt) * dt(1e-6)

    def sparse_step(qq, kv, bt, cent, bids, seq, *scales):
        o, _, _ = sparse_paged_fusion_attention(
            qq, kv, bt, cent, bids, seq, kv_scales=scales or None, k=topk,
            page_size=ps, workload_cap_ratio=cap_ratio)
        return qq + o.astype(dt) * dt(1e-6)

    scale_args = tuple(kv_scales) if kv_scales else ()
    t_d = chain_time(dense_step, q, (kv, bt, seq) + scale_args, iters)
    t_s = chain_time(sparse_step, q, (kv, bt, cent, bids, seq) + scale_args,
                     iters)
    return {
        "B": b, "kv": ctx, "page": ps,
        "dtype": "int8" if int8 else "bf16",
        "dense_ms": round(t_d * 1e3, 3), "sparse_ms": round(t_s * 1e3, 3),
        "dense_tps": round(b / t_d, 1), "sparse_tps": round(b / t_s, 1),
        "speedup": round(t_d / t_s, 3),
    }


def run_standalone(b, ctx, ps, *, int8, iters, topk, cap_ratio, rng,
                   union):
    """Standalone chain (reference cent_select k=64 config,
    cent_select_tiling.cpp:58): per-KV-head selection feeding the sparse
    kernel — per-head page lists.  ``union`` enables the unioned-slab-DMA
    path (paged_flash_decode union_pages)."""
    from cann_ops_adv_vllm_tpu.ops.cent_select import cent_select

    max_page = ctx // ps
    num_pages = max_page * b + 16
    dt = jnp.bfloat16
    q = jnp.asarray(rng.standard_normal((b, HQ, D)), dt)
    k = jnp.asarray(rng.standard_normal((HKV, num_pages, ps, D)), dt)
    v = jnp.asarray(rng.standard_normal((HKV, num_pages, ps, D)), dt)
    kv_scales = None
    if int8:
        kq, ks, ko = quantize_kv(k)
        vq, vs, vo = quantize_kv(v)
        kv = jax.jit(fuse_kv)(kq, vq)
        kv_scales = (ks, ko, vs, vo)
    else:
        kv = jax.jit(fuse_kv)(k, v)
    kv.block_until_ready()
    bt = jnp.asarray(
        np.stack([rng.permutation(num_pages)[:max_page] for _ in range(b)]),
        jnp.int32)
    seq = jnp.full((b,), ctx, jnp.int32)
    cent = jnp.asarray(rng.standard_normal((HKV, C, D)), dt)
    bids = jnp.asarray(rng.integers(0, C, (HKV, num_pages)), jnp.int32)

    def step(qq, kv, bt, cent, bids, seq, *scales):
        pos, plen, _ = cent_select(
            qq, cent, bids, bt, seq, k=topk, block_size=ps,
            max_page_num=max_page, workload_cap_ratio=cap_ratio,
            group_mode="kv_group")
        o = paged_flash_decode(qq, kv, None, bt, seq, pos, plen[..., 0],
                               kv_scales=scales or None, page_size=ps,
                               union_pages=union)
        return qq + o.astype(dt) * dt(1e-6)

    scale_args = tuple(kv_scales) if kv_scales else ()
    t = chain_time(step, q, (kv, bt, cent, bids, seq) + scale_args, iters)
    return {
        "B": b, "kv": ctx, "page": ps, "mode": "standalone",
        "dtype": "int8" if int8 else "bf16", "topk": topk,
        "union": union, "step_ms": round(t * 1e3, 3),
        "tokens_per_s": round(b / t, 1),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=["perf", "accuracy"], default="perf")
    ap.add_argument("--sweep", action="store_true",
                    help="full reference sweep (op_eval/run.sh axes)")
    ap.add_argument("--batches", default="1")
    ap.add_argument("--kvs", default="131072")
    ap.add_argument("--pages", default="128")
    ap.add_argument("--int8", action="store_true")
    ap.add_argument("--iters", type=int, default=100)
    ap.add_argument("--warmup", type=int, default=3)
    ap.add_argument("--topk", type=int, default=512)
    ap.add_argument("--cap-ratio", type=int, default=8,
                    help="1/N sparsity workload cap (reference: 8)")
    ap.add_argument("--standalone", action="store_true",
                    help="standalone per-KV-head chain (k=64), per-head "
                         "vs union DMA")
    args = ap.parse_args()

    if args.standalone:
        rng = np.random.default_rng(0)
        for ctx in [int(x) for x in args.kvs.split(",")]:
            for b in [int(x) for x in args.batches.split(",")]:
                for union in (False, True):
                    res = run_standalone(
                        b, ctx, int(args.pages.split(",")[0]),
                        int8=args.int8, iters=args.iters,
                        topk=min(args.topk, 64), cap_ratio=args.cap_ratio,
                        rng=rng, union=union)
                    print(json.dumps(res), flush=True)
        return

    if args.sweep:
        batches = [1, 2, 4, 6, 8]
        kvs = [8192, 16384, 32768, 65536, 131072]
        pages = [16, 32, 64, 128]
    else:
        batches = [int(x) for x in args.batches.split(",")]
        kvs = [int(x) for x in args.kvs.split(",")]
        pages = [int(x) for x in args.pages.split(",")]

    rng = np.random.default_rng(0)
    for ps in pages:
        for ctx in kvs:
            for b in batches:
                if ctx // ps < 8 * max(1, args.cap_ratio) // 8:
                    continue
                res = run_config(
                    b, ctx, ps, int8=args.int8, iters=args.iters,
                    warmup=args.warmup, mode=args.mode, topk=args.topk,
                    cap_ratio=args.cap_ratio, rng=rng)
                print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
