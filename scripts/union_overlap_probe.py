"""Union-DMA vs per-head-DMA crossover vs selection overlap.

The per-head sparse path costs one DMA descriptor per (head, page); the
union path costs one slab descriptor per UNION page but fetches every
head's record for it.  With S selected pages/head, overlap fraction f
(pages shared by all heads), H heads:

  per-head:  H*S descriptors,            H*S records
  union:     (f + (1-f)*H)*S descriptors, (f + (1-f)*H)*S * H records

Union wins when descriptors dominate AND overlap is high.  This probe
times both at controlled overlap on the canonical standalone geometry
(B=1, 128K, GQA 32/8, D=128, int8, cap=128 pages/head).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import functools
import numpy as np
import jax
import jax.numpy as jnp

from cann_ops_adv_vllm_tpu.config import INT32_SENTINEL
from cann_ops_adv_vllm_tpu.ops.paged_attention import (
    fuse_kv, paged_flash_decode)
from cann_ops_adv_vllm_tpu.ops.quant import quantize_kv

HKV, G, D, C = 8, 4, 128, 512
HQ = HKV * G


def chain_time(step, q, args, iters=60):
    @functools.partial(jax.jit, static_argnames=("n",))
    def chain(qq, args, n):
        return jax.lax.fori_loop(0, n, lambda i, a: step(a, *args), qq)

    n1, n2 = max(iters // 6, 8), iters
    for n in (n1, n2):
        np.asarray(chain(q, args, n))
    best = {}
    for n in (n1, n2, n1, n2):
        t0 = time.time()
        np.asarray(chain(q, args, n))
        best[n] = min(best.get(n, 9e9), time.time() - t0)
    t = (best[n2] - best[n1]) / (n2 - n1)
    if t * n2 < 0.02:
        n2 = min(int(0.02 / max(t, 5e-7)), 40000)
        n1 = max(n2 // 6, 8)
        for n in (n1, n2):
            np.asarray(chain(q, args, n))
        best = {}
        for n in (n1, n2, n1, n2):
            t0 = time.time()
            np.asarray(chain(q, args, n))
            best[n] = min(best.get(n, 9e9), time.time() - t0)
        t = (best[n2] - best[n1]) / (n2 - n1)
    return t


def main():
    ctx, ps, b = 128 * 1024, 128, 1
    max_page = ctx // ps                       # 1024
    sel = max_page // 8                        # cap: 128 pages per head
    num_pages = max_page + 16
    rng = np.random.default_rng(0)
    dt = jnp.bfloat16
    q = jnp.asarray(rng.standard_normal((b, HQ, D)), dt)
    k = jnp.asarray(rng.standard_normal((HKV, num_pages, ps, D)), dt)
    v = jnp.asarray(rng.standard_normal((HKV, num_pages, ps, D)), dt)
    kq, ks, ko = quantize_kv(k)
    vq, vs, vo = quantize_kv(v)
    kv = jax.jit(fuse_kv)(kq, vq)
    kv.block_until_ready()
    scales = (ks, ko, vs, vo)
    bt = jnp.asarray(rng.permutation(num_pages)[:max_page][None], jnp.int32)
    seq = jnp.full((b,), ctx, jnp.int32)

    for overlap in (0.0, 0.5, 0.75, 1.0):
        n_shared = int(sel * overlap)
        shared = np.sort(rng.permutation(max_page)[:n_shared])
        pos = np.full((b, HKV, sel), INT32_SENTINEL, np.int32)
        for h in range(HKV):
            rest = np.setdiff1d(np.arange(max_page), shared)
            priv = rng.permutation(rest)[:sel - n_shared]
            pos[0, h] = np.sort(np.concatenate([shared, priv]))
        positions = jnp.asarray(pos)
        plens = jnp.full((b, HKV), sel, jnp.int32)
        union_len = len(np.unique(pos[0]))

        res = {"overlap": overlap, "sel_per_head": sel,
               "union_pages": union_len}
        for union in (False, True):
            def step(qq, kv, bt, seq, pos, plen, *sc, u=union):
                o = paged_flash_decode(qq, kv, None, bt, seq, pos, plen,
                                       kv_scales=sc, page_size=ps,
                                       union_pages=u)
                return qq + o.astype(dt) * dt(1e-6)
            t = chain_time(step, q, (kv, bt, seq, positions, plens)
                           + scales)
            res["union_ms" if union else "per_head_ms"] = round(t * 1e3, 4)
        res["union_speedup"] = round(res["per_head_ms"] / res["union_ms"],
                                     3)
        print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
