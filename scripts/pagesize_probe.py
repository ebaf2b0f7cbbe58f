"""Page-granularity vs the per-head sparse descriptor floor.

The k<C per-head path issues one DMA descriptor per (head, page) and is
scalar-sequencing-bound (~128 ns/slot — docs/SPARSE_QUALITY.md), so at a
FIXED byte budget, halving the page count by doubling the page size
should halve the floor.  This probes the canonical 128K config (B=1,
GQA 32/8, D=128, int8 per-channel KV, 1/8 cap) at page_size ∈ {128, 256,
512}: context and selected BYTES are identical; only granularity (and
descriptor count) changes.  Selection quality trades off separately
(coarser pages — the reference sweeps page 16..128 the other direction).

Usage: python scripts/pagesize_probe.py [--out docs/evidence/...]
"""

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from cann_ops_adv_vllm_tpu.config import INT32_SENTINEL
from cann_ops_adv_vllm_tpu.ops.paged_attention import (
    fuse_kv,
    paged_flash_decode,
)
from cann_ops_adv_vllm_tpu.ops.quant import quantize_kv

B, HKV, G, D, CTX = 1, 8, 4, 128, 128 * 1024
HQ = HKV * G


def slope(fn, q, args, n1=100, n2=500):
    """Two-length chain slope; ``args`` are explicit jit operands (a
    closed-over page pool would be baked into the program as a constant
    and exceed the remote-compile transport)."""
    @functools.partial(jax.jit, static_argnames=("n",))
    def chain(qq, args, n):
        return jax.lax.fori_loop(
            0, n, lambda i, acc: acc + fn(acc, *args).astype(acc.dtype)
            * jnp.bfloat16(1e-6), qq)
    for n in (n1, n2):
        np.asarray(chain(q, args, n))
    best = {}
    for n in (n1, n2, n1, n2):
        t0 = time.time()
        np.asarray(chain(q, args, n))
        best[n] = min(best.get(n, 1e9), time.time() - t0)
    return (best[n2] - best[n1]) / (n2 - n1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="docs/evidence/pagesize_probe.jsonl")
    args = ap.parse_args()
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, HQ, D)), jnp.bfloat16)
    rows = []
    for ps in (128, 256, 512):
        max_page = CTX // ps
        num_pages = max_page + 8
        k = jnp.asarray(rng.standard_normal((HKV, num_pages, ps, D)),
                        jnp.bfloat16)
        v = jnp.asarray(rng.standard_normal((HKV, num_pages, ps, D)),
                        jnp.bfloat16)
        kv = jax.jit(fuse_kv)(k, v)
        kv8, sc, off = jax.jit(
            lambda a: quantize_kv(a, mode="per_channel"))(kv)
        scales = (sc[:, :D], off[:, :D], sc[:, D:], off[:, D:])
        del k, v, kv
        seq = jnp.full((B,), CTX, jnp.int32)
        bt = jnp.asarray(np.arange(max_page, dtype=np.int32)[None])
        cap = max_page // 8
        pos = np.full((B, HKV, max_page), INT32_SENTINEL, np.int32)
        for h in range(HKV):
            pos[0, h, :cap] = np.sort(rng.permutation(max_page)[:cap])
        pos = jnp.asarray(pos)
        lens = jnp.full((B, HKV), cap, jnp.int32)

        t = slope(
            lambda qq, kv8, bt, seq, pos, lens, *sc: paged_flash_decode(
                qq, kv8, None, bt, seq, pos, lens, kv_scales=sc,
                page_size=ps),
            q, (kv8, bt, seq, pos, lens) + scales)
        rows.append({
            "page_size": ps, "pages_per_head": cap,
            "descriptors_per_step": HKV * cap,
            "selected_MB": round(HKV * cap * ps * 2 * D / 1e6, 1),
            "step_ms": round(t * 1e3, 4),
        })
        print(json.dumps(rows[-1]))
        del kv8
    rec = {"metric": "per-head sparse (k<C) step vs page size, fixed "
                     "byte budget (B=1, GQA 32/8, 128K, int8 KV, 1/8 "
                     "cap)", "rows": rows}
    with open(args.out, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
