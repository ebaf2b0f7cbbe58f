"""Quantify KV-cache copy overhead in the model decode step.

Hypothesis (from the recorded config-4 numbers: 23 ms device step at
L=8/16K-ctx where attention accounts for ~1.4 ms): the functional cache
update materializes full-cache copies per step — decode_step_scan carries
the cache through scan xs/ys (stacked output = full write) and the
unrolled path re-stacks per-layer caches.  If true, step time scales with
POOL SIZE at constant context (the copy is O(pool), the attention
O(context)).

Prints per-step ms for pool multipliers {1, 2} × {scan, unrolled} at a
fixed 4K context, bf16, L=4.  A flat profile → compute-bound; ~2× step
time at 2× pool → copy-bound.
"""

import dataclasses
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from cann_ops_adv_vllm_tpu.models import llama


def chain_ms(cfg, params, kv, bt, seq, scan):
    stacked = llama.stack_layer_params(params) if scan else params
    tok = jnp.zeros((seq.shape[0],), jnp.int32)

    @functools.partial(jax.jit, static_argnames=("n",))
    def chain(tok, kv, stacked, bt, seq, n):
        def body(i, c):
            t, kv_c = c
            fn = llama.decode_step_scan if scan else llama.decode_step
            logits, kv_c = fn(cfg, stacked, t, kv_c, bt, seq)
            return (jnp.argmax(logits, -1).astype(jnp.int32), kv_c)
        # return the token only and FETCH it: on this rig
        # block_until_ready does not reliably block through the tunnel —
        # np.asarray of a tiny output is the dependable sync point
        return jax.lax.fori_loop(0, n, body, (tok, kv))[0]

    n1, n2 = 8, 48
    for n in (n1, n2):
        np.asarray(chain(tok, kv, stacked, bt, seq, n))
    best = {}
    for n in (n1, n2, n1, n2):
        t0 = time.time()
        np.asarray(chain(tok, kv, stacked, bt, seq, n))
        best[n] = min(best.get(n, 9e9), time.time() - t0)
    return (best[n2] - best[n1]) / (n2 - n1) * 1e3


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--kv-dtype", default="auto", choices=["auto", "int8"])
    a = ap.parse_args()
    ctx = 4096
    cfg = dataclasses.replace(
        llama.LLAMA_2_7B, num_layers=4, kv_cache_dtype=a.kv_dtype)
    params = llama.init_params(cfg, jax.random.key(0))
    base_pages = ctx // cfg.page_size + 8
    bt = jnp.arange(ctx // cfg.page_size + 4, dtype=jnp.int32)[None]
    seq = jnp.full((1,), ctx, jnp.int32)
    for scan in (True, False):
        for mult in (1, 2):
            kv = llama.init_kv_cache(cfg, base_pages * mult)
            ms = chain_ms(cfg, params, kv, bt, seq, scan)
            gb = sum(np.prod(x.shape) * x.dtype.itemsize
                     for x in jax.tree.leaves(kv)) / 1e9
            print(json.dumps({
                "kv_dtype": a.kv_dtype,
                "mode": "scan" if scan else "unrolled",
                "pool_mult": mult, "cache_gb": round(gb, 3),
                "step_ms": round(ms, 3),
                "implied_GBps_if_2_copies": round(2 * gb / (ms / 1e3), 1),
            }), flush=True)
            del kv


if __name__ == "__main__":
    main()
