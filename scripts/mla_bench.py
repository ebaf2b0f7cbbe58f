"""MLA (DeepSeek-class) end-to-end decode benchmark.

Serves a DeepSeek-geometry model THROUGH the engine (DeepSeekAdapter:
chunked MLA prefill + absorbed latent decode over the shared paged
latent cache) and reports engine tokens/s + p50, plus the device-only
decode-step latency via the two-length chain slope.

The latent stream is h_kv = 1: every decode step runs the slab kernel's
shared-row fast path (one strided DMA per page serves all query heads),
and the cache is ~(2*H*D)/(c_kv+rope) times smaller than per-head KV —
the scaffolded-but-unrealized MLA promise of the reference
(incre_flash_attention_tiling_mla.h), realized and measured.

Usage: python scripts/mla_bench.py [--layers 4] [--ctx 8192]
         [--heads 32] [--decode 48] [--weights int8]
"""

import argparse
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

from cann_ops_adv_vllm_tpu.models import deepseek
from cann_ops_adv_vllm_tpu.runtime.adapters import DeepSeekAdapter
from cann_ops_adv_vllm_tpu.runtime.engine import DecodeEngine, Request


def device_step_slope(cfg, params, eng, ctx):
    kv = eng.kv_cache
    bt = jnp.asarray(eng._bt_host)
    seq = jnp.full((eng.max_batch,), ctx, jnp.int32)
    tok = jnp.zeros((eng.max_batch,), jnp.int32)

    @functools.partial(jax.jit, static_argnames=("n",))
    def chain(tok, kv, params, bt, seq, n):
        def body(i, c):
            t, kv_c = c
            logits, kv_c = deepseek.decode_step(cfg, params, t, kv_c, bt,
                                                seq)
            return (jnp.argmax(logits, -1).astype(jnp.int32), kv_c)
        return jax.lax.fori_loop(0, n, body, (tok, kv))[0]

    n1, n2 = 8, 40
    for n in (n1, n2):
        np.asarray(chain(tok, kv, params, bt, seq, n))
    best = {}
    for n in (n1, n2, n1, n2):
        t0 = time.time()
        np.asarray(chain(tok, kv, params, bt, seq, n))
        best[n] = min(best.get(n, 9e9), time.time() - t0)
    return (best[n2] - best[n1]) / (n2 - n1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--layers", type=int, default=4)
    ap.add_argument("--ctx", type=int, default=8192)
    ap.add_argument("--heads", type=int, default=32)
    ap.add_argument("--hidden", type=int, default=2048)
    ap.add_argument("--decode", type=int, default=48)
    ap.add_argument("--weights", default="bf16", choices=["bf16", "int8"])
    args = ap.parse_args()

    cfg = dataclasses.replace(
        deepseek.TINY_DEEPSEEK,
        num_layers=args.layers, hidden_size=args.hidden,
        intermediate_size=2 * args.hidden, num_heads=args.heads,
        vocab_size=32000, q_lora_rank=0, page_size=128)
    params = deepseek.init_params(cfg, jax.random.key(0))
    if args.weights == "int8":
        params = jax.tree.map(jnp.asarray,
                              deepseek.quantize_params(cfg, params))

    rng = np.random.default_rng(0)
    prompt = rng.integers(1, cfg.vocab_size,
                          args.ctx - args.decode - 8).astype(np.int32)
    num_pages = args.ctx // cfg.page_size + 8
    eng = DecodeEngine(cfg, params, num_pages=num_pages, max_batch=1,
                      max_page=args.ctx // cfg.page_size + 4,
                      prefill_chunk=2048, adapter=DeepSeekAdapter(cfg))
    eng.add_request(Request(seq_id=0, prompt=prompt,
                            max_new_tokens=args.decode))
    t0 = time.perf_counter()
    while any(eng._prefill_cursor.get(sid, 0) < len(eng.running[sid].prompt)
              for sid in list(eng.running)) or eng.waiting:
        eng.step()
    prefill_s = time.perf_counter() - t0
    steps0, toks0 = eng.stats.steps, eng.stats.tokens_generated
    t0 = time.perf_counter()
    while eng.step():
        pass
    decode_s = time.perf_counter() - t0
    toks = eng.stats.tokens_generated - toks0
    ticks = eng.stats.steps - steps0

    dev_ms = device_step_slope(cfg, params, eng, args.ctx) * 1e3
    latent_gb = (cfg.num_layers * num_pages * cfg.page_size
                 * cfg.record_width * 2) / 1e9
    print(json.dumps({
        "metric": f"MLA e2e decode (L={args.layers}, H={args.heads}, "
                  f"hidden={args.hidden}, c_kv={cfg.kv_lora_rank}, "
                  f"ctx={args.ctx}, {args.weights} weights, B=1)",
        "prefill_s": round(prefill_s, 2),
        "decode_tokens": toks, "decode_ticks": ticks,
        "engine_tokens_per_s": round(toks / decode_s, 2),
        "p50_tick_ms": round(float(np.median(
            list(eng.stats._lat_window)[-ticks:])) * 1e3, 2),
        "device_step_ms": round(dev_ms, 3),
        "device_tokens_per_s": round(1e3 / dev_ms, 1),
        "latent_cache_gb": round(latent_gb, 4),
    }))


if __name__ == "__main__":
    main()
