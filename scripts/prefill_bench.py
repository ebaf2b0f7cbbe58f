"""Warm prefill throughput (device tokens/s) — Llama and MLA.

The reference is decode-only; prefill is this framework's "beyond" axis,
and a serving engine's admission math needs the WARM device number, not
wall clock contaminated by the ~24 ms/tick tunnel dispatch and cold
compile.  Method: the whole prompt's chunked prefill runs as ONE jitted
``lax.fori_loop`` over chunks (cache as carry, start_pos advancing), so
a full S-token prefill costs exactly one dispatch; tokens/s =
S / (t_wall − dispatch), with the dispatch floor measured from a
zero-chunk call of the same program.

Usage: python scripts/prefill_bench.py [--ctx 16384] [--layers 8]
         [--chunks 128,512] [--out docs/evidence/prefill_bench.jsonl]
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

from cann_ops_adv_vllm_tpu.models import deepseek, llama


def time_prefill(step_chunk, params, cache0, bt, tokens, chunk, n_chunks):
    """One-dispatch full prefill; returns (seconds, dispatch_floor_s)."""

    @functools.partial(jax.jit, static_argnames=("n",), donate_argnums=(2,))
    def run(params, toks, cache, bt, n):
        def body(i, cache):
            start = (i * chunk).astype(jnp.int32)[None]
            tk = jax.lax.dynamic_slice_in_dim(toks, i * chunk, chunk)
            _, cache = step_chunk(params, tk[None], cache, bt, start,
                                  jnp.full((1,), chunk, jnp.int32))
            return cache
        cache = jax.lax.fori_loop(0, n, body, cache, unroll=False)
        # tiny fetched checksum: np.asarray on it is the dependable sync
        # point through the axon tunnel (block_until_ready is not)
        leaf = jax.tree.leaves(cache)[0]
        return cache, leaf.reshape(-1)[:1].astype(jnp.float32)

    toks = jnp.asarray(tokens, jnp.int32)
    # warm both trip counts (0 = dispatch floor)
    cache = jax.tree.map(jnp.copy, cache0)
    cache, s = run(params, toks, cache, bt, 0)
    np.asarray(s)
    t0 = time.time()
    cache, s = run(params, toks, cache, bt, 0)
    np.asarray(s)
    disp = time.time() - t0

    cache = jax.tree.map(jnp.copy, cache0)
    cache, s = run(params, toks, cache, bt, n_chunks)   # compile+warm
    np.asarray(s)
    best = float("inf")
    for _ in range(2):
        cache = jax.tree.map(jnp.copy, cache0)
        t0 = time.time()
        cache, s = run(params, toks, cache, bt, n_chunks)
        np.asarray(s)
        best = min(best, time.time() - t0)
    return max(best - disp, 1e-9), disp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ctx", type=int, default=16 * 1024)
    ap.add_argument("--layers", type=int, default=8)
    ap.add_argument("--chunks", default="128,512")
    ap.add_argument("--out", default="docs/evidence/prefill_bench.jsonl")
    args = ap.parse_args()
    chunks = [int(c) for c in args.chunks.split(",")]
    rng = np.random.default_rng(0)
    S = args.ctx
    rows = []

    # --- Llama (config-4 geometry: GQA 32/8, int8 KV) ---
    cfg = dataclasses.replace(
        llama.LLAMA_2_7B, num_layers=args.layers, num_kv_heads=8,
        kv_cache_dtype="int8")
    params = llama.init_params(cfg, jax.random.key(0))
    num_pages = S // cfg.page_size + 8
    bt = jnp.asarray(np.arange(S // cfg.page_size, dtype=np.int32)[None])
    tokens = rng.integers(0, 31000, S, dtype=np.int32)
    cache0 = llama.init_kv_cache(cfg, num_pages)
    for chunk in chunks:
        fn = functools.partial(llama.prefill_chunk_step, cfg)
        t, disp = time_prefill(fn, params, cache0, bt, tokens, chunk,
                               S // chunk)
        rows.append({
            "model": f"llama L={args.layers} GQA 32/8 int8-KV",
            "ctx": S, "chunk": chunk,
            "prefill_s": round(t, 3),
            "prefill_tokens_per_s": round(S / t, 0),
            "dispatch_floor_s": round(disp, 4),
        })
        print(json.dumps(rows[-1]))
    del params, cache0

    # --- MLA (DeepSeek geometry matching mla_bench.py) ---
    dcfg = dataclasses.replace(
        deepseek.TINY_DEEPSEEK, num_layers=4, hidden_size=2048,
        intermediate_size=4096, num_heads=32, vocab_size=32000)
    dparams = deepseek.init_params(dcfg, jax.random.key(1))
    dcache0 = deepseek.init_latent_cache(dcfg, num_pages)
    for chunk in chunks:
        fn = functools.partial(deepseek.prefill_chunk_step, dcfg)
        t, disp = time_prefill(fn, dparams, dcache0, bt, tokens, chunk,
                               S // chunk)
        rows.append({
            "model": "mla L=4 H=32 c_kv=512 hidden=2048",
            "ctx": S, "chunk": chunk,
            "prefill_s": round(t, 3),
            "prefill_tokens_per_s": round(S / t, 0),
            "dispatch_floor_s": round(disp, 4),
        })
        print(json.dumps(rows[-1]))

    rec = {"metric": "warm device prefill tokens/s (one-dispatch chunked "
                     "prefill, dispatch floor subtracted)", "rows": rows}
    with open(args.out, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
