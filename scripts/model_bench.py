"""Model-level end-to-end benchmark — BASELINE config 4.

Llama-2-7B-class geometry (hidden 4096, 32 q-heads, MHA/GQA, D=128) at a
depth that fits one v5e chip next to a 16K-context KV cache, INT8 KV
(per-token, written online by the engine), decoding through
``runtime.engine.DecodeEngine`` with chunked prefill.

Reports, as JSON lines:
  * engine wall-clock decode tokens/s and p50 per-token latency (includes
    host loop + the ~24 ms axon-tunnel dispatch per tick — the deployment
    number for THIS rig, not the chip's),
  * device-only decode-step latency via the two-length chain slope
    (the chip number: what a colocated host would see),
for dense vs sparse attention (1/8 centroid sparsity), at B=1.

Usage: python scripts/model_bench.py [--layers 8] [--ctx 16384]
         [--decode 64] [--kv-dtype int8] [--batch 1]
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

from cann_ops_adv_vllm_tpu.models import llama
from cann_ops_adv_vllm_tpu.runtime.engine import DecodeEngine, Request


def build_cfg(args, sparse):
    return dataclasses.replace(
        llama.LLAMA_2_7B,
        num_layers=args.layers,
        num_kv_heads=args.kv_heads,
        kv_cache_dtype=args.kv_dtype if args.kv_dtype != "bf16" else "auto",
        num_centroids=512 if sparse else 0,
        top_k_clusters=512,
        max_page_num=256,
    )


def engine_run(cfg, params, args, prompt):
    num_pages = args.ctx // cfg.page_size + 32
    eng = DecodeEngine(cfg, params, num_pages=num_pages,
                       max_batch=args.batch,
                       max_page=args.ctx // cfg.page_size + 8,
                       prefill_chunk=2048, scan_layers=args.scan)
    for i in range(args.batch):
        eng.add_request(Request(seq_id=i, prompt=prompt,
                                max_new_tokens=args.decode))
    # run prefill ticks to completion first (not counted in decode rate)
    t0 = time.perf_counter()
    while any(eng._prefill_cursor.get(sid, 0) < len(eng.running[sid].prompt)
              for sid in list(eng.running)) or eng.waiting:
        eng.step()
    prefill_s = time.perf_counter() - t0

    steps_before = eng.stats.steps
    toks_before = eng.stats.tokens_generated
    t0 = time.perf_counter()
    while eng.step():
        pass
    decode_s = time.perf_counter() - t0
    ticks = eng.stats.steps - steps_before
    toks = eng.stats.tokens_generated - toks_before
    return {
        "prefill_s": round(prefill_s, 3),
        "decode_ticks": ticks,
        "decode_tokens": toks,
        "engine_tokens_per_s": round(toks / decode_s, 2),
        "p50_tick_ms": round(
            float(np.median(list(eng.stats._lat_window)[-ticks:])) * 1e3, 2)
        if ticks else 0.0,
    }, eng


def device_step_slope(cfg, params, eng, args):
    """Chip-only decode-step latency: two-length fori_loop chain slope.

    Uses the scan-over-layers decode (llama.decode_step_scan) so the
    chained program's HLO is O(1) in depth — the per-layer-unrolled chain
    exceeded the remote-compile transport at L=8.
    """
    # with --scan the engine already holds stacked params — reuse them
    # (a fresh stack is another full weight copy; at L=32 the duplicate
    # OOMed the chip next to the 16K cache)
    stacked = (eng.params if args.scan
               else llama.stack_layer_params(params))
    kv = eng.kv_cache
    bt = jnp.asarray(eng._bt_host)
    seq = jnp.full((eng.max_batch,), args.ctx, jnp.int32)
    tok = jnp.zeros((eng.max_batch,), jnp.int32)
    bids = eng.block_ids

    # params/tables must be jit OPERANDS — closed-over arrays are baked
    # into the program as constants (GB-scale compile payloads)
    @functools.partial(jax.jit, static_argnames=("n",))
    def chain(tok, kv, stacked, bt, seq, bids, n):
        def body(i, c):
            t, kv_c = c
            logits, kv_c = llama.decode_step_scan(
                cfg, stacked, t, kv_c, bt, seq, bids)
            return (jnp.argmax(logits, -1).astype(jnp.int32), kv_c)
        # return + FETCH the token only: np.asarray is the dependable
        # sync point through the tunnel (block_until_ready is not)
        return jax.lax.fori_loop(0, n, body, (tok, kv))[0]

    n1, n2 = 8, 40
    ops = (stacked, bt, seq, bids)
    for n in (n1, n2):
        np.asarray(chain(tok, kv, *ops, n))
    best = {}
    for n in (n1, n2, n1, n2):
        t0 = time.time()
        np.asarray(chain(tok, kv, *ops, n))
        best[n] = min(best.get(n, float("inf")), time.time() - t0)
    return (best[n2] - best[n1]) / (n2 - n1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--layers", type=int, default=8)
    ap.add_argument("--kv-heads", type=int, default=32)
    ap.add_argument("--ctx", type=int, default=16 * 1024)
    ap.add_argument("--decode", type=int, default=64)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--kv-dtype", default="int8",
                    choices=["int8", "bf16"])
    ap.add_argument("--weights", default="bf16", choices=["bf16", "int8"],
                    help="weight-only int8 (llama.quantize_params)")
    ap.add_argument("--scan", action="store_true",
                    help="scan-over-layers engine steps (O(1)-in-depth "
                         "programs; avoids the cold remote-compile cost "
                         "of deep unrolled prefill, required for L=32)")
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    prompt = rng.integers(0, 31000, args.ctx - args.decode - 8,
                          dtype=np.int32)

    results = {}
    for sparse in (False, True):
        cfg = build_cfg(args, sparse)
        params = llama.init_params(cfg, jax.random.key(0))
        if args.weights == "int8":
            # donate: the fp weights (2x the int8 bytes) free as the
            # quantized leaves materialize — without this the transient
            # holds both full copies (19+ GB at L=32, OOM)
            params = jax.jit(llama.quantize_params,
                             donate_argnums=(0,))(params)
            jax.block_until_ready(params)
        if args.scan:
            # stack BEFORE the engine so only one full weight copy lives
            # (the engine accepts pre-stacked params)
            params = jax.jit(llama.stack_layer_params,
                             donate_argnums=(0,))(params)
            jax.block_until_ready(params)
        stats, eng = engine_run(cfg, params, args, prompt)
        dev_ms = device_step_slope(cfg, params, eng, args) * 1e3
        name = "sparse" if sparse else "dense"
        results[name] = {**stats, "device_step_ms": round(dev_ms, 3),
                         "device_tokens_per_s": round(
                             args.batch / dev_ms * 1e3, 1)}
        print(json.dumps({name: results[name]}))
        del eng, params

    print(json.dumps({
        "metric": f"model e2e decode (L={args.layers} Llama-2-7B-class, "
                  f"ctx={args.ctx}, {args.kv_dtype} KV, "
                  f"{args.weights} weights, B={args.batch})",
        "sparse_vs_dense_device": round(
            results["dense"]["device_step_ms"]
            / results["sparse"]["device_step_ms"], 3),
        "results": results,
    }))


if __name__ == "__main__":
    main()
