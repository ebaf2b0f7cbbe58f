"""Benchmark: INT8-KV sparse vs INT8-KV dense decode throughput, one chip.

Reproduces the reference's canonical perf configuration
(fused_ifa_v5_torch_case.py:21-41): B=1, 32 q-heads / 8 kv-heads (GQA 4:1),
D=128, C=512 centroids, page=128, KV context 128K, sparsity 1/8 — with
per-channel INT8 KV (the literal BASELINE.json north-star metric:
"sparse decode tokens/s/chip (INT8 KV) ≥ 2× dense").  bf16 numbers are
reported in `detail` for cross-reference.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Timing method: per-step cost is the SLOPE between two on-device dependency
chains of different lengths (t = dispatch + n·step, so
step = (t2−t1)/(n2−n1)).  Each chain is a jitted ``lax.fori_loop`` whose
step perturbs the query with the previous output (no cross-step
deduplication possible); the slope subtracts the per-dispatch fixed cost
(~24 ms through the axon tunnel) *exactly* instead of amortizing it into
the step time.  Each chain length runs twice and takes the min (best-of-2
de-noises host jitter).
"""

import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from cann_ops_adv_vllm_tpu.ops.fused import (  # noqa: E402
    sparse_paged_fusion_attention,
)
from cann_ops_adv_vllm_tpu.ops.paged_attention import (  # noqa: E402
    fuse_kv,
    paged_flash_decode,
)
from cann_ops_adv_vllm_tpu.ops.quant import quantize_kv  # noqa: E402

QUICK = os.environ.get("BENCH_QUICK", "") == "1"

B, HKV, G, D, PS, C = 1, 8, 4, 128, 128, 512
HQ = HKV * G
CTX = 32 * 1024 if QUICK else 128 * 1024
N1, N2 = (50, 300) if QUICK else (100, 900)


def slope_time(step, q, args, n1=N1, n2=N2):
    """Per-step seconds via the two-length chain slope (see module doc)."""
    @functools.partial(jax.jit, static_argnames=("n",))
    def chain(qq, args, n):
        return jax.lax.fori_loop(0, n, lambda i, acc: step(acc, *args), qq)

    for n in (n1, n2):
        _ = np.asarray(chain(q, args, n))            # compile + warm
    best = {}
    for n in (n1, n2, n1, n2):
        t0 = time.time()
        _ = np.asarray(chain(q, args, n))
        best[n] = min(best.get(n, float("inf")), time.time() - t0)
    return (best[n2] - best[n1]) / (n2 - n1)


def main():
    rng = np.random.default_rng(0)
    num_pages = CTX // PS + 16
    max_page = CTX // PS
    dt = jnp.bfloat16

    q = jnp.asarray(rng.standard_normal((B, HQ, D)), dt)
    k = jnp.asarray(rng.standard_normal((HKV, num_pages, PS, D)), dt)
    v = jnp.asarray(rng.standard_normal((HKV, num_pages, PS, D)), dt)
    kv = jax.jit(fuse_kv)(k, v)
    kv.block_until_ready()
    # Per-channel INT8 quantization of the fused K|V record (the headline
    # dtype).  Fused record lanes [:D] are K, [D:] are V — split the scale
    # row back into the (k_scale, k_off, v_scale, v_off) 4-tuple.
    kv8, sc, off = jax.jit(lambda a: quantize_kv(a, mode="per_channel"))(kv)
    kv_scales = (sc[:, :D], off[:, :D], sc[:, D:], off[:, D:])
    kv8.block_until_ready()
    del k, v
    bt = jnp.asarray(
        np.stack([rng.permutation(num_pages)[:max_page] for _ in range(B)]),
        jnp.int32)
    seq = jnp.full((B,), CTX, jnp.int32)
    cent = jnp.asarray(rng.standard_normal((HKV, C, D)), dt)
    block_ids = jnp.asarray(rng.integers(0, C, (HKV, num_pages)), jnp.int32)

    # NOTE: kv/bt/... must be explicit jit arguments — closed-over arrays
    # are baked into the program as constants (huge compile payloads).
    def dense8_step(qq, kv8, bt, seq, *scales):
        o = paged_flash_decode(qq, kv8, None, bt, seq, kv_scales=scales)
        return qq + o.astype(qq.dtype) * jnp.bfloat16(1e-6)

    def sparse8_step(qq, kv8, bt, cent, block_ids, seq, *scales):
        o, _, _ = sparse_paged_fusion_attention(
            qq, kv8, bt, cent, block_ids, seq, k=512, kv_scales=scales)
        return qq + o.astype(qq.dtype) * jnp.bfloat16(1e-6)

    def dense_step(qq, kv, bt, seq):
        o = paged_flash_decode(qq, kv, None, bt, seq)
        return qq + o * jnp.bfloat16(1e-6)

    def sparse_step(qq, kv, bt, cent, block_ids, seq):
        o, _, _ = sparse_paged_fusion_attention(
            qq, kv, bt, cent, block_ids, seq, k=512)
        return qq + o * jnp.bfloat16(1e-6)

    t_dense8 = slope_time(dense8_step, q, (kv8, bt, seq) + kv_scales)
    t_sparse8 = slope_time(
        sparse8_step, q, (kv8, bt, cent, block_ids, seq) + kv_scales)
    t_dense = slope_time(dense_step, q, (kv, bt, seq))
    t_sparse = slope_time(sparse_step, q, (kv, bt, cent, block_ids, seq))

    dense8_tps = B / t_dense8
    sparse8_tps = B / t_sparse8
    print(json.dumps({
        "metric": "sparse decode tokens/s/chip (1/8 centroid sparsity, "
                  f"B={B}, GQA {HQ}/{HKV}, D={D}, KV={CTX}, INT8 KV "
                  "per-channel)",
        "value": round(sparse8_tps, 2),
        "unit": "tokens/s/chip",
        "vs_baseline": round(sparse8_tps / dense8_tps, 3),
        "detail": {
            "dense_int8_ms": round(t_dense8 * 1e3, 4),
            "sparse_int8_ms": round(t_sparse8 * 1e3, 4),
            "dense_int8_tokens_per_s": round(dense8_tps, 2),
            "dense_bf16_ms": round(t_dense * 1e3, 4),
            "sparse_bf16_ms": round(t_sparse * 1e3, 4),
            "sparse_bf16_tokens_per_s": round(B / t_sparse, 2),
            "sparse_bf16_vs_dense_bf16": round(t_dense / t_sparse, 3),
            "sparse_int8_vs_dense_bf16": round(t_dense / t_sparse8, 3),
            "dense_int8_eff_GBps": round(
                HKV * max_page * PS * 2 * D * 1 / t_dense8 / 1e9, 1),
            "timing": "two-length chain slope (dispatch-floor exact-"
                      "subtracted), best-of-2 per length",
            "model_level_evidence": "docs/evidence/model_bench_L4_128k_"
                                    "b4_w8.jsonl (128K model-level: "
                                    "2.11x at B=4), docs/SWEEP_v5e.md "
                                    "(full grid: >=2x holds everywhere),"
                                    " docs/SPARSE_QUALITY.md (k<C "
                                    "quality + latency)",
        },
    }))


if __name__ == "__main__":
    main()
