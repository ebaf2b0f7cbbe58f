"""Benchmark: sparse vs dense decode attention throughput on one TPU chip.

Reproduces the reference's canonical perf configuration
(fused_ifa_v5_torch_case.py:21-41): B=1, 32 q-heads / 8 kv-heads (GQA 4:1),
D=128, C=512 centroids, page=128, KV context 128K, sparsity 1/8 — and
reports sparse decode tokens/s/chip with the dense paged-attention
tokens/s as the baseline (BASELINE.json north-star: sparse ≥ 2× dense).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Timing method: a dependency chain of decode steps (each step's query is
perturbed by the previous output) executed on device, closed by a forced
host transfer — immune to async-dispatch undercounting and to the
relay-level deduplication of identical requests.
"""

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

QUICK = os.environ.get("BENCH_QUICK", "") == "1"

B, HKV, G, D, PS, C = 1, 8, 4, 128, 128, 512
HQ = HKV * G
CTX = 32 * 1024 if QUICK else 128 * 1024
ITERS = 100 if QUICK else 300  # large: ~24 ms fixed dispatch per chain call must amortize


def chain_time(step, q, args, n):
    """Single-dispatch dependency chain: the n steps run inside one jit
    (lax.fori_loop), so per-call host→device dispatch latency (several ms
    through the axon tunnel) is amortized across the chain instead of
    added to every step.  ``args`` are jit operands, not closures."""
    import functools

    @functools.partial(jax.jit, static_argnames=("n",))
    def chain(qq, args, n):
        return jax.lax.fori_loop(0, n, lambda i, acc: step(acc, *args), qq)

    _ = np.asarray(chain(q, args, n))        # compile + warm
    t0 = time.time()
    _ = np.asarray(chain(q, args, n))
    return (time.time() - t0) / n


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
    del k, v
    bt = jnp.asarray(
        np.stack([rng.permutation(num_pages)[:max_page] for _ in range(B)]),
        jnp.int32)
    seq = jnp.full((B,), CTX, jnp.int32)
    cent = jnp.asarray(rng.standard_normal((HKV, C, D)), dt)
    block_ids = jnp.asarray(rng.integers(0, C, (HKV, num_pages)), jnp.int32)

    # NOTE: kv/bt/... must be explicit jit arguments — closed-over arrays
    # are baked into the program as constants (huge compile payloads).
    def dense_step(qq, kv, bt, seq):
        o = paged_flash_decode(qq, kv, None, bt, seq)
        return qq + o * jnp.bfloat16(1e-6)

    def sparse_step(qq, kv, bt, cent, block_ids, seq):
        o, _, _ = sparse_paged_fusion_attention(
            qq, kv, bt, cent, block_ids, seq, k=512)
        return qq + o * jnp.bfloat16(1e-6)

    t_dense = chain_time(dense_step, q, (kv, bt, seq), ITERS)
    t_sparse = chain_time(sparse_step, q, (kv, bt, cent, block_ids, seq),
                          ITERS)

    dense_tps = B / t_dense
    sparse_tps = B / t_sparse
    print(json.dumps({
        "metric": "sparse decode tokens/s/chip (1/8 centroid sparsity, "
                  f"B={B}, GQA {HQ}/{HKV}, D={D}, KV={CTX}, bf16 KV)",
        "value": round(sparse_tps, 2),
        "unit": "tokens/s/chip",
        "vs_baseline": round(sparse_tps / dense_tps, 3),
        "detail": {
            "dense_ms": round(t_dense * 1e3, 3),
            "sparse_ms": round(t_sparse * 1e3, 3),
            "dense_tokens_per_s": round(dense_tps, 2),
            "dense_eff_GBps": round(
                2 * HKV * max_page * PS * D * 2 / t_dense / 1e9, 1),
        },
    }))


if __name__ == "__main__":
    main()
