"""sp (sequence-parallel) sharding overhead.

Default (virtual CPU mesh): times sp_sparse_attention at sp ∈ {1, 2, 4,
8} on identical work (B=2, 8 KV heads, 64 selected of 128 pages) and
reports per-step time relative to sp=1.  CPU wall-clock — RELATIVE
overhead of the extra machinery (per-shard compaction, capped grid,
LSE-merge psums) only; absolute numbers are meaningless off-TPU.
Quantifies deviation #6 in ARCHITECTURE.md (local-compute + LSE-merge
instead of remote-page gather-overlap): the cross-chip traffic is two
[B, H_q(, D)] psums per step regardless of context length.

Why the CPU ratio GROWS with sp (sp=8 ≈ 1.9×): every sp shard pays the
full per-shard FIXED work — the [B, H, M] compaction of the global
selected list, metadata resolution, and kernel launch — while only the
kernel's page grid shrinks (to the 2×-margin cap).  On the virtual mesh
all shards time-slice the same host cores, so wall clock ≈ sp × fixed +
shrunk-kernel, and the fixed part dominates at sp=8.  On real chips the
shards run concurrently on their own cores, so the expected cost is
max(fixed + kernel/sp) + psum — the ratio is a host-emulation artifact,
not projected ICI behavior.

Usage: XLA_FLAGS=--xla_force_host_platform_device_count=8 \
       JAX_PLATFORMS=cpu python scripts/sp_overhead.py

On-chip mode (``--tpu``): the one sp number a single chip CAN produce —
sp=1 sp_sparse_attention (full machinery: compaction, capped grid, LSE
merge, degenerate psums) vs the plain kernel on identical inputs, chain-
slope timed on the real TPU.
"""

import argparse
import json
import os
import sys
import time

if "--tpu" not in sys.argv:
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=8")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if "--tpu" not in sys.argv:
    jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

from cann_ops_adv_vllm_tpu.config import INT32_SENTINEL
from cann_ops_adv_vllm_tpu.parallel.mesh import make_mesh
from cann_ops_adv_vllm_tpu.parallel.sharded import sp_sparse_attention


def main_tpu():
    """sp=1 full-machinery vs plain kernel, chain-slope on the chip."""
    import functools

    from cann_ops_adv_vllm_tpu.ops.paged_attention import (
        paged_flash_decode,
    )

    b, h_kv, g, d, ps = 1, 8, 4, 128, 128
    h_q = h_kv * g
    ctx = 128 * 1024
    num_pages, mp = ctx // ps + 8, ctx // ps
    m_sel = mp // 8
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((b, h_q, d)), jnp.bfloat16)
    kv = jnp.asarray(
        rng.standard_normal((h_kv, num_pages, ps, 2 * d)), jnp.bfloat16)
    bt = jnp.asarray(np.arange(mp, dtype=np.int32)[None])
    seq = jnp.full((b,), ctx, jnp.int32)
    pos = np.full((b, h_kv, m_sel), INT32_SENTINEL, np.int32)
    for h in range(h_kv):
        pos[0, h] = np.sort(rng.permutation(mp)[:m_sel])
    positions = jnp.asarray(pos)
    plens = jnp.full((b, h_kv), m_sel, jnp.int32)

    mesh = make_mesh(dp=1, tp=1, sp=1)
    attend = sp_sparse_attention(mesh, page_size=ps)

    def slope(fn, n1=50, n2=250):
        # kv/tables are explicit jit operands — closed-over arrays are
        # baked into the program as constants (the 0.5 GB pool would
        # exceed the remote-compile transport)
        @functools.partial(jax.jit, static_argnames=("n",))
        def chain(qq, kv, bt, seq, pos, plens, n):
            return jax.lax.fori_loop(
                0, n, lambda i, acc: acc
                + fn(acc, kv, bt, seq, pos, plens).astype(acc.dtype)
                * jnp.bfloat16(1e-6), qq)
        args = (kv, bt, seq, positions, plens)
        for n in (n1, n2):
            np.asarray(chain(q, *args, n))
        best = {}
        for n in (n1, n2, n1, n2):
            t0 = time.perf_counter()
            np.asarray(chain(q, *args, n))
            best[n] = min(best.get(n, 1e9), time.perf_counter() - t0)
        return (best[n2] - best[n1]) / (n2 - n1)

    t_sp = slope(lambda qq, kv, bt, seq, pos, plens: attend(
        qq, kv, bt, seq, pos, plens))
    t_plain = slope(lambda qq, kv, bt, seq, pos, plens: paged_flash_decode(
        qq, kv, None, bt, seq, pos, plens, page_size=ps))
    print(json.dumps({
        "mode": "tpu sp=1 overhead (canonical 128K per-head sparse)",
        "sp1_step_ms": round(t_sp * 1e3, 4),
        "plain_step_ms": round(t_plain * 1e3, 4),
        "sp_machinery_overhead": round(t_sp / t_plain, 3),
    }))


def main():
    b, h_kv, g, d, ps = 2, 8, 4, 128, 16
    h_q = h_kv * g
    num_pages, mp, m_sel = 128, 64, 64
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((b, h_q, d)), jnp.float32)
    kv = jnp.asarray(
        rng.standard_normal((h_kv, num_pages, ps, 2 * d)), jnp.float32)
    bt = jnp.asarray(np.stack([rng.permutation(num_pages)[:mp]
                               for _ in range(b)]), jnp.int32)
    seq = jnp.full((b,), mp * ps, jnp.int32)
    pos = np.full((b, h_kv, m_sel), INT32_SENTINEL, np.int32)
    for bi in range(b):
        for h in range(h_kv):
            pos[bi, h] = np.sort(rng.permutation(mp)[:m_sel])
    positions = jnp.asarray(pos)
    plens = jnp.full((b, h_kv), m_sel // 2, jnp.int32)

    base = None
    for sp in (1, 2, 4, 8):
        mesh = make_mesh(dp=1, tp=1, sp=sp)
        attend = sp_sparse_attention(mesh, page_size=ps)
        fn = jax.jit(lambda *a: attend(*a))
        args = (q, kv, bt, seq, positions, plens)
        np.asarray(fn(*args))                       # compile
        ts = []
        for _ in range(30):
            t0 = time.perf_counter()
            np.asarray(fn(*args))
            ts.append(time.perf_counter() - t0)
        ms = float(np.median(ts) * 1e3)
        if base is None:
            base = ms
        print(json.dumps({
            "sp": sp, "step_ms_cpu": round(ms, 3),
            "vs_sp1": round(ms / base, 3),
            "psum_bytes_per_step": int(b * h_q * (d + 1) * 4),
        }), flush=True)


if __name__ == "__main__":
    if "--tpu" in sys.argv:
        main_tpu()
    else:
        main()
