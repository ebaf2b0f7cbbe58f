"""sp (sequence-parallel) sharding overhead on the virtual CPU mesh.

Times sp_sparse_attention at sp ∈ {1, 2, 4, 8} on identical work
(B=2, 8 KV heads, 64 selected of 128 pages) and reports per-step time
relative to sp=1.  CPU wall-clock — RELATIVE overhead of the extra
machinery (per-shard compaction, capped grid, LSE-merge psums) only;
absolute numbers are meaningless off-TPU.  Quantifies deviation #6 in
ARCHITECTURE.md (local-compute + LSE-merge instead of remote-page
gather-overlap): the cross-chip traffic is two [B, H_q(, D)] psums per
step regardless of context length.

Usage: XLA_FLAGS=--xla_force_host_platform_device_count=8 \
       JAX_PLATFORMS=cpu python scripts/sp_overhead.py
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

from cann_ops_adv_vllm_tpu.config import INT32_SENTINEL
from cann_ops_adv_vllm_tpu.parallel.mesh import make_mesh
from cann_ops_adv_vllm_tpu.parallel.sharded import sp_sparse_attention


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
    main()
