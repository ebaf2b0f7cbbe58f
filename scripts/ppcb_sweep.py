"""Sweep pages-per-compute-block (ppcb) for the dense decode kernel."""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from cann_ops_adv_vllm_tpu.ops.paged_attention import fuse_kv, paged_flash_decode

rng = np.random.default_rng(0)
B, HKV, G, D, PS = 1, 8, 4, 128, 128
HQ = HKV * G
CTX = int(os.environ.get("CTX", 128 * 1024))
mp = CTX // PS
P = mp + 16
dt = jnp.bfloat16
q = jnp.asarray(rng.standard_normal((B, HQ, D)), dt)
k = jnp.asarray(rng.standard_normal((HKV, P, PS, D)), dt)
v = jnp.asarray(rng.standard_normal((HKV, P, PS, D)), dt)
kv = jax.jit(fuse_kv)(k, v)
kv.block_until_ready()
del k, v
bt = jnp.asarray(np.stack([rng.permutation(P)[:mp] for _ in range(B)]),
                 jnp.int32)
seq = jnp.full((B,), CTX, jnp.int32)


def bench(ppcb, iters=30):
    def step(qq, kv, bt, seq):
        o = paged_flash_decode(qq, kv, None, bt, seq, ppcb=ppcb)
        return qq + o * dt(1e-6)

    @functools.partial(jax.jit, static_argnames=("n",))
    def chain(qq, kv, bt, seq, n):
        return jax.lax.fori_loop(0, n, lambda i, a: step(a, kv, bt, seq), qq)

    np.asarray(chain(q, kv, bt, seq, iters))
    t0 = time.time()
    np.asarray(chain(q, kv, bt, seq, iters))
    t = (time.time() - t0) / iters
    bw = 2 * HKV * mp * PS * D * 2 / t / 1e9
    print(f"ppcb={ppcb:3d}: {t * 1e3:7.3f} ms  eff {bw:6.1f} GB/s",
          flush=True)


for ppcb in [int(x) for x in sys.argv[1:]] or [8]:
    try:
        bench(ppcb)
    except Exception as e:
        print(f"ppcb={ppcb:3d}: FAILED {str(e)[:140]}", flush=True)
