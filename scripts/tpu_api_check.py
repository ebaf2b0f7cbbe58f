"""On-device drive of the reference-named API surface (real TPU).

Exercises api.incre_flash_attention (layouts, vllm KV, continuous KV,
mask+pse, packed antiquant, kv padding, shared prefix),
api.sparse_paged_attention and api.sparse_paged_fusion_attention, plus
error-path probes.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

print("backend:", jax.default_backend(), jax.devices())
from cann_ops_adv_vllm_tpu import api  # noqa: E402
from cann_ops_adv_vllm_tpu.ops.paged_attention import (  # noqa: E402
    fuse_kv, paged_flash_decode)
from cann_ops_adv_vllm_tpu.ops.prefix import shared_prefix_attention  # noqa: E402
from cann_ops_adv_vllm_tpu.ops.quant import quantize_kv  # noqa: E402

rng = np.random.default_rng(0)
b, h_kv, g, d, ps, P, mp = 2, 2, 4, 128, 128, 64, 8
h_q = h_kv * g
q = jnp.asarray(rng.standard_normal((b, h_q, d)), jnp.float32)
k = jnp.asarray(rng.standard_normal((h_kv, P, ps, d)), jnp.float32)
v = jnp.asarray(rng.standard_normal((h_kv, P, ps, d)), jnp.float32)
bt = jnp.asarray(rng.permutation(P)[:b * mp].reshape(b, mp), jnp.int32)
sl = jnp.asarray(rng.integers(ps, mp * ps, b), jnp.int32)
fails = []


def check(name, err, tol=2e-3):
    print(f"{name}: max err {err:.2e}")
    if not (err < tol):
        fails.append(name)


ref = paged_flash_decode(q, fuse_kv(k, v), None, bt, sl, page_size=ps,
                         interpret=False)

# layouts
for lay, ql in (("BSH", q.reshape(b, 1, h_q * d)),
                ("BSND", q.reshape(b, 1, h_q, d)),
                ("BNSD", q.reshape(b, h_q, 1, d))):
    out = api.incre_flash_attention(
        ql, k, v, num_heads=h_q, num_key_value_heads=h_kv,
        input_layout=lay, block_table=bt, actual_seq_lengths=sl,
        block_size=ps)
    check(f"layout {lay}",
          float(jnp.abs(jnp.asarray(out).reshape(b, h_q, d) - ref).max()))

# vllm KV layout
k_vllm = jnp.transpose(k, (1, 2, 0, 3)).reshape(P, ps, h_kv * d)
v_vllm = jnp.transpose(v, (1, 2, 0, 3)).reshape(P, ps, h_kv * d)
out = api.incre_flash_attention(
    q.reshape(b, 1, h_q * d), k_vllm, v_vllm, num_heads=h_q,
    num_key_value_heads=h_kv, block_table=bt, actual_seq_lengths=sl,
    block_size=ps, kv_layout="vllm")
check("vllm kv",
      float(jnp.abs(jnp.asarray(out).reshape(b, h_q, d) - ref).max()))

# mask + pse + packed int8 antiquant together
s_tot = mp * ps
mask = jnp.asarray(rng.random((b, s_tot)) < 0.2)
pse = jnp.asarray(rng.standard_normal((b, h_kv, s_tot)) * 0.3, jnp.float32)
k_q, ks, ko = quantize_kv(k)
v_q, vs, vo = quantize_kv(v)
out = api.incre_flash_attention(
    q.reshape(b, 1, h_q * d), k_q, v_q, num_heads=h_q,
    num_key_value_heads=h_kv, block_table=bt, actual_seq_lengths=sl,
    block_size=ps, atten_mask=mask, pse_shift=pse,
    antiquant_scale=jnp.stack([ks, vs]),
    antiquant_offset=jnp.stack([ko, vo]))
bias = api.make_bias_pages(atten_mask=mask, pse_shift=pse, max_blocks=mp,
                           page_size=ps)
want = paged_flash_decode(q, fuse_kv(k_q, v_q), None, bt, sl,
                          kv_scales=(ks, ko, vs, vo), bias_pages=bias,
                          page_size=ps, interpret=False)
check("mask+pse+int8",
      float(jnp.abs(jnp.asarray(out).reshape(b, h_q, d) - want).max()))

# shared prefix on chip
pk = jnp.asarray(rng.standard_normal((h_kv, 8, ps, d)), jnp.float32)
pv = jnp.asarray(rng.standard_normal((h_kv, 8, ps, d)), jnp.float32)
pre_table = jnp.arange(4, dtype=jnp.int32).reshape(1, 4)
pre_len = jnp.asarray([2 * ps + 17], jnp.int32)
out = api.incre_flash_attention(
    q.reshape(b, 1, h_q * d), k, v, num_heads=h_q,
    num_key_value_heads=h_kv, block_table=bt, actual_seq_lengths=sl,
    block_size=ps, prefix_key=fuse_kv(pk, pv), prefix_table=pre_table,
    prefix_lens=pre_len)
want = shared_prefix_attention(
    q, fuse_kv(pk, pv), pre_table, pre_len, fuse_kv(k, v), bt, sl,
    page_size=ps, interpret=False)
check("shared prefix",
      float(jnp.abs(jnp.asarray(out).reshape(b, h_q, d) - want).max()))

# fusion api on chip
C = 32
l1 = jnp.asarray(rng.standard_normal((h_kv, C, d)), jnp.float32)
bids = jnp.asarray(rng.integers(0, C, (h_kv, P)), jnp.int32)
out, pos, ml = api.sparse_paged_fusion_attention(
    q.reshape(b, 1, h_q * d), k, v, block_table=bt, l1_cent=l1,
    block_ids=bids, total_seq_len=sl, num_heads=h_q,
    num_key_value_heads=h_kv, block_size=ps, k=8)
ok = bool(jnp.all(jnp.isfinite(out)))
print("fusion api finite:", ok, "out", out.shape, "pos", pos.shape)
if not ok:
    fails.append("fusion")

# probes: error paths
try:
    api.incre_flash_attention(
        jnp.zeros((b, 2, h_q * d)), k, v, num_heads=h_q,
        num_key_value_heads=h_kv, block_table=bt, actual_seq_lengths=sl,
        block_size=ps)
    fails.append("S=2 accepted")
except ValueError as e:
    print("probe S=2:", str(e)[:60])
try:
    api.incre_flash_attention(
        q.reshape(b, 1, h_q * d), k, v, num_heads=h_q,
        num_key_value_heads=h_kv, block_size=ps)
    fails.append("missing seq lens accepted")
except ValueError as e:
    print("probe no-seq-lens:", str(e)[:60])
try:
    api.incre_flash_attention(
        q.reshape(b, 1, h_q * d), k, v, num_heads=h_q,
        num_key_value_heads=h_kv, input_layout="NSBD", block_table=bt,
        actual_seq_lengths=sl, block_size=ps)
    fails.append("bad layout accepted")
except ValueError as e:
    print("probe bad-layout:", str(e)[:60])

if fails:
    print("FAILED:", fails)
    sys.exit(1)
print("TPU API OK")
