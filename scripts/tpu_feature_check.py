"""On-device check of the IFA misc-feature kernel paths (run on real TPU).

Exercises bias pages (mask), per-kv-head bias, ALiBi + kv-left-padding,
post-quant int8 out, per-token antiquant, and empty-sequence zero-fill
against the XLA fallback.  Complements the CPU interpret-mode tests in
tests/test_ifa_features.py.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

print("backend:", jax.default_backend(), jax.devices())
from cann_ops_adv_vllm_tpu.ops.paged_attention import (  # noqa: E402
    fuse_kv, paged_attention_xla, paged_flash_decode)
from cann_ops_adv_vllm_tpu.ops.quant import quantize_kv  # noqa: E402
from cann_ops_adv_vllm_tpu.config import MASK_VALUE  # noqa: E402

rng = np.random.default_rng(0)
b, h_kv, g, d, ps, P, mp = 2, 2, 4, 128, 128, 64, 16
h_q = h_kv * g
q = jnp.asarray(rng.standard_normal((b, h_q, d)), jnp.float32)
k = jnp.asarray(rng.standard_normal((h_kv, P, ps, d)), jnp.float32)
v = jnp.asarray(rng.standard_normal((h_kv, P, ps, d)), jnp.float32)
bt = jnp.asarray(rng.permutation(P)[:b * mp].reshape(b, mp), jnp.int32)
sl = jnp.asarray(rng.integers(ps, mp * ps, b), jnp.int32)
kv = fuse_kv(k, v)
fails = []


def check(name, err, tol=2e-3):
    print(f"{name}: max err {err:.2e}")
    if not (err < tol):
        fails.append(name)


bias = jnp.where(jnp.asarray(rng.random((b, 1, mp, ps)) < 0.3),
                 MASK_VALUE, 0.).astype(jnp.float32)
got = paged_flash_decode(q, kv, None, bt, sl, bias_pages=bias,
                         page_size=ps, interpret=False)
want = paged_attention_xla(q, k, v, bt, sl, bias_pages=bias, page_size=ps)
check("mask", float(jnp.abs(got - want).max()))

bias2 = jnp.asarray(rng.standard_normal((b, h_kv, mp, ps)) * 0.4, jnp.float32)
got = paged_flash_decode(q, kv, None, bt, sl, bias_pages=bias2,
                         page_size=ps, interpret=False)
want = paged_attention_xla(q, k, v, bt, sl, bias_pages=bias2, page_size=ps)
check("per-head bias", float(jnp.abs(got - want).max()))

slopes = jnp.asarray(np.linspace(0.01, 0.2, h_q), jnp.float32)
st = jnp.asarray(rng.integers(0, 2 * ps, b), jnp.int32)
got = paged_flash_decode(q, kv, None, bt, sl, kv_start=st,
                         alibi_slopes=slopes, page_size=ps, interpret=False)
want = paged_attention_xla(q, k, v, bt, sl, kv_start=st,
                           alibi_slopes=slopes, page_size=ps)
# large alibi biases concentrate the softmax, amplifying the MXU's
# bf16-pass f32 rounding relative to the XLA gather path
check("alibi+pad", float(jnp.abs(got - want).max()), tol=2e-2)

s2 = jnp.full((h_q, d), 30.0, jnp.float32)
o2 = jnp.zeros((h_q, d), jnp.float32)
got = paged_flash_decode(q, kv, None, bt, sl, out_quant=(s2, o2),
                         page_size=ps, interpret=False)
want = paged_attention_xla(q, k, v, bt, sl, out_quant=(s2, o2), page_size=ps)
di = int(jnp.abs(got.astype(jnp.int32) - want.astype(jnp.int32)).max())
print("int8 out dtype:", got.dtype, "max |diff|:", di)
if got.dtype != jnp.int8 or di > 1:
    fails.append("int8 out")

kq, ks, ko = quantize_kv(k, mode="per_token")
vq, vs, vo = quantize_kv(v, mode="per_token")
got = paged_flash_decode(q, fuse_kv(kq, vq), None, bt, sl,
                         kv_scales=(ks, ko, vs, vo), page_size=ps,
                         interpret=False)
want = paged_attention_xla(q, kq, vq, bt, sl, kv_scales=(ks, ko, vs, vo),
                           page_size=ps)
check("per-token quant", float(jnp.abs(got - want).max()))

got = paged_flash_decode(q, kv, None, bt, sl.at[0].set(0),
                         page_size=ps, interpret=False)
ok = bool(jnp.all(got[0] == 0)) and bool(jnp.all(jnp.isfinite(got)))
print("empty zero-fill:", ok)
if not ok:
    fails.append("empty")

# --- mixed per-channel-token mode (K chan + V token) ---
kq8, ks8, ko8 = quantize_kv(k, mode="per_channel")
got = paged_flash_decode(q, fuse_kv(kq8, vq), None, bt, sl,
                         kv_scales=(ks8, ko8, vs, vo), page_size=ps,
                         interpret=False)
want = paged_attention_xla(q, kq8, vq, bt, sl,
                           kv_scales=(ks8, ko8, vs, vo), page_size=ps)
check("chan-token mixed", float(jnp.abs(got - want).max()))

# --- packed int4 KV (dense + sparse) ---
from cann_ops_adv_vllm_tpu.ops.quant import (  # noqa: E402
    quantize_kv_int4, unpack_int4_fused)

packed, i4s = quantize_kv_int4(kv, mode="per_channel")
unp = unpack_int4_fused(packed).astype(jnp.float32)
k4 = unp[..., :d] * i4s[0][:, None, None, :] + i4s[1][:, None, None, :]
v4 = unp[..., d:] * i4s[2][:, None, None, :] + i4s[3][:, None, None, :]
got = paged_flash_decode(q, packed, None, bt, sl, kv_scales=i4s,
                         kv_int4=True, page_size=ps, interpret=False)
want = paged_attention_xla(q, k4, v4, bt, sl, page_size=ps)
check("int4 dense", float(jnp.abs(got - want).max()))

positions = jnp.sort(jnp.asarray(
    np.stack([np.stack([rng.permutation(mp)[:6] for _ in range(h_kv)])
              for _ in range(b)]), jnp.int32), axis=2)
plens = jnp.full((b, h_kv), 5, jnp.int32)
got = paged_flash_decode(q, packed, None, bt, sl, positions, plens,
                         kv_scales=i4s, kv_int4=True, page_size=ps,
                         interpret=False)
want = paged_attention_xla(q, k4, v4, bt, sl, positions, plens,
                           page_size=ps)
check("int4 sparse", float(jnp.abs(got - want).max()))

# --- fused k=C shared-position row == explicit per-head positions ---
from cann_ops_adv_vllm_tpu.ops.fused import (  # noqa: E402
    sparse_paged_fusion_attention)
from cann_ops_adv_vllm_tpu.ops.cent_select import cent_select  # noqa: E402

C = 32
cent = jnp.asarray(rng.standard_normal((h_kv, C, d)), jnp.float32)
bids = jnp.asarray(rng.integers(0, C, (h_kv, P)), jnp.int32)
out_f, pos_f, _ = sparse_paged_fusion_attention(
    q, kv, bt, cent, bids, sl, k=C, group_mode="kv_group", interpret=False)
pos_s, plen_s, _ = cent_select(q, cent, bids, bt, sl, k=C,
                               group_mode="kv_group")
want = paged_flash_decode(q, kv, None, bt, sl, pos_s[:, :h_kv],
                          plen_s[:, :h_kv, 0], page_size=ps,
                          interpret=False)
check("fused shared-row (k=C)", float(jnp.abs(out_f - want).max()), 2e-5)

# --- run-coalesced multi-page DMA descriptors (opt-in): exact vs
# --- per-page DMA on contiguous physical tables with mixed run lengths
bt_c = jnp.stack([jnp.arange(16, dtype=jnp.int32),
                  16 + jnp.arange(16, dtype=jnp.int32)])
sl_c = jnp.asarray([16 * ps, 11 * ps + 7], jnp.int32)
import numpy as _np
from cann_ops_adv_vllm_tpu.config import INT32_SENTINEL
pos_c = _np.full((2, h_kv, 16), INT32_SENTINEL, _np.int32)
len_c = _np.zeros((2, h_kv), _np.int32)
for bi2 in range(2):
    hi2 = -(-int(sl_c[bi2]) // ps)
    for h2 in range(h_kv):
        sel2 = sorted(set([0] + list(range(2, min(2 + 9, hi2)))
                          + [hi2 - 1]))
        pos_c[bi2, h2, :len(sel2)] = sel2
        len_c[bi2, h2] = len(sel2)
pos_c, len_c = jnp.asarray(pos_c), jnp.asarray(len_c)
o_co = paged_flash_decode(q, kv, None, bt_c, sl_c, pos_c, len_c,
                          page_size=ps, coalesce=True, interpret=False)
o_pp = paged_flash_decode(q, kv, None, bt_c, sl_c, pos_c, len_c,
                          page_size=ps, coalesce=False, interpret=False)
check("coalesced-run DMA exact", float(jnp.abs(o_co - o_pp).max()), 1e-12)

# --- int8 KV cache through the model decode step (per-token online) ---
import dataclasses  # noqa: E402
from cann_ops_adv_vllm_tpu.models import llama  # noqa: E402

cfg8 = dataclasses.replace(llama.TINY_LLAMA, num_centroids=0,
                           dtype=jnp.float32, kv_cache_dtype="int8")
cfgf = dataclasses.replace(cfg8, kv_cache_dtype="auto")
params = llama.init_params(cfgf, jax.random.key(0))
tokens = jax.random.randint(jax.random.key(1), (2, 9), 0, cfgf.vocab_size)
btm = jnp.stack([jnp.arange(8, dtype=jnp.int32),
                 8 + jnp.arange(8, dtype=jnp.int32)])
lf, _ = llama.prefill(cfgf, params, tokens, llama.init_kv_cache(cfgf, 16),
                      btm)
l8, _ = llama.prefill(cfg8, params, tokens, llama.init_kv_cache(cfg8, 16),
                      btm)
check("model int8 KV cache", float(jnp.abs(lf - l8).max()
                                   / (jnp.abs(lf).max() + 1e-9)), 5e-2)

if fails:
    print("FAILED:", fails)
    sys.exit(1)
print("TPU OK")
