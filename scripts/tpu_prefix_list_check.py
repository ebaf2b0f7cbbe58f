"""Real-chip drive of round-3 additions: shared-prefix feature composition
(bias + ALiBi + kv_start + out-quant) and tensor-list KV — Pallas
(interpret=False) vs the XLA gather fallback / oracle identities."""

import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from cann_ops_adv_vllm_tpu import api
from cann_ops_adv_vllm_tpu.ops.paged_attention import (
    fuse_kv, paged_attention_xla)
from cann_ops_adv_vllm_tpu.ops.prefix import (
    merge_partial_attention, shared_prefix_attention)

assert jax.default_backend() == "tpu", jax.default_backend()
rng = np.random.default_rng(0)

b, h_kv, g, d, ps = 2, 2, 4, 128, 128
h_q = h_kv * g
q = jnp.asarray(rng.standard_normal((b, h_q, d)), jnp.float32)
pk = jnp.asarray(rng.standard_normal((h_kv, 8, ps, d)), jnp.float32)
pv = jnp.asarray(rng.standard_normal((h_kv, 8, ps, d)), jnp.float32)
uk = jnp.asarray(rng.standard_normal((h_kv, 16, ps, d)), jnp.float32)
uv = jnp.asarray(rng.standard_normal((h_kv, 16, ps, d)), jnp.float32)
pre_table = jnp.asarray(rng.permutation(8)[:4].reshape(1, 4), jnp.int32)
pre_len = jnp.asarray([2 * ps + 3], jnp.int32)
mp = 8
usr_table = jnp.asarray(
    rng.permutation(16)[:b * mp].reshape(b, mp), jnp.int32)
kv_start = jnp.asarray([5, 0], jnp.int32)
usr_len = jnp.asarray([3 * ps - 11, 5 * ps + 7], jnp.int32)
slopes = jnp.asarray(rng.uniform(0.01, 0.1, h_q), jnp.float32)
bias_tiles = jnp.asarray(
    rng.standard_normal((b, 1, mp, ps)) * 0.5, jnp.float32)

got = shared_prefix_attention(
    q, fuse_kv(pk, pv), pre_table, pre_len,
    fuse_kv(uk, uv), usr_table, usr_len, kv_start=kv_start,
    bias_pages=bias_tiles, alibi_slopes=slopes, page_size=ps,
    interpret=False)

# same composition in interpreter mode (host-exact reference)
want = shared_prefix_attention(
    q, fuse_kv(pk, pv), pre_table, pre_len,
    fuse_kv(uk, uv), usr_table, usr_len, kv_start=kv_start,
    bias_pages=bias_tiles, alibi_slopes=slopes, page_size=ps,
    interpret=True)
np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                           rtol=2e-2, atol=2e-2)
print("prefix-composition chip vs interpret: OK")

# tensor-list KV on chip
lens = [190, 401, 77]
bl = len(lens)
ql = jnp.asarray(rng.standard_normal((bl, h_q, d)), jnp.float32)
keys = [jnp.asarray(rng.standard_normal((1, s, h_kv * d)), jnp.float32)
        for s in lens]
vals = [jnp.asarray(rng.standard_normal((1, s, h_kv * d)), jnp.float32)
        for s in lens]
out = api.incre_flash_attention(
    ql.reshape(bl, 1, h_q * d), keys, vals, num_heads=h_q,
    num_key_value_heads=h_kv, block_size=ps, interpret=False)
for bi, s in enumerate(lens):
    want = api.incre_flash_attention(
        ql[bi:bi + 1].reshape(1, 1, h_q * d), keys[bi], vals[bi],
        num_heads=h_q, num_key_value_heads=h_kv,
        actual_seq_lengths=jnp.asarray([s], jnp.int32), block_size=ps,
        interpret=False)
    np.testing.assert_allclose(np.asarray(out)[bi], np.asarray(want)[0],
                               rtol=2e-3, atol=2e-3)
print("tensor-list KV chip: OK")
print("ALL OK")
