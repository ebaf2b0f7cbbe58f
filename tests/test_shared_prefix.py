"""Shared-prefix two-pass attention vs a concatenated-sequence oracle.

The reference computes system-prompt attention as two kernel passes merged
by LSE scales (ProcessSysPrefixCombine, split header :3650-3809); the
ground truth is plain attention over the concatenation [prefix ‖ user].
"""

import numpy as np
import jax.numpy as jnp

from cann_ops_adv_vllm_tpu.config import MASK_VALUE
from cann_ops_adv_vllm_tpu.ops.paged_attention import fuse_kv
from cann_ops_adv_vllm_tpu.ops.prefix import (
    merge_partial_attention,
    shared_prefix_attention,
)
from cann_ops_adv_vllm_tpu import api


def _concat_oracle(q, pre_k, pre_v, usr_k, usr_v):
    """Dense attention over [prefix ‖ user] tokens.  pre/usr: [H_kv, S, D]
    token streams per batch entry (lists over batch)."""
    q = np.asarray(q, np.float64)
    b, h_q, d = q.shape
    h_kv = pre_k[0].shape[0]
    g = h_q // h_kv
    scale = 1.0 / np.sqrt(d)
    out = np.zeros((b, h_q, d))
    for bi in range(b):
        for hq in range(h_q):
            hk = hq // g
            keys = np.concatenate([pre_k[bi][hk], usr_k[bi][hk]], axis=0)
            vals = np.concatenate([pre_v[bi][hk], usr_v[bi][hk]], axis=0)
            s = scale * (keys @ q[bi, hq])
            e = np.exp(s - s.max())
            out[bi, hq] = (e / e.sum()) @ vals
    return out


def test_shared_prefix_matches_concat():
    rng = np.random.default_rng(0)
    b, h_kv, g, d, ps = 2, 2, 4, 128, 16
    h_q = h_kv * g
    pre_pages, usr_pages, mp_pre, mp_usr = 8, 16, 4, 8

    q = jnp.asarray(rng.standard_normal((b, h_q, d)), jnp.float32)
    pk = jnp.asarray(rng.standard_normal((h_kv, pre_pages, ps, d)),
                     jnp.float32)
    pv = jnp.asarray(rng.standard_normal((h_kv, pre_pages, ps, d)),
                     jnp.float32)
    uk = jnp.asarray(rng.standard_normal((h_kv, usr_pages, ps, d)),
                     jnp.float32)
    uv = jnp.asarray(rng.standard_normal((h_kv, usr_pages, ps, d)),
                     jnp.float32)

    # one shared prefix row (broadcasts over batch)
    pre_table = jnp.asarray(
        rng.permutation(pre_pages)[:mp_pre].reshape(1, mp_pre), jnp.int32)
    pre_len = jnp.asarray([2 * ps + 5], jnp.int32)
    usr_table = jnp.asarray(
        rng.permutation(usr_pages)[:b * mp_usr].reshape(b, mp_usr),
        jnp.int32)
    usr_len = jnp.asarray(rng.integers(1, mp_usr * ps, b), jnp.int32)

    got = shared_prefix_attention(
        q, fuse_kv(pk, pv), pre_table, pre_len,
        fuse_kv(uk, uv), usr_table, usr_len, page_size=ps)

    def tokens(pages_k, pages_v, table_row, n):
        ks = [np.asarray(pages_k)[:, int(table_row[t // ps]), t % ps]
              for t in range(n)]
        vs = [np.asarray(pages_v)[:, int(table_row[t // ps]), t % ps]
              for t in range(n)]
        stack = lambda xs: (np.stack(xs, axis=1) if xs
                            else np.zeros((pages_k.shape[0], 0, d)))
        return stack(ks), stack(vs)

    pre_k, pre_v, usr_k, usr_v = [], [], [], []
    for bi in range(b):
        a, c = tokens(pk, pv, pre_table[0], int(pre_len[0]))
        pre_k.append(a); pre_v.append(c)
        a, c = tokens(uk, uv, usr_table[bi], int(usr_len[bi]))
        usr_k.append(a); usr_v.append(c)
    want = _concat_oracle(q, pre_k, pre_v, usr_k, usr_v)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)


def test_empty_prefix_reduces_to_plain():
    rng = np.random.default_rng(1)
    b, h_kv, g, d, ps = 2, 2, 2, 128, 16
    h_q = h_kv * g
    q = jnp.asarray(rng.standard_normal((b, h_q, d)), jnp.float32)
    pk = jnp.zeros((h_kv, 4, ps, 2 * d), np.float32)
    uk = jnp.asarray(rng.standard_normal((h_kv, 16, ps, d)), jnp.float32)
    uv = jnp.asarray(rng.standard_normal((h_kv, 16, ps, d)), jnp.float32)
    usr_table = jnp.asarray(
        rng.permutation(16)[:b * 8].reshape(b, 8), jnp.int32)
    usr_len = jnp.asarray(rng.integers(1, 8 * ps, b), jnp.int32)

    from cann_ops_adv_vllm_tpu.ops.paged_attention import paged_flash_decode
    got = shared_prefix_attention(
        q, pk, jnp.zeros((1, 4), jnp.int32), jnp.asarray([0], jnp.int32),
        fuse_kv(uk, uv), usr_table, usr_len, page_size=ps)
    want = paged_flash_decode(q, fuse_kv(uk, uv), None, usr_table, usr_len,
                              page_size=ps)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_merge_partial_attention_n_way():
    """The LSE merge is associative across N partials — the primitive
    behind prefix combine, intra-chip splitKV and cross-chip SP."""
    rng = np.random.default_rng(2)
    b, h, d, n = 2, 4, 32, 3
    outs, lses, all_s, all_v = [], [], [], []
    for i in range(n):
        s = rng.standard_normal((b, h, 16)) * (i + 1)  # distinct maxima
        v = rng.standard_normal((b, h, 16, d))
        m = s.max(-1, keepdims=True)
        e = np.exp(s - m)
        outs.append(jnp.asarray(
            np.einsum("bhs,bhsd->bhd", e, v) / e.sum(-1, keepdims=True),
            jnp.float32))
        lses.append(jnp.asarray(m[..., 0] + np.log(e.sum(-1)), jnp.float32))
        all_s.append(s)
        all_v.append(v)
    s = np.concatenate(all_s, axis=-1)
    v = np.concatenate(all_v, axis=-2)
    e = np.exp(s - s.max(-1, keepdims=True))
    want = np.einsum("bhs,bhsd->bhd", e, v) / e.sum(-1, keepdims=True)
    got, _ = merge_partial_attention(outs, lses)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)


def _featured_oracle(q, pre_k, pre_v, usr_k, usr_v, *, kv_start=None,
                     bias=None, slopes=None, out_quant=None):
    """Dense attention over [prefix ‖ user] with bias/alibi/kv_start/
    out-quant.  pre/usr: per-batch [H_kv, S, D] token streams; bias:
    per-batch [S_usr] additive on user tokens; user token at local
    position t (t ≥ kv_start) sits at global position P + t − kv_start."""
    q = np.asarray(q, np.float64)
    b, h_q, d = q.shape
    h_kv = pre_k[0].shape[0]
    g = h_q // h_kv
    scale = 1.0 / np.sqrt(d)
    out = np.zeros((b, h_q, d))
    for bi in range(b):
        p = pre_k[bi].shape[1]
        start = 0 if kv_start is None else int(kv_start[bi])
        s_usr = usr_k[bi].shape[1]
        qpos = p + s_usr - 1
        for hq in range(h_q):
            hk = hq // g
            keys = np.concatenate([pre_k[bi][hk], usr_k[bi][hk]], axis=0)
            vals = np.concatenate([pre_v[bi][hk], usr_v[bi][hk]], axis=0)
            s = scale * (keys @ q[bi, hq])
            if bias is not None:
                s[p:] += np.asarray(bias[bi], np.float64)
            if slopes is not None:
                pos = np.concatenate([np.arange(p),
                                      p + np.arange(s_usr)])
                s += float(slopes[hq]) * (pos - qpos)
            e = np.exp(s - s.max())
            out[bi, hq] = (e / e.sum()) @ vals
        del start  # start folded into usr_k extraction by the caller
    if out_quant is not None:
        sc, off = out_quant
        out = np.clip(np.round(out * sc + off), -128, 127)
    return out


def test_shared_prefix_composes_features():
    """Prefix mode with ALiBi + user-side bias + kv-left-padding together
    (the reference's SYS_PREFIX path carries the full feature matrix —
    incre_flash_attention.cpp INVOKE_IFA_GENERAL_OP_IMPL_PREFIX)."""
    rng = np.random.default_rng(7)
    b, h_kv, g, d, ps = 2, 2, 4, 128, 16
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
    usr_len = jnp.asarray([40, 70], jnp.int32)
    slopes = jnp.asarray(rng.uniform(0.01, 0.1, h_q), jnp.float32)
    bias_tiles = jnp.asarray(
        rng.standard_normal((b, 1, mp, ps)) * 0.5, jnp.float32)

    got = shared_prefix_attention(
        q, fuse_kv(pk, pv), pre_table, pre_len,
        fuse_kv(uk, uv), usr_table, usr_len, kv_start=kv_start,
        bias_pages=bias_tiles, alibi_slopes=slopes, page_size=ps)

    def tokens(pages_k, pages_v, table_row, lo, hi):
        ks = [np.asarray(pages_k)[:, int(table_row[t // ps]), t % ps]
              for t in range(lo, hi)]
        vs = [np.asarray(pages_v)[:, int(table_row[t // ps]), t % ps]
              for t in range(lo, hi)]
        stack = lambda xs: (np.stack(xs, axis=1) if xs
                            else np.zeros((pages_k.shape[0], 0, d)))
        return stack(ks), stack(vs)

    pre_k, pre_v, usr_k, usr_v, ubias = [], [], [], [], []
    bias_flat = np.asarray(bias_tiles)[:, 0].reshape(b, mp * ps)
    for bi in range(b):
        a, c = tokens(pk, pv, pre_table[0], 0, int(pre_len[0]))
        pre_k.append(a); pre_v.append(c)
        lo = int(kv_start[bi])
        hi = lo + int(usr_len[bi])
        a, c = tokens(uk, uv, usr_table[bi], lo, hi)
        usr_k.append(a); usr_v.append(c)
        ubias.append(bias_flat[bi, lo:hi])
    want = _featured_oracle(q, pre_k, pre_v, usr_k, usr_v,
                            bias=ubias, slopes=np.asarray(slopes))
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-4)


def test_shared_prefix_out_quant():
    rng = np.random.default_rng(8)
    b, h_kv, g, d, ps = 1, 2, 2, 128, 16
    h_q = h_kv * g
    q = jnp.asarray(rng.standard_normal((b, h_q, d)), jnp.float32)
    pk = jnp.asarray(rng.standard_normal((h_kv, 4, ps, d)), jnp.float32)
    pv = jnp.asarray(rng.standard_normal((h_kv, 4, ps, d)), jnp.float32)
    uk = jnp.asarray(rng.standard_normal((h_kv, 8, ps, d)), jnp.float32)
    uv = jnp.asarray(rng.standard_normal((h_kv, 8, ps, d)), jnp.float32)
    pre_table = jnp.arange(4, dtype=jnp.int32).reshape(1, 4)
    usr_table = jnp.arange(8, dtype=jnp.int32).reshape(1, 8)
    pre_len = jnp.asarray([ps + 2], jnp.int32)
    usr_len = jnp.asarray([3 * ps - 5], jnp.int32)

    got = shared_prefix_attention(
        q, fuse_kv(pk, pv), pre_table, pre_len,
        fuse_kv(uk, uv), usr_table, usr_len,
        out_quant=(jnp.float32(100.0), jnp.float32(2.0)), page_size=ps)
    assert got.dtype == jnp.int8
    base = shared_prefix_attention(
        q, fuse_kv(pk, pv), pre_table, pre_len,
        fuse_kv(uk, uv), usr_table, usr_len, page_size=ps)
    want = np.clip(np.round(np.asarray(base, np.float64) * 100.0 + 2.0),
                   -128, 127)
    np.testing.assert_allclose(np.asarray(got, np.int32), want, atol=1)


def test_api_shared_prefix_path():
    rng = np.random.default_rng(3)
    b, h_kv, g, d, ps = 2, 2, 2, 128, 16
    h_q = h_kv * g
    q = jnp.asarray(rng.standard_normal((b, h_q, d)), jnp.float32)
    pk = jnp.asarray(rng.standard_normal((h_kv, 8, ps, d)), jnp.float32)
    pv = jnp.asarray(rng.standard_normal((h_kv, 8, ps, d)), jnp.float32)
    uk = jnp.asarray(rng.standard_normal((h_kv, 16, ps, d)), jnp.float32)
    uv = jnp.asarray(rng.standard_normal((h_kv, 16, ps, d)), jnp.float32)
    pre_table = jnp.arange(4, dtype=jnp.int32).reshape(1, 4)
    usr_table = jnp.asarray(
        rng.permutation(16)[:b * 8].reshape(b, 8), jnp.int32)
    usr_len = jnp.asarray([40, 70], jnp.int32)

    out = api.incre_flash_attention(
        q.reshape(b, 1, h_q * d), uk, uv, num_heads=h_q,
        num_key_value_heads=h_kv, block_table=usr_table,
        actual_seq_lengths=usr_len, block_size=ps,
        prefix_key=fuse_kv(pk, pv), prefix_table=pre_table,
        prefix_lens=jnp.asarray([2 * ps], jnp.int32))
    want = shared_prefix_attention(
        q, fuse_kv(pk, pv), pre_table, jnp.asarray([2 * ps], jnp.int32),
        fuse_kv(uk, uv), usr_table, usr_len, page_size=ps)
    np.testing.assert_allclose(np.asarray(out).reshape(b, h_q, d),
                               np.asarray(want), rtol=1e-5, atol=1e-5)


def test_api_prefix_total_s_mask_split():
    """Reference-shaped atten_mask/pse over totalS = prefix + user splits
    at prefix_len: [:pl] biases the prefix pass, [pl:] the user pass
    (the reference's tiling sizes both against the concatenated KV)."""
    rng = np.random.default_rng(7)
    b, h_kv, g, d, ps = 2, 2, 2, 128, 16
    h_q = h_kv * g
    mp_pre, mp_usr = 4, 8
    pl = 2 * ps
    q = jnp.asarray(rng.standard_normal((b, h_q, d)), jnp.float32)
    pk = jnp.asarray(rng.standard_normal((h_kv, 8, ps, d)), jnp.float32)
    pv = jnp.asarray(rng.standard_normal((h_kv, 8, ps, d)), jnp.float32)
    uk = jnp.asarray(rng.standard_normal((h_kv, 16, ps, d)), jnp.float32)
    uv = jnp.asarray(rng.standard_normal((h_kv, 16, ps, d)), jnp.float32)
    pre_table = jnp.arange(mp_pre, dtype=jnp.int32).reshape(1, mp_pre)
    usr_table = jnp.asarray(
        rng.permutation(16)[:b * mp_usr].reshape(b, mp_usr), jnp.int32)
    usr_len = jnp.asarray([40, 70], jnp.int32)

    total_s = pl + mp_usr * ps
    mask = (rng.random((b, total_s)) < 0.3).astype(np.int8)
    mask[:, 0] = 0      # keep at least the sink token visible everywhere

    out = api.incre_flash_attention(
        q.reshape(b, 1, h_q * d), uk, uv, num_heads=h_q,
        num_key_value_heads=h_kv, block_table=usr_table,
        actual_seq_lengths=usr_len, block_size=ps,
        atten_mask=jnp.asarray(mask),
        prefix_key=fuse_kv(pk, pv), prefix_table=pre_table,
        prefix_lens=[pl])

    pre_bias = api.make_bias_pages(
        atten_mask=jnp.asarray(mask[:, :pl]), max_blocks=mp_pre,
        page_size=ps)
    usr_bias = api.make_bias_pages(
        atten_mask=jnp.asarray(mask[:, pl:]), max_blocks=mp_usr,
        page_size=ps)
    want = shared_prefix_attention(
        q, fuse_kv(pk, pv), pre_table, jnp.asarray([pl], jnp.int32),
        fuse_kv(uk, uv), usr_table, usr_len,
        bias_pages=usr_bias, prefix_bias_pages=pre_bias, page_size=ps)
    np.testing.assert_allclose(np.asarray(out).reshape(b, h_q, d),
                               np.asarray(want), rtol=1e-5, atol=1e-5)

    # non-uniform prefix_lens with a total-S mask must raise, not silently
    # mis-index
    import pytest
    with pytest.raises(ValueError, match="uniform prefix length"):
        api.incre_flash_attention(
            q.reshape(b, 1, h_q * d), uk, uv, num_heads=h_q,
            num_key_value_heads=h_kv, block_table=usr_table,
            actual_seq_lengths=usr_len, block_size=ps,
            atten_mask=jnp.asarray(mask),
            prefix_key=fuse_kv(pk, pv), prefix_table=pre_table,
            prefix_lens=[pl, pl + 1])
