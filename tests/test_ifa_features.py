"""IFA misc-feature parity tests (SURVEY.md §2.2).

Covers the reference IncreFlashAttention optional features rebuilt on the
TPU kernel: attention mask / pse bias pages, ALiBi slopes, kv-left-padding
(kv_padding_size analog), post-quant int8 output (quant_scale2/offset2),
per-token antiquant, and empty-tensor zero-fill.  Each feature is checked
kernel (interpret) vs the pure-XLA fallback, and the fallback itself vs a
small numpy reference where practical.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from cann_ops_adv_vllm_tpu.config import MASK_VALUE
from cann_ops_adv_vllm_tpu.ops.paged_attention import (
    fuse_kv,
    paged_attention_xla,
    paged_flash_decode,
)
from cann_ops_adv_vllm_tpu.ops.quant import quantize_kv


def _setup(b=2, h_kv=2, g=4, d=128, ps=16, num_pages=32, max_page=8,
           seed=0):
    rng = np.random.default_rng(seed)
    h_q = h_kv * g
    q = jnp.asarray(rng.standard_normal((b, h_q, d)), jnp.float32)
    k_pages = jnp.asarray(
        rng.standard_normal((h_kv, num_pages, ps, d)), jnp.float32)
    v_pages = jnp.asarray(
        rng.standard_normal((h_kv, num_pages, ps, d)), jnp.float32)
    block_table = jnp.asarray(
        rng.permutation(num_pages)[: b * max_page].reshape(b, max_page),
        jnp.int32)
    seq_lens = jnp.asarray(rng.integers(1, max_page * ps, b), jnp.int32)
    return q, k_pages, v_pages, block_table, seq_lens, rng


def _dense_numpy(q, k_pages, v_pages, block_table, seq_lens, *, start=None,
                 bias=None, slopes=None, ps=16):
    """Reference: gather tokens, apply bias/alibi, softmax."""
    q, kp, vp = (np.asarray(x, np.float64) for x in (q, k_pages, v_pages))
    bt, sl = np.asarray(block_table), np.asarray(seq_lens)
    b, h_q, d = q.shape
    h_kv = kp.shape[0]
    g = h_q // h_kv
    scale = 1.0 / np.sqrt(d)
    out = np.zeros((b, h_q, d))
    for bi in range(b):
        s0 = 0 if start is None else int(start[bi])
        n = int(sl[bi])
        for hq in range(h_q):
            hk = hq // g
            keys, vals, biases, poss = [], [], [], []
            for t in range(s0, s0 + n):
                slot, row = t // ps, t % ps
                page = bt[bi, slot]
                keys.append(kp[hk, page, row])
                vals.append(vp[hk, page, row])
                biases.append(0.0 if bias is None
                              else float(bias[bi, hk % bias.shape[1], slot, row]))
                poss.append(t)
            s = scale * (np.stack(keys) @ q[bi, hq])
            s += np.asarray(biases)
            if slopes is not None:
                qpos = s0 + n - 1
                s += slopes[hq] * (np.asarray(poss, np.float64) - qpos)
            s = np.maximum(s, MASK_VALUE)
            e = np.exp(s - s.max())
            out[bi, hq] = (e / e.sum()) @ np.stack(vals)
    return out


def test_bias_pages_mask():
    ps, max_page = 16, 8
    q, k_pages, v_pages, block_table, seq_lens, rng = _setup(ps=ps)
    b, h_kv = q.shape[0], k_pages.shape[0]
    # boolean mask per (batch, token) → bias pages (h_b = 1)
    masked = rng.random((b, 1, max_page, ps)) < 0.3
    bias = jnp.where(jnp.asarray(masked), MASK_VALUE, 0.0).astype(jnp.float32)

    got = paged_flash_decode(
        q, fuse_kv(k_pages, v_pages), None, block_table, seq_lens,
        bias_pages=bias, page_size=ps)
    want_xla = paged_attention_xla(
        q, k_pages, v_pages, block_table, seq_lens,
        bias_pages=bias, page_size=ps)
    want_np = _dense_numpy(q, k_pages, v_pages, block_table, seq_lens,
                           bias=np.asarray(bias), ps=ps)
    np.testing.assert_allclose(np.asarray(want_xla), want_np,
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(got), want_np,
                               rtol=1e-4, atol=1e-4)


def test_bias_pages_per_kv_head():
    ps, max_page = 16, 8
    q, k_pages, v_pages, block_table, seq_lens, rng = _setup(ps=ps)
    b, h_kv = q.shape[0], k_pages.shape[0]
    bias = jnp.asarray(
        rng.standard_normal((b, h_kv, max_page, ps)) * 0.5, jnp.float32)
    got = paged_flash_decode(
        q, fuse_kv(k_pages, v_pages), None, block_table, seq_lens,
        bias_pages=bias, page_size=ps)
    want = _dense_numpy(q, k_pages, v_pages, block_table, seq_lens,
                        bias=np.asarray(bias), ps=ps)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)


def test_alibi_slopes():
    ps = 16
    q, k_pages, v_pages, block_table, seq_lens, rng = _setup(ps=ps)
    h_q = q.shape[1]
    slopes = np.asarray([2.0 ** (-(i + 1) / 2) for i in range(h_q)],
                        np.float32) * 0.1
    got = paged_flash_decode(
        q, fuse_kv(k_pages, v_pages), None, block_table, seq_lens,
        alibi_slopes=jnp.asarray(slopes), page_size=ps)
    want_xla = paged_attention_xla(
        q, k_pages, v_pages, block_table, seq_lens,
        alibi_slopes=jnp.asarray(slopes), page_size=ps)
    want = _dense_numpy(q, k_pages, v_pages, block_table, seq_lens,
                        slopes=slopes, ps=ps)
    np.testing.assert_allclose(np.asarray(want_xla), want,
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)


def test_kv_left_padding():
    ps, max_page = 16, 8
    q, k_pages, v_pages, block_table, _, rng = _setup(ps=ps)
    b = q.shape[0]
    start = jnp.asarray(rng.integers(0, 3 * ps, b), jnp.int32)
    seq_lens = jnp.asarray(
        rng.integers(1, max_page * ps - 3 * ps, b), jnp.int32)

    got = paged_flash_decode(
        q, fuse_kv(k_pages, v_pages), None, block_table, seq_lens,
        kv_start=start, page_size=ps)
    want_xla = paged_attention_xla(
        q, k_pages, v_pages, block_table, seq_lens,
        kv_start=start, page_size=ps)
    want = _dense_numpy(q, k_pages, v_pages, block_table, seq_lens,
                        start=np.asarray(start), ps=ps)
    np.testing.assert_allclose(np.asarray(want_xla), want,
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)


def test_alibi_with_left_padding():
    ps = 16
    q, k_pages, v_pages, block_table, _, rng = _setup(ps=ps)
    b, h_q = q.shape[0], q.shape[1]
    start = jnp.asarray(rng.integers(0, 2 * ps, b), jnp.int32)
    seq_lens = jnp.asarray(rng.integers(1, 5 * ps, b), jnp.int32)
    slopes = np.linspace(0.01, 0.2, h_q).astype(np.float32)
    got = paged_flash_decode(
        q, fuse_kv(k_pages, v_pages), None, block_table, seq_lens,
        kv_start=start, alibi_slopes=jnp.asarray(slopes), page_size=ps)
    want = _dense_numpy(q, k_pages, v_pages, block_table, seq_lens,
                        start=np.asarray(start), slopes=slopes, ps=ps)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)


def test_post_quant_int8_out():
    ps = 16
    q, k_pages, v_pages, block_table, seq_lens, rng = _setup(ps=ps)
    h_q, d = q.shape[1], q.shape[2]
    scale2 = jnp.asarray(rng.uniform(20.0, 40.0, (h_q, d)), jnp.float32)
    offset2 = jnp.asarray(rng.uniform(-2.0, 2.0, (h_q, d)), jnp.float32)

    got = paged_flash_decode(
        q, fuse_kv(k_pages, v_pages), None, block_table, seq_lens,
        out_quant=(scale2, offset2), page_size=ps)
    want = paged_attention_xla(
        q, k_pages, v_pages, block_table, seq_lens,
        out_quant=(scale2, offset2), page_size=ps)
    assert got.dtype == jnp.int8
    # kernel and fallback may round a borderline value apart by 1 quantum
    diff = np.abs(np.asarray(got, np.int32) - np.asarray(want, np.int32))
    assert diff.max() <= 1
    assert (diff > 0).mean() < 0.02


def test_per_token_antiquant():
    ps = 16
    q, k_pages, v_pages, block_table, seq_lens, _ = _setup(ps=ps)
    k_q, ks, ko = quantize_kv(k_pages, mode="per_token")
    v_q, vs, vo = quantize_kv(v_pages, mode="per_token")
    scales = (ks, ko, vs, vo)

    got = paged_flash_decode(
        q, fuse_kv(k_q, v_q), None, block_table, seq_lens,
        kv_scales=scales, page_size=ps)
    want_xla = paged_attention_xla(
        q, k_q, v_q, block_table, seq_lens,
        kv_scales=scales, page_size=ps)
    # dequantized reference
    k_dq = k_q.astype(jnp.float32) * ks[..., None] + ko[..., None]
    v_dq = v_q.astype(jnp.float32) * vs[..., None] + vo[..., None]
    want = _dense_numpy(q, k_dq, v_dq, block_table, seq_lens, ps=ps)
    np.testing.assert_allclose(np.asarray(want_xla), want,
                               rtol=1e-4, atol=1e-4)
    # kernel runs bf16 MXU matmuls (q rounds to bf16; int8 is exact in
    # bf16) — 2^-9 rounding, below the int8 quantization noise floor
    np.testing.assert_allclose(np.asarray(got), want, rtol=5e-3, atol=5e-3)
    # and the int8 path stays close to the fp32 ground truth
    ref_fp = _dense_numpy(q, k_pages, v_pages, block_table, seq_lens, ps=ps)
    err = np.abs(np.asarray(got) - ref_fp).max()
    assert err < 0.15


def test_empty_sequence_zero_fill():
    ps = 16
    q, k_pages, v_pages, block_table, seq_lens, _ = _setup(ps=ps)
    seq_lens = seq_lens.at[0].set(0)
    got = paged_flash_decode(
        q, fuse_kv(k_pages, v_pages), None, block_table, seq_lens,
        page_size=ps)
    assert np.all(np.asarray(got)[0] == 0.0)
    assert np.all(np.isfinite(np.asarray(got)))


def test_sparse_with_bias_and_alibi():
    """Features compose with the sparse (positions) path."""
    ps, max_page = 16, 8
    q, k_pages, v_pages, block_table, _, rng = _setup(ps=ps)
    b, h_kv = q.shape[0], k_pages.shape[0]
    h_q = q.shape[1]
    seq_lens = jnp.full((b,), max_page * ps, jnp.int32)
    m = 4
    positions = jnp.stack([
        jnp.stack([jnp.sort(jnp.asarray(
            rng.choice(max_page, m, replace=False), jnp.int32))
            for _ in range(h_kv)])
        for _ in range(b)])
    plens = jnp.full((b, h_kv), m, jnp.int32)
    bias = jnp.asarray(
        rng.standard_normal((b, h_kv, m, ps)) * 0.3, jnp.float32)
    slopes = jnp.asarray(np.linspace(0.01, 0.1, h_q), jnp.float32)

    got = paged_flash_decode(
        q, fuse_kv(k_pages, v_pages), None, block_table, seq_lens,
        positions, plens, bias_pages=bias, alibi_slopes=slopes,
        page_size=ps)
    want = paged_attention_xla(
        q, k_pages, v_pages, block_table, seq_lens,
        positions, plens, bias_pages=bias, alibi_slopes=slopes,
        page_size=ps)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)
