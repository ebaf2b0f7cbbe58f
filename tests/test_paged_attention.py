"""Paged flash-decode kernel accuracy tests (interpret mode on CPU).

Covers the reference's test strategy (SURVEY.md §4):
  * golden-oracle accuracy (tests/ifa_v5_case.py analog)
  * sentinel-value isolation — selected pages 0.1, unselected 9.9, the
    output must show no influence of 9.9 (ifa_v5_case.py:560-583)
  * int8 KV quantization vs the fp32 oracle within tolerance
  * ragged batches, partial tail pages, LSE output
"""

import jax.numpy as jnp
import numpy as np
import pytest

from cann_ops_adv_vllm_tpu.config import INT32_SENTINEL
from cann_ops_adv_vllm_tpu.ops.paged_attention import (
    fuse_kv,
    paged_attention_xla,
    paged_flash_decode,
)
from cann_ops_adv_vllm_tpu.ops.quant import (
    pack_int4_fused,
    quantize_kv_int4,
    unpack_int4_fused,
)
from cann_ops_adv_vllm_tpu.ref import oracles

PS = 16   # small page size for fast interpreter-mode tests
D = 128


def make_case(rng, *, b=2, h_kv=2, g=4, num_pages=64, max_page=16,
              seq=None, dtype=np.float32):
    h_q = h_kv * g
    q = rng.standard_normal((b, h_q, D)).astype(dtype)
    k_pages = rng.standard_normal((h_kv, num_pages, PS, D)).astype(dtype)
    v_pages = rng.standard_normal((h_kv, num_pages, PS, D)).astype(dtype)
    # unique physical pages per row so oracle gather is unambiguous
    block_table = np.stack([
        rng.permutation(num_pages)[:max_page] for _ in range(b)
    ]).astype(np.int32)
    if seq is None:
        seq = np.full((b,), max_page * PS, dtype=np.int32)
    return q, k_pages, v_pages, block_table, np.asarray(seq, np.int32)


class TestDense:
    def test_full_pages_vs_oracle(self, rng):
        q, k, v, bt, seq = make_case(rng)
        got = np.asarray(paged_flash_decode(q, k, v, bt, seq, page_size=PS))
        want = oracles.paged_attention_oracle(q, k, v, bt, seq, block_size=PS)
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)

    def test_ragged_and_partial_tail(self, rng):
        q, k, v, bt, _ = make_case(rng, b=3, max_page=16)
        seq = np.array([16 * PS, 5 * PS + 7, 1], dtype=np.int32)
        got = np.asarray(paged_flash_decode(q, k, v, bt, seq, page_size=PS))
        want = oracles.paged_attention_oracle(q, k, v, bt, seq, block_size=PS)
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)

    def test_lse(self, rng):
        q, k, v, bt, seq = make_case(rng, b=1, max_page=8)
        got, got_lse = paged_flash_decode(q, k, v, bt, seq, page_size=PS,
                                          return_lse=True)
        want, want_lse = oracles.paged_attention_oracle(
            q, k, v, bt, seq, block_size=PS, return_lse=True)
        np.testing.assert_allclose(np.asarray(got), want, rtol=2e-5, atol=2e-5)
        np.testing.assert_allclose(np.asarray(got_lse), want_lse,
                                   rtol=2e-5, atol=2e-5)

    def test_xla_fallback_matches(self, rng):
        q, k, v, bt, _ = make_case(rng, b=2, max_page=12)
        seq = np.array([12 * PS, 3 * PS + 5], dtype=np.int32)
        a = np.asarray(paged_flash_decode(q, k, v, bt, seq, page_size=PS))
        b_ = np.asarray(paged_attention_xla(q, k, v, bt, seq, page_size=PS))
        np.testing.assert_allclose(a, b_, rtol=2e-5, atol=2e-5)

    def test_odd_ppcb_tail(self, rng):
        # max_page=10 with ppcb=4 exercises the ragged final compute block
        q, k, v, bt, seq = make_case(rng, max_page=10)
        got = np.asarray(paged_flash_decode(q, k, v, bt, seq, page_size=PS,
                                            ppcb=4))
        want = oracles.paged_attention_oracle(q, k, v, bt, seq, block_size=PS)
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)

    @pytest.mark.parametrize("dtype", ["float16", "bfloat16"])
    def test_low_precision_dtypes(self, rng, dtype):
        # fp16 is the reference's PRIMARY dtype (ifa_public_define.h dtype
        # combos); the kernel must accept fp16 q/KV end-to-end, not just
        # the bf16 the TPU cache defaults to
        q, k, v, bt, _ = make_case(rng, b=2, max_page=8)
        seq = np.array([8 * PS, 3 * PS + 5], dtype=np.int32)
        dt = jnp.dtype(dtype)
        ql, kl, vl = (jnp.asarray(x, dt) for x in (q, k, v))
        got = paged_flash_decode(ql, kl, vl, bt, seq, page_size=PS)
        assert got.dtype == dt
        want = oracles.paged_attention_oracle(q, k, v, bt, seq, block_size=PS)
        np.testing.assert_allclose(np.asarray(got, np.float32), want,
                                   rtol=2e-2, atol=2e-2)


def _make_positions(rng, b, h_pos, max_page, n_sel, max_blocks):
    positions = np.full((b, h_pos, max_blocks), INT32_SENTINEL, np.int32)
    lens = np.zeros((b, h_pos), np.int32)
    for bi in range(b):
        for hp in range(h_pos):
            sel = np.sort(rng.permutation(max_page)[:n_sel])
            positions[bi, hp, :n_sel] = sel
            lens[bi, hp] = n_sel
    return positions, lens


class TestSparse:
    @pytest.mark.parametrize("h_pos_mode", ["shared", "per_kv"])
    def test_vs_oracle(self, rng, h_pos_mode):
        b, h_kv, g, max_page = 2, 2, 4, 16
        q, k, v, bt, seq = make_case(rng, b=b, h_kv=h_kv, g=g,
                                     max_page=max_page)
        h_pos = 1 if h_pos_mode == "shared" else h_kv
        positions, lens = _make_positions(rng, b, h_pos, max_page, 5, 8)
        got = np.asarray(paged_flash_decode(
            q, k, v, bt, seq, positions, lens, page_size=PS))
        want = oracles.sparse_paged_attention_oracle(
            q, k, v, bt, positions, lens, seq, block_size=PS)
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)

    def test_sentinel_isolation(self, rng):
        """Reference methodology (ifa_v5_case.py:560-583): selected pages
        hold 0.1, unselected hold 9.9; output must be ~0.1 — any influence
        of 9.9 would pull the value mean far above 0.1."""
        b, h_kv, g, max_page, num_pages = 1, 2, 4, 16, 64
        h_q = h_kv * g
        q = rng.standard_normal((b, h_q, D)).astype(np.float32)
        bt = np.stack([rng.permutation(num_pages)[:max_page]
                       for _ in range(b)]).astype(np.int32)
        seq = np.full((b,), max_page * PS, dtype=np.int32)

        positions, lens = _make_positions(rng, b, h_kv, max_page, 4, 8)
        k = np.full((h_kv, num_pages, PS, D), 9.9, np.float32)
        v = np.full((h_kv, num_pages, PS, D), 9.9, np.float32)
        for bi in range(b):
            for hp in range(h_kv):
                for s in positions[bi, hp, :lens[bi, hp]]:
                    k[hp, bt[bi, s]] = 0.1
                    v[hp, bt[bi, s]] = 0.1

        out = np.asarray(paged_flash_decode(
            q, k, v, bt, seq, positions, lens, page_size=PS))
        np.testing.assert_allclose(out, 0.1, rtol=1e-5, atol=1e-5)

    def test_different_heads_different_positions(self, rng):
        """Distinct per-kv-head position lists must yield distinct outputs
        (ifa_v5_case.py asserts different heads differ)."""
        b, h_kv, g, max_page = 1, 2, 2, 16
        q, k, v, bt, seq = make_case(rng, b=b, h_kv=h_kv, g=g,
                                     max_page=max_page)
        q[:] = q[:, :1]  # identical queries across heads
        positions, lens = _make_positions(rng, b, h_kv, max_page, 3, 8)
        assert not np.array_equal(positions[0, 0], positions[0, 1])
        out = np.asarray(paged_flash_decode(
            q, k, v, bt, seq, positions, lens, page_size=PS))
        assert not np.allclose(out[0, 0], out[0, g])

    def test_empty_selection_zero_fill(self, rng):
        """Zero-length selection must produce zero output (reference
        InitAllZeroOutput semantics, split header :879)."""
        b, h_kv, g, max_page = 1, 2, 4, 8
        q, k, v, bt, seq = make_case(rng, b=b, h_kv=h_kv, g=g,
                                     max_page=max_page)
        positions = np.full((b, h_kv, 4), INT32_SENTINEL, np.int32)
        lens = np.zeros((b, h_kv), np.int32)
        out = np.asarray(paged_flash_decode(
            q, k, v, bt, seq, positions, lens, page_size=PS))
        np.testing.assert_array_equal(out, 0.0)


class TestInt8KV:
    def test_per_channel_quant_vs_fp32_oracle(self, rng):
        b, h_kv, g, max_page = 2, 2, 4, 8
        q, kf, vf, bt, seq = make_case(rng, b=b, h_kv=h_kv, g=g,
                                       max_page=max_page)
        k_q, k_s, k_o = oracles.quantize_kv_oracle(kf, mode="per_channel")
        v_q, v_s, v_o = oracles.quantize_kv_oracle(vf, mode="per_channel")
        scales = (k_s.reshape(h_kv, D), k_o.reshape(h_kv, D),
                  v_s.reshape(h_kv, D), v_o.reshape(h_kv, D))

        got = np.asarray(paged_flash_decode(
            q, k_q, v_q, bt, seq, kv_scales=scales, page_size=PS))

        # oracle on the dequantized cache: the kernel folds the scale into
        # q and runs bf16 MXU matmuls (int8 values are exact in bf16), so
        # the only divergence from the f32 oracle is the 2^-9 bf16 rounding
        # of q — below the int8 quantization noise floor (2^-8 on K)
        k_dq = oracles.dequantize_kv_oracle(k_q, k_s, k_o)
        v_dq = oracles.dequantize_kv_oracle(v_q, v_s, v_o)
        want_dq = oracles.paged_attention_oracle(q, k_dq, v_dq, bt, seq,
                                                 block_size=PS)
        np.testing.assert_allclose(got, want_dq, rtol=5e-3, atol=5e-3)

        # and the fp32 oracle within quantization tolerance
        want_fp = oracles.paged_attention_oracle(q, kf, vf, bt, seq,
                                                 block_size=PS)
        err = np.abs(got - want_fp).mean()
        assert err < 0.05, f"int8 KV mean abs error too large: {err}"


class TestMixedQuantModes:
    """Reference PER_CHANNEL_TOKEN_MODE = 2: K per-channel + V per-token
    (incre_flash_attention_split_Bbn2s2_Us2.h:71-72)."""

    def _mixed_case(self, rng, k_mode, v_mode, *, b=2, h_kv=2, g=4,
                    max_page=8):
        q, kf, vf, bt, seq = make_case(rng, b=b, h_kv=h_kv, g=g,
                                       max_page=max_page)
        k_q, k_s, k_o = oracles.quantize_kv_oracle(kf, mode=k_mode)
        v_q, v_s, v_o = oracles.quantize_kv_oracle(vf, mode=v_mode)
        num_pages = kf.shape[1]

        def reshape(s, mode):
            # oracle returns keepdims shapes; the kernel wants [H_kv, D]
            # (per-channel) / [H_kv, P, ps] (per-token)
            return (s.reshape(h_kv, D) if mode == "per_channel"
                    else s.reshape(h_kv, num_pages, PS))
        scales = (reshape(k_s, k_mode), reshape(k_o, k_mode),
                  reshape(v_s, v_mode), reshape(v_o, v_mode))
        k_dq = oracles.dequantize_kv_oracle(k_q, k_s, k_o)
        v_dq = oracles.dequantize_kv_oracle(v_q, v_s, v_o)
        return q, k_q, v_q, scales, k_dq, v_dq, bt, seq

    @pytest.mark.parametrize("k_mode,v_mode",
                             [("per_channel", "per_token"),
                              ("per_token", "per_channel")])
    def test_mixed_vs_dequant_oracle(self, rng, k_mode, v_mode):
        (q, k_q, v_q, scales, k_dq, v_dq, bt,
         seq) = self._mixed_case(rng, k_mode, v_mode)
        got = np.asarray(paged_flash_decode(
            q, k_q, v_q, bt, seq, kv_scales=scales, page_size=PS))
        want = oracles.paged_attention_oracle(q, k_dq, v_dq, bt, seq,
                                              block_size=PS)
        np.testing.assert_allclose(got, want, rtol=5e-3, atol=5e-3)

    def test_mixed_sparse(self, rng):
        b, h_kv, max_page = 2, 2, 16
        (q, k_q, v_q, scales, k_dq, v_dq, bt, seq) = self._mixed_case(
            rng, "per_channel", "per_token", b=b, h_kv=h_kv,
            max_page=max_page)
        positions, lens = _make_positions(rng, b, h_kv, max_page, 5, 8)
        got = np.asarray(paged_flash_decode(
            q, k_q, v_q, bt, seq, positions, lens, kv_scales=scales,
            page_size=PS))
        want = oracles.sparse_paged_attention_oracle(
            q, k_dq, v_dq, bt, positions, lens, seq, block_size=PS)
        np.testing.assert_allclose(got, want, rtol=5e-3, atol=5e-3)


class TestGeneralKernelFallback:
    """`slab=False` routes through the per-(head, block) `_kernel`; it
    must agree with the (default) slab path on featured workloads."""

    def test_general_matches_slab_featured(self, rng):
        b, h_kv, g, max_page = 2, 2, 4, 8
        q, kf, vf, bt, seq = make_case(rng, b=b, h_kv=h_kv, g=g,
                                       max_page=max_page)
        h_q = h_kv * g
        slopes = np.linspace(0.1, 0.5, h_q).astype(np.float32)
        bias = rng.standard_normal((b, h_kv, max_page, PS)
                                   ).astype(np.float32)
        kwargs = dict(bias_pages=bias, alibi_slopes=slopes, page_size=PS)
        a = np.asarray(paged_flash_decode(q, kf, vf, bt, seq, **kwargs))
        b_ = np.asarray(paged_flash_decode(q, kf, vf, bt, seq, slab=False,
                                           **kwargs))
        np.testing.assert_allclose(a, b_, rtol=2e-5, atol=2e-5)

    def test_general_matches_slab_token_quant(self, rng):
        b, h_kv, g, max_page = 1, 2, 4, 8
        q, kf, vf, bt, seq = make_case(rng, b=b, h_kv=h_kv, g=g,
                                       max_page=max_page)
        k_q, k_s, k_o = oracles.quantize_kv_oracle(kf, mode="per_token")
        v_q, v_s, v_o = oracles.quantize_kv_oracle(vf, mode="per_token")
        num_pages = kf.shape[1]
        scales = tuple(s.reshape(h_kv, num_pages, PS)
                       for s in (k_s, k_o, v_s, v_o))
        a = np.asarray(paged_flash_decode(q, k_q, v_q, bt, seq,
                                          kv_scales=scales, page_size=PS))
        b_ = np.asarray(paged_flash_decode(q, k_q, v_q, bt, seq,
                                           kv_scales=scales, page_size=PS,
                                           slab=False))
        np.testing.assert_allclose(a, b_, rtol=2e-5, atol=2e-5)


class TestInt4KV:
    """In-kernel packed-int4 KV (reference int4b_t variants,
    incre_flash_attention.cpp:431-438)."""

    def test_pack_unpack_roundtrip(self, rng):
        vals = rng.integers(-8, 8, size=(2, 3, PS, 2 * D)).astype(np.int8)
        packed = np.asarray(pack_int4_fused(vals))
        assert packed.shape == (2, 3, PS, D)
        back = np.asarray(unpack_int4_fused(packed))
        np.testing.assert_array_equal(back, vals)

    def _int4_case(self, rng, *, b=2, h_kv=2, g=4, max_page=8):
        q, kf, vf, bt, seq = make_case(rng, b=b, h_kv=h_kv, g=g,
                                       max_page=max_page)
        kv = np.asarray(fuse_kv(kf, vf))
        packed, scales = quantize_kv_int4(kv, mode="per_channel")
        # dequantized reference pages
        unpacked = np.asarray(unpack_int4_fused(packed)).astype(np.float32)
        k_s, k_o, v_s, v_o = (np.asarray(s) for s in scales)
        k_dq = (unpacked[..., :D] * k_s[:, None, None, :]
                + k_o[:, None, None, :])
        v_dq = (unpacked[..., D:] * v_s[:, None, None, :]
                + v_o[:, None, None, :])
        return q, kf, vf, packed, scales, k_dq, v_dq, bt, seq

    def test_dense_vs_dequant_oracle(self, rng):
        (q, kf, vf, packed, scales, k_dq, v_dq, bt,
         seq) = self._int4_case(rng)
        got = np.asarray(paged_flash_decode(
            q, packed, None, bt, seq, kv_scales=scales, kv_int4=True,
            page_size=PS))
        want = oracles.paged_attention_oracle(q, k_dq, v_dq, bt, seq,
                                              block_size=PS)
        np.testing.assert_allclose(got, want, rtol=5e-3, atol=5e-3)

        # fp32 oracle within int4 quantization tolerance (noise floor 2^-4)
        want_fp = oracles.paged_attention_oracle(q, kf, vf, bt, seq,
                                                 block_size=PS)
        err = np.abs(got - want_fp).mean()
        assert err < 0.25, f"int4 KV mean abs error too large: {err}"

    def test_sparse_vs_dequant_oracle(self, rng):
        b, h_kv, max_page = 2, 2, 16
        (q, _, _, packed, scales, k_dq, v_dq, bt,
         seq) = self._int4_case(rng, b=b, h_kv=h_kv, max_page=max_page)
        positions, lens = _make_positions(rng, b, h_kv, max_page, 5, 8)
        got = np.asarray(paged_flash_decode(
            q, packed, None, bt, seq, positions, lens, kv_scales=scales,
            kv_int4=True, page_size=PS))
        want = oracles.sparse_paged_attention_oracle(
            q, k_dq, v_dq, bt, positions, lens, seq, block_size=PS)
        np.testing.assert_allclose(got, want, rtol=5e-3, atol=5e-3)

    def test_per_token_int4(self, rng):
        """Per-token scales route through the general kernel; the nibble
        unpack must compose with the post-matmul per-token identities."""
        q, kf, vf, bt, seq = make_case(rng, b=1, h_kv=2, g=4, max_page=8)
        kv = np.asarray(fuse_kv(kf, vf))
        packed, scales = quantize_kv_int4(kv, mode="per_token")
        got = np.asarray(paged_flash_decode(
            q, packed, None, bt, seq, kv_scales=scales, kv_int4=True,
            page_size=PS))
        unpacked = np.asarray(unpack_int4_fused(packed)).astype(np.float32)
        k_s, k_o, v_s, v_o = (np.asarray(s)[..., None] for s in scales)
        k_dq = unpacked[..., :D] * k_s + k_o
        v_dq = unpacked[..., D:] * v_s + v_o
        want = oracles.paged_attention_oracle(q, k_dq, v_dq, bt, seq,
                                              block_size=PS)
        np.testing.assert_allclose(got, want, rtol=5e-3, atol=5e-3)

    def test_ragged_tail(self, rng):
        (q, _, _, packed, scales, k_dq, v_dq, bt,
         _) = self._int4_case(rng, b=2, max_page=8)
        seq = np.array([8 * PS, 3 * PS + 5], dtype=np.int32)
        got = np.asarray(paged_flash_decode(
            q, packed, None, bt, seq, kv_scales=scales, kv_int4=True,
            page_size=PS))
        want = oracles.paged_attention_oracle(q, k_dq, v_dq, bt, seq,
                                              block_size=PS)
        np.testing.assert_allclose(got, want, rtol=5e-3, atol=5e-3)


def test_layered_cache_matches_per_layer(rng):
    """Full [L, ...] cache + layer_idx == slicing the layer out (dense,
    sparse per-head, and int8 per-token prestacked scales)."""
    L, h_kv, g, d, ps = 3, 2, 2, 128, 16
    h_q = h_kv * g
    num_pages, mp = 12, 6
    b = 2
    q = jnp.asarray(rng.standard_normal((b, h_q, d)), jnp.float32)
    kv = jnp.asarray(rng.standard_normal((L, h_kv, num_pages, ps, 2 * d)),
                     jnp.float32)
    bt = jnp.asarray(
        np.stack([rng.permutation(num_pages)[:mp] for _ in range(b)]),
        jnp.int32)
    seq = jnp.asarray([3 * ps + 5, 5 * ps], jnp.int32)

    for li in range(L):
        got = paged_flash_decode(q, kv, None, bt, seq, page_size=ps,
                                 layer_idx=jnp.int32(li))
        want = paged_flash_decode(q, kv[li], None, bt, seq, page_size=ps)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-6, atol=1e-6)

    # sparse per-head positions through the layered path
    positions = jnp.asarray(
        np.sort(rng.permutation(mp)[:4])[None, None, :].repeat(
            h_kv, 1).repeat(b, 0), jnp.int32)
    positions = jnp.where(positions >= 0, positions, INT32_SENTINEL)
    plens = jnp.full((b, h_kv), 3, jnp.int32)
    got = paged_flash_decode(q, kv, None, bt, seq, positions, plens,
                             page_size=ps, layer_idx=jnp.int32(1))
    want = paged_flash_decode(q, kv[1], None, bt, seq, positions, plens,
                              page_size=ps)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)

    # int8 per-token prestacked scales with a leading layer axis
    kv8 = jnp.asarray(rng.integers(-100, 100,
                                   (L, h_kv, num_pages, ps, 2 * d)),
                      jnp.int8)
    ts = jnp.zeros((L, h_kv, 4, num_pages, ps), jnp.float32)
    ts = ts.at[:, :, 0].set(0.01 + 0.005 * jnp.asarray(
        rng.random((L, h_kv, num_pages, ps)), jnp.float32))
    ts = ts.at[:, :, 2].set(0.01 + 0.005 * jnp.asarray(
        rng.random((L, h_kv, num_pages, ps)), jnp.float32))
    got = paged_flash_decode(q, kv8, None, bt, seq, kv_scales=ts,
                             page_size=ps, layer_idx=jnp.int32(2))
    want = paged_flash_decode(q, kv8[2], None, bt, seq, kv_scales=ts[2],
                              page_size=ps)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)


def test_union_pages_matches_per_head(rng):
    """union_pages (shared unioned page list + per-head windows, slab DMA)
    == the per-head path, including int8 per-token scales and the
    layered cache."""
    h_kv, g, d, ps = 4, 2, 128, 16
    h_q = h_kv * g
    num_pages, mp = 24, 12
    b = 2
    q = jnp.asarray(rng.standard_normal((b, h_q, d)), jnp.float32)
    kv = jnp.asarray(rng.standard_normal((h_kv, num_pages, ps, 2 * d)),
                     jnp.float32)
    bt = jnp.asarray(
        np.stack([rng.permutation(num_pages)[:mp] for _ in range(b)]),
        jnp.int32)
    seq = jnp.asarray([9 * ps + 5, 11 * ps], jnp.int32)

    # distinct per-head ascending selections with overlaps
    m = 6
    positions = np.full((b, h_kv, m), INT32_SENTINEL, np.int32)
    plens = np.zeros((b, h_kv), np.int32)
    for bi in range(b):
        for h in range(h_kv):
            k = int(rng.integers(1, m + 1))
            positions[bi, h, :k] = np.sort(rng.permutation(mp - 1)[:k])
            plens[bi, h] = k
    positions = jnp.asarray(positions)
    plens = jnp.asarray(plens)

    want = paged_flash_decode(q, kv, None, bt, seq, positions, plens,
                              page_size=ps)
    got = paged_flash_decode(q, kv, None, bt, seq, positions, plens,
                             page_size=ps, union_pages=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)

    # int8 per-token + layered cache through the union path
    L = 2
    kv8 = jnp.asarray(rng.integers(-100, 100,
                                   (L, h_kv, num_pages, ps, 2 * d)),
                      jnp.int8)
    ts = jnp.zeros((L, h_kv, 4, num_pages, ps), jnp.float32)
    ts = ts.at[:, :, 0].set(0.01)
    ts = ts.at[:, :, 2].set(0.02)
    want = paged_flash_decode(q, kv8, None, bt, seq, positions, plens,
                              kv_scales=ts, page_size=ps,
                              layer_idx=jnp.int32(1))
    got = paged_flash_decode(q, kv8, None, bt, seq, positions, plens,
                             kv_scales=ts, page_size=ps,
                             layer_idx=jnp.int32(1), union_pages=True)
    # union regroups pages into different compute blocks, so the
    # per-token dequant identity accumulates in a different order; both
    # paths sit within ~1e-3 of the XLA oracle (verified), they just
    # differ from each other at that level
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-3, atol=2e-3)


class TestCoalescedRuns:
    """Run-coalesced multi-page DMA descriptors (_coalesce_runs): exact
    vs per-page DMA and vs the oracle when physical pages are contiguous
    (sequence-contiguous allocation + temporally-clustered selection —
    the k<C descriptor-floor lever)."""

    def _contig_case(self, rng, b=2, h_kv=2, g=4, max_page=24):
        h_q = h_kv * g
        num_pages = b * max_page + 4
        q = rng.standard_normal((b, h_q, D)).astype(np.float32)
        k = rng.standard_normal((h_kv, num_pages, PS, D)).astype(np.float32)
        v = rng.standard_normal((h_kv, num_pages, PS, D)).astype(np.float32)
        # physically CONTIGUOUS tables (what the allocator produces for a
        # fresh sequence) → selected slot runs become physical pid runs
        bt = np.stack([np.arange(max_page, dtype=np.int32) + i * max_page
                       for i in range(b)])
        seq = np.array([max_page * PS, 17 * PS + 9][:b], np.int32)
        return q, k, v, bt, seq

    def _run_positions(self, rng, b, h_pos, max_page, seq=None):
        """Selections that contain long runs + isolated pages + ragged
        tails (run lengths 1..11 exercise the {8,4,2,1} decomposition).
        Honors the cent_select contract: slots stay < ceil(seq/PS)."""
        m = max_page
        positions = np.full((b, h_pos, m), INT32_SENTINEL, np.int32)
        lens = np.zeros((b, h_pos), np.int32)
        for bi in range(b):
            hi = (m if seq is None
                  else int(-(-int(seq[bi]) // PS)))
            for hp in range(h_pos):
                sel = set()
                start = 0
                for run in (1, 11, 2, 5, 3):
                    s0 = start + rng.integers(0, 2)
                    sel.update(range(s0, min(s0 + run, hi)))
                    start = s0 + run + rng.integers(1, 3)
                sel = sorted(x for x in sel if x < hi)
                positions[bi, hp, :len(sel)] = sel
                lens[bi, hp] = len(sel)
        return positions, lens

    @pytest.mark.parametrize("ppcb", [4, 8])
    def test_per_head_runs_vs_oracle(self, rng, ppcb):
        q, k, v, bt, seq = self._contig_case(rng)
        h_kv, max_page = k.shape[0], bt.shape[1]
        pos, lens = self._run_positions(rng, q.shape[0], h_kv, max_page,
                                        seq)
        got_c = np.asarray(paged_flash_decode(
            q, k, v, bt, seq, pos, lens, page_size=PS, ppcb=ppcb,
            coalesce=True))
        got_p = np.asarray(paged_flash_decode(
            q, k, v, bt, seq, pos, lens, page_size=PS, ppcb=ppcb,
            coalesce=False))
        want = oracles.sparse_paged_attention_oracle(
            q, k, v, bt, pos, lens, seq, block_size=PS)
        np.testing.assert_allclose(got_c, want, rtol=2e-5, atol=2e-5)
        np.testing.assert_array_equal(got_c, got_p)

    def test_shared_row_coalesce(self, rng):
        q, k, v, bt, seq = self._contig_case(rng, b=1)
        pos, lens = self._run_positions(rng, 1, 1, bt.shape[1], seq)
        got = np.asarray(paged_flash_decode(
            q, k, v, bt, seq, pos, lens, page_size=PS, coalesce=True))
        want = oracles.sparse_paged_attention_oracle(
            q, k, v, bt, pos, lens, seq, block_size=PS)
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)

    def test_dense_contiguous_coalesce(self, rng):
        q, k, v, bt, seq = self._contig_case(rng)
        got = np.asarray(paged_flash_decode(
            q, k, v, bt, seq, page_size=PS, coalesce=True))
        want = oracles.paged_attention_oracle(q, k, v, bt, seq,
                                              block_size=PS)
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)

    def test_int8_per_token_runs(self, rng):
        from cann_ops_adv_vllm_tpu.ops.quant import quantize_kv
        import jax
        q, k, v, bt, seq = self._contig_case(rng, h_kv=2)
        h_kv, max_page = k.shape[0], bt.shape[1]
        kv = np.asarray(fuse_kv(jnp.asarray(k), jnp.asarray(v)))
        kv8, sc, off = jax.jit(
            lambda a: quantize_kv(a, mode="per_token"))(jnp.asarray(kv))
        scales = (sc[..., 0], off[..., 0], sc[..., 1], off[..., 1]) \
            if sc.ndim == 4 else None
        # per_token quantize_kv returns [H, P, ps] scales per half
        if scales is None:
            d2 = kv.shape[-1] // 2
            scales = (sc, off, sc, off)
        pos, lens = self._run_positions(rng, q.shape[0], h_kv, max_page,
                                        seq)
        got = np.asarray(paged_flash_decode(
            q, kv8, None, bt, seq, pos, lens, kv_scales=scales,
            page_size=PS, coalesce=True))
        want = np.asarray(paged_flash_decode(
            q, kv8, None, bt, seq, pos, lens, kv_scales=scales,
            page_size=PS, coalesce=False))
        np.testing.assert_array_equal(got, want)

    def test_coalesce_plan_covers_exactly(self, rng):
        """_coalesce_runs: descriptors tile each valid run exactly once."""
        from cann_ops_adv_vllm_tpu.ops.paged_attention import (
            _coalesce_runs,
        )
        b, h, m, ppcb = 2, 3, 64, 8
        pids = jnp.asarray(rng.integers(0, 50, (b, h, m)), jnp.int32)
        # inject runs
        pids = pids.at[0, 0, 10:21].set(jnp.arange(100, 111))
        begs = jnp.zeros((b, h, m), jnp.int32)
        ends = jnp.asarray(rng.integers(0, 2, (b, h, m)) * PS, jnp.int32)
        ends = ends.at[0, 0, 10:21].set(PS)
        dlen = np.asarray(_coalesce_runs(pids, begs, ends, ppcb, 8))
        valid = np.asarray(ends > begs)
        cover = np.zeros((b, h, m), bool)
        for bi in range(b):
            for hi in range(h):
                for i in range(m):
                    L = dlen[bi, hi, i]
                    if L:
                        assert not cover[bi, hi, i:i + L].any()
                        cover[bi, hi, i:i + L] = True
                        assert i // ppcb == (i + L - 1) // ppcb
                        p0 = np.asarray(pids)[bi, hi, i]
                        np.testing.assert_array_equal(
                            np.asarray(pids)[bi, hi, i:i + L],
                            np.arange(p0, p0 + L))
        np.testing.assert_array_equal(cover, valid)
