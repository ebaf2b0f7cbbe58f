"""Fused-vs-separate consistency tests.

Ports the reference's level-3 test strategy
(sparse_paged_fusion_attention/test/fused_ifa_v5_torch_case.py:171-238):
run the fused op, then the separate cent_select + sparse attention chain,
and require exact equality on ``block_position`` plus tight agreement on
the attention output.
"""

import numpy as np
import pytest

from cann_ops_adv_vllm_tpu.config import TPL_PAD
from cann_ops_adv_vllm_tpu.ops.cent_select import cent_select
from cann_ops_adv_vllm_tpu.ops.fused import sparse_paged_fusion_attention
from cann_ops_adv_vllm_tpu.ops.paged_attention import (
    fuse_kv,
    paged_flash_decode,
)
from cann_ops_adv_vllm_tpu.ref import oracles

PS = 16
D = 128


def make_case(rng, *, b=2, h_kv=2, g=4, c=64, num_pages=64, max_page=16,
              max_batch=4):
    h_q = h_kv * g
    q = rng.standard_normal((b, h_q, D)).astype(np.float32)
    cent = rng.standard_normal((h_kv, c, D)).astype(np.float32)
    k_pages = rng.standard_normal((h_kv, num_pages, PS, D)).astype(np.float32)
    v_pages = rng.standard_normal((h_kv, num_pages, PS, D)).astype(np.float32)
    block_ids = rng.integers(0, c, (h_kv, num_pages)).astype(np.int32)
    block_table = np.stack([
        rng.permutation(num_pages)[:max_page] for _ in range(max_batch)
    ]).astype(np.int32)
    seq = np.full((b,), max_page * PS, dtype=np.int32)
    return q, cent, k_pages, v_pages, block_ids, block_table, seq


class TestFusedVsSeparate:
    @pytest.mark.parametrize("group_mode", ["kv_group", "per_qhead"])
    def test_block_position_identical(self, rng, group_mode):
        q, cent, kp, vp, bids, bt, seq = make_case(rng)
        kv = np.asarray(fuse_kv(kp, vp))

        out_f, pos_f, maxlen_f = sparse_paged_fusion_attention(
            q, kv, bt, cent, bids, seq, k=8, page_size=PS, max_page_num=16,
            group_mode=group_mode)

        pos_s, plen_s, maxlen_s = cent_select(
            q, cent, bids, bt, seq, k=8, block_size=PS, max_page_num=16,
            group_mode=group_mode)

        np.testing.assert_array_equal(np.asarray(pos_f), np.asarray(pos_s))
        np.testing.assert_array_equal(np.asarray(maxlen_f),
                                      np.asarray(maxlen_s))

        h_kv = kp.shape[0]
        out_s = paged_flash_decode(
            q, kv, None, bt[:q.shape[0]], seq,
            np.asarray(pos_s)[:, :h_kv, :], np.asarray(plen_s)[:, :h_kv, 0],
            page_size=PS)
        np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_s),
                                   rtol=2e-5, atol=2e-5)

    def test_fused_matches_oracle_end_to_end(self, rng):
        """Selection oracle + sparse attention oracle == fused op."""
        q, cent, kp, vp, bids, bt, seq = make_case(rng, b=1, h_kv=2, g=2)
        kv = np.asarray(fuse_kv(kp, vp))
        h_kv = kp.shape[0]

        out_f, pos_f, _ = sparse_paged_fusion_attention(
            q, kv, bt, cent, bids, seq, k=8, page_size=PS, max_page_num=16,
            group_mode="per_qhead")

        want_pos, want_len, _ = oracles.cent_select_oracle(
            q, cent, bids, bt, seq, k=8, block_size=PS, max_page_num=16)
        np.testing.assert_array_equal(np.asarray(pos_f), want_pos)

        want_out = oracles.sparse_paged_attention_oracle(
            q, kp, vp, bt, want_pos[:, :h_kv], want_len[:, :h_kv, 0], seq,
            block_size=PS)
        np.testing.assert_allclose(np.asarray(out_f), want_out,
                                   rtol=2e-5, atol=2e-5)

    def test_capped_length_limits_attended_pages(self, rng):
        """The workload cap must limit what the attention actually reads."""
        q, cent, kp, vp, bids, bt, seq = make_case(rng)
        # all pages in cluster 0 → every page matches → cap = page_len/8 = 2
        bids = np.zeros_like(bids)
        kv = np.asarray(fuse_kv(kp, vp))
        out_f, pos_f, maxlen_f = sparse_paged_fusion_attention(
            q, kv, bt, cent, bids, seq, k=8, page_size=PS, max_page_num=16,
            group_mode="kv_group")
        assert np.all(np.asarray(maxlen_f) == 2 * PS)
        # attended = first 2 selected slots only
        h_kv = kp.shape[0]
        plens = np.full((q.shape[0], h_kv), 2, np.int32)
        want = np.asarray(paged_flash_decode(
            q, kv, None, bt[:q.shape[0]], seq,
            np.asarray(pos_f)[:, :h_kv], plens, page_size=PS))
        np.testing.assert_allclose(np.asarray(out_f), want,
                                   rtol=2e-5, atol=2e-5)


class TestQuant:
    def test_roundtrip_int8(self, rng):
        from cann_ops_adv_vllm_tpu.ops.quant import dequantize_kv, quantize_kv
        kv = rng.standard_normal((2, 8, 2 * PS, D)).astype(np.float32)
        kv_q, s, o = quantize_kv(kv, mode="per_channel")
        back = np.asarray(dequantize_kv(np.asarray(kv_q), np.asarray(s),
                                        np.asarray(o)))
        # error bounded by scale/2 per element
        bound = np.asarray(s)[:, None, None, :] / 2 + 1e-6
        assert np.all(np.abs(back - kv) <= bound)

    def test_int4_pack_roundtrip(self, rng):
        from cann_ops_adv_vllm_tpu.ops.quant import pack_int4, unpack_int4
        vals = rng.integers(-8, 8, (2, 4, 2 * PS, D)).astype(np.int8)
        packed = pack_int4(vals)
        assert packed.shape == (2, 4, PS, D)
        np.testing.assert_array_equal(np.asarray(unpack_int4(packed)), vals)

    def test_fused_int8(self, rng):
        from cann_ops_adv_vllm_tpu.ops.quant import quantize_kv
        q, cent, kp, vp, bids, bt, seq = make_case(rng, b=1)
        h_kv = kp.shape[0]
        kq, ks, ko = quantize_kv(kp, mode="per_channel")
        vq, vs, vo = quantize_kv(vp, mode="per_channel")
        kv_q = np.asarray(fuse_kv(np.asarray(kq), np.asarray(vq)))
        scales = tuple(np.asarray(x) for x in (ks, ko, vs, vo))

        out_q, pos, _ = sparse_paged_fusion_attention(
            q, kv_q, bt, cent, bids, seq, kv_scales=scales, k=8,
            page_size=PS, max_page_num=16)
        kv_f = np.asarray(fuse_kv(kp, vp))
        out_f, _, _ = sparse_paged_fusion_attention(
            q, kv_f, bt, cent, bids, seq, k=8, page_size=PS, max_page_num=16)
        err = np.abs(np.asarray(out_q) - np.asarray(out_f)).mean()
        assert err < 0.05, err
