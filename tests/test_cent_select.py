"""Selection-op accuracy tests vs the golden oracles.

Ports the reference's golden tests (tests/compute_cent.py — B=8, N1=32,
N2=8, C=512, k=64, D=128; tests/cent_select.py — B=4, kvPageLen=1280,
maxPage=1024) with *exact equality* on index outputs, per the reference's
criterion (tests/utils.py compare_tensors: integer outputs compared with
torch.equal).

Inputs are drawn from small integers so fp32 dot products are exact and the
top-k order is deterministic across XLA/NumPy accumulation orders.
"""

import numpy as np
import pytest

from cann_ops_adv_vllm_tpu.config import INT32_SENTINEL, PAGE_SIZE, TPL_PAD
from cann_ops_adv_vllm_tpu.ops.cent_select import (
    cent_select,
    compute_cent,
    compute_cent_scores_grouped,
    select_position,
)
from cann_ops_adv_vllm_tpu.ref import oracles


def _int_data(rng, shape, lo=-4, hi=5, dtype=np.float32):
    return rng.integers(lo, hi, size=shape).astype(dtype)


class TestComputeCent:
    def test_reference_config(self, rng):
        # tests/compute_cent.py:15-27 canonical shapes
        b, n1, n2, c, k, d = 8, 32, 8, 512, 64, 128
        q = _int_data(rng, (b, n1, d))
        cent = _int_data(rng, (n2, c, d))
        got = np.asarray(compute_cent(q, cent, k))
        want = oracles.compute_cent_oracle(q, cent, k)
        np.testing.assert_array_equal(got, want)

    def test_small(self, rng):
        # BASELINE.json config 1: B=1, N=8, D=128, C=64, k=4
        q = _int_data(rng, (1, 8, 128))
        cent = _int_data(rng, (4, 64, 128))
        got = np.asarray(compute_cent(q, cent, 4))
        want = oracles.compute_cent_oracle(q, cent, 4)
        np.testing.assert_array_equal(got, want)

    def test_grouped_matches_summed_queries(self, rng):
        b, n1, n2, c, k, d = 2, 8, 4, 32, 4, 16
        q = _int_data(rng, (b, n1, d))
        cent = _int_data(rng, (n2, c, d))
        got = np.asarray(compute_cent_scores_grouped(q, cent, k))
        q_sum = q.reshape(b, n2, n1 // n2, d).sum(axis=2)
        want = oracles.compute_cent_oracle(q_sum, cent, k)
        np.testing.assert_array_equal(got, want)


class TestSelectPosition:
    @pytest.mark.parametrize("seq", [32 * 1024, 1000, 128, 1])
    def test_vs_oracle(self, rng, seq):
        b, n1, n2, k = 4, 32, 8, 64
        kv_page_len, max_batch, max_page = 1280, 8, 1024
        block_ids = rng.integers(0, 512, (n2, kv_page_len)).astype(np.int32)
        block_table = rng.integers(0, kv_page_len, (max_batch, max_page)).astype(np.int32)
        seq_len = np.full((b,), seq, dtype=np.int32)
        indices = rng.integers(0, 512, (b, n1, k)).astype(np.int32)

        got_pos, got_len = select_position(
            block_ids, block_table, seq_len, indices, out_size=max_page)
        want_pos, want_len = oracles.select_position_oracle(
            block_ids, block_table, seq_len, indices)

        np.testing.assert_array_equal(np.asarray(got_len), want_len)
        w = want_pos.shape[-1]
        np.testing.assert_array_equal(np.asarray(got_pos)[..., :w], want_pos)
        assert np.all(np.asarray(got_pos)[..., w:] == INT32_SENTINEL)

    def test_ragged_batch(self, rng):
        b, n1, n2, k = 3, 8, 4, 16
        kv_page_len, max_page = 64, 32
        block_ids = rng.integers(0, 64, (n2, kv_page_len)).astype(np.int32)
        block_table = rng.integers(0, kv_page_len, (b, max_page)).astype(np.int32)
        seq_len = np.array([4096, 129, 2048], dtype=np.int32)
        indices = rng.integers(0, 64, (b, n1, k)).astype(np.int32)

        got_pos, got_len = select_position(
            block_ids, block_table, seq_len, indices, out_size=max_page)
        want_pos, want_len = oracles.select_position_oracle(
            block_ids, block_table, seq_len, indices)
        np.testing.assert_array_equal(np.asarray(got_len), want_len)
        w = want_pos.shape[-1]
        np.testing.assert_array_equal(np.asarray(got_pos)[..., :w], want_pos)


class TestCentSelect:
    def test_vs_oracle_reference_config(self, rng):
        # tests/cent_select.py canonical: B=4, 32/8 heads, C=512, k=64,
        # seq=32K, kvPageLen=1280, maxPage=1024
        b, n1, n2, c, k, d = 4, 32, 8, 512, 64, 128
        kv_page_len, max_batch, max_page = 1280, 8, 1024
        seq = 32 * 1024
        q = _int_data(rng, (b, n1, d))
        cent = _int_data(rng, (n2, c, d))
        block_ids = rng.integers(0, c, (n2, kv_page_len)).astype(np.int32)
        block_table = rng.integers(0, kv_page_len, (max_batch, max_page)).astype(np.int32)
        seq_len = np.full((b,), seq, dtype=np.int32)

        got = cent_select(q, cent, block_ids, block_table, seq_len, k=k,
                          group_mode="per_qhead")
        want = oracles.cent_select_oracle(
            q, cent, block_ids, block_table, seq_len, k=k)

        for g, w, name in zip(got, want,
                              ["page_position", "page_position_length",
                               "max_page_position_length"]):
            np.testing.assert_array_equal(np.asarray(g), w, err_msg=name)

    def test_sink_and_recent_always_selected(self, rng):
        b, n1, n2, c, k, d = 2, 4, 2, 32, 2, 16
        kv_page_len, max_page = 128, 64
        seq = 64 * PAGE_SIZE
        q = _int_data(rng, (b, n1, d))
        cent = _int_data(rng, (n2, c, d))
        block_ids = rng.integers(0, c, (n2, kv_page_len)).astype(np.int32)
        # unique physical pages so forcing maps to slots {0, pl-2, pl-1}
        block_table = np.stack([
            rng.permutation(kv_page_len)[:max_page] for _ in range(b)
        ]).astype(np.int32)
        seq_len = np.full((b,), seq, dtype=np.int32)

        pos, _, _ = cent_select(q, cent, block_ids, block_table, seq_len, k=k)
        pos = np.asarray(pos)
        pl = seq // PAGE_SIZE
        for bi in range(b):
            for h in range(n1):
                valid = pos[bi, h][pos[bi, h] != INT32_SENTINEL]
                assert 0 in valid
                assert pl - 2 in valid
                assert pl - 1 in valid

    def test_workload_cap(self, rng):
        # all pages match => count == page_len, length must clamp to pl//8
        b, n1, n2, d = 1, 4, 2, 16
        kv_page_len, max_page = 256, 128
        seq = 128 * PAGE_SIZE
        q = _int_data(rng, (b, n1, d))
        cent = _int_data(rng, (n2, 8, d))
        block_ids = np.zeros((n2, kv_page_len), dtype=np.int32)  # all cluster 0
        block_table = rng.integers(0, kv_page_len, (b, max_page)).astype(np.int32)
        seq_len = np.full((b,), seq, dtype=np.int32)
        indices_all_zero_k = 8  # top-8 of 8 clusters => includes cluster 0

        _, plen, maxlen = cent_select(q, cent, block_ids, block_table,
                                      seq_len, k=indices_all_zero_k)
        pl = seq // PAGE_SIZE
        assert np.all(np.asarray(plen) == pl // 8)
        assert np.all(np.asarray(maxlen) == (pl // 8) * PAGE_SIZE)
        assert np.asarray(plen).shape == (b, n1, TPL_PAD)

    def test_matches_composition_when_no_forcing_or_cap(self, rng):
        b, n1, n2, c, k, d = 2, 8, 4, 64, 8, 32
        kv_page_len, max_page = 128, 64
        q = _int_data(rng, (b, n1, d))
        cent = _int_data(rng, (n2, c, d))
        block_ids = rng.integers(0, c, (n2, kv_page_len)).astype(np.int32)
        block_table = rng.integers(0, kv_page_len, (b, max_page)).astype(np.int32)
        seq_len = np.array([max_page * PAGE_SIZE, 40 * PAGE_SIZE], dtype=np.int32)

        idx = compute_cent(q, cent, k)
        sp_pos, sp_len = select_position(block_ids, block_table, seq_len,
                                         np.asarray(idx), out_size=256)
        cs_pos, cs_len, _ = cent_select(
            q, cent, block_ids, block_table, seq_len, k=k,
            workload_cap_ratio=0, force_sink_and_recent=False,
            group_mode="per_qhead")
        np.testing.assert_array_equal(np.asarray(cs_pos), np.asarray(sp_pos))
        np.testing.assert_array_equal(np.asarray(cs_len)[..., 0],
                                      np.asarray(sp_len))
