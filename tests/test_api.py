"""Reference-API surface tests: layouts, KV formats, feature plumbing.

Checks that the ``api`` module reproduces the reference op signatures
(custom_ops/add_custom.py) over the native kernels: BSH/BSND/BNSD query
layouts, vllm-layout and continuous (non-paged) KV, atten_mask/pse_shift,
packed antiquant params, and the shared-prefix path.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from cann_ops_adv_vllm_tpu import api
from cann_ops_adv_vllm_tpu.config import MASK_VALUE
from cann_ops_adv_vllm_tpu.ops.paged_attention import (
    fuse_kv,
    paged_attention_xla,
    paged_flash_decode,
)
from cann_ops_adv_vllm_tpu.ops.quant import quantize_kv


def _pool(rng, h_kv, num_pages, ps, d):
    k = jnp.asarray(rng.standard_normal((h_kv, num_pages, ps, d)),
                    jnp.float32)
    v = jnp.asarray(rng.standard_normal((h_kv, num_pages, ps, d)),
                    jnp.float32)
    return k, v


def _base(seed=0, b=2, h_kv=2, g=4, d=128, ps=16, num_pages=32, mp=8):
    rng = np.random.default_rng(seed)
    h_q = h_kv * g
    q = jnp.asarray(rng.standard_normal((b, h_q, d)), jnp.float32)
    k, v = _pool(rng, h_kv, num_pages, ps, d)
    bt = jnp.asarray(rng.permutation(num_pages)[:b * mp].reshape(b, mp),
                     jnp.int32)
    sl = jnp.asarray(rng.integers(ps, mp * ps, b), jnp.int32)
    return rng, q, k, v, bt, sl, (b, h_q, h_kv, d, ps, mp)


@pytest.mark.parametrize("layout", ["BSH", "BSND", "BNSD"])
def test_layouts_roundtrip(layout):
    rng, q, k, v, bt, sl, (b, h_q, h_kv, d, ps, mp) = _base()
    if layout == "BSH":
        q_l = q.reshape(b, 1, h_q * d)
    elif layout == "BSND":
        q_l = q.reshape(b, 1, h_q, d)
    else:
        q_l = q.reshape(b, h_q, 1, d)
    out = api.incre_flash_attention(
        q_l, k, v, num_heads=h_q, num_key_value_heads=h_kv,
        input_layout=layout, block_table=bt, actual_seq_lengths=sl,
        block_size=ps)
    want = paged_flash_decode(q, fuse_kv(k, v), None, bt, sl, page_size=ps)
    got = np.asarray(out).reshape(b, h_q, d)
    np.testing.assert_allclose(got, np.asarray(want), rtol=1e-5, atol=1e-5)


def test_vllm_kv_layout():
    rng, q, k, v, bt, sl, (b, h_q, h_kv, d, ps, mp) = _base()
    num_pages = k.shape[1]
    k_vllm = jnp.transpose(k, (1, 2, 0, 3)).reshape(num_pages, ps, h_kv * d)
    v_vllm = jnp.transpose(v, (1, 2, 0, 3)).reshape(num_pages, ps, h_kv * d)
    out = api.incre_flash_attention(
        q.reshape(b, 1, h_q * d), k_vllm, v_vllm, num_heads=h_q,
        num_key_value_heads=h_kv, block_table=bt, actual_seq_lengths=sl,
        block_size=ps, kv_layout="vllm")
    want = paged_flash_decode(q, fuse_kv(k, v), None, bt, sl, page_size=ps)
    np.testing.assert_allclose(np.asarray(out).reshape(b, h_q, d),
                               np.asarray(want), rtol=1e-5, atol=1e-5)


def test_continuous_kv_non_paged():
    """Non-paged IFA: continuous KV paginated internally == paged result."""
    rng, q, k, v, bt, sl, (b, h_q, h_kv, d, ps, mp) = _base()
    s_max = int(jnp.max(sl))
    # build continuous KV [B, S, H_kv*D] from the paged pool via the table
    k_cont = np.zeros((b, s_max, h_kv * d), np.float32)
    v_cont = np.zeros((b, s_max, h_kv * d), np.float32)
    kn, vn = np.asarray(k), np.asarray(v)
    for bi in range(b):
        for t in range(int(sl[bi])):
            pg = int(bt[bi, t // ps])
            k_cont[bi, t] = kn[:, pg, t % ps].reshape(-1)
            v_cont[bi, t] = vn[:, pg, t % ps].reshape(-1)
    out = api.incre_flash_attention(
        q.reshape(b, 1, h_q * d), jnp.asarray(k_cont), jnp.asarray(v_cont),
        num_heads=h_q, num_key_value_heads=h_kv, actual_seq_lengths=sl,
        block_size=ps)
    want = paged_flash_decode(q, fuse_kv(k, v), None, bt, sl, page_size=ps)
    np.testing.assert_allclose(np.asarray(out).reshape(b, h_q, d),
                               np.asarray(want), rtol=1e-4, atol=1e-4)


def test_atten_mask_and_pse():
    rng, q, k, v, bt, sl, (b, h_q, h_kv, d, ps, mp) = _base()
    s_tot = mp * ps
    mask = rng.random((b, s_tot)) < 0.25
    pse = rng.standard_normal((b, h_kv, s_tot)).astype(np.float32) * 0.4
    out = api.incre_flash_attention(
        q.reshape(b, 1, h_q * d), k, v, num_heads=h_q,
        num_key_value_heads=h_kv, block_table=bt, actual_seq_lengths=sl,
        block_size=ps, atten_mask=jnp.asarray(mask),
        pse_shift=jnp.asarray(pse))
    bias = api.make_bias_pages(atten_mask=jnp.asarray(mask),
                               pse_shift=jnp.asarray(pse),
                               max_blocks=mp, page_size=ps)
    assert bias.shape == (b, h_kv, mp, ps)
    want = paged_attention_xla(q, k, v, bt, sl, bias_pages=bias,
                               page_size=ps)
    np.testing.assert_allclose(np.asarray(out).reshape(b, h_q, d),
                               np.asarray(want), rtol=1e-4, atol=1e-4)


def test_packed_antiquant_params():
    rng, q, k, v, bt, sl, (b, h_q, h_kv, d, ps, mp) = _base()
    k_q, ks, ko = quantize_kv(k)
    v_q, vs, vo = quantize_kv(v)
    packed_scale = jnp.stack([ks, vs])
    packed_off = jnp.stack([ko, vo])
    out = api.incre_flash_attention(
        q.reshape(b, 1, h_q * d), k_q, v_q, num_heads=h_q,
        num_key_value_heads=h_kv, block_table=bt, actual_seq_lengths=sl,
        block_size=ps, antiquant_scale=packed_scale,
        antiquant_offset=packed_off)
    want = paged_flash_decode(q, fuse_kv(k_q, v_q), None, bt, sl,
                              kv_scales=(ks, ko, vs, vo), page_size=ps)
    np.testing.assert_allclose(np.asarray(out).reshape(b, h_q, d),
                               np.asarray(want), rtol=1e-5, atol=1e-5)


def test_kv_padding_and_lse_flag():
    rng, q, k, v, bt, sl, (b, h_q, h_kv, d, ps, mp) = _base()
    pad = jnp.asarray(rng.integers(0, 2 * ps, b), jnp.int32)
    sl = jnp.asarray(rng.integers(1, (mp - 2) * ps, b), jnp.int32)
    out, lse = api.incre_flash_attention(
        q.reshape(b, 1, h_q * d), k, v, num_heads=h_q,
        num_key_value_heads=h_kv, block_table=bt, actual_seq_lengths=sl,
        block_size=ps, kv_padding_size=pad, softmax_lse_flag=True)
    want, want_lse = paged_flash_decode(
        q, fuse_kv(k, v), None, bt, sl, kv_start=pad, page_size=ps,
        return_lse=True)
    np.testing.assert_allclose(np.asarray(out).reshape(b, h_q, d),
                               np.asarray(want), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(lse), np.asarray(want_lse),
                               rtol=1e-5, atol=1e-5)


def test_sparse_api_per_qhead_rows():
    """sparse_paged_attention consumes per-q-head block_position rows the
    way the reference kernel does: first H_kv rows."""
    rng, q, k, v, bt, sl, (b, h_q, h_kv, d, ps, mp) = _base()
    sl = jnp.full((b,), mp * ps, jnp.int32)
    m = 4
    pos = jnp.stack([
        jnp.stack([jnp.sort(jnp.asarray(
            rng.choice(mp, m, replace=False), jnp.int32))
            for _ in range(h_q)])
        for _ in range(b)])                        # [B, H_q, m]
    plen = jnp.full((b, h_q, 8), m, jnp.int32)     # TPL_PAD form
    out = api.sparse_paged_attention(
        q.reshape(b, 1, h_q * d), k, v, block_table=bt,
        block_position=pos, page_position_length=plen,
        actual_seq_lengths=sl, num_heads=h_q, num_key_value_heads=h_kv,
        block_size=ps)
    want = paged_flash_decode(
        q, fuse_kv(k, v), None, bt, sl, pos[:, :h_kv, :],
        plen[:, :h_kv, 0], page_size=ps)
    np.testing.assert_allclose(np.asarray(out).reshape(b, h_q, d),
                               np.asarray(want), rtol=1e-5, atol=1e-5)


def test_fusion_api():
    rng, q, k, v, bt, sl, (b, h_q, h_kv, d, ps, mp) = _base()
    c = 16
    l1 = jnp.asarray(rng.standard_normal((h_kv, c, d)), jnp.float32)
    bids = jnp.asarray(rng.integers(0, c, (h_kv, k.shape[1])), jnp.int32)
    out, pos, max_len = api.sparse_paged_fusion_attention(
        q.reshape(b, 1, h_q * d), k, v, block_table=bt, l1_cent=l1,
        block_ids=bids, total_seq_len=sl, num_heads=h_q,
        num_key_value_heads=h_kv, block_size=ps, k=4)
    assert out.shape == (b, 1, h_q * d)
    assert pos.shape[0] == b and max_len.shape[0] == b
    assert bool(jnp.all(jnp.isfinite(out)))


def test_selection_api_wrappers():
    rng = np.random.default_rng(3)
    b, h_q, h_kv, d, c, ps = 2, 8, 2, 128, 16, 16
    num_pages, mp = 32, 8
    q = jnp.asarray(rng.standard_normal((b, h_q, d)), jnp.float32)
    l1 = jnp.asarray(rng.standard_normal((h_kv, c, d)), jnp.float32)
    bids = jnp.asarray(rng.integers(0, c, (h_kv, num_pages)), jnp.int32)
    bt = jnp.asarray(rng.permutation(num_pages)[:b * mp].reshape(b, mp),
                     jnp.int32)
    sl = jnp.asarray(rng.integers(ps, mp * ps, b), jnp.int32)

    idx = api.compute_cent(q.reshape(b, 1, h_q * d), l1, k=4,
                           num_heads=h_q, input_layout="BSH")
    assert idx.shape == (b, h_q, 4)
    pos, lens = api.select_position(bids, bt, sl, idx, block_size=ps)
    assert pos.shape[:2] == (b, h_q)
    pos2, plens, maxlen = api.cent_select(
        q, l1, bids, bt, sl, k=4, block_size=ps)
    assert pos2.shape[:2] == (b, h_q) and maxlen.shape[0] == b


def test_int8_query_dequant_scale1():
    """Fully-quantized int8-query path (reference QUANT flag,
    incre_flash_attention.cpp:590-604): int8 q + dequant_scale1 must match
    the float path on the dequantized query within bf16 tolerance."""
    rng, q, k, v, bt, sl, (b, h_q, h_kv, d, ps, mp) = _base(seed=7)
    scale = 0.05
    q_i8 = jnp.clip(jnp.round(q / scale), -128, 127).astype(jnp.int8)
    q_deq = (q_i8.astype(jnp.float32) * scale)

    got = api.incre_flash_attention(
        q_i8.reshape(b, 1, h_q * d), fuse_kv(k, v),
        num_heads=h_q, num_key_value_heads=h_kv,
        actual_seq_lengths=sl, block_table=bt, block_size=ps,
        dequant_scale1=scale)
    want = api.incre_flash_attention(
        q_deq.reshape(b, 1, h_q * d), fuse_kv(k, v),
        num_heads=h_q, num_key_value_heads=h_kv,
        actual_seq_lengths=sl, block_table=bt, block_size=ps)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=5e-3, atol=5e-3)

    # per-head and per-channel dequant_scale1 shapes are accepted too
    s_head = jnp.full((h_q,), scale, jnp.float32)
    got2 = api.incre_flash_attention(
        q_i8.reshape(b, 1, h_q * d), fuse_kv(k, v),
        num_heads=h_q, num_key_value_heads=h_kv,
        actual_seq_lengths=sl, block_table=bt, block_size=ps,
        dequant_scale1=s_head)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(got),
                               rtol=1e-6, atol=1e-6)

    with pytest.raises(ValueError, match="dequant_scale1"):
        api.incre_flash_attention(
            q_i8.reshape(b, 1, h_q * d), fuse_kv(k, v),
            num_heads=h_q, num_key_value_heads=h_kv,
            actual_seq_lengths=sl, block_table=bt, block_size=ps)


def test_int4_kv_through_api():
    """kv_int4=True accepts nibble-packed pages + packed antiquant params
    through the reference-shaped API (reference int4b_t rows,
    incre_flash_attention.cpp:431-438)."""
    from cann_ops_adv_vllm_tpu.ops.quant import quantize_kv_int4

    rng, q, k, v, bt, sl, (b, h_q, h_kv, d, ps, mp) = _base(seed=11)
    kv = fuse_kv(k, v)
    packed, (k_s, k_o, v_s, v_o) = quantize_kv_int4(kv, mode="per_channel")
    # reference packed antiquant layout: [2, H_kv, D] (K first)
    aq_scale = jnp.stack([k_s, v_s])
    aq_off = jnp.stack([k_o, v_o])

    got = api.incre_flash_attention(
        q.reshape(b, 1, h_q * d), packed,
        num_heads=h_q, num_key_value_heads=h_kv,
        actual_seq_lengths=sl, block_table=bt, block_size=ps,
        antiquant_scale=aq_scale, antiquant_offset=aq_off, kv_int4=True)

    from cann_ops_adv_vllm_tpu.ops.quant import unpack_int4_fused
    unpacked = np.asarray(unpack_int4_fused(packed)).astype(np.float32)
    k_dq = (unpacked[..., :d] * np.asarray(k_s)[:, None, None, :]
            + np.asarray(k_o)[:, None, None, :])
    v_dq = (unpacked[..., d:] * np.asarray(v_s)[:, None, None, :]
            + np.asarray(v_o)[:, None, None, :])
    want = api.incre_flash_attention(
        q.reshape(b, 1, h_q * d), fuse_kv(jnp.asarray(k_dq),
                                          jnp.asarray(v_dq)),
        num_heads=h_q, num_key_value_heads=h_kv,
        actual_seq_lengths=sl, block_table=bt, block_size=ps)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=5e-3, atol=5e-3)


def test_tensor_list_kv():
    """Per-batch KV tensor lists (reference kvListSeqLens_ non-continuous
    batches, incre_flash_attention_tiling.cc:337-366): ragged per-request
    KV tensors == per-request single-tensor calls."""
    rng = np.random.default_rng(11)
    h_kv, g, d, ps = 2, 2, 128, 16
    h_q = h_kv * g
    lens = [19, 40, 7]
    b = len(lens)
    q = jnp.asarray(rng.standard_normal((b, h_q, d)), jnp.float32)
    keys = [jnp.asarray(rng.standard_normal((1, s, h_kv * d)), jnp.float32)
            for s in lens]
    vals = [jnp.asarray(rng.standard_normal((1, s, h_kv * d)), jnp.float32)
            for s in lens]

    out = api.incre_flash_attention(
        q.reshape(b, 1, h_q * d), keys, vals, num_heads=h_q,
        num_key_value_heads=h_kv, block_size=ps)

    for bi, s in enumerate(lens):
        want = api.incre_flash_attention(
            q[bi:bi + 1].reshape(1, 1, h_q * d), keys[bi], vals[bi],
            num_heads=h_q, num_key_value_heads=h_kv,
            actual_seq_lengths=jnp.asarray([s], jnp.int32), block_size=ps)
        np.testing.assert_allclose(
            np.asarray(out)[bi], np.asarray(want)[0], rtol=1e-5, atol=1e-5)


def test_tensor_list_kv_2d_elements_and_explicit_lens():
    """[S, H] list elements; actual_seq_lengths may shorten each element."""
    rng = np.random.default_rng(12)
    h_kv, g, d, ps = 2, 2, 128, 16
    h_q = h_kv * g
    lens = [25, 33]
    b = len(lens)
    q = jnp.asarray(rng.standard_normal((b, h_q, d)), jnp.float32)
    keys = [jnp.asarray(rng.standard_normal((s, h_kv * d)), jnp.float32)
            for s in lens]
    vals = [jnp.asarray(rng.standard_normal((s, h_kv * d)), jnp.float32)
            for s in lens]
    short = jnp.asarray([20, 30], jnp.int32)
    out = api.incre_flash_attention(
        q.reshape(b, 1, h_q * d), keys, vals, num_heads=h_q,
        num_key_value_heads=h_kv, block_size=ps,
        actual_seq_lengths=short)
    for bi in range(b):
        want = api.incre_flash_attention(
            q[bi:bi + 1].reshape(1, 1, h_q * d), keys[bi][None],
            vals[bi][None], num_heads=h_q, num_key_value_heads=h_kv,
            actual_seq_lengths=short[bi:bi + 1], block_size=ps)
        np.testing.assert_allclose(
            np.asarray(out)[bi], np.asarray(want)[0], rtol=1e-5, atol=1e-5)
