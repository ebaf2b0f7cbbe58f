"""torch front-end parity: torch tensors in/out, same numbers as JAX api."""

import numpy as np
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")

from cann_ops_adv_vllm_tpu import api, torch_bridge
from cann_ops_adv_vllm_tpu.ops.paged_attention import fuse_kv


def _setup(seed=0):
    rng = np.random.default_rng(seed)
    b, h_kv, g, d, ps, P, mp = 2, 2, 4, 128, 16, 32, 8
    h_q = h_kv * g
    q = torch.tensor(rng.standard_normal((b, 1, h_q * d)), dtype=torch.float32)
    k = torch.tensor(rng.standard_normal((h_kv, P, ps, d)), dtype=torch.float32)
    v = torch.tensor(rng.standard_normal((h_kv, P, ps, d)), dtype=torch.float32)
    bt = torch.tensor(rng.permutation(P)[:b * mp].reshape(b, mp).astype(np.int32))
    sl = torch.tensor(rng.integers(1, mp * ps, b).astype(np.int32))
    return q, k, v, bt, sl, (b, h_q, h_kv, d, ps)


def test_incre_flash_attention_torch():
    q, k, v, bt, sl, (b, h_q, h_kv, d, ps) = _setup()
    out = torch_bridge.incre_flash_attention(
        q, k, v, num_heads=h_q, num_key_value_heads=h_kv,
        block_table=bt, actual_seq_lengths=sl, block_size=ps)
    assert isinstance(out, torch.Tensor) and out.shape == q.shape
    want = api.incre_flash_attention(
        jnp.asarray(q.numpy()), jnp.asarray(k.numpy()),
        jnp.asarray(v.numpy()), num_heads=h_q, num_key_value_heads=h_kv,
        block_table=jnp.asarray(bt.numpy()),
        actual_seq_lengths=jnp.asarray(sl.numpy()), block_size=ps)
    np.testing.assert_allclose(out.numpy(), np.asarray(want),
                               rtol=1e-6, atol=1e-6)


def test_fused_with_device_cache():
    q, k, v, bt, sl, (b, h_q, h_kv, d, ps) = _setup(1)
    rng = np.random.default_rng(1)
    C, P = 16, k.shape[1]
    cent = torch.tensor(rng.standard_normal((h_kv, C, d)),
                        dtype=torch.float32)
    bids = torch.tensor(rng.integers(0, C, (h_kv, P)).astype(np.int32))
    cache = torch_bridge.DeviceCache(
        fuse_kv(jnp.asarray(k.numpy()), jnp.asarray(v.numpy())),
        l1_cent=cent, block_ids=bids)
    out, pos, ml = torch_bridge.sparse_paged_fusion_attention(
        q, cache=cache, block_table=bt, total_seq_len=sl,
        num_heads=h_q, num_key_value_heads=h_kv, block_size=ps, k=4)
    assert isinstance(out, torch.Tensor)
    assert isinstance(pos, torch.Tensor) and pos.dtype == torch.int32
    assert torch.isfinite(out).all()


def test_selection_chain_torch():
    rng = np.random.default_rng(2)
    b, h_q, h_kv, d, c, ps = 2, 4, 2, 128, 8, 16
    P, mp = 32, 8
    q = torch.tensor(rng.standard_normal((b, h_q, d)), dtype=torch.float32)
    cent = torch.tensor(rng.standard_normal((h_kv, c, d)),
                        dtype=torch.float32)
    bids = torch.tensor(rng.integers(0, c, (h_kv, P)).astype(np.int32))
    bt = torch.tensor(rng.permutation(P)[:b * mp].reshape(b, mp)
                      .astype(np.int32))
    sl = torch.tensor(rng.integers(ps, mp * ps, b).astype(np.int32))

    idx = torch_bridge.compute_cent(q, cent, k=4)
    assert idx.shape == (b, h_q, 4)
    pos, lens = torch_bridge.select_position(bids, bt, sl, idx,
                                             block_size=ps)
    assert pos.shape[:2] == (b, h_q)
    pos2, plens, maxlen = torch_bridge.cent_select(q, cent, bids, bt, sl,
                                                   k=4, block_size=ps)
    assert maxlen.shape[0] == b


def test_bf16_dlpack_roundtrip():
    """bf16 tensors cross the bridge without an fp32 detour (dlpack both
    directions) and outputs come back as torch.bfloat16."""
    rng = np.random.default_rng(3)
    b, h_kv, g, d, ps = 2, 2, 2, 128, 16
    h_q = h_kv * g
    q = torch.tensor(rng.standard_normal((b, 1, h_q * d)),
                     dtype=torch.bfloat16)
    k = torch.tensor(rng.standard_normal((h_kv, 16, ps, d)),
                     dtype=torch.bfloat16)
    v = torch.tensor(rng.standard_normal((h_kv, 16, ps, d)),
                     dtype=torch.bfloat16)
    bt = torch.tensor(rng.permutation(16)[:b * 8].reshape(b, 8)
                      .astype(np.int32))
    sl = torch.tensor(rng.integers(ps, 8 * ps, b).astype(np.int32))
    out = torch_bridge.incre_flash_attention(
        q, k, v, num_heads=h_q, num_key_value_heads=h_kv,
        block_table=bt, actual_seq_lengths=sl, block_size=ps)
    assert out.dtype == torch.bfloat16
    want = api.incre_flash_attention(
        jnp.asarray(q.float().numpy(), jnp.bfloat16),
        jnp.asarray(k.float().numpy(), jnp.bfloat16),
        jnp.asarray(v.float().numpy(), jnp.bfloat16),
        num_heads=h_q, num_key_value_heads=h_kv, block_table=bt.numpy(),
        actual_seq_lengths=sl.numpy(), block_size=ps)
    np.testing.assert_allclose(out.float().numpy(),
                               np.asarray(want, jnp.float32).reshape(
                                   out.shape),
                               rtol=2e-2, atol=2e-2)


def test_torch_compile_captures_registered_ops():
    """torch.library registration (torch_ops): the fused op appears as a
    dispatcher node inside a torch.compile'd graph (no graph break), and
    the compiled module's outputs match eager (reference analog:
    TORCH_LIBRARY registration.cpp:43-79, op_plugin_functions.yaml:6962).
    """
    from cann_ops_adv_vllm_tpu import torch_ops  # noqa: F401  (registers)

    q, k, v, bt, sl, (b, h_q, h_kv, d, ps) = _setup(2)
    rng = np.random.default_rng(2)
    C, P = 16, k.shape[1]
    kv = torch.tensor(np.concatenate([k.numpy(), v.numpy()], axis=3))
    cent = torch.tensor(rng.standard_normal((h_kv, C, d)),
                        dtype=torch.float32)
    bids = torch.tensor(rng.integers(0, C, (h_kv, P)).astype(np.int32))
    qb = q.reshape(b, h_q, 1, d)       # BNSD

    def fn(qq, kv, bt, cent, bids, sl):
        out, pos, ml = (
            torch.ops.cann_ops_adv_vllm_tpu.sparse_paged_fusion_attention(
                qq, kv, bt, cent, bids, sl, h_q, h_kv,
                None, ps, "BNSD", C, 16, 0))
        return out * 2.0, pos, ml

    want = fn(qb, kv, bt, cent, bids, sl)

    graphs = []

    def backend(gm, example_inputs):
        graphs.append(gm)
        return gm.forward

    compiled = torch.compile(fn, backend=backend, fullgraph=True)
    got = compiled(qb, kv, bt, cent, bids, sl)

    assert len(graphs) == 1
    targets = [str(n.target) for n in graphs[0].graph.nodes
               if n.op == "call_function"]
    assert any("sparse_paged_fusion_attention" in t for t in targets), targets
    for g, w in zip(got, want):
        np.testing.assert_allclose(g.float().numpy(), w.float().numpy(),
                                   rtol=1e-6, atol=1e-6)


def test_registered_dense_and_selection_ops():
    """incre_flash_attention / cent_select / compute_cent through the
    dispatcher == the function surface."""
    from cann_ops_adv_vllm_tpu import torch_ops  # noqa: F401

    q, k, v, bt, sl, (b, h_q, h_kv, d, ps) = _setup(3)
    kv = torch.tensor(np.concatenate([k.numpy(), v.numpy()], axis=3))
    qb = q.reshape(b, h_q, 1, d)
    got = torch.ops.cann_ops_adv_vllm_tpu.incre_flash_attention(
        qb, kv, bt, sl, h_q, h_kv, None, ps, "BNSD", None, None)
    want = torch_bridge.incre_flash_attention(
        qb, kv, num_heads=h_q, num_key_value_heads=h_kv,
        block_table=bt, actual_seq_lengths=sl, block_size=ps,
        input_layout="BNSD")
    np.testing.assert_allclose(got.numpy(), want.numpy(),
                               rtol=1e-6, atol=1e-6)

    rng = np.random.default_rng(3)
    C, P = 16, k.shape[1]
    cent = torch.tensor(rng.standard_normal((h_kv, C, d)),
                        dtype=torch.float32)
    bids = torch.tensor(rng.integers(0, C, (h_kv, P)).astype(np.int32))
    qs = q.reshape(b, h_q, d)
    pos, lens, ml = torch.ops.cann_ops_adv_vllm_tpu.cent_select(
        qs, cent, bids, bt, sl, 4, ps, 16, 0, "per_qhead")
    pos2, lens2, ml2 = torch_bridge.cent_select(
        qs, cent, bids, bt, sl, k=4, block_size=ps, max_page_num=16,
        workload_cap_ratio=0, group_mode="per_qhead")
    np.testing.assert_array_equal(pos.numpy(), pos2.numpy())
    np.testing.assert_array_equal(lens.numpy(), lens2.numpy())
    np.testing.assert_array_equal(ml.numpy(), ml2.numpy())

    idx = torch.ops.cann_ops_adv_vllm_tpu.compute_cent(qs, cent, 4)
    idx2 = torch_bridge.compute_cent(qs, cent, k=4)
    np.testing.assert_array_equal(idx.numpy(), idx2.numpy())
