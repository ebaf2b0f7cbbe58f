"""MLA decode: kernel vs numpy latent oracle; absorbed == expanded; model.

The reference only scaffolds MLA (incre_flash_attention_tiling_mla.h);
semantics here are pinned by first principles: absorbed latent attention
must equal the naive per-head expansion K_t = W_UK·c_t ‖ k_rope_t,
V_t = W_UVᵀ·c_t.
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from cann_ops_adv_vllm_tpu.models import deepseek
from cann_ops_adv_vllm_tpu.ops import mla as mla_ops
import pytest

pytestmark = pytest.mark.slow    # model/engine/mesh-level — minutes on CPU; -m 'not slow' for the fast oracle suite


def _latent_oracle(q_eff, latent, block_table, seq_lens, d_v, scale, ps):
    """softmax(q·latentᵀ)·latent[:, :d_v] gathered via block table."""
    q_eff = np.asarray(q_eff, np.float64)
    latent = np.asarray(latent, np.float64)
    b, h, w = q_eff.shape
    out = np.zeros((b, h, d_v))
    for bi in range(b):
        n = int(seq_lens[bi])
        rows = np.stack([
            latent[int(block_table[bi, t // ps]), t % ps]
            for t in range(n)])                        # [n, W]
        s = scale * (q_eff[bi] @ rows.T)               # [H, n]
        e = np.exp(s - s.max(-1, keepdims=True))
        p = e / e.sum(-1, keepdims=True)
        out[bi] = p @ rows[:, :d_v]
    return out


def test_mla_flash_decode_vs_oracle():
    rng = np.random.default_rng(0)
    b, h, w, c, ps, P, mp = 2, 16, 640, 512, 16, 32, 8
    q = jnp.asarray(rng.standard_normal((b, h, w)), jnp.float32)
    pages = jnp.asarray(rng.standard_normal((P, ps, w)), jnp.float32)
    bt = jnp.asarray(rng.permutation(P)[:b * mp].reshape(b, mp), jnp.int32)
    sl = jnp.asarray(rng.integers(1, mp * ps, b), jnp.int32)
    scale = 1.0 / np.sqrt(192.0)

    got = mla_ops.mla_flash_decode(q, pages, bt, sl, d_v=c,
                                   sm_scale=scale, page_size=ps)
    want = _latent_oracle(q, pages, np.asarray(bt), np.asarray(sl), c,
                          scale, ps)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-4)


def test_absorbed_equals_expanded():
    """Absorbed MLA == naive expansion to per-head K/V attention."""
    rng = np.random.default_rng(1)
    b, h, dn, dr, c, dv = 2, 4, 128, 64, 512, 128
    ps, P, mp = 16, 16, 4
    w = 640
    q_nope = jnp.asarray(rng.standard_normal((b, h, dn)), jnp.float32)
    q_rope = jnp.asarray(rng.standard_normal((b, h, dr)), jnp.float32)
    w_uk = jnp.asarray(rng.standard_normal((h, dn, c)) * 0.05, jnp.float32)
    w_uv = jnp.asarray(rng.standard_normal((h, c, dv)) * 0.05, jnp.float32)
    pages = np.zeros((P, ps, w), np.float32)
    pages[..., :c + dr] = rng.standard_normal((P, ps, c + dr))
    pages = jnp.asarray(pages)
    bt = jnp.asarray(rng.permutation(P)[:b * mp].reshape(b, mp), jnp.int32)
    sl = jnp.asarray([3 * ps + 5, 2 * ps], jnp.int32)
    scale = 1.0 / np.sqrt(dn + dr)

    got = mla_ops.mla_attention(q_nope, q_rope, pages, bt, sl, w_uk, w_uv,
                                sm_scale=scale, page_size=ps)

    # naive expansion
    pn = np.asarray(pages, np.float64)
    qn = np.asarray(q_nope, np.float64)
    qr = np.asarray(q_rope, np.float64)
    uk = np.asarray(w_uk, np.float64)
    uv = np.asarray(w_uv, np.float64)
    want = np.zeros((b, h, dv))
    for bi in range(b):
        n = int(sl[bi])
        rows = np.stack([pn[int(bt[bi, t // ps]), t % ps]
                         for t in range(n)])
        c_t, pe_t = rows[:, :c], rows[:, c:c + dr]
        for hi in range(h):
            k_t = c_t @ uk[hi].T                       # [n, dn]
            v_t = c_t @ uv[hi]                         # [n, dv]
            s = scale * (k_t @ qn[bi, hi] + pe_t @ qr[bi, hi])
            e = np.exp(s - s.max())
            want[bi, hi] = (e / e.sum()) @ v_t
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-4)


def _tiny(moe=False):
    cfg = deepseek.TINY_DEEPSEEK_MOE if moe else deepseek.TINY_DEEPSEEK
    import dataclasses as dc
    return dc.replace(cfg, page_size=16, dtype=jnp.float32)


def test_deepseek_decode_runs_and_is_consistent():
    cfg = _tiny()
    params = deepseek.init_params(cfg, jax.random.key(0))
    rng = np.random.default_rng(0)
    b, num_pages, mp = 2, 32, 8
    cache = deepseek.init_latent_cache(cfg, num_pages)
    bt = jnp.arange(b * mp, dtype=jnp.int32).reshape(b, mp)
    toks = rng.integers(0, cfg.vocab_size, (b, 5))

    # run 5 steps; then replay the first 4 writes into a fresh cache and
    # check step-5 logits agree (cache-write correctness)
    c1 = cache
    for t in range(5):
        seq = jnp.full((b,), t + 1, jnp.int32)
        logits, c1 = deepseek.decode_step(cfg, params,
                                          jnp.asarray(toks[:, t]), c1, bt,
                                          seq)
    assert bool(jnp.all(jnp.isfinite(logits)))

    c2 = cache
    for t in range(4):
        seq = jnp.full((b,), t + 1, jnp.int32)
        _, c2 = deepseek.decode_step(cfg, params, jnp.asarray(toks[:, t]),
                                     c2, bt, seq)
    logits2, _ = deepseek.decode_step(cfg, params, jnp.asarray(toks[:, 4]),
                                      c2, bt, jnp.full((b,), 5, jnp.int32))
    np.testing.assert_allclose(np.asarray(logits), np.asarray(logits2),
                               rtol=1e-5, atol=1e-5)


def test_deepseek_moe_routing():
    cfg = _tiny(moe=True)
    params = deepseek.init_params(cfg, jax.random.key(1))
    rng = np.random.default_rng(1)
    b = 2
    cache = deepseek.init_latent_cache(cfg, 32)
    bt = jnp.arange(b * 8, dtype=jnp.int32).reshape(b, 8)
    logits, _ = deepseek.decode_step(
        cfg, params, jnp.asarray(rng.integers(0, cfg.vocab_size, b)),
        cache, bt, jnp.ones((b,), jnp.int32))
    assert bool(jnp.all(jnp.isfinite(logits)))

    # MoE numpy cross-check on the layer function
    lp = params["layers"][0]
    x = jnp.asarray(rng.standard_normal((b, cfg.hidden_size)), jnp.float32)
    got = deepseek._moe(cfg, lp, x)
    xs = np.asarray(x, np.float64)
    router = np.asarray(lp["router"], np.float64)
    sc = np.exp(xs @ router)
    sc = sc / sc.sum(-1, keepdims=True)
    want = np.zeros_like(xs)
    for bi in range(b):
        top = np.argsort(sc[bi])[::-1][:cfg.num_experts_per_tok]
        wts = sc[bi, top] / sc[bi, top].sum()
        for wt, e in zip(wts, top):
            g = np.asarray(lp["e_gate"][e], np.float64)
            u = np.asarray(lp["e_up"][e], np.float64)
            d = np.asarray(lp["e_down"][e], np.float64)
            silu = lambda z: z / (1 + np.exp(-z))
            want[bi] += wt * ((silu(xs[bi] @ g) * (xs[bi] @ u)) @ d)
        want[bi] += (silu(xs[bi] @ np.asarray(lp["s_gate"], np.float64))
                     * (xs[bi] @ np.asarray(lp["s_up"], np.float64))
                     ) @ np.asarray(lp["s_down"], np.float64)
    # fp32 device compute vs float64 oracle: accumulation-order differences
    # through softmax → weighted expert sums (with cancellation) legitimately
    # reach a few 1e-4 relative.  A routing error (wrong expert / weight)
    # would show up at O(1), so 2e-3 still catches real bugs.
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-3, atol=1e-3)


def test_mla_prefill_chunk_matches_decode_loop(rng):
    """Chunked MLA prefill == token-at-a-time decode_step (cache + logits)."""
    cfg = dataclasses.replace(deepseek.TINY_DEEPSEEK, num_layers=2,
                              page_size=16, dtype=jnp.float32)
    params = deepseek.init_params(cfg, jax.random.key(0))
    b, s = 2, 21
    num_pages, mp = 16, 8
    tokens = jnp.asarray(rng.integers(1, cfg.vocab_size, (b, s)), jnp.int32)
    # disjoint per-lane pages (aliased tables would make both paths read
    # whichever lane wrote the shared page last — undefined either way)
    bt = jnp.stack([i * mp + jnp.roll(jnp.arange(mp, dtype=jnp.int32), i)
                    for i in range(b)])

    # oracle: sequential decode over every position
    cache_ref = deepseek.init_latent_cache(cfg, num_pages)
    logits_ref = None
    for t in range(s):
        seq = jnp.full((b,), t + 1, jnp.int32)
        logits_ref, cache_ref = deepseek.decode_step(
            cfg, params, tokens[:, t], cache_ref, bt, seq)

    # chunked prefill in two page-aligned chunks
    cache = deepseek.init_latent_cache(cfg, num_pages)
    c1 = cfg.page_size
    logits, cache = deepseek.prefill_chunk_step(
        cfg, params, tokens[:, :c1], cache, bt,
        jnp.zeros((b,), jnp.int32), jnp.full((b,), c1, jnp.int32))
    pad = jnp.zeros((b, c1 - (s - c1)), jnp.int32)
    logits, cache = deepseek.prefill_chunk_step(
        cfg, params, jnp.concatenate([tokens[:, c1:], pad], axis=1),
        cache, bt, jnp.full((b,), c1, jnp.int32),
        jnp.full((b,), s - c1, jnp.int32))

    np.testing.assert_allclose(np.asarray(cache), np.asarray(cache_ref),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(logits_ref),
                               rtol=2e-3, atol=2e-3)


def test_deepseek_engine_serving(rng):
    """DeepSeek/MLA (+MoE) through DecodeEngine via DeepSeekAdapter:
    chunked prefill + continuous batching == standalone decode loop."""
    from cann_ops_adv_vllm_tpu.runtime.adapters import DeepSeekAdapter
    from cann_ops_adv_vllm_tpu.runtime.engine import DecodeEngine, Request

    cfg = dataclasses.replace(deepseek.TINY_DEEPSEEK_MOE, num_layers=2,
                              page_size=16, dtype=jnp.float32)
    params = deepseek.init_params(cfg, jax.random.key(1))
    prompts = [rng.integers(1, cfg.vocab_size, n).astype(np.int32)
               for n in (9, 23, 17)]
    max_new = 5

    eng = DecodeEngine(cfg, params, num_pages=48, max_batch=2, max_page=8,
                       prefill_chunk=cfg.page_size,
                       adapter=DeepSeekAdapter(cfg))
    reqs = [Request(seq_id=i, prompt=pr, max_new_tokens=max_new)
            for i, pr in enumerate(prompts)]
    for r in reqs:
        eng.add_request(r)
    eng.run(max_steps=300)
    assert all(len(r.generated) == max_new for r in reqs)

    # oracle: greedy decode per request, standalone
    for r in reqs:
        cache = deepseek.init_latent_cache(cfg, 16)
        bt = jnp.arange(8, dtype=jnp.int32)[None]
        toks = list(r.prompt)
        out = []
        logits = None
        for t in range(len(r.prompt) + max_new - 1):
            seq = jnp.full((1,), t + 1, jnp.int32)
            logits, cache = deepseek.decode_step(
                cfg, params, jnp.asarray([toks[t]], jnp.int32), cache,
                bt, seq)
            if t + 1 >= len(r.prompt):
                nxt = int(jnp.argmax(logits[0]))
                out.append(nxt)
                toks.append(nxt)
        assert out == list(r.generated), (r.seq_id, out, r.generated)


def test_deepseek_weight_only_int8(rng):
    """deepseek.quantize_params: decode runs, logits close to fp."""
    cfg = dataclasses.replace(deepseek.TINY_DEEPSEEK_MOE, num_layers=2,
                              page_size=16, dtype=jnp.float32)
    params = deepseek.init_params(cfg, jax.random.key(0))
    qparams = deepseek.quantize_params(cfg, params)
    b, mp, pool = 2, 8, 16
    bt = jnp.stack([jnp.arange(mp, dtype=jnp.int32) + i * (pool // b)
                    for i in range(b)])
    tokens = jnp.asarray(rng.integers(1, cfg.vocab_size, (b,)), jnp.int32)
    seq = jnp.asarray([4, 7], jnp.int32)
    logits, _ = deepseek.decode_step(
        cfg, params, tokens, deepseek.init_latent_cache(cfg, pool), bt, seq)
    logits_q, _ = deepseek.decode_step(
        cfg, qparams, tokens, deepseek.init_latent_cache(cfg, pool), bt,
        seq)
    denom = np.maximum(np.abs(np.asarray(logits)).max(), 1.0)
    rel = np.abs(np.asarray(logits_q) - np.asarray(logits)).max() / denom
    assert rel < 0.05, rel


def test_sparse_mla_selection(rng):
    """Centroid-sparse MLA: sentinel isolation (selected latent pages 0.1,
    unselected 9.9 → no 9.9 influence) + engine serving with latent-page
    centroids."""
    cfg = dataclasses.replace(deepseek.TINY_DEEPSEEK, num_layers=1,
                              page_size=16, dtype=jnp.float32,
                              num_centroids=8, top_k_clusters=2,
                              max_page_num=8, workload_cap_ratio=0)
    w = cfg.record_width
    b, mp, pool = 1, 8, 16
    bt = jnp.arange(mp, dtype=jnp.int32)[None]
    seq = jnp.full((b,), mp * cfg.page_size, jnp.int32)

    # hand-built latent cache: cluster 0 pages hold 0.1, others 9.9
    block_ids = jnp.asarray(
        np.r_[np.zeros(4, np.int32), np.ones(pool - 4, np.int32)])[None]
    pages = np.full((1, pool, cfg.page_size, w), 9.9, np.float32)
    pages[0, :4] = 0.1
    pages = jnp.asarray(pages)

    # a codebook whose cluster 0 matches the mean query direction
    q_eff = jnp.ones((b, 1, w), jnp.float32)
    cents = np.full((1, cfg.num_centroids, w), -1.0, np.float32)
    cents[0, 0] = 1.0
    from cann_ops_adv_vllm_tpu.ops.cent_select import cent_select
    pos, plen, _ = cent_select(
        q_eff, jnp.asarray(cents), block_ids, bt, seq,
        k=1, block_size=cfg.page_size, max_page_num=8,
        workload_cap_ratio=0, force_sink_and_recent=False,
        group_mode="per_qhead")
    out = mla_ops.mla_flash_decode(
        jnp.ones((b, 4, w), jnp.float32), pages, bt, seq,
        pos, plen[..., 0], d_v=cfg.kv_lora_rank,
        sm_scale=cfg.sm_scale, page_size=cfg.page_size)
    np.testing.assert_allclose(np.asarray(out), 0.1, rtol=1e-5, atol=1e-5)

    # end-to-end: engine with latent centroids completes and matches the
    # dense engine at k >= C (every cluster selected => same math)
    from cann_ops_adv_vllm_tpu.runtime.adapters import DeepSeekAdapter
    from cann_ops_adv_vllm_tpu.runtime.engine import DecodeEngine, Request
    cfg_all = dataclasses.replace(cfg, num_layers=2, top_k_clusters=8,
                                  workload_cap_ratio=0)
    params = deepseek.init_params(cfg_all, jax.random.key(3))
    prompts = [rng.integers(1, cfg_all.vocab_size, n).astype(np.int32)
               for n in (9, 18)]

    def serve(c):
        eng = DecodeEngine(c, params, num_pages=32, max_batch=2,
                           max_page=8, prefill_chunk=c.page_size,
                           adapter=DeepSeekAdapter(c))
        reqs = [Request(seq_id=i, prompt=p, max_new_tokens=4)
                for i, p in enumerate(prompts)]
        for r in reqs:
            eng.add_request(r)
        eng.run(max_steps=200)
        return [list(r.generated) for r in reqs]

    dense_cfg = dataclasses.replace(cfg_all, num_centroids=0)
    sparse_toks = serve(cfg_all)
    # params for the dense config lack l1_cent in spec terms but the
    # engine just ignores the extra leaf; compare token streams
    dense_toks = serve(dense_cfg)
    assert sparse_toks == dense_toks
    assert all(len(t) == 4 for t in sparse_toks)


def test_deepseek_scan_layers_parity(rng):
    """decode_step_scan / prefill_chunk_step_scan == unrolled loops, and
    the scan HLO is O(1) in depth (the DeepSeek-V3 61-layer enabler;
    reference MLA scaffold incre_flash_attention_tiling_mla.h:27-79)."""
    cfg = dataclasses.replace(deepseek.TINY_DEEPSEEK_MOE, num_layers=3,
                              page_size=16, dtype=jnp.float32,
                              num_centroids=8, top_k_clusters=8,
                              max_page_num=8, workload_cap_ratio=0)
    params = deepseek.init_params(cfg, jax.random.key(2))
    stacked = deepseek.stack_layer_params(params)
    b, mp, pool = 2, 8, 32
    bt = jnp.stack([jnp.arange(mp, dtype=jnp.int32) + i * (pool // b)
                    for i in range(b)])
    bids = jnp.asarray(
        rng.integers(0, cfg.num_centroids,
                     (cfg.num_layers, 1, pool)), jnp.int32)
    toks = jnp.asarray(rng.integers(1, cfg.vocab_size, (b,)), jnp.int32)
    seq = jnp.asarray([5, 12], jnp.int32)

    cache = deepseek.init_latent_cache(cfg, pool)
    l_ref, c_ref = deepseek.decode_step(cfg, params, toks, cache, bt, seq,
                                        bids)
    l_scan, c_scan = deepseek.decode_step_scan(cfg, stacked, toks, cache,
                                               bt, seq, bids)
    np.testing.assert_allclose(np.asarray(l_scan), np.asarray(l_ref),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(c_scan), np.asarray(c_ref),
                               rtol=1e-5, atol=1e-5)

    # prefill chunk parity
    t = cfg.page_size
    ptoks = jnp.asarray(rng.integers(1, cfg.vocab_size, (b, t)), jnp.int32)
    start = jnp.zeros((b,), jnp.int32)
    vlens = jnp.asarray([t, t - 3], jnp.int32)
    lp_ref, cp_ref = deepseek.prefill_chunk_step(
        cfg, params, ptoks, deepseek.init_latent_cache(cfg, pool), bt,
        start, vlens)
    lp_scan, cp_scan = deepseek.prefill_chunk_step_scan(
        cfg, stacked, ptoks, deepseek.init_latent_cache(cfg, pool), bt,
        start, vlens)
    np.testing.assert_allclose(np.asarray(lp_scan), np.asarray(lp_ref),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(cp_scan), np.asarray(cp_ref),
                               rtol=1e-5, atol=1e-5)

    # O(1)-in-depth program size: the jaxpr of a 24-layer scan step is
    # essentially the same size as the 3-layer one (the unrolled form
    # grows ~8x)
    def jaxpr_len(n_layers):
        c = dataclasses.replace(cfg, num_layers=n_layers)
        p = deepseek.stack_layer_params(
            deepseek.init_params(c, jax.random.key(0)))
        cache_n = jax.eval_shape(
            lambda: deepseek.init_latent_cache(c, pool))
        bids_n = jax.ShapeDtypeStruct((n_layers, 1, pool), jnp.int32)
        jx = jax.make_jaxpr(
            lambda pr, ca, bi: deepseek.decode_step_scan(
                c, pr, toks, ca, bt, seq, bi))(p, cache_n, bids_n)
        return len(str(jx))
    small, big = jaxpr_len(3), jaxpr_len(24)
    assert big < 1.5 * small, (small, big)


def test_deepseek_engine_scan_layers_serving(rng):
    """DeepSeekAdapter with scan_layers=True through the engine matches
    the unrolled engine token-for-token."""
    from cann_ops_adv_vllm_tpu.runtime.adapters import DeepSeekAdapter
    from cann_ops_adv_vllm_tpu.runtime.engine import DecodeEngine, Request

    cfg = dataclasses.replace(deepseek.TINY_DEEPSEEK_MOE, num_layers=2,
                              page_size=16, dtype=jnp.float32)
    params = deepseek.init_params(cfg, jax.random.key(1))
    prompts = [rng.integers(1, cfg.vocab_size, n).astype(np.int32)
               for n in (9, 19)]

    def serve(scan):
        eng = DecodeEngine(cfg, params, num_pages=48, max_batch=2,
                           max_page=8, prefill_chunk=cfg.page_size,
                           scan_layers=scan, adapter=DeepSeekAdapter(cfg))
        reqs = [Request(seq_id=i, prompt=p, max_new_tokens=4)
                for i, p in enumerate(prompts)]
        for r in reqs:
            eng.add_request(r)
        eng.run(max_steps=200)
        return [list(r.generated) for r in reqs]

    assert serve(True) == serve(False)
