"""Continuous-batching engine tests (CPU, tiny model).

Covers: admission with limited pages, prefill/decode interleaving,
greedy-decode equivalence vs the standalone model path, allocator recycling,
and the native allocator's fork/copy-on-write bookkeeping.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from cann_ops_adv_vllm_tpu.models import llama
from cann_ops_adv_vllm_tpu.runtime.allocator import PageAllocator
from cann_ops_adv_vllm_tpu.runtime.engine import DecodeEngine, Request
import pytest

pytestmark = pytest.mark.slow    # model/engine/mesh-level — minutes on CPU; -m 'not slow' for the fast oracle suite

PS = 16
CFG = dataclasses.replace(llama.TINY_LLAMA, page_size=PS, num_centroids=0,
                          dtype=jnp.float32)


class TestAllocator:
    def test_exhaustion_and_recycle(self):
        pa = PageAllocator(4, PS)
        pa.create_seq(1)
        assert pa.try_append_tokens(1, 4 * PS) == 4 * PS
        assert pa.num_free_pages == 0
        assert pa.try_append_tokens(1, 1) == -1   # out of pages
        pa.free_seq(1)
        assert pa.num_free_pages == 4

    def test_fork_shares_then_cow(self):
        pa = PageAllocator(8, PS)
        pa.create_seq(1)
        pa.append_tokens(1, 2 * PS + 3)
        free_before = pa.num_free_pages
        pa.fork(1, 2)
        assert pa.num_free_pages == free_before          # shared, no alloc
        dst, src = pa.ensure_writable_last(2)
        assert dst != src                                # copied
        np.testing.assert_array_equal(
            pa.block_table(1, 3)[:2], pa.block_table(2, 3)[:2])
        assert pa.block_table(1, 3)[2] != pa.block_table(2, 3)[2]


class TestEngine:
    def test_single_request_matches_model_path(self):
        params = llama.init_params(CFG, jax.random.key(0))
        prompt = np.array([3, 1, 4, 1, 5, 9, 2, 6], np.int32)

        eng = DecodeEngine(CFG, params, num_pages=16, max_batch=2,
                           max_page=8)
        eng.add_request(Request(seq_id=7, prompt=prompt, max_new_tokens=4))
        eng.run()
        got = eng.running.get(7)
        assert got is None  # finished and released
        req_out = None
        # engine removed it; re-run capturing the request object
        eng2 = DecodeEngine(CFG, params, num_pages=16, max_batch=2,
                            max_page=8)
        req = Request(seq_id=7, prompt=prompt, max_new_tokens=4)
        eng2.add_request(req)
        eng2.run()
        req_out = req.generated
        assert len(req_out) == 4

        # reference: greedy decode via the raw model path
        kv = llama.init_kv_cache(CFG, 16)
        bt = jnp.arange(8, dtype=jnp.int32)[None, :]
        logits, kv = llama.prefill(CFG, params, prompt[None, :], kv, bt)
        toks = []
        cur = int(jnp.argmax(logits[0]))
        toks.append(cur)
        for t in range(3):
            seq_lens = jnp.full((1,), len(prompt) + t + 1, jnp.int32)
            logits, kv = llama.decode_step(CFG, params,
                                           jnp.asarray([cur], jnp.int32),
                                           kv, bt, seq_lens)
            cur = int(jnp.argmax(logits[0]))
            toks.append(cur)
        assert req_out == toks

    def test_continuous_batching_two_requests(self):
        params = llama.init_params(CFG, jax.random.key(0))
        eng = DecodeEngine(CFG, params, num_pages=16, max_batch=2,
                           max_page=4)
        r1 = Request(seq_id=1, prompt=np.array([1, 2, 3], np.int32),
                     max_new_tokens=3)
        r2 = Request(seq_id=2, prompt=np.array([4, 5], np.int32),
                     max_new_tokens=3)
        eng.add_request(r1)
        eng.add_request(r2)
        eng.run()
        assert r1.done and r2.done
        assert len(r1.generated) == 3 and len(r2.generated) == 3
        # all pages recycled after completion
        assert eng.allocator.num_free_pages == 16

    def test_chunked_prefill_matches_token_at_a_time(self):
        """A 2.5-page prompt completes in ceil(S/chunk) prefill ticks and
        generates the same greedy tokens as the one-token-per-step path."""
        params = llama.init_params(CFG, jax.random.key(0))
        rng = np.random.default_rng(3)
        prompt = rng.integers(0, CFG.vocab_size, 2 * PS + PS // 2,
                              dtype=np.int32)

        r_chunk = Request(seq_id=1, prompt=prompt, max_new_tokens=4)
        eng = DecodeEngine(CFG, params, num_pages=16, max_batch=2,
                           max_page=8)  # prefill_chunk defaults to page_size
        eng.add_request(r_chunk)
        steps = eng.run()
        # ceil(40/16)=3 prefill ticks (first samples token 1) + 3 decode
        assert steps == 3 + (r_chunk.max_new_tokens - 1)

        r_tok = Request(seq_id=1, prompt=prompt, max_new_tokens=4)
        eng1 = DecodeEngine(CFG, params, num_pages=16, max_batch=2,
                            max_page=8, prefill_chunk=1)
        eng1.add_request(r_tok)
        steps1 = eng1.run()
        assert steps1 == len(prompt) + r_tok.max_new_tokens - 1
        assert r_chunk.generated == r_tok.generated

    def test_chunked_prefill_two_lanes_different_lengths(self):
        params = llama.init_params(CFG, jax.random.key(0))
        eng = DecodeEngine(CFG, params, num_pages=16, max_batch=2,
                           max_page=4)
        r1 = Request(seq_id=1, prompt=np.arange(1, PS + 4, dtype=np.int32),
                     max_new_tokens=3)
        r2 = Request(seq_id=2, prompt=np.array([4, 5], np.int32),
                     max_new_tokens=3)
        eng.add_request(r1)
        eng.add_request(r2)
        eng.run()
        assert r1.done and r2.done

        # same tokens as the token-at-a-time engine
        for chunked, seq_id, prompt in ((r1.generated, 1, r1.prompt),
                                        (r2.generated, 2, r2.prompt)):
            r = Request(seq_id=seq_id, prompt=prompt, max_new_tokens=3)
            e = DecodeEngine(CFG, params, num_pages=16, max_batch=2,
                             max_page=4, prefill_chunk=1)
            e.add_request(r)
            e.run()
            assert chunked == r.generated

    def test_admission_waits_for_pages(self):
        params = llama.init_params(CFG, jax.random.key(0))
        # 2 pages total: only one request fits at a time
        eng = DecodeEngine(CFG, params, num_pages=2, max_batch=2,
                           max_page=2)
        r1 = Request(seq_id=1, prompt=np.array([1] * PS, np.int32),
                     max_new_tokens=2)
        r2 = Request(seq_id=2, prompt=np.array([2] * PS, np.int32),
                     max_new_tokens=2)
        eng.add_request(r1)
        eng.add_request(r2)
        eng.run(max_steps=200)
        assert r1.done and r2.done


class TestStats:
    def test_engine_stats_and_cached_block_tables(self):
        """Metrics counters are consistent and the block-table row cache
        (rebuilt only on page-boundary crossings) does not change decoded
        tokens vs an engine forced to rebuild every tick."""
        params = llama.init_params(CFG, jax.random.key(0))
        prompts = [np.array([3, 1, 4, 1, 5], np.int32),
                   np.array([2, 7, 1, 8], np.int32)]

        eng = DecodeEngine(CFG, params, num_pages=16, max_batch=2,
                           max_page=8)
        reqs = [Request(seq_id=i, prompt=p, max_new_tokens=6)
                for i, p in enumerate(prompts)]
        for r in reqs:
            eng.add_request(r)
        eng.run()

        s = eng.stats
        assert s.requests_admitted == 2
        assert s.requests_completed == 2
        assert s.tokens_generated == sum(len(r.generated) for r in reqs)
        assert s.prompt_tokens == sum(len(p) for p in prompts)
        assert s.steps == s.decode_ticks + s.prefill_ticks
        assert s.p50_ms() > 0.0
        snap = s.snapshot(eng)
        assert snap["free_pages"] == eng.allocator.num_free_pages
        assert snap["running"] == 0 and snap["waiting"] == 0

        # cache-off oracle: invalidate the row cache before every tick
        eng2 = DecodeEngine(CFG, params, num_pages=16, max_batch=2,
                            max_page=8)
        reqs2 = [Request(seq_id=i, prompt=p, max_new_tokens=6)
                 for i, p in enumerate(prompts)]
        for r in reqs2:
            eng2.add_request(r)
        while True:
            eng2._bt_pages[:] = -1
            if not eng2.step():
                break
        for a, b in zip(reqs, reqs2):
            assert a.generated == b.generated


class TestSlidingWindowReclaim:
    def test_allocator_trim_front(self):
        pa = PageAllocator(8, PS)
        pa.create_seq(1)
        pa.append_tokens(1, 5 * PS)
        assert pa.num_free_pages == 3
        # window edge inside page 2 → pages 0,1 reclaimed
        assert pa.trim_front(1, 2 * PS + 3) == 2
        assert pa.num_free_pages == 5
        bt = pa.block_table(1, 5)
        assert (bt[:2] == -1).all() and (bt[2:] >= 0).all()
        # idempotent / monotonic
        assert pa.trim_front(1, 2 * PS + 3) == 0
        # freeing the trimmed sequence releases only live pages
        pa.free_seq(1)
        assert pa.num_free_pages == 8

    def test_trim_front_respects_fork_refcounts(self):
        pa = PageAllocator(8, PS)
        pa.create_seq(1)
        pa.append_tokens(1, 3 * PS)
        pa.fork(1, 2)
        free_before = pa.num_free_pages
        assert pa.trim_front(1, PS) == 1      # slot freed in seq 1...
        assert pa.num_free_pages == free_before   # ...but child still holds it
        assert pa.trim_front(2, PS) == 1
        assert pa.num_free_pages == free_before + 1  # now truly free

    def test_sliding_window_engine_reclaims_pages(self):
        """A windowed model generating far past its window holds only
        O(window) pages, and its logits stay finite."""
        cfg = dataclasses.replace(CFG, sliding_window=2 * PS)
        params = llama.init_params(cfg, jax.random.key(0))
        prompt = np.array([3, 1, 4], np.int32)
        eng = DecodeEngine(cfg, params, num_pages=16, max_batch=1,
                           max_page=16)
        req = Request(seq_id=1, prompt=prompt, max_new_tokens=9 * PS)
        eng.add_request(req)
        min_free = eng.allocator.num_free_pages
        while eng.step():
            if 1 in eng.running:
                min_free = min(min_free, eng.allocator.num_free_pages)
        assert len(req.generated) == 9 * PS
        # without reclaim the run needs ceil((3 + 9*16)/16) = 10 pages;
        # with a 2-page window at most window+1 pages are ever live
        assert min_free >= 16 - 4

    def test_sliding_window_output_matches_unwindowed_tail(self):
        """Windowed decode logits == full attention over only the last W
        tokens (the window semantics), with reclaim on."""
        cfg = dataclasses.replace(CFG, sliding_window=2 * PS)
        params = llama.init_params(cfg, jax.random.key(0))
        s = 3 * PS + 5
        tokens = jax.random.randint(jax.random.key(7), (1, s), 0,
                                    cfg.vocab_size)
        num_pages = 8
        bt = jnp.arange(num_pages, dtype=jnp.int32)[None]
        kv = llama.init_kv_cache(cfg, num_pages)
        logits, kv = llama.prefill(cfg, params, tokens, kv, bt)
        # reference: feed only the window's tokens through an unwindowed
        # model is NOT equivalent (rope positions differ); instead check
        # the kernel path: zero out the reclaimed pages and re-run the
        # final decode step — identical logits prove they are never read
        kv_z = kv.at[:, :, :1].set(jnp.nan)  # page 0 is behind the window
        last = tokens[:, -1]
        seq = jnp.asarray([s], jnp.int32)
        l1, _ = llama.decode_step(cfg, params, last, kv, bt, seq)
        l2, _ = llama.decode_step(cfg, params, last, kv_z, bt, seq)
        np.testing.assert_allclose(np.asarray(l1), np.asarray(l2),
                                   rtol=0, atol=0)


class TestCentroidMaintenance:
    def test_block_ids_refresh_after_prefill(self):
        """Sparse engine: block_ids are re-assigned from the written cache
        (matching ops.clustering.assign_pages) once prefill completes."""
        from cann_ops_adv_vllm_tpu.ops.clustering import assign_pages

        cfg = dataclasses.replace(CFG, num_centroids=8, top_k_clusters=2)
        params = llama.init_params(cfg, jax.random.key(0))
        prompt = np.asarray(
            jax.random.randint(jax.random.key(3), (2 * PS + 5,), 0,
                               cfg.vocab_size), np.int32)
        eng = DecodeEngine(cfg, params, num_pages=16, max_batch=2,
                           max_page=8, prefill_chunk=PS)
        eng.add_request(Request(seq_id=1, prompt=prompt, max_new_tokens=3))
        eng.run()

        assert eng._cents is not None
        # the run's lazy refreshes already produced non-degenerate ids
        lazy = np.asarray(eng.block_ids)
        assert lazy.shape == (cfg.num_layers, cfg.num_kv_heads, 16)
        assert len(np.unique(lazy)) > 1
        # an explicit refresh matches assign_pages on the final cache
        eng.refresh_block_ids()
        want = np.asarray(jax.vmap(assign_pages)(eng.kv_cache, eng._cents))
        np.testing.assert_array_equal(np.asarray(eng.block_ids), want)

    def test_block_ids_refresh_int8_cache(self):
        from cann_ops_adv_vllm_tpu.ops.clustering import (
            assign_pages_quantized)

        cfg = dataclasses.replace(CFG, num_centroids=8, top_k_clusters=2,
                                  kv_cache_dtype="int8")
        params = llama.init_params(cfg, jax.random.key(0))
        prompt = np.asarray(
            jax.random.randint(jax.random.key(4), (PS + 3,), 0,
                               cfg.vocab_size), np.int32)
        eng = DecodeEngine(cfg, params, num_pages=16, max_batch=2,
                           max_page=8, prefill_chunk=PS)
        eng.add_request(Request(seq_id=1, prompt=prompt, max_new_tokens=2))
        eng.run()
        eng.refresh_block_ids()
        want = np.asarray(jax.vmap(assign_pages_quantized)(
            eng.kv_cache["kv"], eng.kv_cache["ts"], eng._cents))
        np.testing.assert_array_equal(np.asarray(eng.block_ids), want)


class TestScanLayersEngine:
    def test_scan_engine_matches_unrolled(self):
        """scan_layers=True engine generates the same tokens (fp32)."""
        cfg = dataclasses.replace(CFG, num_centroids=8, top_k_clusters=8)
        params = llama.init_params(cfg, jax.random.key(0))
        prompt = np.asarray(
            jax.random.randint(jax.random.key(5), (PS + 7,), 0,
                               cfg.vocab_size), np.int32)
        outs = []
        for scan in (False, True):
            eng = DecodeEngine(cfg, params, num_pages=16, max_batch=2,
                               max_page=8, prefill_chunk=PS,
                               scan_layers=scan)
            req = Request(seq_id=1, prompt=prompt, max_new_tokens=6)
            eng.add_request(req)
            eng.run()
            outs.append(list(req.generated))
        assert outs[0] == outs[1]


class TestSystemPrefixCaching:
    def test_prefix_fork_matches_full_prompts(self, rng):
        """vLLM-style shared-prompt caching: an engine given
        ``system_prefix`` (prefilled once, fork + COW per request) must
        produce token-exact greedy output vs an engine fed the full
        [prefix || user] prompts — including a NON-page-aligned prefix
        (exercises ensure_writable_last + adapter.copy_page) and slot
        reuse (> max_batch requests sharing the template pages)."""
        import dataclasses

        import jax
        import jax.numpy as jnp

        from cann_ops_adv_vllm_tpu.models import llama
        from cann_ops_adv_vllm_tpu.runtime.engine import (
            DecodeEngine,
            Request,
        )

        cfg = dataclasses.replace(llama.TINY_LLAMA, page_size=16,
                                  num_centroids=0, dtype=jnp.float32)
        params = llama.init_params(cfg, jax.random.key(0))
        prefix = rng.integers(1, cfg.vocab_size, 37).astype(np.int32)
        users = [rng.integers(1, cfg.vocab_size, n).astype(np.int32)
                 for n in (5, 19, 11)]

        def serve(system_prefix, prompts):
            eng = DecodeEngine(cfg, params, num_pages=64, max_batch=2,
                               max_page=12, prefill_chunk=16,
                               system_prefix=system_prefix)
            reqs = [Request(seq_id=i, prompt=p, max_new_tokens=5)
                    for i, p in enumerate(prompts)]
            for r in reqs:
                eng.add_request(r)
            eng.run(max_steps=400)
            return [list(r.generated) for r in reqs], eng

        got, eng = serve(prefix, users)
        want, _ = serve(None, [np.concatenate([prefix, u]) for u in users])
        assert got == want
        assert all(len(g) == 5 for g in got)
        # the template's pages stay resident; per-request pages were freed
        prefix_pages = (len(prefix) + 15) // 16
        assert eng.allocator.num_free_pages == 64 - prefix_pages

    def test_prefix_page_savings(self, rng):
        """Concurrent requests share the prefix's full pages: peak page
        usage is prefix_pages + per-request marginal pages, not
        n_requests x prefix_pages."""
        import dataclasses

        import jax
        import jax.numpy as jnp

        from cann_ops_adv_vllm_tpu.models import llama
        from cann_ops_adv_vllm_tpu.runtime.engine import (
            DecodeEngine,
            Request,
        )

        cfg = dataclasses.replace(llama.TINY_LLAMA, page_size=16,
                                  num_centroids=0, dtype=jnp.float32)
        params = llama.init_params(cfg, jax.random.key(1))
        prefix = rng.integers(1, cfg.vocab_size, 64).astype(np.int32)  # 4 pages
        eng = DecodeEngine(cfg, params, num_pages=32, max_batch=2,
                           max_page=12, prefill_chunk=16,
                           system_prefix=prefix)
        assert eng.allocator.num_free_pages == 32 - 4
        for i in range(2):
            eng.add_request(Request(
                seq_id=i,
                prompt=rng.integers(1, cfg.vocab_size, 8).astype(np.int32),
                max_new_tokens=4))
        eng.step()      # one prefill tick: both lanes append their user
        # tokens.  Page-aligned prefix: each request's marginal cost is
        # only its own user+new tokens (1 fresh page each here — the 4
        # prefix pages are shared, no COW page)
        assert eng.allocator.num_free_pages == 32 - 4 - 2
