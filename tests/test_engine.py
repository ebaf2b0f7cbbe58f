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
