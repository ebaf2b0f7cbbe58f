"""Chunked-prefill correctness: chunk path == sequential decode path."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from cann_ops_adv_vllm_tpu.models import llama
from cann_ops_adv_vllm_tpu.ops.prefill import (
    paged_prefill_attention,
    write_prompt_chunk,
)
from cann_ops_adv_vllm_tpu.ops.paged_attention import paged_flash_decode

PS = 16
CFG = dataclasses.replace(llama.TINY_LLAMA, page_size=PS, num_centroids=0,
                          dtype=jnp.float32)


class TestPrefillOps:
    def test_chunk_write_matches_row_writes(self, rng):
        h_kv, num_pages, d, b, t = 2, 8, 128, 2, 10
        cache = jnp.zeros((h_kv, num_pages, PS, 2 * d))
        k = jnp.asarray(rng.standard_normal((b, t, h_kv, d)), jnp.float32)
        v = jnp.asarray(rng.standard_normal((b, t, h_kv, d)), jnp.float32)
        bt = jnp.stack([jnp.arange(8, dtype=jnp.int32),
                        jnp.arange(8, dtype=jnp.int32)[::-1]])
        start = jnp.asarray([3, 12], jnp.int32)

        got = write_prompt_chunk(cache, k, v, bt, start, page_size=PS)

        want = cache
        for tt in range(t):
            want = llama.write_kv_page_rows(
                want, k[:, tt], v[:, tt], bt, start + tt, PS)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want))

    def test_prefill_attention_last_row_matches_decode_kernel(self, rng):
        """The chunk's last query row must equal a decode-kernel call at
        the same position (same cache state)."""
        b, h_kv, g, d, t = 2, 2, 4, 128, 8
        num_pages, max_page = 16, 8
        h_q = h_kv * g
        cache = jnp.asarray(
            rng.standard_normal((h_kv, num_pages, PS, 2 * d)), jnp.float32)
        bt = jnp.stack([jnp.arange(max_page, dtype=jnp.int32),
                        jnp.arange(max_page, dtype=jnp.int32)[::-1]])
        start = jnp.asarray([PS + 3, 2 * PS], jnp.int32)
        q = jnp.asarray(rng.standard_normal((b, t, h_q, d)), jnp.float32)

        out = paged_prefill_attention(q, cache, bt, start, page_size=PS,
                                      kv_block_pages=2)
        # decode at position start + t - 1, i.e. seq_len = start + t
        seq = start + t
        want = paged_flash_decode(q[:, -1], cache, None, bt, seq,
                                  page_size=PS)
        np.testing.assert_allclose(np.asarray(out[:, -1]), np.asarray(want),
                                   rtol=2e-5, atol=2e-5)


class TestModelChunkedPrefill:
    def test_chunked_prefill_matches_sequential(self):
        params = llama.init_params(CFG, jax.random.key(0))
        b, s = 2, 24
        tokens = jax.random.randint(jax.random.key(1), (b, s), 0,
                                    CFG.vocab_size)
        num_pages = 16
        bt = jnp.stack([jnp.arange(8, dtype=jnp.int32) + i * 4
                        for i in range(b)])

        kv1 = llama.init_kv_cache(CFG, num_pages)
        want_logits, want_cache = llama.prefill(CFG, params, tokens, kv1, bt)

        kv2 = llama.init_kv_cache(CFG, num_pages)
        chunk = 8
        logits = None
        for c0 in range(0, s, chunk):
            start = jnp.full((b,), c0, jnp.int32)
            logits, kv2 = llama.prefill_chunk_step(
                CFG, params, tokens[:, c0:c0 + chunk], kv2, bt, start)

        np.testing.assert_allclose(np.asarray(logits),
                                   np.asarray(want_logits),
                                   rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(np.asarray(kv2), np.asarray(want_cache),
                                   rtol=1e-5, atol=1e-5)
