"""Mesh-sharded engine tests on the virtual 8-device CPU mesh.

Continuous batching THROUGH the dp×tp shard_map step functions: the same
host-side scheduler as DecodeEngine, with lanes + private page pools
sharded over dp and heads over tp.  Parity oracle: the plain single-device
engine on identical requests (greedy decode, fp32).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cann_ops_adv_vllm_tpu.models import llama
from cann_ops_adv_vllm_tpu.parallel.mesh import make_mesh
from cann_ops_adv_vllm_tpu.runtime.engine import DecodeEngine, Request
from cann_ops_adv_vllm_tpu.runtime.sharded_engine import ShardedDecodeEngine

pytestmark = pytest.mark.slow

PS = 16
CFG = dataclasses.replace(llama.TINY_LLAMA, page_size=PS, num_centroids=0,
                          dtype=jnp.float32)


def _requests(n, rng, prompt_lens, max_new=6):
    return [Request(seq_id=i,
                    prompt=rng.integers(1, CFG.vocab_size,
                                        prompt_lens[i % len(prompt_lens)]
                                        ).astype(np.int32),
                    max_new_tokens=max_new)
            for i in range(n)]


def _run(engine, reqs, max_steps=400):
    for r in reqs:
        engine.add_request(r)
    engine.run(max_steps=max_steps)
    return {r.seq_id: list(r.generated) for r in reqs}


def test_sharded_engine_matches_plain():
    """dp=2 × tp=2 continuous batching == single-device engine, token for
    token (greedy, fp32), including queueing beyond the lane count."""
    rng = np.random.default_rng(0)
    params = llama.init_params(CFG, jax.random.key(0))
    mesh = make_mesh(dp=2, tp=2)
    n_req = 6                     # > max_batch → exercises re-admission
    prompt_lens = [7, 19, 33, 12]

    got = _run(
        ShardedDecodeEngine(CFG, params, pages_per_replica=24, mesh=mesh,
                            max_batch=4, max_page=8, prefill_chunk=PS),
        _requests(n_req, np.random.default_rng(1), prompt_lens))
    want = _run(
        DecodeEngine(CFG, params, num_pages=48, max_batch=4, max_page=8,
                     prefill_chunk=PS),
        _requests(n_req, np.random.default_rng(1), prompt_lens))
    assert got == want


def test_sharded_engine_sparse_int8():
    """Sparse (centroid) selection + int8 KV through the sharded engine:
    completes, matches the plain engine greedily."""
    cfg = dataclasses.replace(CFG, num_centroids=16, top_k_clusters=16,
                              kv_cache_dtype="int8")
    params = llama.init_params(cfg, jax.random.key(2))
    mesh = make_mesh(dp=2, tp=2)
    reqs_a = _requests(3, np.random.default_rng(3), [21, 40], max_new=5)
    reqs_b = _requests(3, np.random.default_rng(3), [21, 40], max_new=5)

    got = _run(ShardedDecodeEngine(cfg, params, pages_per_replica=24,
                                   mesh=mesh, max_batch=2, max_page=8,
                                   prefill_chunk=PS), reqs_a)
    want = _run(DecodeEngine(cfg, params, num_pages=48, max_batch=2,
                             max_page=8, prefill_chunk=PS), reqs_b)
    assert got == want
    assert all(len(v) == 5 for v in got.values())


def test_sharded_engine_scan_layers():
    """scan-over-layers decode/prefill through the tp shard_map path."""
    rng = np.random.default_rng(5)
    params = llama.init_params(CFG, jax.random.key(4))
    mesh = make_mesh(dp=1, tp=2)
    reqs_a = _requests(2, np.random.default_rng(6), [18, 9], max_new=4)
    reqs_b = _requests(2, np.random.default_rng(6), [18, 9], max_new=4)
    got = _run(ShardedDecodeEngine(CFG, params, pages_per_replica=32,
                                   mesh=mesh, max_batch=2, max_page=8,
                                   prefill_chunk=PS, scan_layers=True),
               reqs_a)
    want = _run(DecodeEngine(CFG, params, num_pages=32, max_batch=2,
                             max_page=8, prefill_chunk=PS), reqs_b)
    assert got == want


def test_sharded_engine_quantized_weights():
    """Weight-only int8 params through the dp×tp engine == the plain
    engine on the same quantized params (greedy)."""
    params = llama.quantize_params(
        llama.init_params(CFG, jax.random.key(7)))
    mesh = make_mesh(dp=2, tp=2)
    got = _run(
        ShardedDecodeEngine(CFG, params, pages_per_replica=24, mesh=mesh,
                            max_batch=2, max_page=8, prefill_chunk=PS),
        _requests(3, np.random.default_rng(8), [11, 25], max_new=4))
    want = _run(
        DecodeEngine(CFG, params, num_pages=48, max_batch=2, max_page=8,
                     prefill_chunk=PS),
        _requests(3, np.random.default_rng(8), [11, 25], max_new=4))
    assert got == want


def test_sharded_engine_deepseek():
    """DeepSeek/MLA (+MoE) through the sharded engine: dp×tp×ep
    continuous batching == the plain DeepSeek engine token-for-token
    (greedy, fp32) — q-heads over tp, latent stream replicated, expert
    tables over ep (models.deepseek._moe ep psum)."""
    from cann_ops_adv_vllm_tpu.models import deepseek
    from cann_ops_adv_vllm_tpu.runtime.adapters import DeepSeekAdapter

    cfg = dataclasses.replace(deepseek.TINY_DEEPSEEK_MOE, num_layers=2,
                              page_size=PS, dtype=jnp.float32,
                              num_experts=4)
    params = deepseek.init_params(cfg, jax.random.key(9))
    mesh = make_mesh(dp=2, tp=2, ep=2)
    rng_a, rng_b = np.random.default_rng(10), np.random.default_rng(10)

    def reqs(rng):
        return [Request(seq_id=i,
                        prompt=rng.integers(1, cfg.vocab_size, n
                                            ).astype(np.int32),
                        max_new_tokens=4)
                for i, n in enumerate([9, 21, 14])]

    got = _run(ShardedDecodeEngine(cfg, params, pages_per_replica=24,
                                   mesh=mesh, max_batch=2, max_page=8,
                                   prefill_chunk=PS,
                                   adapter=DeepSeekAdapter(cfg)),
               reqs(rng_a))
    want = _run(DecodeEngine(cfg, params, num_pages=48, max_batch=2,
                             max_page=8, prefill_chunk=PS,
                             adapter=DeepSeekAdapter(cfg)),
               reqs(rng_b))
    assert got == want
    assert all(len(v) == 4 for v in got.values())


def test_sharded_engine_deepseek_sparse_scan():
    """Centroid-sparse DeepSeek (latent-page selection) with
    scan-over-layers through the dp×tp sharded engine == plain engine."""
    from cann_ops_adv_vllm_tpu.models import deepseek
    from cann_ops_adv_vllm_tpu.runtime.adapters import DeepSeekAdapter

    cfg = dataclasses.replace(deepseek.TINY_DEEPSEEK, num_layers=2,
                              page_size=PS, dtype=jnp.float32,
                              num_centroids=8, top_k_clusters=8,
                              max_page_num=8, workload_cap_ratio=0)
    params = deepseek.init_params(cfg, jax.random.key(11))
    mesh = make_mesh(dp=2, tp=2)

    def reqs(rng):
        return [Request(seq_id=i,
                        prompt=rng.integers(1, cfg.vocab_size, n
                                            ).astype(np.int32),
                        max_new_tokens=4)
                for i, n in enumerate([8, 19])]

    got = _run(ShardedDecodeEngine(cfg, params, pages_per_replica=24,
                                   mesh=mesh, max_batch=2, max_page=8,
                                   prefill_chunk=PS, scan_layers=True,
                                   adapter=DeepSeekAdapter(cfg)),
               reqs(np.random.default_rng(12)))
    want = _run(DecodeEngine(cfg, params, num_pages=48, max_batch=2,
                             max_page=8, prefill_chunk=PS,
                             adapter=DeepSeekAdapter(cfg)),
                reqs(np.random.default_rng(12)))
    assert got == want


def test_sharded_engine_system_prefix():
    """Shared system prompt across the dp×tp engine: per-replica
    templates + fork + shard_map COW — token-exact vs the sharded engine
    fed full [prefix || user] prompts (non-page-aligned prefix)."""
    rng_p = np.random.default_rng(20)
    params = llama.init_params(CFG, jax.random.key(20))
    mesh = make_mesh(dp=2, tp=2)
    prefix = rng_p.integers(1, CFG.vocab_size, 37).astype(np.int32)
    users = [rng_p.integers(1, CFG.vocab_size, n).astype(np.int32)
             for n in (5, 19, 11)]

    def serve(system_prefix, prompts):
        eng = ShardedDecodeEngine(CFG, params, pages_per_replica=32,
                                  mesh=mesh, max_batch=2, max_page=12,
                                  prefill_chunk=PS,
                                  system_prefix=system_prefix)
        reqs = [Request(seq_id=i, prompt=p, max_new_tokens=5)
                for i, p in enumerate(prompts)]
        for r in reqs:
            eng.add_request(r)
        eng.run(max_steps=400)
        return [list(r.generated) for r in reqs]

    got = serve(prefix, users)
    want = serve(None, [np.concatenate([prefix, u]) for u in users])
    assert got == want
    assert all(len(g) == 5 for g in got)
