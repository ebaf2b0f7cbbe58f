"""Sampler semantics + engine sampling integration."""

import numpy as np
import jax
import jax.numpy as jnp

from cann_ops_adv_vllm_tpu.runtime import sampling


def _logits(rows):
    return jnp.asarray(np.array(rows, np.float32))


def test_greedy_when_temperature_zero():
    logits = _logits([[0.1, 3.0, 0.2, 0.3], [5.0, 0.0, 0.0, 0.0]])
    ids = sampling.sample(logits, jax.random.key(0),
                          temperature=jnp.asarray([0.0, 0.0]))
    np.testing.assert_array_equal(np.asarray(ids), [1, 0])


def test_per_lane_greedy_and_stochastic():
    logits = _logits([[0.0, 10.0, 0.0, 0.0]] * 2)
    ids = sampling.sample(logits, jax.random.key(1),
                          temperature=jnp.asarray([0.0, 1.0]))
    assert int(ids[0]) == 1  # greedy lane deterministic


def test_top_k_restricts_support():
    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.standard_normal((4, 64)), jnp.float32)
    allowed = np.argsort(np.asarray(logits), axis=-1)[:, -2:]
    for s in range(20):
        ids = sampling.sample(logits, jax.random.key(s),
                              temperature=1.5, top_k=2)
        for b in range(4):
            assert int(ids[b]) in allowed[b]


def test_top_p_restricts_support():
    # one dominant token (p≈0.97) → top_p=0.5 keeps only it
    logits = _logits([[8.0, 2.0, 1.0, 0.0, -1.0]])
    for s in range(10):
        ids = sampling.sample(logits, jax.random.key(s),
                              temperature=1.0,
                              top_p=jnp.asarray([0.5]))
        assert int(ids[0]) == 0
    # top_p = 1.0 must allow sampling beyond the max eventually
    seen = {int(sampling.sample(
        _logits([[1.0, 1.0, 1.0, 1.0, 1.0]]), jax.random.key(s),
        temperature=1.0, top_p=jnp.asarray([1.0]))[0]) for s in range(30)}
    assert len(seen) > 1
    # near-flat DISTINCT logits with top_p < 1 must still keep several
    # tokens (regression: threshold must be the smallest kept logit,
    # not the largest)
    rng = np.random.default_rng(1)
    logits = _logits([rng.standard_normal(32) * 0.1])
    seen = {int(sampling.sample(logits, jax.random.key(s),
                                temperature=1.0,
                                top_p=jnp.asarray([0.9]))[0])
            for s in range(40)}
    assert len(seen) > 3


def test_min_p_masks_tail():
    logits = _logits([[5.0, 4.9, -5.0, -5.0]])
    for s in range(15):
        ids = sampling.sample(logits, jax.random.key(s),
                              temperature=1.0, min_p=jnp.asarray([0.5]))
        assert int(ids[0]) in (0, 1)


def test_distribution_roughly_matches_softmax():
    logits = _logits([[1.0, 0.0]])
    p_want = float(jax.nn.softmax(logits[0])[0])
    hits = sum(
        int(sampling.sample(logits, jax.random.key(s), temperature=1.0)[0]
            ) == 0
        for s in range(400))
    assert abs(hits / 400 - p_want) < 0.08


def test_engine_sampling_params_and_eos():
    import dataclasses as dc
    from cann_ops_adv_vllm_tpu.models import llama
    from cann_ops_adv_vllm_tpu.runtime.engine import DecodeEngine, Request

    cfg = dc.replace(llama.TINY_LLAMA, num_layers=1, num_centroids=0)
    params = llama.init_params(cfg, jax.random.key(0))
    eng = DecodeEngine(cfg, params, num_pages=64, max_batch=2)
    rng = np.random.default_rng(0)

    # greedy lane and a stochastic lane with eos stopping
    eng.add_request(Request(seq_id=1, prompt=rng.integers(0, 100, 4),
                            max_new_tokens=8, temperature=0.0))
    eng.add_request(Request(seq_id=2, prompt=rng.integers(0, 100, 4),
                            max_new_tokens=64, temperature=1.0,
                            top_p=0.9))
    eng.run(max_steps=200)
    assert not eng.running  # all finished


def test_engine_eos_stop_reason():
    import dataclasses as dc
    from cann_ops_adv_vllm_tpu.models import llama
    from cann_ops_adv_vllm_tpu.runtime.engine import DecodeEngine, Request

    cfg = dc.replace(llama.TINY_LLAMA, num_layers=1, num_centroids=0)
    params = llama.init_params(cfg, jax.random.key(0))
    eng = DecodeEngine(cfg, params, num_pages=64, max_batch=1)
    req = Request(seq_id=7, prompt=np.asarray([1, 2, 3]),
                  max_new_tokens=50, temperature=0.0)
    eng.add_request(req)
    eng.run(max_steps=10)
    first = req.generated[0] if req.generated else None
    assert first is not None

    # now replay with that token as EOS → must stop immediately with "stop"
    eng2 = DecodeEngine(cfg, params, num_pages=64, max_batch=1)
    req2 = Request(seq_id=8, prompt=np.asarray([1, 2, 3]),
                   max_new_tokens=50, temperature=0.0, eos_token_id=first)
    eng2.add_request(req2)
    eng2.run(max_steps=200)
    assert req2.done and req2.finish_reason == "stop"
    assert len(req2.generated) == 1
