"""Logits parity against transformers (torch CPU) for HF-loaded models.

Random-weight tiny models of each supported family (Llama GQA, Qwen2 with
qkv bias + tied embeddings, Mistral with sliding window) are built from
local configs (no downloads), converted via models.hf, run through this
framework's chunked prefill + decode chain, and compared token-for-token
against the transformers forward pass.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from cann_ops_adv_vllm_tpu.models import hf, llama

pytestmark = pytest.mark.slow    # model/engine/mesh-level — minutes on CPU; -m 'not slow' for the fast oracle suite


def _run_ours(cfg, params, tokens, chunk=None):
    """Prefill tokens[:, :-1] (chunked) then decode the last token; return
    logits for every position via step-by-step decode (exactness check)."""
    b, s = tokens.shape
    num_pages = 4 * s // cfg.page_size + 8
    max_page = (s + cfg.page_size - 1) // cfg.page_size + 1
    kv = llama.init_kv_cache(cfg, num_pages)
    bt = jnp.arange(b * max_page, dtype=jnp.int32).reshape(b, max_page)

    logits_all = []
    for t in range(s):
        seq = jnp.full((b,), t + 1, jnp.int32)
        lg, kv = llama.decode_step(cfg, params, jnp.asarray(tokens[:, t]),
                                   kv, bt, seq)
        logits_all.append(lg)
    return np.stack([np.asarray(x) for x in logits_all], axis=1)  # [B,S,V]


def _run_ours_chunked(cfg, params, tokens, chunk):
    b, s = tokens.shape
    assert s % chunk == 0
    num_pages = 4 * s // cfg.page_size + 8
    max_page = (s + cfg.page_size - 1) // cfg.page_size + 1
    kv = llama.init_kv_cache(cfg, num_pages)
    bt = jnp.arange(b * max_page, dtype=jnp.int32).reshape(b, max_page)
    logits = None
    for c0 in range(0, s, chunk):
        start = jnp.full((b,), c0, jnp.int32)
        logits, kv = llama.prefill_chunk_step(
            cfg, params, jnp.asarray(tokens[:, c0:c0 + chunk]), kv, bt,
            start)
    return np.asarray(logits)                                    # [B, V]


def _hf_logits(model, tokens):
    with torch.no_grad():
        return model(torch.tensor(tokens)).logits.float().numpy()


def _check(cfg, params, model, tokens, tol=2e-3):
    want = _hf_logits(model, tokens)
    got = _run_ours(cfg, params, tokens)
    scale = np.abs(want).max()
    np.testing.assert_allclose(got, want, rtol=0, atol=tol * scale)
    # chunked prefill path must agree on the final position too
    got_last = _run_ours_chunked(cfg, params, tokens,
                                 chunk=tokens.shape[1] // 2)
    np.testing.assert_allclose(got_last, want[:, -1], rtol=0,
                               atol=tol * scale)


def test_llama_gqa_parity():
    hf_cfg = transformers.LlamaConfig(
        vocab_size=128, hidden_size=256, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=2, num_key_value_heads=1,
        max_position_embeddings=256, rope_theta=10000.0)
    torch.manual_seed(0)
    model = transformers.LlamaForCausalLM(hf_cfg).eval()
    cfg, params = hf.load_hf_model(model, dtype=jnp.float32,
                                   page_size=16)
    assert cfg.head_dim == 128 and cfg.num_kv_heads == 1
    tokens = np.random.default_rng(0).integers(0, 128, (2, 24))
    _check(cfg, params, model, tokens)


def test_qwen2_bias_tied_parity():
    hf_cfg = transformers.Qwen2Config(
        vocab_size=128, hidden_size=256, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=2, num_key_value_heads=2,
        tie_word_embeddings=True, use_sliding_window=False,
        max_position_embeddings=256)
    torch.manual_seed(1)
    model = transformers.Qwen2ForCausalLM(hf_cfg).eval()
    cfg, params = hf.load_hf_model(model, dtype=jnp.float32, page_size=16)
    assert cfg.attention_bias
    assert "bq" in params["layers"][0]
    tokens = np.random.default_rng(1).integers(0, 128, (2, 16))
    _check(cfg, params, model, tokens)


def test_mistral_sliding_window_parity():
    window = 8
    hf_cfg = transformers.MistralConfig(
        vocab_size=128, hidden_size=256, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=2, num_key_value_heads=1,
        sliding_window=window, max_position_embeddings=256)
    torch.manual_seed(2)
    model = transformers.MistralForCausalLM(hf_cfg).eval()
    cfg, params = hf.load_hf_model(model, dtype=jnp.float32, page_size=16)
    assert cfg.sliding_window == window
    # sequence much longer than the window so windowing actually bites
    tokens = np.random.default_rng(2).integers(0, 128, (1, 24))
    _check(cfg, params, model, tokens)


def test_head_dim_constraint_rejected():
    hf_cfg = transformers.LlamaConfig(
        vocab_size=64, hidden_size=128, intermediate_size=64,
        num_hidden_layers=1, num_attention_heads=2)  # head_dim 64
    with pytest.raises(ValueError, match="head_dim"):
        hf.config_from_hf(hf_cfg)
