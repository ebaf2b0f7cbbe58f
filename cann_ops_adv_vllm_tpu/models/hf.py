"""HuggingFace checkpoint ingestion.

Converts ``transformers`` Llama-architecture checkpoints (Llama-2/3, Qwen2,
Mistral — anything with the ``model.layers.N.self_attn.{q,k,v,o}_proj`` /
``mlp.{gate,up,down}_proj`` structure) into this framework's parameter
pytree, so a vLLM user's models run on the TPU engine directly.

The reference sits under vLLM and inherits its HF loading; this framework
is self-contained, so the loader lives here.  Weight mapping:

  model.embed_tokens.weight [V, H]        → embed
  …self_attn.q_proj.weight  [Nq·D, H]     → wq  (transposed: x @ wq)
  …self_attn.{q,k,v}_proj.bias            → bq/bk/bv (Qwen2)
  …mlp.gate/up/down_proj.weight           → w_gate/w_up/w_down (transposed)
  …input_layernorm / post_attention_layernorm → ln_attn / ln_mlp
  model.norm.weight                       → ln_f
  lm_head.weight [V, H] (or tied embed)   → lm_head (transposed)

Constraints inherited from the TPU kernel: ``head_dim`` must be a multiple
of 128 (Llama-2/3, Qwen2-7B+, Mistral all use 128).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from .llama import LlamaConfig


def config_from_hf(hf_config, **overrides) -> LlamaConfig:
    """Build a :class:`LlamaConfig` from a transformers config object."""
    heads = hf_config.num_attention_heads
    head_dim = getattr(hf_config, "head_dim", None) \
        or hf_config.hidden_size // heads
    window = getattr(hf_config, "sliding_window", None) or 0
    if not getattr(hf_config, "use_sliding_window", True):
        window = 0                                   # Qwen2 gating flag
    kw = dict(
        vocab_size=hf_config.vocab_size,
        hidden_size=hf_config.hidden_size,
        intermediate_size=hf_config.intermediate_size,
        num_layers=hf_config.num_hidden_layers,
        num_heads=heads,
        num_kv_heads=getattr(hf_config, "num_key_value_heads", heads),
        head_dim=head_dim,
        rope_theta=getattr(hf_config, "rope_theta", 10000.0),
        rms_eps=getattr(hf_config, "rms_norm_eps", 1e-5),
        attention_bias=getattr(hf_config, "attention_bias", False)
        or hf_config.model_type == "qwen2",
        sliding_window=window,
    )
    kw.update(overrides)
    cfg = LlamaConfig(**kw)
    if cfg.head_dim % 128:
        raise ValueError(
            f"head_dim {cfg.head_dim} must be a multiple of the TPU's "
            "128-lane tile (Llama-2/3, Qwen2-7B+, Mistral qualify)")
    return cfg


def _to_jnp(tensor, dtype):
    return jnp.asarray(np.asarray(tensor.detach().cpu().float()), dtype)


def params_from_hf(hf_model, cfg: LlamaConfig) -> dict:
    """Convert a transformers ``*ForCausalLM`` (or its state_dict)."""
    sd = (hf_model.state_dict()
          if hasattr(hf_model, "state_dict") else dict(hf_model))
    dt = cfg.dtype

    def w(name, transpose=True):
        t = _to_jnp(sd[name], dt)
        return t.T if transpose else t

    layers = []
    for i in range(cfg.num_layers):
        pre = f"model.layers.{i}"
        p = {
            "wq": w(f"{pre}.self_attn.q_proj.weight"),
            "wk": w(f"{pre}.self_attn.k_proj.weight"),
            "wv": w(f"{pre}.self_attn.v_proj.weight"),
            "wo": w(f"{pre}.self_attn.o_proj.weight"),
            "w_gate": w(f"{pre}.mlp.gate_proj.weight"),
            "w_up": w(f"{pre}.mlp.up_proj.weight"),
            "w_down": w(f"{pre}.mlp.down_proj.weight"),
            "ln_attn": w(f"{pre}.input_layernorm.weight", False),
            "ln_mlp": w(f"{pre}.post_attention_layernorm.weight", False),
        }
        if f"{pre}.self_attn.q_proj.bias" in sd:
            p["bq"] = w(f"{pre}.self_attn.q_proj.bias", False)
            p["bk"] = w(f"{pre}.self_attn.k_proj.bias", False)
            p["bv"] = w(f"{pre}.self_attn.v_proj.bias", False)
        layers.append(p)

    embed = w("model.embed_tokens.weight", False)
    lm_head = (w("lm_head.weight")
               if "lm_head.weight" in sd else embed.T)   # tied embeddings
    return {
        "embed": embed,
        "layers": layers,
        "ln_f": w("model.norm.weight", False),
        "lm_head": lm_head,
    }


def load_hf_model(hf_model, dtype=jnp.bfloat16, **config_overrides):
    """One-call ingestion: (cfg, params) from a transformers model."""
    cfg = config_from_hf(hf_model.config, dtype=dtype, **config_overrides)
    return cfg, params_from_hf(hf_model, cfg)
