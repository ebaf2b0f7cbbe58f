"""On-device drive: HF-loaded models generating on the real TPU.

Builds tiny random transformers models (Llama GQA / Qwen2 / Mistral SWA),
ingests them via models.hf, runs greedy generation through the serving
engine on the TPU, and compares token streams with transformers'
model.generate on CPU.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import torch
import transformers
import jax
import jax.numpy as jnp

print("backend:", jax.default_backend(), jax.devices())
from cann_ops_adv_vllm_tpu.models import hf, llama  # noqa: E402
from cann_ops_adv_vllm_tpu.runtime.engine import DecodeEngine, Request  # noqa: E402

fails = []
N_NEW = 8


def drive(name, model, prompt, **overrides):
    cfg, params = hf.load_hf_model(model, dtype=jnp.float32, page_size=16,
                                   **overrides)
    with torch.no_grad():
        want = model.generate(
            torch.tensor(prompt), max_new_tokens=N_NEW, do_sample=False,
            pad_token_id=0)[0, len(prompt[0]):].tolist()
    eng = DecodeEngine(cfg, params, num_pages=256, max_batch=1)
    req = Request(seq_id=1, prompt=np.asarray(prompt[0]),
                  max_new_tokens=N_NEW, temperature=0.0)
    eng.add_request(req)
    eng.run(max_steps=200)
    ok = req.generated == want
    print(f"{name}: ours={req.generated} hf={want} match={ok}")
    if not ok:
        fails.append(name)


rng = np.random.default_rng(0)
prompt = rng.integers(1, 120, (1, 12)).tolist()

torch.manual_seed(0)
m = transformers.LlamaForCausalLM(transformers.LlamaConfig(
    vocab_size=128, hidden_size=256, intermediate_size=96,
    num_hidden_layers=2, num_attention_heads=2, num_key_value_heads=1,
    max_position_embeddings=256)).eval()
drive("llama-gqa", m, prompt)

torch.manual_seed(1)
m = transformers.Qwen2ForCausalLM(transformers.Qwen2Config(
    vocab_size=128, hidden_size=256, intermediate_size=96,
    num_hidden_layers=2, num_attention_heads=2, num_key_value_heads=2,
    tie_word_embeddings=True, use_sliding_window=False,
    max_position_embeddings=256)).eval()
drive("qwen2-bias-tied", m, prompt)

torch.manual_seed(2)
m = transformers.MistralForCausalLM(transformers.MistralConfig(
    vocab_size=128, hidden_size=256, intermediate_size=96,
    num_hidden_layers=2, num_attention_heads=2, num_key_value_heads=1,
    sliding_window=8, max_position_embeddings=256)).eval()
drive("mistral-swa8", m, prompt)

if fails:
    print("FAILED:", fails)
    sys.exit(1)
print("TPU HF OK")
