"""Token sampling for the serving engine.

The reference is a kernel library; sampling lives above it in vLLM.  This
framework is self-contained, so the sampler is in-repo: a single jitted
function implementing the standard serving controls — temperature,
top-k, top-p (nucleus), min-p — with **per-lane** parameters so one
batched call serves heterogeneous requests (continuous batching), and
greedy decoding expressed as ``temperature <= 0``.

Everything is device-side: masking uses sorted cumulative probabilities,
sampling uses the Gumbel-max trick (no host RNG round trip).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

NEG_INF = -1e30


@functools.partial(jax.jit, static_argnames=("top_k",))
def sample(logits, key, *, temperature=None, top_p=None, min_p=None,
           top_k=0, top_k_per_lane=None):
    """Sample next tokens from [B, V] logits.

    Args:
      logits:      [B, V] float.
      key:         PRNG key (folded per batch lane internally).
      temperature: [B] or scalar; ``<= 0`` means greedy for that lane.
      top_p:       [B] or scalar in (0, 1]; 1 disables.
      min_p:       [B] or scalar in [0, 1); tokens with prob <
                   ``min_p * max_prob`` are masked (0 disables).
      top_k:       static int; 0 disables.
      top_k_per_lane: [B] int32 — per-lane top-k (0 disables that lane's
                   filter); composes with / replaces the static ``top_k``.

    Returns [B] int32 token ids.
    """
    b, v = logits.shape
    x = logits.astype(jnp.float32)
    greedy_ids = jnp.argmax(x, axis=-1).astype(jnp.int32)

    if temperature is None:
        return greedy_ids
    temperature = jnp.broadcast_to(jnp.asarray(temperature, jnp.float32),
                                   (b,))
    x = x / jnp.maximum(temperature, 1e-6)[:, None]

    if top_k and top_k < v:
        kth = jnp.sort(x, axis=-1)[:, v - top_k][:, None]
        x = jnp.where(x < kth, NEG_INF, x)

    if top_k_per_lane is not None:
        # sort-based kth threshold (same machinery as top_p): lane b keeps
        # logits >= the top_k[b]-th largest; top_k == 0 disables the lane
        tk = jnp.broadcast_to(jnp.asarray(top_k_per_lane, jnp.int32), (b,))
        sorted_desc = jnp.sort(x, axis=-1)[:, ::-1]
        idx = jnp.clip(tk - 1, 0, v - 1)
        kth = jnp.take_along_axis(sorted_desc, idx[:, None], axis=1)
        x = jnp.where((tk[:, None] > 0) & (x < kth), NEG_INF, x)

    if min_p is not None:
        min_p = jnp.broadcast_to(jnp.asarray(min_p, jnp.float32), (b,))
        probs = jax.nn.softmax(x, axis=-1)
        cutoff = min_p[:, None] * jnp.max(probs, axis=-1, keepdims=True)
        x = jnp.where(probs < cutoff, NEG_INF, x)

    if top_p is not None:
        top_p = jnp.broadcast_to(jnp.asarray(top_p, jnp.float32), (b,))
        sorted_x = jnp.sort(x, axis=-1)[:, ::-1]
        probs = jax.nn.softmax(sorted_x, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        # keep tokens while the cumulative mass *before* them is < top_p;
        # the threshold is the SMALLEST kept logit
        keep_sorted = (cum - probs) < top_p[:, None]
        kth = jnp.min(jnp.where(keep_sorted, sorted_x, jnp.inf), axis=-1)
        x = jnp.where(x < kth[:, None], NEG_INF, x)

    gumbel = jax.random.gumbel(key, (b, v), jnp.float32)
    sampled = jnp.argmax(x + gumbel, axis=-1).astype(jnp.int32)
    return jnp.where(temperature <= 0.0, greedy_ids, sampled)


def make_sampler(*, top_k=0):
    """Engine-facing factory: returns ``fn(logits, key, params)`` where
    params is a dict of per-lane arrays {"temperature", "top_p", "min_p"}."""

    def fn(logits, key, params):
        return sample(logits, key,
                      temperature=params.get("temperature"),
                      top_p=params.get("top_p"),
                      min_p=params.get("min_p"),
                      top_k=top_k,
                      top_k_per_lane=params.get("top_k"))

    return fn
