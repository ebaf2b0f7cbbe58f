"""Centroid codebook construction (k-means) and page cluster assignment.

The reference consumes a pre-built IVF-style centroid codebook
(``l1_cent`` [H_kv, C, D]) and per-page cluster ids (``block_ids``
[H_kv, P]) but ships no builder — they come from an offline indexing
pipeline.  A complete framework needs the builder, so this module provides:

* :func:`kmeans` — batched Lloyd's iterations per KV head on device
  (one ``lax.scan``; assignment via argmax of −‖k−c‖² expanded so the
  distance matrix is one MXU matmul per iteration).
* :func:`assign_pages` — cluster id per page = nearest centroid to the
  page's mean key (matches the IVF convention: a page is routed to the
  cell its content centroid falls in).
* :func:`build_index` — end-to-end: keys from the fused paged cache →
  (l1_cent, block_ids).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("num_clusters", "iters"))
def kmeans(keys, num_clusters, *, iters=10, key=None):
    """Per-head k-means.

    Args:
      keys: [H_kv, N, D] key vectors (any float dtype; fp32 internally).
      num_clusters: C.
      iters: Lloyd iterations.
      key: PRNG key for initialization (default: deterministic seed 0).

    Returns centroids [H_kv, C, D] fp32.
    """
    if key is None:
        key = jax.random.key(0)
    keys = keys.astype(jnp.float32)
    h_kv, n, d = keys.shape
    k_sq = jnp.sum(keys * keys, axis=-1)                      # [H, N]

    # farthest-point (greedy max-min) init: immune to the duplicate-seed
    # local optimum of random init on well-separated clusters
    first = jax.random.randint(key, (h_kv,), 0, n)
    cent0 = jnp.zeros((h_kv, num_clusters, d), jnp.float32)
    cent0 = cent0.at[:, 0].set(
        jnp.take_along_axis(keys, first[:, None, None], axis=1)[:, 0])

    def fp_body(c, state):
        cent0, min_d2 = state
        last = cent0[:, c - 1]                                # [H, D]
        d2 = (k_sq - 2 * jnp.einsum("hnd,hd->hn", keys, last)
              + jnp.sum(last * last, axis=-1)[:, None])
        min_d2 = jnp.minimum(min_d2, d2)
        far = jnp.argmax(min_d2, axis=-1)                     # [H]
        cent0 = cent0.at[:, c].set(
            jnp.take_along_axis(keys, far[:, None, None], axis=1)[:, 0])
        return cent0, min_d2

    cent0, _ = jax.lax.fori_loop(
        1, num_clusters, fp_body,
        (cent0, jnp.full((h_kv, n), jnp.inf, jnp.float32)))

    def step(cent, _):
        # assignment: argmin ‖k−c‖² = argmax (k·c − ‖c‖²/2)
        dots = jnp.einsum("hnd,hcd->hnc", keys, cent,
                          preferred_element_type=jnp.float32)
        c_sq = jnp.sum(cent * cent, axis=-1)                  # [H, C]
        score = dots - 0.5 * c_sq[:, None, :]
        assign = jnp.argmax(score, axis=-1)
        one_hot = jax.nn.one_hot(assign, num_clusters,
                                 dtype=jnp.float32)           # [H, N, C]
        sums = jnp.einsum("hnc,hnd->hcd", one_hot, keys,
                          preferred_element_type=jnp.float32)
        counts = jnp.sum(one_hot, axis=1)                     # [H, C]
        new_cent = sums / jnp.maximum(counts[..., None], 1.0)
        # reseed empty clusters at the points farthest from their
        # assigned centroid (escapes duplicate-centroid local optima)
        d2 = 0.5 * k_sq - jnp.max(score, axis=-1)             # [H, N]
        _, far = jax.lax.top_k(d2, num_clusters)              # [H, C]
        far_pts = jnp.take_along_axis(keys, far[..., None], axis=1)
        new_cent = jnp.where(counts[..., None] > 0, new_cent, far_pts)
        return new_cent, None

    cent, _ = jax.lax.scan(step, cent0, None, length=iters)
    return cent


@jax.jit
def assign_pages(kv_pages, centroids, valid_rows=None):
    """Cluster id per physical page: nearest centroid to the page's mean key.

    Args:
      kv_pages:  [H_kv, P, ps, 2D] fused records (K in lanes [:D]).
      centroids: [H_kv, C, D].
      valid_rows: optional [P] int32 — number of written rows per page
        (pages are assigned by the mean of their written keys only).

    Returns block_ids [H_kv, P] int32.
    """
    d = centroids.shape[-1]
    k = kv_pages[..., :d].astype(jnp.float32)                 # [H, P, ps, D]
    if valid_rows is not None:
        ps = k.shape[2]
        row_ok = (jnp.arange(ps)[None, :]
                  < valid_rows[:, None])                      # [P, ps]
        k = k * row_ok[None, :, :, None]
        denom = jnp.maximum(valid_rows, 1).astype(jnp.float32)
        mean_k = jnp.sum(k, axis=2) / denom[None, :, None]
    else:
        mean_k = jnp.mean(k, axis=2)                          # [H, P, D]
    dots = jnp.einsum("hpd,hcd->hpc", mean_k,
                      centroids.astype(jnp.float32),
                      preferred_element_type=jnp.float32)
    c_sq = jnp.sum(centroids.astype(jnp.float32) ** 2, axis=-1)
    return jnp.argmax(dots - 0.5 * c_sq[:, None, :],
                      axis=-1).astype(jnp.int32)


@jax.jit
def assign_pages_quantized(kv_pages, ts_pages, centroids):
    """:func:`assign_pages` for the int8 per-token KV cache.

    kv_pages [H_kv, P, ps, 2D] int8, ts_pages [H_kv, 4, P, ps] (rows
    0/1 = K scale/offset): keys are dequantized row-wise before the mean.
    """
    d = centroids.shape[-1]
    k = kv_pages[..., :d].astype(jnp.float32)
    k = (k * ts_pages[:, 0, :, :, None] + ts_pages[:, 1, :, :, None])
    mean_k = jnp.mean(k, axis=2)                              # [H, P, D]
    dots = jnp.einsum("hpd,hcd->hpc", mean_k,
                      centroids.astype(jnp.float32),
                      preferred_element_type=jnp.float32)
    c_sq = jnp.sum(centroids.astype(jnp.float32) ** 2, axis=-1)
    return jnp.argmax(dots - 0.5 * c_sq[:, None, :],
                      axis=-1).astype(jnp.int32)


def build_index(kv_pages, num_clusters, *, sample_pages=None, iters=10,
                key=None):
    """keys in cache → (l1_cent [H_kv, C, D] fp32, block_ids [H_kv, P] i32).

    ``sample_pages`` optionally subsamples pages for the k-means fit (the
    assignment still covers every page).
    """
    d = kv_pages.shape[-1] // 2
    k = kv_pages[..., :d]
    h_kv, p, ps, _ = k.shape
    if sample_pages is not None and sample_pages < p:
        k_fit = k[:, :sample_pages]
    else:
        k_fit = k
    keys_flat = k_fit.reshape(h_kv, -1, d)
    cent = kmeans(keys_flat, num_clusters, iters=iters, key=key)
    block_ids = assign_pages(kv_pages, cent)
    return cent, block_ids
