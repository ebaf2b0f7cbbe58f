"""Real-selection (k < C) quality AND speed at model level — the study
the centroid machinery exists for.

Every previously recorded sparse number ran the reference's fused
k=C=512 configuration, where selection provably collapses to "attend the
first page_len/8 pages" (cent_select's masked-iota fast path).  This
script measures the actual centroid path — k-means codebooks built from
the REAL cache content (ops.clustering.build_index), k ∈ {64, 128}
(cent_select_tiling.cpp:58: k=64 is the reference's own standalone
config) — at the canonical 128K geometry, model-level:

  (a) generation quality: teacher-forced greedy token agreement and
      logit error vs the dense model over N decode steps (sentinel-
      methodology spirit of tests/ifa_v5_case.py:560-583, upgraded to a
      model-level metric the reference never records);
  (b) attention-mass recall: the fraction of the dense softmax mass that
      falls on the selected pages, per layer × head;
  (c) device step latency: dense vs k=C-cap vs k=64/128 via the
      two-length chain slope.

The prompt is random tokens through random init weights — keys still
carry RoPE's positional structure, which is what the centroid index
actually exploits; a run with converged weights would tighten (a) but
(b)/(c) are structural.

Usage: python scripts/sparse_quality.py [--layers 4] [--ctx 131072]
         [--decode 64] [--ks 64,128] [--out docs/evidence/...]
"""

import argparse
import dataclasses
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from cann_ops_adv_vllm_tpu.models import llama
from cann_ops_adv_vllm_tpu.ops.cent_select import cent_select
from cann_ops_adv_vllm_tpu.ops.clustering import (
    assign_pages_quantized,
    kmeans,
)

C = 512
PS = 128          # default; override with --page-size


def build_cfg(args, *, k=None):
    return dataclasses.replace(
        llama.LLAMA_2_7B,
        num_layers=args.layers,
        num_kv_heads=8,
        kv_cache_dtype="int8" if args.page_size <= 128 else "auto",
        num_centroids=0 if k is None else C,
        top_k_clusters=k or C,
        page_size=args.page_size,
        max_page_num=args.ctx // args.page_size,
        workload_cap_ratio=8,
    )


def prefill(cfg, params, prompt, num_pages, bt):
    """Chunked prefill of the whole prompt (direct, engine-free)."""
    cache = llama.init_kv_cache(cfg, num_pages)
    chunk = 1024
    fn = jax.jit(
        functools.partial(llama.prefill_chunk_step, cfg),
        donate_argnums=(2,))
    n = len(prompt)
    for s0 in range(0, n, chunk):
        toks = prompt[s0:s0 + chunk]
        valid = len(toks)
        if valid < chunk:
            toks = np.pad(toks, (0, chunk - valid))
        _, cache = fn(params, jnp.asarray(toks[None], jnp.int32), cache,
                      bt, jnp.asarray([s0], jnp.int32),
                      jnp.asarray([valid], jnp.int32))
    jax.block_until_ready(cache)
    return cache


@functools.partial(jax.jit, static_argnames=("sample_pages", "n_clusters"))
def _layer_codebook(kv_l, ts_l, *, sample_pages, n_clusters):
    """k-means codebook + page assignment for one layer of the int8 cache.

    kv_l [H, P, ps, 2D] int8, ts_l [H, 4, P, ps] → (cent [H, C, D] f32,
    block_ids [H, P] i32).  Keys are dequantized row-wise; the fit uses
    the first ``sample_pages`` pages, the assignment covers every page.
    """
    d = kv_l.shape[-1] // 2
    k = kv_l[:, :sample_pages, :, :d].astype(jnp.float32)
    k = (k * ts_l[:, 0, :sample_pages, :, None]
         + ts_l[:, 1, :sample_pages, :, None])
    keys_flat = k.reshape(k.shape[0], -1, d)
    cent = kmeans(keys_flat, n_clusters, iters=10)
    bids = assign_pages_quantized(kv_l, ts_l, cent)
    return cent, bids


def build_codebooks(cache, sample_pages):
    from cann_ops_adv_vllm_tpu.ops.clustering import build_index
    cents, bids = [], []
    if isinstance(cache, dict):
        for li in range(cache["kv"].shape[0]):
            c, b = _layer_codebook(cache["kv"][li], cache["ts"][li],
                                   sample_pages=sample_pages,
                                   n_clusters=C)
            cents.append(c)
            bids.append(b)
    else:
        for li in range(cache.shape[0]):
            c, b = build_index(cache[li], C,
                               sample_pages=sample_pages, iters=10)
            cents.append(c)
            bids.append(b)
    return jnp.stack(cents), jnp.stack(bids)


def install_cents(params, cents):
    out = {**params, "layers": [dict(lp) for lp in params["layers"]]}
    for li, lp in enumerate(out["layers"]):
        lp["l1_cent"] = cents[li].astype(jnp.bfloat16)
    return out


def make_forced_scan(cfg):
    """jit: scan over FORCED tokens, returning all-step logits."""
    @functools.partial(jax.jit, donate_argnums=(2,))
    def run(params, forced, cache, bt, seq0, bids):
        def body(carry, tok):
            cache, seq = carry
            logits, cache = llama.decode_step(cfg, params, tok[None],
                                              cache, bt, seq, bids)
            return (cache, seq + 1), logits[0]
        (_, _), logits = jax.lax.scan(body, (cache, seq0), forced)
        return logits
    return run


def make_greedy_scan(cfg):
    """jit: self-feeding greedy scan, returning tokens + logits."""
    @functools.partial(jax.jit, static_argnames=("n",), donate_argnums=(3,))
    def run(params, tok0, n, cache, bt, seq0, bids):
        def body(carry, _):
            tok, cache, seq = carry
            logits, cache = llama.decode_step(cfg, params, tok, cache,
                                              bt, seq, bids)
            nxt = jnp.argmax(logits, -1).astype(jnp.int32)
            return (nxt, cache, seq + 1), (nxt[0], logits[0])
        (_, cache, _), (toks, logits) = jax.lax.scan(
            body, (tok0, cache, seq0), None, length=n)
        return toks, logits
    return run


def make_recall_probe(cfg, k):
    """jit: per-layer/head attention-mass recall of the selected pages.

    Replays the model layer loop on a frozen cache (no writes — the probe
    asks "of the dense softmax mass over the EXISTING tokens, how much
    lands on pages cent_select picks?").
    """
    d = cfg.head_dim

    @jax.jit
    def probe(params, tok, cache, bt, seq, bids):
        b = tok.shape[0]
        pos = seq.astype(jnp.int32) - 1
        x = params["embed"][tok].astype(cfg.dtype)
        quantized = isinstance(cache, dict)
        kv = cache["kv"] if quantized else cache
        ts = cache["ts"] if quantized else None
        num_pages = kv.shape[2]
        max_page = bt.shape[1]
        recalls, nsel, sel_out = [], [], []
        for li, lp in enumerate(params["layers"]):
            h = llama.rms_norm(x, lp["ln_attn"], cfg.rms_eps)
            q = llama._mm(h, lp["wq"]).reshape(b, cfg.num_heads, d)
            q = llama.rope(q, pos, cfg.rope_theta)
            positions, plen, _ = cent_select(
                q, lp["l1_cent"], bids[li], bt, seq, k=k,
                block_size=cfg.page_size, max_page_num=cfg.max_page_num,
                workload_cap_ratio=cfg.workload_cap_ratio,
                group_mode="kv_group")
            plen_h = plen[..., 0]                       # [B, H_kv]
            # dense softmax mass per page: dequantized K of every page
            if quantized:
                kd = (kv[li, :, :, :, :d].astype(jnp.float32)
                      * ts[li, :, 0, :, :, None]
                      + ts[li, :, 1, :, :, None])
            else:
                kd = kv[li, :, :, :, :d].astype(jnp.float32)
            kd = kd.reshape(cfg.num_kv_heads, num_pages * cfg.page_size, d)
            qg = q.reshape(b, cfg.num_kv_heads, -1, d).astype(jnp.float32)
            s = jnp.einsum("bhgd,hnd->bhgn", qg, kd) / jnp.sqrt(1.0 * d)
            # token validity: logical slot t // ps < page_len, but scores
            # index PHYSICAL rows — map logical slots through bt instead
            slot_of_phys = jnp.full((b, num_pages), max_page, jnp.int32)
            slot_of_phys = slot_of_phys.at[
                jnp.arange(b)[:, None],
                jnp.clip(bt, 0, num_pages - 1)].set(
                    jnp.broadcast_to(jnp.arange(max_page)[None],
                                     bt.shape))
            tok_slot = jnp.repeat(slot_of_phys, cfg.page_size, axis=1)
            tok_pos = (tok_slot * cfg.page_size
                       + jnp.tile(jnp.arange(cfg.page_size)[None],
                                  (1, num_pages)))
            valid = tok_pos < seq[:, None]
            s = jnp.where(valid[:, None, None], s, -1e30)
            p = jax.nn.softmax(s, axis=-1)              # [B, Hkv, G, N]
            mass_page = p.reshape(*p.shape[:3], num_pages,
                                  cfg.page_size).sum(-1)
            # selected slots → physical pages → gather mass
            m = positions.shape[2]
            sel_ok = (jnp.arange(m)[None, None]
                      < plen_h[:, :, None])
            slots = jnp.clip(positions, 0, max_page - 1)
            sel_pids = jnp.take_along_axis(
                jnp.broadcast_to(bt[:, None], (b, cfg.num_kv_heads,
                                               max_page)),
                jnp.where(sel_ok, slots, 0), axis=2)
            sel_mass = jnp.take_along_axis(
                mass_page, sel_pids[:, :, None, :].repeat(
                    mass_page.shape[2], 2), axis=3)
            sel_mass = jnp.where(sel_ok[:, :, None], sel_mass, 0.0)
            recalls.append(sel_mass.sum(-1))            # [B, Hkv, G]
            nsel.append(plen_h)
            sel_out.append(positions)
            # advance x with the DENSE layer so deeper layers see the
            # true hidden state
            lbi = None
            attn, _ = llama._attention(
                dataclasses.replace(cfg, num_centroids=0), lp, h,
                cache, bt, seq, lbi, layer_idx=li)
            x = x + attn.astype(cfg.dtype)
            h2 = llama.rms_norm(x, lp["ln_mlp"], cfg.rms_eps)
            x = x + llama._mlp(lp, h2).astype(cfg.dtype)
        return jnp.stack(recalls), jnp.stack(nsel), jnp.stack(sel_out)
    return probe


def slope(fn, *args, n1=8, n2=40):
    for n in (n1, n2):
        np.asarray(fn(*args, n))
    best = {}
    for n in (n1, n2, n1, n2):
        t0 = time.time()
        np.asarray(fn(*args, n))
        best[n] = min(best.get(n, float("inf")), time.time() - t0)
    return (best[n2] - best[n1]) / (n2 - n1)


def make_timing_chain(cfg):
    @functools.partial(jax.jit, static_argnames=("n",))
    def chain(params, tok, cache, bt, seq, bids, n):
        def body(i, c):
            t, kv_c = c
            logits, kv_c = llama.decode_step(cfg, params, t, kv_c, bt,
                                             seq, bids)
            return (jnp.argmax(logits, -1).astype(jnp.int32), kv_c)
        return jax.lax.fori_loop(0, n, body, (tok, cache))[0]
    return chain


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--layers", type=int, default=4)
    ap.add_argument("--ctx", type=int, default=128 * 1024)
    ap.add_argument("--decode", type=int, default=64)
    ap.add_argument("--ks", default="64,128")
    ap.add_argument("--sample-pages", type=int, default=256)
    ap.add_argument("--page-size", type=int, default=128)
    ap.add_argument("--out", default="docs/evidence/sparse_quality.jsonl")
    args = ap.parse_args()
    ks = [int(x) for x in args.ks.split(",")]

    rng = np.random.default_rng(0)
    prompt = rng.integers(0, 31000, args.ctx - args.decode - 8,
                          dtype=np.int32)
    max_page = args.ctx // args.page_size
    num_pages = max_page + 8
    bt = jnp.asarray(np.arange(max_page, dtype=np.int32)[None])

    cfg_d = build_cfg(args)
    params = llama.init_params(build_cfg(args, k=C), jax.random.key(0))
    t0 = time.time()
    cache0 = prefill(cfg_d, params, prompt, num_pages, bt)
    print(json.dumps({"phase": "prefill", "s": round(time.time() - t0, 1),
                      "tokens": int(len(prompt))}))

    t0 = time.time()
    cents, bids = build_codebooks(cache0, args.sample_pages)
    jax.block_until_ready((cents, bids))
    params = install_cents(params, cents)
    print(json.dumps({"phase": "build_index",
                      "s": round(time.time() - t0, 1),
                      "C": C, "sample_pages": args.sample_pages}))

    seq0 = jnp.asarray([len(prompt) + 1], jnp.int32)
    tok0 = jnp.asarray([int(prompt[-1])], jnp.int32)
    out_rows = []

    # --- dense reference: greedy self-feeding ---
    dense_run = make_greedy_scan(cfg_d)
    d_toks, d_logits = dense_run(params, tok0, args.decode,
                                 jax.tree.map(jnp.copy, cache0), bt, seq0,
                                 None)
    d_toks = np.asarray(d_toks)
    d_logits = np.asarray(d_logits)
    forced = jnp.asarray(
        np.concatenate([[int(tok0[0])], d_toks[:-1]]), jnp.int32)
    d_scale = float(np.abs(d_logits).max())

    # --- each sparse config: teacher-forced vs dense ---
    for k in ks + [C]:
        cfg_s = build_cfg(args, k=k)
        run = make_forced_scan(cfg_s)
        s_logits = np.asarray(run(params, forced,
                                  jax.tree.map(jnp.copy, cache0), bt,
                                  seq0, bids))
        agree = float(np.mean(np.argmax(s_logits, -1) == d_toks))
        err = np.abs(s_logits - d_logits)
        row = {
            "k": k, "C": C, "layers": args.layers, "ctx": args.ctx,
            "decode_steps": args.decode,
            "greedy_token_agreement": round(agree, 4),
            "max_logit_err_rel": round(float(err.max()) / d_scale, 5),
            "mean_logit_err_rel": round(float(err.mean()) / d_scale, 6),
        }
        if k < C:
            probe = make_recall_probe(cfg_s, k)
            rec, nsel, sel_pos = probe(params, tok0, cache0, bt, seq0,
                                       bids)
            rec = np.asarray(rec)           # [L, B, Hkv, G]
            row["recall_mean"] = round(float(rec.mean()), 4)
            row["recall_min_head"] = round(float(rec.min()), 4)
            row["selected_pages_mean"] = round(
                float(np.asarray(nsel).mean()), 1)
            row["cap_pages"] = max_page // 8 + 3
            row["page_size"] = args.page_size
            # run-length structure of the selection (contiguous tables →
            # physical runs == slot runs): the mean run length bounds the
            # gain any DMA-run-coalescing scheme could deliver
            pos_np = np.asarray(sel_pos)    # [L, B, Hkv, M]
            len_np = np.asarray(nsel)       # [L, B, Hkv]
            runs = []
            for li in range(pos_np.shape[0]):
                for h in range(pos_np.shape[2]):
                    n = int(len_np[li, 0, h])
                    s_sel = pos_np[li, 0, h, :n]
                    if n == 0:
                        continue
                    rl, cur = [], 1
                    for a, b2 in zip(s_sel[:-1], s_sel[1:]):
                        if b2 == a + 1:
                            cur += 1
                        else:
                            rl.append(cur)
                            cur = 1
                    rl.append(cur)
                    runs.extend(rl)
            row["run_len_mean"] = round(float(np.mean(runs)), 2)
            row["run_len_p90"] = int(np.percentile(runs, 90))
            row["runs_per_head"] = round(len(runs) / max(
                pos_np.shape[0] * pos_np.shape[2], 1), 1)
        out_rows.append(row)
        print(json.dumps(row))

    # --- device step timing ---
    timing = {}
    chain_d = make_timing_chain(cfg_d)
    t = slope(chain_d, params, tok0, cache0, bt, seq0, None)
    timing["dense"] = round(t * 1e3, 4)
    for k in [C] + ks:
        cfg_s = build_cfg(args, k=k)
        ch = make_timing_chain(cfg_s)
        t = slope(ch, params, tok0, cache0, bt, seq0, bids)
        timing[f"k{k}"] = round(t * 1e3, 4)
    summary = {
        "metric": f"sparse quality+latency (L={args.layers}, GQA 32/8, "
                  f"ctx={args.ctx}, int8 KV, C={C}, kmeans codebooks "
                  "from real cache)",
        "device_step_ms": timing,
        "rows": out_rows,
    }
    print(json.dumps(summary))
    with open(args.out, "a") as f:
        f.write(json.dumps(summary) + "\n")


if __name__ == "__main__":
    main()
