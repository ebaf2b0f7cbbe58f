"""Multi-host (DCN) data-parallel decode demo — BASELINE config 5 stepping
stone.

Runs the dp×tp-sharded decode step (parallel.sharded.tp_decode_step)
across TWO OS processes joined with ``jax.distributed`` — the same
mechanics as two TPU hosts over DCN, exercised here on CPU devices so the
demo runs in CI without multi-host hardware:

* process p contributes 4 local CPU devices; the global mesh is
  dp=2 (spanning processes — the DCN axis) × tp=4 (within a process —
  the ICI axis), so the dp batch/pool sharding crosses the host boundary
  and the tp psums stay host-local, exactly the layout a 2-host TPU
  deployment would use.
* inputs are assembled with ``jax.make_array_from_process_local_data``:
  each process feeds only ITS dp shard of tokens / block tables /
  seq_lens / page pool (its replica's private pool, local page ids).
* each process independently verifies its addressable output shard
  against a local single-device reference — no cross-host result
  gathering is needed for the parity check.

``--config5`` runs the BASELINE config-5 shape instead of the tiny CI
config: Llama-3-70B attention geometry (GQA 64 q / 8 kv heads, D=128,
hidden 8192), 32K context, per-token INT8 KV cache, dp=2 hosts × tp=4 —
depth and FFN/vocab width reduced so the CPU demo stays memory-bounded
(the attention path, cache layout, sharding and collectives are the
full-size ones).

``--engine`` runs the full ShardedDecodeEngine instead of one decode
step: **continuous batching across hosts** — each process admits its own
request stream into its dp replica's lanes (different prompt lengths and
arrival pattern per host, more requests than lanes so lanes recycle),
ticks run lock-step over the global mesh, and every process verifies its
generated tokens against a local single-device DecodeEngine oracle, then
prints engine tokens/s and p50 tick latency.  ``--engine --config5``
uses the 70B attention geometry / 32K ctx / int8 KV variant.

Usage:  python scripts/multihost_demo.py [--config5] [--engine]
        PROC_ID=<0|1> python scripts/multihost_demo.py   (worker)
"""

import dataclasses
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_PROC = 2
LOCAL_DEVICES = 4
PORT = int(os.environ.get("MH_PORT", "8476"))


def engine_worker(proc_id: int, config5: bool = False) -> None:
    """Continuous batching across 2 processes (dp over DCN × tp local)."""
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={LOCAL_DEVICES}"
    ).strip()
    import json
    import dataclasses as dc

    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"localhost:{PORT}",
        num_processes=N_PROC, process_id=proc_id)

    import jax.numpy as jnp
    import numpy as np

    from cann_ops_adv_vllm_tpu.models import llama
    from cann_ops_adv_vllm_tpu.parallel.mesh import make_mesh
    from cann_ops_adv_vllm_tpu.runtime.engine import DecodeEngine, Request
    from cann_ops_adv_vllm_tpu.runtime.sharded_engine import (
        ShardedDecodeEngine)

    if config5:
        # config-5 attention geometry (Llama-3-70B heads, 32K ctx, int8
        # KV); depth/FFN/vocab shrunk so the CPU demo stays memory-bounded
        cfg = dc.replace(
            llama.LLAMA_3_70B, num_layers=1, vocab_size=1024,
            intermediate_size=1024, num_centroids=0,
            kv_cache_dtype="int8", dtype=jnp.float32)
        prompt_lens = ([1800, 700] if proc_id == 0 else [2400])
        pool, max_page, max_new = 40, 32, 8
    else:
        cfg = dc.replace(
            llama.TINY_LLAMA, num_layers=2, num_heads=8, num_kv_heads=4,
            num_centroids=0, page_size=16, dtype=jnp.float32)
        prompt_lens = ([9, 21, 34] if proc_id == 0 else [27])
        pool, max_page, max_new = 24, 8, 6
    mesh = make_mesh(dp=N_PROC, tp=LOCAL_DEVICES, devices=jax.devices())

    params = llama.init_params(cfg, jax.random.key(0))
    # per-host request stream: same seed builds the same stream twice
    n_req = 2 * len(prompt_lens)                  # > lanes → recycling
    max_batch = 2

    def make_reqs():
        return [Request(seq_id=1000 * proc_id + i,
                        prompt=rng_clone.integers(
                            1, cfg.vocab_size,
                            prompt_lens[i % len(prompt_lens)]
                        ).astype(np.int32),
                        max_new_tokens=max_new)
                for i in range(n_req)]

    rng_clone = np.random.default_rng(10 + proc_id)
    reqs = make_reqs()
    rng_clone = np.random.default_rng(10 + proc_id)
    reqs_oracle = make_reqs()

    eng = ShardedDecodeEngine(
        cfg, params, pages_per_replica=pool, mesh=mesh,
        max_batch=max_batch, max_page=max_page,
        prefill_chunk=2 * cfg.page_size)
    for r in reqs:
        eng.add_request(r)
    import time
    t0 = time.perf_counter()
    eng.run(max_steps=4000)
    wall = time.perf_counter() - t0

    # local single-device oracle on this host's request stream
    oracle = DecodeEngine(cfg, params, num_pages=pool * N_PROC,
                          max_batch=max_batch, max_page=max_page,
                          prefill_chunk=2 * cfg.page_size)
    for r in reqs_oracle:
        oracle.add_request(r)
    oracle.run(max_steps=4000)

    got = {r.seq_id: list(r.generated) for r in reqs}
    want = {r.seq_id: list(r.generated) for r in reqs_oracle}
    match = sum(got[k] == want[k] for k in got)
    assert all(len(v) == max_new for v in got.values()), got
    assert match == len(got), (
        f"[proc {proc_id}] {len(got) - match}/{len(got)} streams diverge "
        "from the single-device oracle")
    snap = eng.stats.snapshot(eng)
    tag = "config-5 " if config5 else ""
    print(f"[proc {proc_id}] ENGINE {tag}continuous batching across "
          f"{jax.process_count()} hosts: {len(got)} requests, "
          f"{snap['tokens_generated']} tokens, oracle parity "
          f"{match}/{len(got)}", flush=True)
    print(json.dumps({
        "proc": proc_id, "mode": f"engine{'-config5' if config5 else ''}",
        "requests": len(got), "tokens": snap["tokens_generated"],
        "decode_ticks": snap["decode_ticks"],
        "prefill_ticks": snap["prefill_ticks"],
        "engine_tokens_per_s": round(snap["tokens_generated"] / wall, 2),
        "p50_tick_ms": snap["p50_tick_ms"],
        "wall_s": round(wall, 2),
    }), flush=True)
    jax.distributed.shutdown()


def worker(proc_id: int, config5: bool = False) -> None:
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={LOCAL_DEVICES}"
    ).strip()
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"localhost:{PORT}",
        num_processes=N_PROC, process_id=proc_id)

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from cann_ops_adv_vllm_tpu.models import llama
    from cann_ops_adv_vllm_tpu.parallel.mesh import (
        kv_cache_spec, make_mesh, param_specs, ts_spec)
    from cann_ops_adv_vllm_tpu.parallel.sharded import tp_decode_step

    assert jax.process_count() == N_PROC
    assert len(jax.devices()) == N_PROC * LOCAL_DEVICES

    if config5:
        # BASELINE config 5: Llama-3-70B attention geometry, 32K ctx,
        # INT8 KV, ≥2 hosts.  Depth/FFN/vocab shrunk for CPU memory; the
        # attention shape (64/8 heads, D=128, hidden 8192), the paged
        # int8 cache at 32K, and the dp-over-DCN × tp-over-ICI layout are
        # the real thing.
        cfg = dataclasses.replace(
            llama.LLAMA_3_70B, num_layers=1, vocab_size=1024,
            intermediate_size=1024, num_centroids=0,
            kv_cache_dtype="int8", dtype=jnp.float32)
        ctx = 32 * 1024
        b_local = 2
        mp = ctx // cfg.page_size                 # 256 block-table slots
        pool = mp + 2
    else:
        cfg = dataclasses.replace(
            llama.TINY_LLAMA, num_layers=2, num_heads=8, num_kv_heads=4,
            num_centroids=0, page_size=16, dtype=jnp.float32)
        b_local, pool, mp = 2, 16, 8
        ctx = 3 * cfg.page_size
    dp, tp = N_PROC, LOCAL_DEVICES
    # jax.devices() orders process-major: reshaping (dp, tp, 1, 1) puts
    # each process's 4 local devices in one dp row → dp crosses DCN,
    # tp stays intra-host
    mesh = make_mesh(dp=dp, tp=tp, sp=1, devices=jax.devices())

    b = b_local * dp
    num_pages = pool * dp

    # identical params on every process → replicated global arrays
    params = llama.init_params(cfg, jax.random.key(0))
    pspecs = param_specs(cfg.num_layers, sparse=False)
    params_g = jax.tree.map(
        lambda x, s: jax.make_array_from_process_local_data(
            NamedSharding(mesh, s), np.asarray(x)),
        params, pspecs, is_leaf=lambda x: not isinstance(x, (dict, list)))

    def dp_shard(spec, local_np):
        return jax.make_array_from_process_local_data(
            NamedSharding(mesh, spec), local_np)

    rng = np.random.default_rng(proc_id)       # per-replica data
    tokens_l = rng.integers(0, cfg.vocab_size, b_local).astype(np.int32)
    bt_l = np.stack([np.roll(np.arange(mp, dtype=np.int32), i)
                     for i in range(b_local)])
    seq_l = np.full((b_local,), ctx - 5, np.int32)
    rng_fill = np.random.default_rng(100 + proc_id)
    if cfg.kv_cache_dtype == "int8":
        kv_l = rng_fill.integers(
            -112, 112, (cfg.num_layers, cfg.num_kv_heads, pool,
                        cfg.page_size, 2 * cfg.head_dim)).astype(np.int8)
        ts_l = np.zeros((cfg.num_layers, cfg.num_kv_heads, 4, pool,
                         cfg.page_size), np.float32)
        ts_l[:, :, 0] = 0.008 + 0.004 * rng_fill.random(
            ts_l[:, :, 0].shape)                          # k per-token scale
        ts_l[:, :, 2] = 0.008 + 0.004 * rng_fill.random(
            ts_l[:, :, 2].shape)                          # v per-token scale
        cache_l = {"kv": kv_l, "ts": ts_l}
    else:
        cache_l = rng_fill.standard_normal(
            (cfg.num_layers, cfg.num_kv_heads, pool, cfg.page_size,
             2 * cfg.head_dim)).astype(np.float32)

    tokens = dp_shard(P("dp"), tokens_l)
    bt = dp_shard(P("dp", None), bt_l)
    seq = dp_shard(P("dp"), seq_l)
    if isinstance(cache_l, dict):
        specs = {"kv": kv_cache_spec(), "ts": ts_spec()}
        kv_cache = {k: dp_shard(specs[k], v)
                    for k, v in cache_l.items()}
    else:
        kv_cache = dp_shard(kv_cache_spec(), cache_l)

    step = tp_decode_step(cfg, mesh)
    logits, new_cache = step(params_g, tokens, kv_cache, bt, seq)
    logits.block_until_ready()

    # local reference: this replica's rows against its private pool
    ref_logits, ref_cache = llama.decode_step(
        cfg, params, jnp.asarray(tokens_l),
        jax.tree.map(jnp.asarray, cache_l), jnp.asarray(bt_l),
        jnp.asarray(seq_l))

    # logits are sharded over dp and replicated over tp: every local
    # device holds this process's dp shard — read one copy
    tol = 2e-3 if cfg.kv_cache_dtype == "int8" else 2e-4
    local = np.asarray(logits.addressable_shards[0].data)
    np.testing.assert_allclose(local, np.asarray(ref_logits),
                               rtol=tol, atol=tol)
    tag = ("config-5 (70B-geometry, 32K ctx, int8 KV) " if config5 else "")
    print(f"[proc {proc_id}] dp-over-DCN {tag}decode parity OK "
          f"(local batch {b_local}/{b}, {jax.process_count()} hosts)")
    jax.distributed.shutdown()


def main():
    config5 = "--config5" in sys.argv
    engine = "--engine" in sys.argv
    if "PROC_ID" in os.environ:
        if engine:
            engine_worker(int(os.environ["PROC_ID"]), config5)
        else:
            worker(int(os.environ["PROC_ID"]), config5)
        return
    procs = []
    for pid in range(N_PROC):
        env = dict(os.environ, PROC_ID=str(pid))
        procs.append(subprocess.Popen(
            [sys.executable, __file__] + sys.argv[1:], env=env))
    rc = 0
    for p in procs:
        rc |= p.wait(timeout=1800 if (config5 or engine) else 420)
    if rc:
        sys.exit(rc)
    print("MULTIHOST DEMO OK" + (" (config 5)" if config5 else ""))


if __name__ == "__main__":
    main()
