"""Continuous-batching decode engine.

Fills the role vLLM plays above the reference kernel library (SURVEY.md §0):
request admission, paged KV allocation (native C++ allocator), batch
assembly, the jitted model step, sampling, and completion — with the
sparse-attention op chain on the hot path.

Design points:
* **Static batch buckets** — the jitted decode step has a fixed batch size
  ``max_batch``; inactive lanes are masked via ``seq_lens = 0`` (the kernel
  zero-fills their output, reference InitAllZeroOutput semantics), so
  sequences join/leave the batch without recompilation.
* **Block tables on device** — rebuilt from the allocator only for
  sequences whose page set changed; the padded [max_batch, max_page]
  int32 array is the kernel's scalar-prefetch input.
* **Centroid maintenance** — when sparsity is enabled, each page's cluster
  id (``block_ids``) is refreshed lazily: a page is assigned the id of the
  nearest centroid to its mean key (device-side k-means assignment step).
"""

from __future__ import annotations

import dataclasses
import logging
import time
from collections import deque
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models import llama
from . import sampling
from .allocator import PageAllocator

logger = logging.getLogger("cann_ops_adv_vllm_tpu.engine")


@dataclasses.dataclass
class EngineStats:
    """Request-level observability (the reference instruments its op path
    with OPS_LOG throughout, ops_log.h; the engine is the layer where the
    serving-visible counters live here).

    Latencies are wall-clock per engine tick, in seconds; ``p50_ms()``
    reads the rolling window of the last 512 ticks.
    """

    steps: int = 0
    decode_ticks: int = 0
    prefill_ticks: int = 0
    tokens_generated: int = 0
    prompt_tokens: int = 0
    requests_admitted: int = 0
    requests_completed: int = 0
    _lat_window: deque = dataclasses.field(
        default_factory=lambda: deque(maxlen=512))

    def observe_tick(self, dt: float, kind: str):
        self.steps += 1
        if kind == "prefill":
            self.prefill_ticks += 1
        else:
            self.decode_ticks += 1
        self._lat_window.append(dt)

    def p50_ms(self) -> float:
        if not self._lat_window:
            return 0.0
        return float(np.median(self._lat_window) * 1e3)

    def snapshot(self, engine: "DecodeEngine") -> dict:
        return {
            "steps": self.steps,
            "decode_ticks": self.decode_ticks,
            "prefill_ticks": self.prefill_ticks,
            "tokens_generated": self.tokens_generated,
            "prompt_tokens": self.prompt_tokens,
            "requests_admitted": self.requests_admitted,
            "requests_completed": self.requests_completed,
            "running": len(engine.running),
            "waiting": len(engine.waiting),
            "free_pages": engine.allocator.num_free_pages,
            "total_pages": engine.allocator.num_pages,
            "p50_tick_ms": round(self.p50_ms(), 3),
        }


@dataclasses.dataclass
class Request:
    seq_id: int
    prompt: np.ndarray                  # [S] int32
    max_new_tokens: int = 32
    #: sampling controls (temperature <= 0 → greedy)
    temperature: float = 0.0
    top_k: int = 0
    top_p: float = 1.0
    min_p: float = 0.0
    eos_token_id: Optional[int] = None
    generated: list = dataclasses.field(default_factory=list)
    done: bool = False
    finish_reason: Optional[str] = None


class DecodeEngine:
    """Single-host continuous-batching engine over the paged decode step."""

    def __init__(self, cfg: llama.LlamaConfig, params, num_pages: int,
                 max_batch: int = 8, max_page: Optional[int] = None,
                 sample_fn: Optional[Callable] = None, seed: int = 0,
                 prefill_chunk: Optional[int] = None,
                 log_interval: int = 0,
                 centroid_refresh_interval: int = 32,
                 scan_layers: bool = False,
                 adapter=None,
                 system_prefix=None):
        self.cfg = cfg
        #: model binding: cache layout + jitted step functions
        #: (runtime.adapters; default = Llama family).  Pass
        #: adapters.DeepSeekAdapter(cfg) to serve MLA models.
        if adapter is None:
            from .adapters import LlamaAdapter
            adapter = LlamaAdapter(cfg)
        self.adapter = adapter
        #: scan_layers compiles the layer loop as lax.scan over stacked
        #: params — O(1)-in-depth HLO; the right choice for deep models
        #: (models.llama.decode_step_scan)
        self.params = adapter.prepare_params(params, scan_layers)
        self.max_batch = max_batch
        self.max_page = max_page or (num_pages // max(max_batch, 1))
        self.allocator = self._build_allocator(num_pages)
        self.kv_cache = self._build_kv_cache(num_pages)
        self.block_ids = self._build_block_ids(num_pages)
        #: lazy centroid maintenance: every `centroid_refresh_interval`
        #: ticks (and after each prefill burst) pages are re-assigned to
        #: the nearest codebook centroid of their mean key — one small
        #: device call (ops.clustering.assign_pages) per refresh
        self.centroid_refresh_interval = centroid_refresh_interval
        self._cents = None
        self._ticks_since_refresh = 0
        if cfg.num_centroids:
            self._cents = adapter.extract_cents(params)
        self.sample_fn = sample_fn
        self._sampler = sampling.make_sampler()
        self._key = jax.random.key(seed)

        self.waiting: deque[Request] = deque()
        self.running: dict[int, Request] = {}
        self.slots: list[Optional[int]] = [None] * max_batch
        self._decode = self._build_decode_fn(scan_layers)
        #: chunked prefill: prompts advance `prefill_chunk` tokens per tick
        #: through one batched prefill_chunk_step (page-sized chunks by
        #: default; 1 falls back to token-at-a-time through decode)
        self.prefill_chunk = (cfg.page_size if prefill_chunk is None
                              else prefill_chunk)
        self._prefill = (self._build_prefill_fn(scan_layers)
                         if self.prefill_chunk > 1 else None)
        self._pf_tokens = np.zeros((max_batch, max(self.prefill_chunk, 1)),
                                   np.int32)
        self._pf_start = np.zeros((max_batch,), np.int32)
        self._pf_valid = np.zeros((max_batch,), np.int32)

        self._bt_host = np.zeros((max_batch, self.max_page), np.int32)
        self._seq_lens = np.zeros((max_batch,), np.int32)
        self._tokens = np.zeros((max_batch,), np.int32)
        self._temps = np.zeros((max_batch,), np.float32)
        self._top_ks = np.zeros((max_batch,), np.int32)
        self._top_ps = np.ones((max_batch,), np.float32)
        self._min_ps = np.zeros((max_batch,), np.float32)
        self._prefill_cursor: dict[int, int] = {}
        #: pages covered by the cached _bt_host row (−1 → must rebuild);
        #: a block-table row changes only when its sequence crosses a page
        #: boundary, so the per-slot allocator ctypes call runs ~1/page_size
        #: of the time instead of every tick
        self._bt_pages = np.full((max_batch,), -1, np.int64)
        self.stats = EngineStats()
        self.log_interval = log_interval
        #: shared system prefix (vLLM-style prompt caching): the prefix
        #: is prefilled ONCE into a template sequence; every admitted
        #: request FORKS the template's ref-counted pages (native
        #: allocator fork) and, when the prefix ends mid-page,
        #: copy-on-writes that one page before its first write
        #: (ensure_writable_last + adapter.copy_page).  Requests'
        #: ``prompt`` then carries only the user part.  This is the
        #: paged-COW realization of the reference's shared-prefix
        #: two-pass attention (ops/prefix.py is the op-level one).
        self._prefix_len = 0
        #: template id: large positive (the ctypes ABI returns the id on
        #: success, so negative ids would collide with its -1 error code)
        self._TEMPLATE = (1 << 62) + 41
        if system_prefix is not None and len(system_prefix):
            if self._prefill is None:
                raise ValueError(
                    "system_prefix requires chunked prefill "
                    "(prefill_chunk > 1)")
            self._prefix_tokens = np.asarray(system_prefix, np.int32)
            self._prefix_len = int(len(self._prefix_tokens))
            self._copy_page_jit = jax.jit(
                lambda c, src, dst: self.adapter.copy_page(c, src, dst),
                donate_argnums=(0,))
            self._ingest_system_prefix()

    # -- overridable builders (ShardedDecodeEngine swaps in mesh-sharded
    # -- state and shard_map step functions; the host-side scheduling
    # -- logic above/below is shared) ----------------------------------------

    def _build_allocator(self, num_pages: int):
        return PageAllocator(num_pages, self.cfg.page_size)

    def _build_kv_cache(self, num_pages: int):
        return self.adapter.init_cache(num_pages)

    def _build_block_ids(self, num_pages: int):
        if not self.cfg.num_centroids:
            return None
        return jnp.zeros(
            (self.cfg.num_layers, self.cfg.num_kv_heads, num_pages),
            jnp.int32)

    def _build_decode_fn(self, scan_layers: bool):
        return self.adapter.make_decode_fn(scan_layers)

    def _build_prefill_fn(self, scan_layers: bool):
        return self.adapter.make_prefill_fn(scan_layers)

    # -- request lifecycle ---------------------------------------------------

    def add_request(self, req: Request):
        self.waiting.append(req)

    def _ingest_system_prefix(self):
        """Prefill the shared prefix once into the template sequence."""
        sp = self._prefix_tokens
        self.allocator.create_seq(self._TEMPLATE)
        chunk = self.prefill_chunk
        bt = np.zeros((self.max_batch, self.max_page), np.int32)
        for s0 in range(0, len(sp), chunk):
            m = min(chunk, len(sp) - s0)
            self.allocator.append_tokens(self._TEMPLATE, m)
            bt[0] = self.allocator.block_table(
                self._TEMPLATE, self.max_page, pad_value=0)
            self._pf_tokens[:] = 0
            self._pf_tokens[0, :m] = sp[s0:s0 + m]
            self._pf_start[:] = 0
            self._pf_start[0] = s0
            self._pf_valid[:] = 0
            self._pf_valid[0] = m
            _, self.kv_cache = self._prefill(
                self.params, self._dev(self._pf_tokens), self.kv_cache,
                self._dev(bt), self._dev(self._pf_start),
                self._dev(self._pf_valid))
        # prefix pages are fully written: assign their centroids before
        # any request's first selection
        self._maybe_refresh_block_ids(force=True)

    def _pages_needed(self, req: Request) -> int:
        """NEW pages a request will consume over its lifetime (whole
        shared prefix pages are free; a partial shared page costs one
        copy-on-write page)."""
        ps = self.cfg.page_size
        total = self._prefix_len + len(req.prompt) + req.max_new_tokens
        return (total + ps - 1) // ps - self._prefix_len // ps

    def _create_seq_for(self, req: Request):
        if not self._prefix_len:
            self.allocator.create_seq(req.seq_id)
            return
        self.allocator.fork(self._TEMPLATE, req.seq_id)
        if self._prefix_len % self.cfg.page_size:
            # the template's last page is partial: give this request its
            # own writable copy before any of its tokens land there
            dst, src = self.allocator.ensure_writable_last(req.seq_id)
            if dst != src:
                self.kv_cache = self._copy_page_jit(
                    self.kv_cache, jnp.asarray(src, jnp.int32),
                    jnp.asarray(dst, jnp.int32))

    def _admit(self):
        # worst-case pages already promised to running sequences
        reserved = 0
        ps = self.cfg.page_size
        for seq_id in self.running:
            req = self.running[seq_id]
            total = self._prefix_len + len(req.prompt) + req.max_new_tokens
            needed = (total + ps - 1) // ps
            have = (self.allocator.num_tokens(seq_id) + ps - 1) // ps
            reserved += max(needed - have, 0)
        available = self.allocator.num_free_pages - reserved
        for i, slot in enumerate(self.slots):
            if slot is not None or not self.waiting:
                continue
            req = self.waiting[0]
            needed = self._pages_needed(req)
            if needed > available:
                break
            available -= needed
            self.waiting.popleft()
            self._create_seq_for(req)
            self._place(i, req)

    def _place(self, i: int, req: Request):
        """Lane bookkeeping for an admitted request (seq already created
        in its allocator)."""
        self.slots[i] = req.seq_id
        self.running[req.seq_id] = req
        self._prefill_cursor[req.seq_id] = 0
        self._bt_pages[i] = -1
        self.stats.requests_admitted += 1
        self.stats.prompt_tokens += len(req.prompt)

    def _release(self, slot_idx: int):
        seq_id = self.slots[slot_idx]
        if seq_id is None:
            return
        self.allocator.free_seq(seq_id)
        self.slots[slot_idx] = None
        self.running.pop(seq_id, None)
        self._prefill_cursor.pop(seq_id, None)
        self._bt_pages[slot_idx] = -1
        self.stats.requests_completed += 1

    def _refresh_bt_row(self, i: int, seq_id: int, n_tokens: int):
        """Rebuild the cached block-table row only when the sequence
        crossed a page boundary since the last build."""
        pages = (n_tokens + self.cfg.page_size - 1) // self.cfg.page_size
        if pages != self._bt_pages[i]:
            self._bt_host[i] = self.allocator.block_table(
                seq_id, self.max_page, pad_value=0)
            self._bt_pages[i] = pages

    # -- batch assembly ------------------------------------------------------

    def _assemble(self):
        """Pick this step's token for every active slot.

        Prefill proceeds one token per step per sequence (chunked prefill
        interleaves naturally with decode in the same batch).
        """
        any_active = False
        for i, seq_id in enumerate(self.slots):
            if seq_id is None:
                self._seq_lens[i] = 0
                self._tokens[i] = 0
                continue
            req = self.running[seq_id]
            cur = self._prefill_cursor[seq_id]
            if cur < len(req.prompt):
                token = int(req.prompt[cur])
            else:
                token = int(req.generated[-1])
            self._temps[i] = req.temperature
            self._top_ks[i] = req.top_k
            self._top_ps[i] = req.top_p
            self._min_ps[i] = req.min_p
            n = self.allocator.append_tokens(seq_id, 1)
            self._trim_window(seq_id, n)
            self._refresh_bt_row(i, seq_id, n)
            self._seq_lens[i] = n
            self._tokens[i] = token
            any_active = True
        return any_active

    def refresh_block_ids(self):
        """Re-assign every physical page to its nearest centroid.

        The reference assumes an offline IVF pipeline maintains
        ``block_ids``; here the engine owns the cache writes, so it also
        owns the assignment (ops.clustering.assign_pages — one einsum per
        layer, device-resident).
        """
        if self._cents is None:
            return
        self.block_ids = self.adapter.assign_block_ids(self.kv_cache,
                                                       self._cents)
        self._ticks_since_refresh = 0

    def _maybe_refresh_block_ids(self, force: bool = False):
        if self._cents is None:
            return
        self._ticks_since_refresh += 1
        if force or (self._ticks_since_refresh
                     >= self.centroid_refresh_interval):
            self.refresh_block_ids()

    def _trim_window(self, seq_id: int, n_tokens: int):
        """Sliding-window page reclaim: pages wholly behind the attention
        window (kv_start = n − W, the same edge models.llama._attention
        passes to the kernel) go back to the free list; their block-table
        slots keep their logical index as -1 placeholders the kernel never
        reads."""
        if self.cfg.sliding_window:
            self.allocator.trim_front(
                seq_id, max(n_tokens - self.cfg.sliding_window, 0))

    # -- chunked prefill -------------------------------------------------------

    @staticmethod
    def _dev(host_buf):
        """Host→device copy of a reused staging buffer.

        ``jnp.asarray`` on the CPU backend may alias the numpy buffer
        zero-copy; since the engine mutates these staging arrays in place on
        the next tick while the previous (async-dispatched) step may still
        be reading them, an explicit copy at the device boundary is
        required for correctness.
        """
        return jnp.asarray(np.ascontiguousarray(host_buf).copy())

    def _sample(self, logits):
        if self.sample_fn is not None:
            return np.asarray(self.sample_fn(logits))
        self._key, step_key = jax.random.split(self._key)
        return np.asarray(self._sampler(
            logits, step_key, {
                "temperature": self._dev(self._temps),
                "top_k": self._dev(self._top_ks),
                "top_p": self._dev(self._top_ps),
                "min_p": self._dev(self._min_ps),
            }))

    def _finish_or_continue(self, i: int, req: Request, token: int):
        req.generated.append(token)
        self.stats.tokens_generated += 1
        if (req.eos_token_id is not None and token == req.eos_token_id):
            req.done = True
            req.finish_reason = "stop"
            self._release(i)
        elif len(req.generated) >= req.max_new_tokens:
            req.done = True
            req.finish_reason = "length"
            self._release(i)

    def _prefill_tick(self, lanes) -> bool:
        """Advance every prefilling lane by one chunk (one device call).

        A prompt of S tokens costs ceil(S / prefill_chunk) ticks instead of
        S decode steps; the tick whose chunk covers the last prompt token
        also samples that request's first generated token (the chunk-step
        logits are exactly the last prompt token's).
        """
        self._pf_tokens[:] = 0
        self._pf_valid[:] = 0
        self._pf_start[:] = 0
        finishing = []
        for i in lanes:
            seq_id = self.slots[i]
            req = self.running[seq_id]
            cur = self._prefill_cursor[seq_id]
            n = min(self.prefill_chunk, len(req.prompt) - cur)
            self._pf_tokens[i, :n] = req.prompt[cur:cur + n]
            self._pf_start[i] = self._prefix_len + cur
            self._pf_valid[i] = n
            self._temps[i] = req.temperature
            self._top_ks[i] = req.top_k
            self._top_ps[i] = req.top_p
            self._min_ps[i] = req.min_p
            total = self.allocator.append_tokens(seq_id, n)
            self._trim_window(seq_id, total)
            self._refresh_bt_row(i, seq_id, total)
            self._prefill_cursor[seq_id] = cur + n
            if cur + n == len(req.prompt):
                finishing.append(i)

        logits, self.kv_cache = self._prefill(
            self.params,
            self._dev(self._pf_tokens),
            self.kv_cache,
            self._dev(self._bt_host),
            self._dev(self._pf_start),
            self._dev(self._pf_valid),
        )
        if self._agree_any_finishing(bool(finishing)):
            # prompts finished prefilling: their pages are fully written —
            # refresh centroid assignments before decode starts selecting.
            # In SPMD (multi-process) mode this branch is entered on EVERY
            # process when ANY process has a finishing lane — refresh and
            # sampling are global jitted calls and must launch lock-step.
            self._maybe_refresh_block_ids(force=True)
            next_tokens = self._sample(logits)
            for i in finishing:
                self._finish_or_continue(i, self.running[self.slots[i]],
                                         int(next_tokens[i]))
        return True

    def _agree_any_finishing(self, flag: bool) -> bool:
        """Hook: whether this prefill tick runs the finishing branch.
        Single-process: the local flag.  ShardedDecodeEngine returns the
        cross-process OR agreed in its tick coordination."""
        return flag

    # -- main loop -----------------------------------------------------------

    def step(self) -> bool:
        """One engine tick: admit → assemble → model step → sample/advance.

        Prefilling lanes take priority: while any admitted prompt has
        unprocessed tokens, the tick is one chunked-prefill call (all
        prefilling lanes batched); otherwise it is one decode call.

        Returns False when no work remains.
        """
        t0 = time.perf_counter()
        self._admit()
        if self._prefill is not None:
            lanes = [i for i, sid in enumerate(self.slots)
                     if sid is not None and self._prefill_cursor[sid]
                     < len(self.running[sid].prompt)]
            if lanes:
                r = self._prefill_tick(lanes)
                self._observe(t0, "prefill")
                return r
        if not self._assemble():
            return bool(self.waiting)

        self._maybe_refresh_block_ids()
        logits, self.kv_cache = self._decode(
            self.params,
            self._dev(self._tokens),
            self.kv_cache,
            self._dev(self._bt_host),
            self._dev(self._seq_lens),
            self.block_ids,
        )
        next_tokens = self._sample(logits)
        self._advance_decode(next_tokens)
        self._observe(t0, "decode")
        return True

    def _advance_decode(self, next_tokens):
        """Advance every active lane after a decode tick's sampled tokens."""
        transitioned = False
        for i, seq_id in enumerate(self.slots):
            if seq_id is None:
                continue
            req = self.running[seq_id]
            cur = self._prefill_cursor[seq_id]
            if cur < len(req.prompt):
                # token-at-a-time prefill (prefill_chunk <= 1 fallback)
                self._prefill_cursor[seq_id] = cur + 1
                if cur + 1 == len(req.prompt):
                    transitioned = True
                    self._finish_or_continue(i, req, int(next_tokens[i]))
            else:
                self._finish_or_continue(i, req, int(next_tokens[i]))
        if transitioned:
            # prompt ingestion just completed through the decode path
            # (prefill_chunk <= 1): the pages holding the prompt were
            # never centroid-assigned — refresh before the next tick's
            # selection, mirroring _prefill_tick's finishing branch
            self._maybe_refresh_block_ids(force=True)

    def _observe(self, t0: float, kind: str):
        self.stats.observe_tick(time.perf_counter() - t0, kind)
        if self.log_interval and self.stats.steps % self.log_interval == 0:
            logger.info("engine %s", self.stats.snapshot(self))

    def memory_report(self) -> dict:
        """Device-memory footprint of the serving state (bytes).

        The L=32/16K sizing exercise made this non-optional operator
        knowledge: weights + cache must be budgeted against HBM before
        admission sizing (see scripts/model_bench.py).
        """
        import jax as _jax

        def tree_bytes(t):
            return int(sum(x.size * x.dtype.itemsize
                           for x in _jax.tree.leaves(t)))

        cache = tree_bytes(self.kv_cache)
        params = tree_bytes(self.params)
        bids = (tree_bytes(self.block_ids)
                if self.block_ids is not None else 0)
        return {
            "params_bytes": params,
            "kv_cache_bytes": cache,
            "block_ids_bytes": bids,
            "total_gb": round((params + cache + bids) / 1e9, 3),
            "bytes_per_page": (cache
                               // max(self.allocator.num_pages, 1)),
        }

    def run(self, max_steps: int = 10_000):
        steps = 0
        while self.step():
            steps += 1
            if steps >= max_steps:
                break
        return steps
