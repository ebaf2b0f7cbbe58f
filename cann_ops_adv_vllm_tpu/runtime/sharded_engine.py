"""Mesh-sharded continuous-batching engine — serving over dp × tp.

The reference stops at single-device kernels; vLLM-Ascend supplies the
serving layer above them (reference README.md:1-120).  Here the engine
itself runs on a ``jax.sharding.Mesh``:

* **dp** — batch lanes AND the paged KV pool are sharded over data-
  parallel replicas.  Each replica owns a *private* page pool (its own
  C++ :class:`..runtime.allocator.PageAllocator`) and its block-table
  rows hold LOCAL page ids (parallel.mesh.kv_cache_spec), so admission /
  allocation never crosses replicas.  The dp axis may span hosts (DCN):
  with ``jax.distributed`` each process schedules its own lanes.
* **tp** — attention heads, centroid codebooks, block_ids and KV pages
  shard over tensor-parallel devices inside a replica
  (parallel.sharded.tp_decode_step / tp_prefill_step); the only
  collectives are the two per-layer psums, riding ICI.

Multi-process (multi-host) operation is **lock-step SPMD**: every global
jitted call (prefill step, decode step, sampler, centroid refresh) must
launch on every process in the same order.  The engine guarantees this
with one tiny per-tick agreement (``multihost_utils.process_allgather``
of three booleans): the OR of *has-prefilling-lanes* picks the tick kind
globally (prefill-priority, exactly vLLM's policy), the OR of
*lane-finishes-prompt* gates the sampling/refresh branch, and the OR of
*has-work* terminates all processes together.  A process with no active
lanes still joins every global call with its lanes masked
(``seq_lens = 0`` — the kernel zero-fills, reference InitAllZeroOutput
semantics), which is what makes continuous batching across hosts work:
requests join and leave any host's lanes at any tick with no
recompilation and no divergence.
"""

from __future__ import annotations

import time

import numpy as np

import jax
from jax.sharding import NamedSharding, PartitionSpec as P

from . import sampling
from .allocator import PageAllocator
from .engine import DecodeEngine, Request  # noqa: F401  (re-export)


class _ReplicaPools:
    """Per-dp-replica private page pools behind the single-allocator
    interface the host scheduling code uses (seq-id routed)."""

    def __init__(self, n_replicas: int, pages_per_replica: int,
                 page_size: int):
        self.allocs = [PageAllocator(pages_per_replica, page_size)
                       for _ in range(n_replicas)]
        self._of: dict[int, int] = {}

    def create_seq(self, seq_id: int, replica: int = 0):
        self._of[seq_id] = replica
        self.allocs[replica].create_seq(seq_id)

    def free_seq(self, seq_id: int):
        r = self._of.pop(seq_id, None)
        if r is not None:
            self.allocs[r].free_seq(seq_id)

    def _alloc_of(self, seq_id: int) -> PageAllocator:
        try:
            return self.allocs[self._of[seq_id]]
        except KeyError:
            raise RuntimeError(
                f"sharded engine: seq {seq_id} has no replica pool on this "
                "process — a lane referenced a sequence that was never "
                "admitted here (cross-process scheduling divergence)"
            ) from None

    def fork(self, parent_id: int, child_id: int):
        """Fork within the parent's replica pool (COW prefix sharing)."""
        r = self._of[parent_id]
        self.allocs[r].fork(parent_id, child_id)
        self._of[child_id] = r

    def ensure_writable_last(self, seq_id: int):
        return self._alloc_of(seq_id).ensure_writable_last(seq_id)

    def replica_of(self, seq_id: int) -> int:
        return self._of[seq_id]

    def append_tokens(self, seq_id: int, n: int = 1) -> int:
        return self._alloc_of(seq_id).append_tokens(seq_id, n)

    def num_tokens(self, seq_id: int) -> int:
        return self._alloc_of(seq_id).num_tokens(seq_id)

    def trim_front(self, seq_id: int, keep_from_token: int) -> int:
        return self._alloc_of(seq_id).trim_front(seq_id, keep_from_token)

    def block_table(self, seq_id: int, max_len: int, pad_value: int = 0):
        return self._alloc_of(seq_id).block_table(
            seq_id, max_len, pad_value=pad_value)

    @property
    def num_free_pages(self) -> int:
        return sum(a.num_free_pages for a in self.allocs)

    @property
    def num_pages(self) -> int:
        return sum(a.num_pages for a in self.allocs)


class ShardedDecodeEngine(DecodeEngine):
    """Continuous-batching engine over a (dp, tp) mesh.

    Args mirror :class:`DecodeEngine` except:
      mesh:             mesh with axes "dp" and "tp" (make_mesh).  dp may
                        span processes (dp % process_count == 0).
      pages_per_replica: page-pool size of EACH dp replica (the global
                        pool is dp × this).
      max_batch:        lanes managed by THIS process (the global batch
                        is max_batch × process_count; must divide evenly
                        into this process's dp replicas).
      params:           host-side parameter pytree (identical on every
                        process); sharded internally.
    """

    def __init__(self, cfg, params, pages_per_replica:
                 int, mesh, *, max_batch: int = 8, max_page=None,
                 sample_fn=None, seed: int = 0, prefill_chunk=None,
                 log_interval: int = 0, centroid_refresh_interval: int = 32,
                 scan_layers: bool = False, adapter=None,
                 system_prefix=None):
        self.mesh = mesh
        self.dp = mesh.shape["dp"]
        self.tp = mesh.shape["tp"]
        self.nproc = jax.process_count()
        if self.dp % self.nproc:
            raise ValueError(f"dp={self.dp} must divide evenly over "
                             f"{self.nproc} processes")
        self.dp_local = self.dp // self.nproc
        if max_batch % self.dp_local:
            raise ValueError(f"max_batch={max_batch} must divide over "
                             f"{self.dp_local} local dp replicas")
        self.lanes_per_replica = max_batch // self.dp_local
        self.global_batch = max_batch * self.nproc
        self._lane_offset = jax.process_index() * max_batch
        self._seed0 = seed
        if adapter is None:
            from .adapters import LlamaAdapter
            adapter = LlamaAdapter(cfg)
        self._quantized_weights = adapter.is_quantized(params)
        self._sample_step = 0
        self._fin_agreed = False
        self._scan_layers = scan_layers
        if sample_fn is not None and self.nproc > 1:
            raise ValueError("custom sample_fn is single-process only")
        if prefill_chunk is not None and prefill_chunk <= 1:
            raise ValueError(
                "ShardedDecodeEngine requires chunked prefill "
                "(prefill_chunk > 1): token-at-a-time prefill transitions "
                "inside decode ticks cannot be SPMD-coordinated")
        super().__init__(cfg, params, num_pages=pages_per_replica,
                         max_batch=max_batch, max_page=max_page,
                         sample_fn=sample_fn, seed=seed,
                         prefill_chunk=prefill_chunk,
                         log_interval=log_interval,
                         centroid_refresh_interval=centroid_refresh_interval,
                         scan_layers=scan_layers, adapter=adapter,
                         system_prefix=None)   # ingested below, sharded
        # re-shard params globally (base stacked them host-side if scan)
        self.params = self._shard_params_global(self.params)
        if self._cents is not None:
            self._cents = jax.make_array_from_process_local_data(
                NamedSharding(mesh, self.adapter.cents_spec()),
                np.asarray(self._cents))
            bids_sh = NamedSharding(mesh, self.adapter.block_ids_spec())
            self._refresh_jit = jax.jit(self.adapter.assign_block_ids,
                                        out_shardings=bids_sh)
        self._sampler_jit = jax.jit(self._sampler_body)
        if system_prefix is not None and len(system_prefix):
            if self._prefill is None:
                raise ValueError(
                    "system_prefix requires chunked prefill "
                    "(prefill_chunk > 1)")
            self._prefix_tokens = np.asarray(system_prefix, np.int32)
            self._prefix_len = int(len(self._prefix_tokens))
            self._copy_page_sharded = self._build_copy_page()
            self._ingest_system_prefix()

    # -- builders ------------------------------------------------------------

    def _shard_params_global(self, params):
        """Per-process host params → global arrays under the adapter's
        PartitionSpecs (every process holds identical host params —
        parallel.mesh.shard_params_global rationale)."""
        specs = self.adapter.param_specs(params)
        return jax.tree.map(
            lambda x, s: jax.make_array_from_process_local_data(
                NamedSharding(self.mesh, s), np.asarray(x)),
            params, specs,
            is_leaf=lambda x: not isinstance(x, (dict, list)))

    def _build_allocator(self, pages_per_replica: int):
        return _ReplicaPools(self.dp_local, pages_per_replica,
                             self.cfg.page_size)

    def _zeros_global(self, shape, dtype, spec):
        sh = NamedSharding(self.mesh, spec)
        shard_shape = sh.shard_shape(shape)
        return jax.make_array_from_callback(
            shape, sh, lambda idx: np.zeros(shard_shape, dtype))

    def _build_kv_cache(self, pages_per_replica: int):
        # the adapter defines the cache pytree (shapes/dtypes); its specs
        # shard the global pool (pages_per_replica × dp) over the mesh
        pool = pages_per_replica * self.dp
        shapes = jax.eval_shape(lambda: self.adapter.init_cache(pool))
        flat_sh, treedef = jax.tree.flatten(shapes)
        flat_sp = treedef.flatten_up_to(self.adapter.cache_spec())
        flat = [self._zeros_global(sh.shape, np.dtype(sh.dtype), sp)
                for sh, sp in zip(flat_sh, flat_sp)]
        return jax.tree.unflatten(treedef, flat)

    def _build_block_ids(self, pages_per_replica: int):
        if not self.cfg.num_centroids:
            return None
        return self._zeros_global(
            (self.cfg.num_layers, self.cfg.num_kv_heads,
             pages_per_replica * self.dp), np.int32,
            self.adapter.block_ids_spec())

    def _build_decode_fn(self, scan_layers: bool):
        return self.adapter.make_tp_decode_fn(
            self.mesh, scan_layers, self._quantized_weights)

    def _build_prefill_fn(self, scan_layers: bool):
        return self.adapter.make_tp_prefill_fn(
            self.mesh, scan_layers, self._quantized_weights)

    # -- device boundary -----------------------------------------------------

    def _dev(self, host_buf):
        """Local staging buffer → dp-sharded global array (copied: the
        engine mutates staging arrays while the async step may read)."""
        buf = np.ascontiguousarray(host_buf).copy()
        spec = P("dp") if buf.ndim == 1 else P("dp", None)
        return jax.make_array_from_process_local_data(
            NamedSharding(self.mesh, spec), buf)

    def _dev_replicated(self, host_buf):
        return jax.make_array_from_process_local_data(
            NamedSharding(self.mesh, P()), np.ascontiguousarray(host_buf))

    @staticmethod
    def _sampler_body(logits, key_data, temps, top_ks, top_ps, min_ps):
        key = jax.random.wrap_key_data(key_data)
        return sampling.sample(logits, key, temperature=temps,
                               top_p=top_ps, min_p=min_ps,
                               top_k_per_lane=top_ks)

    def _sample(self, logits):
        if self.sample_fn is not None:
            return np.asarray(self.sample_fn(logits))
        # the PRNG key is derived host-side from (seed, tick) — identical
        # on every process by construction, so the global sampler call is
        # SPMD-consistent without a cross-host key exchange
        self._sample_step += 1
        kd = np.array([self._seed0 & 0xFFFFFFFF, self._sample_step],
                      np.uint32)
        toks = self._sampler_jit(
            logits, self._dev_replicated(kd), self._dev(self._temps),
            self._dev(self._top_ks), self._dev(self._top_ps),
            self._dev(self._min_ps))
        if self.nproc == 1:
            return np.asarray(toks)
        out = np.zeros((self.global_batch,), np.int32)
        for sh in toks.addressable_shards:
            out[sh.index[0]] = np.asarray(sh.data)
        return out[self._lane_offset:self._lane_offset + self.max_batch]

    # -- system-prefix caching (per-replica templates) ------------------------

    def _build_copy_page(self):
        """shard_map page copy with PER-REPLICA (src, dst) local page
        ids; a replica with nothing to COW this tick passes an
        out-of-range dst (the adapter's copy drops it)."""
        import functools

        cspec = self.adapter.cache_spec()
        adapter = self.adapter

        @functools.partial(
            jax.shard_map, mesh=self.mesh,
            in_specs=(cspec, P("dp"), P("dp")), out_specs=cspec,
            check_vma=False)
        def cp(cache, src, dst):
            return adapter.copy_page(cache, src[0], dst[0])

        return jax.jit(cp, donate_argnums=(0,))

    def _template_id(self, replica: int) -> int:
        return self._TEMPLATE + replica

    def _ingest_system_prefix(self):
        """Prefill the shared prefix ONCE into every dp replica's
        private pool: one template sequence per replica, all written by
        the same global prefill calls (one active lane per replica)."""
        sp = self._prefix_tokens
        for r in range(self.dp_local):
            self.allocator.create_seq(self._template_id(r), r)
        chunk = self.prefill_chunk
        bt = np.zeros((self.max_batch, self.max_page), np.int32)
        for s0 in range(0, len(sp), chunk):
            m = min(chunk, len(sp) - s0)
            self._pf_tokens[:] = 0
            self._pf_start[:] = 0
            self._pf_valid[:] = 0
            for r in range(self.dp_local):
                tid = self._template_id(r)
                self.allocator.append_tokens(tid, m)
                lane = r * self.lanes_per_replica
                bt[lane] = self.allocator.block_table(
                    tid, self.max_page, pad_value=0)
                self._pf_tokens[lane, :m] = sp[s0:s0 + m]
                self._pf_start[lane] = s0
                self._pf_valid[lane] = m
            _, self.kv_cache = self._prefill(
                self.params, self._dev(self._pf_tokens), self.kv_cache,
                self._dev(bt), self._dev(self._pf_start),
                self._dev(self._pf_valid))
        self._maybe_refresh_block_ids(force=True)

    def _create_seq_for_replica(self, req, replica: int):
        if not self._prefix_len:
            self.allocator.create_seq(req.seq_id, replica)
            return
        self.allocator.fork(self._template_id(replica), req.seq_id)
        if self._prefix_len % self.cfg.page_size:
            dst, src = self.allocator.ensure_writable_last(req.seq_id)
            if dst != src:
                # per-replica (src, dst) LOCAL page ids; every other
                # replica gets an out-of-range dst → its copy is dropped
                # (_dev builds the dp-sharded global from this process's
                # local [dp_local] part)
                s_arr = np.full((self.dp_local,), -1, np.int32)
                d_arr = np.full((self.dp_local,),
                                self.allocator.allocs[0].num_pages,
                                np.int32)
                s_arr[replica], d_arr[replica] = src, dst
                self.kv_cache = self._copy_page_sharded(
                    self.kv_cache, self._dev(s_arr), self._dev(d_arr))

    # -- centroid maintenance ------------------------------------------------

    def refresh_block_ids(self):
        if self._cents is None:
            return
        self.block_ids = self._refresh_jit(self.kv_cache, self._cents)
        self._ticks_since_refresh = 0

    # -- scheduling ----------------------------------------------------------

    def _admit(self):
        """Per-replica admission: a lane's request must fit in the PRIVATE
        pool of the replica that owns the lane (lane i → replica
        i // lanes_per_replica)."""
        ps = self.cfg.page_size
        avail = [a.num_free_pages for a in self.allocator.allocs]
        for i, sid in enumerate(self.slots):
            if sid is None:
                continue
            req = self.running[sid]
            total = self._prefix_len + len(req.prompt) + req.max_new_tokens
            needed = (total + ps - 1) // ps
            have = (self.allocator.num_tokens(sid) + ps - 1) // ps
            avail[i // self.lanes_per_replica] -= max(needed - have, 0)
        for i, slot in enumerate(self.slots):
            if slot is not None or not self.waiting:
                continue
            r = i // self.lanes_per_replica
            req = self.waiting[0]
            needed = self._pages_needed(req)
            if needed > avail[r]:
                continue        # other replicas' lanes may still have room
            avail[r] -= needed
            self.waiting.popleft()
            self._create_seq_for_replica(req, r)
            self._place(i, req)

    def _agree_any_finishing(self, flag: bool) -> bool:
        return self._fin_agreed if self.nproc > 1 else flag

    def step(self) -> bool:
        """One lock-step global tick (see module docstring).

        All processes agree on (tick kind, finishing branch, termination)
        through one small allgather, then issue the same global jitted
        calls; lanes a process doesn't use are masked.
        """
        t0 = time.perf_counter()
        self._admit()
        lanes = [i for i, sid in enumerate(self.slots)
                 if sid is not None and self._prefill_cursor[sid]
                 < len(self.running[sid].prompt)]
        fin = any(self._prefill_cursor[self.slots[i]] + self.prefill_chunk
                  >= len(self.running[self.slots[i]].prompt) for i in lanes)
        work = bool(self.running or self.waiting)
        if self.nproc > 1:
            from jax.experimental import multihost_utils
            flags = multihost_utils.process_allgather(
                np.array([bool(lanes), fin, work]))
            any_prefill, self._fin_agreed, work = (
                bool(x) for x in flags.any(axis=0))
        else:
            any_prefill, self._fin_agreed = bool(lanes), fin
        if not work:
            return False
        if any_prefill:
            self._prefill_tick(lanes)
            self._observe(t0, "prefill")
            return True
        # decode tick — runs on every process even with no active local
        # lanes (masked), keeping the global call sequence identical
        self._assemble()
        self._maybe_refresh_block_ids()
        logits, self.kv_cache = self._decode(
            self.params, self._dev(self._tokens), self.kv_cache,
            self._dev(self._bt_host), self._dev(self._seq_lens),
            self.block_ids)
        next_tokens = self._sample(logits)
        self._advance_decode(next_tokens)
        self._observe(t0, "decode")
        return True
