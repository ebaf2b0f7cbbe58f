"""PyTorch front-end for the op surface — the torch_npu/custom_ops analog.

The reference exposes its kernels to torch twice: a cpp-extension wheel
(``custom_ops``, extension/custom_ops/add_custom.py) and a vendored
torch_npu registering ``npu_sparse_paged_fusion_attention`` et al.
(op_plugin_functions.yaml:6962; torch_npu/utils/custom_ops.py:133).  Here
the same surface is a thin bridge: torch tensors in → JAX compute on TPU →
torch tensors out, with the reference's op names.  A vLLM-style torch
serving stack can call these directly.

Conversion: **dlpack, both directions** — a torch CPU tensor enters JAX
zero-copy (bf16 included, no fp32 detour) and is placed on the default
device in one hop; outputs come back as a zero-copy torch view of the
fetched host buffer.  The ownership window is safe by construction: every
bridge call blocks on its outputs before returning, so the borrowed input
buffers have already been consumed when control returns to torch.  For
repeated decode steps over a static cache, hold the cache on device with
:class:`DeviceCache` so only the small per-step tensors cross.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from . import api

try:
    import torch
except ImportError:                                  # pragma: no cover
    torch = None

__all__ = [
    "compute_cent", "select_position", "cent_select",
    "incre_flash_attention", "sparse_paged_attention",
    "sparse_paged_fusion_attention", "DeviceCache",
]


def _require_torch():
    if torch is None:                                # pragma: no cover
        raise ImportError("torch_bridge requires torch")


def _cpu_device():
    try:
        return jax.local_devices(backend="cpu")[0]
    except RuntimeError:                             # pragma: no cover
        return None


def _to_jax(x):
    if torch is not None and isinstance(x, torch.Tensor):
        t = x.detach().contiguous()
        if t.device.type == "cpu":
            try:
                # zero-copy borrow (bf16 stays bf16), then one explicit hop
                # to the default device — without the explicit target the
                # borrowed array stays committed to CPU and jit would
                # compile the whole op for the CPU backend
                return jax.device_put(jnp.from_dlpack(t), jax.devices()[0])
            except Exception:                        # pragma: no cover
                pass
        t = t.cpu()
        if t.dtype == torch.bfloat16:                # pragma: no cover
            return jnp.asarray(t.float().numpy(), jnp.bfloat16)
        return jnp.asarray(t.numpy())                # pragma: no cover
    return x


def _to_torch(x):
    if isinstance(x, (tuple, list)):
        return type(x)(_to_torch(v) for v in x)
    cpu = _cpu_device()
    if cpu is not None:
        try:
            # fetch to host once (bf16 outputs stay bf16); clone the
            # dlpack view so the caller owns a writable tensor — JAX
            # arrays are immutable by contract and its runtime may cache/
            # alias the host buffer, so handing out a writable view would
            # let an in-place torch op corrupt the JAX array
            host = jax.device_put(x, cpu)
            host.block_until_ready()
            return torch.from_dlpack(host).clone()
        except Exception:                            # pragma: no cover
            pass
    arr = np.asarray(x.astype(jnp.float32) if x.dtype == jnp.bfloat16
                     else x)                         # pragma: no cover
    return torch.from_numpy(np.ascontiguousarray(arr))


class DeviceCache:
    """Keeps a paged KV pool (and codebooks) resident on the TPU across
    torch-side decode steps, so per-step traffic is queries + tables only.
    """

    def __init__(self, kv_pages, l1_cent=None, block_ids=None):
        _require_torch()
        self.kv_pages = _to_jax(kv_pages)
        self.l1_cent = _to_jax(l1_cent) if l1_cent is not None else None
        self.block_ids = (_to_jax(block_ids)
                          if block_ids is not None else None)


def _tree_to_jax(kwargs):
    return {k: (_to_jax(v) if torch is not None
                and isinstance(v, torch.Tensor) else v)
            for k, v in kwargs.items()}


def compute_cent(query, l1_cent, **kw):
    _require_torch()
    return _to_torch(api.compute_cent(_to_jax(query), _to_jax(l1_cent),
                                      **_tree_to_jax(kw)))


def select_position(block_ids, block_table, seq_len, indices, **kw):
    _require_torch()
    pos, lens = api.select_position(
        _to_jax(block_ids), _to_jax(block_table), _to_jax(seq_len),
        _to_jax(indices), **_tree_to_jax(kw))
    return _to_torch(pos), _to_torch(lens)


def cent_select(query, l1_cent, block_ids, block_table, seq_len, **kw):
    _require_torch()
    out = api.cent_select(
        _to_jax(query), _to_jax(l1_cent), _to_jax(block_ids),
        _to_jax(block_table), _to_jax(seq_len), **_tree_to_jax(kw))
    return tuple(_to_torch(x) for x in out)


def incre_flash_attention(query, key, value=None, **kw):
    _require_torch()
    res = api.incre_flash_attention(
        _to_jax(query), _to_jax(key),
        _to_jax(value) if value is not None else None, **_tree_to_jax(kw))
    return _to_torch(res)


def sparse_paged_attention(query, key, value=None, **kw):
    _require_torch()
    res = api.sparse_paged_attention(
        _to_jax(query), _to_jax(key),
        _to_jax(value) if value is not None else None, **_tree_to_jax(kw))
    return _to_torch(res)


def sparse_paged_fusion_attention(query, key=None, value=None, *,
                                  cache: DeviceCache | None = None, **kw):
    """Flagship fused op; pass ``cache=DeviceCache(...)`` to avoid
    re-uploading the KV pool / codebooks every step."""
    _require_torch()
    if cache is not None:
        kv, kw2 = cache.kv_pages, dict(kw)
        kw2.setdefault("l1_cent", cache.l1_cent)
        kw2.setdefault("block_ids", cache.block_ids)
    else:
        kv, kw2 = _to_jax(key), dict(kw)
    out, pos, max_len = api.sparse_paged_fusion_attention(
        _to_jax(query), kv,
        _to_jax(value) if value is not None else None, **_tree_to_jax(kw2))
    return _to_torch(out), _to_torch(pos), _to_torch(max_len)
