"""Device mesh construction and parameter/cache shardings.

The reference builds NCCL process groups ``_TP,_PP,_DP,_EP,_SP,_SP_TP``
(reference ``ulysses.py:95-295``); here the same product layout is one
``jax.sharding.Mesh`` with named axes and the "groups" are just axis
tuples:

- tp         -> axis "tp"
- sp         -> axis "sp"
- sp_tp      -> the fused ("tp", "sp") tuple.  Axis ORDER matters: a
  weight stored sharded over "tp" can be re-sharded to ("tp", "sp") with
  a comm-free local slice (each sp peer takes a sub-slice of its tp
  shard), which is what makes shift parallelism cheap; and the KV cache
  head axis is sharded over ("tp", "sp") in BOTH modes, giving the
  KV-layout invariance the reference relies on
  (``docs/shift-parallel.rst:34-36``).
- dp         -> axis "dp" (engine replicas; batch-sharded)
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from arcticinference_tpu.config import ParallelConfig

SP_TP = ("tp", "sp")  # fused tensor-parallel axis used in shift mode


def build_mesh(cfg: ParallelConfig,
               devices: Optional[list] = None) -> Mesh:
    if devices is None:
        devices = jax.devices()
    need = cfg.world_size
    if len(devices) < need:
        raise ValueError(
            f"parallel config needs {need} devices, have {len(devices)}")
    devs = np.asarray(devices[:need]).reshape(
        cfg.data_parallel_size,
        cfg.pipeline_parallel_size,
        cfg.ulysses_sequence_parallel_size,
        cfg.tensor_parallel_size)
    return Mesh(devs, ("dp", "pp", "sp", "tp"))


def param_specs(quantized: bool = False, pp: bool = False) -> dict:
    """PartitionSpecs for the Llama parameter pytree (weights stored
    tp-sharded, replicated over sp — the SP-mode layout).  With ``pp``
    the stacked layer axis shards over the pipeline axis (each stage
    holds its own layers; embed/final_norm/lm_head replicated)."""
    l_ax = "pp" if pp else None
    col = P(l_ax, None, "tp")      # [L, in, out] -> shard out
    row = P(l_ax, "tp", None)      # [L, in, out] -> shard in
    specs = {
        "embed": P(None, None),
        "final_norm": P(None),
        "lm_head": P(None, "tp"),
        "layers": {
            "input_norm": P(l_ax, None),
            "post_norm": P(l_ax, None),
            "wq": col, "wk": col, "wv": col,
            "wo": row,
            "w_gate": col, "w_up": col,
            "w_down": row,
            # Fused decode layout (models/llama.py fuse_params; only
            # built when tp == 1, where "tp" col-sharding is trivial):
            "wqkv": col, "w_gateup": col, "bqkv": P(l_ax, "tp"),
            # Family variants (pruned to the actual param structure by
            # shard_params / _param_spec_tree when absent):
            "bq": P(l_ax, "tp"), "bk": P(l_ax, "tp"), "bv": P(l_ax, "tp"),
            "q_norm": P(l_ax, None), "k_norm": P(l_ax, None),
        },
    }
    return specs


#: layer-dict keys that only some model variants carry (Qwen2 biases,
#: Qwen3 qk norms); spec builders drop them when params lack them.
OPTIONAL_LAYER_KEYS = ("bq", "bk", "bv", "q_norm", "k_norm",
                       "wqkv", "w_gateup", "bqkv")


def quantized_leaf_spec(spec: P, w_ndim: Optional[int] = None,
                        s_ndim: Optional[int] = None) -> tuple:
    """A QuantizedLinear leaf flattens to (weight, scale).

    The scale spec derives from the weight spec + the scale's rank
    (granularity is encoded purely in rank, see ``ops/fp8.py``):
    - group scales (``s_ndim == w_ndim``, ``[.., in/g, out]``): the
      group axis inherits the in-axis sharding -> same spec;
    - per-out-channel (``s_ndim == w_ndim - 1``): weight spec minus its
      in-axis entry (axis -2);
    - per-layer/per-tensor: replicated, except the stacked layer axis
      follows the weight's pp sharding.
    """
    if w_ndim is not None and s_ndim is not None and len(spec) == w_ndim:
        if s_ndim == w_ndim:
            return (spec, spec)
        if s_ndim == w_ndim - 1:
            return (spec, P(*(spec[:-2] + (spec[-1],))))
    if len(spec) and spec[0] == "pp":
        return (spec, P("pp"))
    return (spec, P())  # P() replicates any rank (incl. scalar scales)


def shard_params(params, mesh: Mesh, specs: Optional[dict] = None):
    """Place a parameter pytree onto the mesh with the SP-mode layout."""
    from arcticinference_tpu.ops.fp8 import QuantizedLinear

    if specs is None:
        specs = param_specs()
    def prune(s, p):
        """Drop spec entries for absent optional params (tied lm_head,
        variant layer keys) at every dict level; error on params that
        have no spec."""
        if isinstance(s, dict) and isinstance(p, dict):
            missing = set(p) - set(s)
            if missing:
                raise ValueError(f"no PartitionSpec for params {missing}")
            return {k: prune(s[k], p[k]) for k in p}
        return s

    specs = prune(specs, params)

    def put(x, spec):
        try:
            return jax.device_put(x, NamedSharding(mesh, spec))
        except ValueError:
            # Dim not divisible by the axis (e.g. tiny test vocab):
            # fall back to replication for this leaf.
            return jax.device_put(
                x, NamedSharding(mesh, P(*([None] * x.ndim))))

    def place(leaf, spec):
        if isinstance(leaf, QuantizedLinear):
            wspec, sspec = quantized_leaf_spec(
                spec, leaf.weight.ndim, leaf.scale.ndim)
            return QuantizedLinear(put(leaf.weight, wspec),
                                   put(leaf.scale, sspec))
        return put(leaf, spec)

    return jax.tree.map(
        place, params, specs,
        is_leaf=lambda x: isinstance(x, QuantizedLinear))


def kv_cache_spec(pp: bool = False, dp: bool = False) -> P:
    """KV cache [L, N, 2, Bs, Hkv*D]: head-feature axis sharded over the
    fused sp_tp axis — identical in SP and shift modes.  Under pipeline
    parallelism the layer axis shards over "pp" (each stage holds only
    its own layers' pages).  Under in-engine data parallelism the BLOCK
    axis shards over "dp": each dp group owns a private block space
    (block ids are shard-local), so the groups decode independent
    request sets with zero cross-group communication."""
    return P("pp" if pp else None, "dp" if dp else None, None, None,
             SP_TP)


def replicated_spec(ndim: int) -> P:
    return P(*([None] * ndim))
