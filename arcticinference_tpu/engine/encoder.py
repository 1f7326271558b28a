"""Encoder runner: batched one-shot embedding forward with shape buckets.

The decode engine's paged machinery is dead weight for encoders, so
``LLM`` routes encoder architectures (``module.IS_ENCODER``) here
instead of ``LLMEngine``.  Shapes are bucketed (pow2 batch, pow2 token
length) so a serving fleet sees a handful of compiles, then pure
steady-state MXU work; pooling runs on device so only ``[B, D]`` comes
back over PCIe (reference behaviour: vLLM encode mode returns pooled
embeddings, ``embedding/replica.py:213-237``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from arcticinference_tpu.config import EngineConfig
from arcticinference_tpu.models.loader import load_model, resolve_dtype


def _bucket(n: int, lo: int, hi: int) -> int:
    b = lo
    while b < n:
        b *= 2
    return min(b, hi)


class EncoderRunner:

    def __init__(self, config: EngineConfig):
        self.config = config
        self.module, self.arch, self.params = load_model(config.model)
        self.max_len = min(config.model.max_model_len,
                           getattr(self.arch, "max_position_embeddings",
                                   config.model.max_model_len))
        self.max_batch = config.scheduler.max_num_seqs
        self._fns: dict = {}

    # -- compiled encode per (pooling, normalize) ------------------------

    def _get_fn(self, pooling: str, normalize: bool):
        key = (pooling, normalize)
        fn = self._fns.get(key)
        if fn is None:
            module, arch = self.module, self.arch

            @functools.partial(jax.jit, static_argnums=())
            def run(params, ids, mask):
                h = module.forward(params, arch,
                                   {"input_ids": ids,
                                    "attention_mask": mask})
                return module.pool(h, mask, method=pooling,
                                   normalize=normalize)

            fn = run
            self._fns[key] = fn
        return fn

    # -- public ----------------------------------------------------------

    def encode(self, prompt_token_ids, pooling: str = "mean",
               normalize: bool = True) -> list[np.ndarray]:
        out: list[np.ndarray] = []
        budget = self.config.scheduler.max_num_batched_tokens
        batch: list[list[int]] = []
        total = 0
        for ids in prompt_token_ids:
            ids = list(ids)[: self.max_len]
            cost = _bucket(max(len(ids), 1), 16, self.max_len)
            if batch and (total + cost > budget
                          or len(batch) >= self.max_batch):
                out.extend(self._run_batch(batch, pooling, normalize))
                batch, total = [], 0
            batch.append(ids)
            total += cost
        if batch:
            out.extend(self._run_batch(batch, pooling, normalize))
        return out

    def _run_batch(self, batch, pooling, normalize):
        n = len(batch)
        t = _bucket(max(len(x) for x in batch), 16, self.max_len)
        b = _bucket(n, 1, self.max_batch)
        ids = np.full((b, t), self.arch.pad_token_id, np.int32)
        mask = np.zeros((b, t), np.int32)
        for i, x in enumerate(batch):
            ids[i, : len(x)] = x
            mask[i, : len(x)] = 1
        fn = self._get_fn(pooling, normalize)
        pooled = np.asarray(fn(self.params, jnp.asarray(ids),
                               jnp.asarray(mask)))
        return [pooled[i] for i in range(n)]
