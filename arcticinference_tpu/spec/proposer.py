"""ArcticProposer: host driver for the MLP/LSTM draft models.

Mirror of reference ``vllm/spec_dec/arctic_proposer.py``: holds the
speculator, gathers the hidden state of each request's last ACCEPTED token
(the reference's ``prepare_hidden_states``, ``arctic_proposer.py:113-147``
— here the engine hands us the accepted row index directly since
verification happens on host), and runs the jitted greedy chain to emit
``n_predict`` draft tokens per request.
"""

from __future__ import annotations

import functools
import json
from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from arcticinference_tpu.config import SpeculativeConfig
from arcticinference_tpu.models import speculators as spec_mod
from arcticinference_tpu.utils import pad_to_bucket


class ArcticProposer:

    def __init__(self, spec_config: SpeculativeConfig, base_arch,
                 rng: Optional[jax.Array] = None, target_params=None):
        self.config = spec_config
        hidden = base_arch.hidden_size
        cfg_dict = self._load_config(spec_config.model)
        method = (cfg_dict or {}).get("method", "sum_rnn")
        archs = (cfg_dict or {}).get("architectures") or []
        is_lstm = method == "sum_lstm" or any("LSTM" in a for a in archs)

        if (cfg_dict or {}).get("distilled_tied"):
            # In-env distilled drafter (spec/distill.py): the projection
            # weights come from the checkpoint; embedding + LM head are
            # the TARGET model's own tables, resolved live.
            if target_params is None:
                raise ValueError(
                    "distilled_tied drafter needs the target params")
            from arcticinference_tpu.spec.distill import load_distilled
            self.kind = "mlp"
            self.params, self.arch = load_distilled(
                spec_config.model, cfg_dict, target_params)
            self.n_predict = min(self.arch.n_predict,
                                 spec_config.num_speculative_tokens)
            self._jitted = {}
            return

        if is_lstm:
            self.kind = "lstm"
            base = dict(cfg_dict or {})
            base.setdefault("input_hidden_dim", hidden)
            base.setdefault("vocab_size", base_arch.vocab_size)
            base.setdefault("n_predict",
                            spec_config.num_speculative_tokens)
            self.arch = spec_mod.LSTMSpecArch.from_hf_config(base)
        else:
            self.kind = "mlp"
            base = dict(cfg_dict or {})
            base.setdefault("emb_dim", hidden)
            base.setdefault("vocab_size", base_arch.vocab_size)
            base.setdefault("n_predict",
                            spec_config.num_speculative_tokens)
            self.arch = spec_mod.MLPSpecArch.from_hf_config(base)

        self.params = self._load_params(spec_config.model,
                                        rng or jax.random.PRNGKey(0))
        if spec_config.quantization:
            # Reference quantizes the speculator LM head + embeddings to
            # FP8 (vllm/spec_dec/fp8.py Fp8ConfigWithEmbedding).
            self.params = spec_mod.quantize_spec_params(
                self.params, spec_config.quantization)
        self.n_predict = min(self.arch.n_predict,
                             spec_config.num_speculative_tokens)
        self._jitted = {}

    # -- loading --------------------------------------------------------

    @staticmethod
    def _load_config(model: Optional[str]):
        if model is None:
            return None
        p = Path(model) / "config.json"
        if p.exists():
            return json.loads(p.read_text())
        return None

    def _load_params(self, model: Optional[str], rng):
        tensors = None
        if model is not None:
            d = Path(model)
            files = sorted(d.glob("*.safetensors")) if d.exists() else []
            if files:
                from safetensors import safe_open

                tensors = {}
                for f in files:
                    with safe_open(str(f), framework="numpy") as st:
                        for name in st.keys():
                            tensors[name] = st.get_tensor(name)
        if self.kind == "lstm":
            if tensors:
                return spec_mod.load_lstm_state(self.arch, tensors)
            return spec_mod.lstm_init_params(self.arch, rng)
        if tensors:
            return spec_mod.load_mlp_state(self.arch, tensors)
        return spec_mod.mlp_init_params(self.arch, rng)

    # -- proposing ------------------------------------------------------

    def _generate_fn(self, batch: int):
        fn = self._jitted.get(batch)
        if fn is None:
            gen = (spec_mod.lstm_generate_proposals if self.kind == "lstm"
                   else spec_mod.mlp_generate_proposals)
            fn = jax.jit(functools.partial(
                gen, arch=self.arch, num_predict=self.n_predict))
            self._jitted[batch] = fn
        return fn

    def propose(self, drafter_reqs, step_inputs, rows,
                accepted_row: dict[str, int], max_len_cap: int) -> None:
        """Fill ``req.spec_token_ids`` for each scheduled request.

        rows: device array [S_pad, hidden] of per-sample-row hidden states
        from the main model step; ``accepted_row[req_id]`` indexes the row
        of the last accepted token.
        """
        items = [(s.request, accepted_row[s.request.req_id])
                 for s in drafter_reqs
                 if s.request.req_id in accepted_row]
        if not items:
            return
        if getattr(rows, "is_fully_addressable", True) is False:
            # Multi-host: ``rows`` is a replicated global array (runner
            # compiles step outputs with replicated out_shardings).  The
            # drafter is tiny, so run it LEADER-LOCAL on this process's
            # replica copy — no cross-host program, nothing for the
            # follower mirror to replay; the drafts re-enter the mirrored
            # dispatch as ordinary step inputs next step.
            rows = rows.addressable_shards[0].data
        b = len(items)
        b_pad = pad_to_bucket(b, [8, 16, 32, 64, 128, 256, 512, 1024])
        idx = np.zeros(b_pad, np.int32)
        last_tok = np.zeros(b_pad, np.int32)
        for i, (req, row) in enumerate(items):
            idx[i] = row
            last_tok[i] = req.all_token_ids[-1]
        hidden = rows[jnp.asarray(idx)]
        fn = self._generate_fn(b_pad)
        drafts = np.asarray(fn(self.params,
                               last_tokens=jnp.asarray(last_tok),
                               hidden=hidden))
        for i, (req, _) in enumerate(items):
            cap = max_len_cap - req.num_tokens - 1
            if cap <= 0:
                continue
            req.spec_token_ids = [int(t) for t in drafts[i][:cap]]
