"""In-environment drafter distillation (on-chip, optax).

The Arctic speculator's published speedups come from drafters distilled
offline against the target model (reference ``docs/arctic-speculator.rst``
trains MLP/LSTM speculators on target-model outputs; the checkpoints are
shipped, e.g. ``Snowflake/Arctic-LSTM-Speculator-*``).  This environment has
no checkpoint egress, so this module reproduces the *capability* end to end:

1. :func:`capture_pairs` — run the engine greedily over a prompt set with a
   hidden-state hook installed, collecting ``(hidden_t, x_{t+1},
   x_{t+2..t+1+K})`` tuples: exactly the supervision the drafter sees at
   inference time (``spec/proposer.py``: hidden of the last accepted token
   plus the token it emitted -> predict the next K tokens).
2. :func:`distill_mlp` — train the MLP speculator chain (teacher-forced
   cross-entropy per head) with optax Adam on device.  The drafter's
   embedding table and LM head are TIED to the target model's own (frozen,
   fp8 when the target is quantized), so only the per-head projections and
   layernorms train — the trained artifact is ~100 MB instead of ~2 GB and
   HBM holds the target + optimizer comfortably.
3. :func:`save_distilled` / proposer loading — writes a safetensors
   checkpoint with ``distilled_tied: true`` in its config.json;
   ``ArcticProposer`` resolves the tied tables from the live target params.

The drafter trained this way reproduces the reference's headline speedup
mechanism (multi-token drafts verified in one target pass) with measured,
non-zero acceptance — see ``benchmarks/distill_drafter.py`` and bench.py.
"""

from __future__ import annotations

import json
import logging
import math
from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from arcticinference_tpu.models import speculators as spec_mod
from arcticinference_tpu.models.speculators import (MLPSpecArch, SQRT2,
                                                    _embed, _mm,
                                                    _mlp_head_params)
from arcticinference_tpu.ops.layers import l2_norm_scaled

logger = logging.getLogger("arcticinference_tpu")


# --------------------------------------------------------------------- #
# Capture: engine hook + driver
# --------------------------------------------------------------------- #

class HiddenCapture:
    """Engine hook recording (hidden row, emitted token) per request/step.

    Install as ``engine.hidden_capture``; the synchronous step loop calls
    it with the step's sample-row hidden block and the per-request commit
    list.  Greedy, no-spec decoding emits exactly one token per request
    per step, so each call appends one (hidden, token) pair per request.
    """

    def __init__(self):
        self.seqs: dict[str, tuple[list, list]] = {}

    def __call__(self, rows, items) -> None:
        rows_np = None
        for req_id, row_idx, token in items:
            if rows_np is None:
                rows_np = np.asarray(rows)
            h_list, t_list = self.seqs.setdefault(req_id, ([], []))
            h_list.append(np.asarray(rows_np[row_idx]))
            t_list.append(int(token))

    def pairs(self, n_predict: int):
        """Flatten captured trajectories into training arrays.

        Returns (hidden [N, D], tok0 [N], targets [N, K], mask [N, K]):
        hidden/tok0 are the drafter inputs; targets are the next-K tokens
        the target model actually emitted (mask 0 past each trajectory's
        end).
        """
        hs, t0s, tgts, masks = [], [], [], []
        for h_list, t_list in self.seqs.values():
            n = len(t_list)
            for i in range(n - 1):
                hs.append(h_list[i])
                t0s.append(t_list[i])
                tgt = t_list[i + 1:i + 1 + n_predict]
                m = [1.0] * len(tgt)
                while len(tgt) < n_predict:
                    tgt.append(0)
                    m.append(0.0)
                tgts.append(tgt)
                masks.append(m)
        if not hs:
            raise ValueError("no pairs captured")
        return (np.stack(hs), np.asarray(t0s, np.int32),
                np.asarray(tgts, np.int32), np.asarray(masks, np.float32))


def capture_pairs(llm, prompt_token_ids, gen_len: int, n_predict: int):
    """Run greedy decoding over ``prompt_token_ids`` capturing supervision
    pairs.  The LLM must run the synchronous step loop
    (``async_scheduling=False``).

    Capture works in two engine configurations:

    - no spec config: plain greedy decode, one pair per request per step;
    - a speculative config (**spec-shaped capture**): every step runs
      verify-shaped programs (K+1 rows per request; the fused loop when
      enabled), and each committed token pairs with its verify row's
      hidden.  This is the configuration the spec bench measures, and on
      a random-weight target it is the only capture that transfers:
      greedy argmax at 128k vocab flips under any program-shape change
      (different t_pad buckets, prefix-cache prefill, fused-loop fusion),
      so the trajectory — hence the drafter's acceptance — only
      reproduces under the exact programs it was captured from.
      Disable prefix caching in both runs for the same reason.
    """
    from arcticinference_tpu.engine.request import SamplingParams

    eng = llm.engine
    assert not eng._pipeline, "capture needs async_scheduling=False"
    cap = HiddenCapture()
    eng.hidden_capture = cap
    try:
        llm.generate(prompt_token_ids=prompt_token_ids,
                     sampling_params=SamplingParams(max_tokens=gen_len,
                                                    ignore_eos=True))
    finally:
        eng.hidden_capture = None
    return cap.pairs(n_predict)


# --------------------------------------------------------------------- #
# Training
# --------------------------------------------------------------------- #

def _tied_tables(target_params):
    """The target model's (embedding, lm_head) leaves, used frozen."""
    head = target_params.get("lm_head")
    if head is None:
        raise ValueError(
            "distilled_tied drafters need an untied target lm_head "
            "(tie_word_embeddings models would require a transposed "
            "gather of the shared table)")
    return target_params["embed"], head


def _chain_logits(params, arch: MLPSpecArch, hidden, tok0, targets):
    """Teacher-forced drafter chain; yields per-head fp32 logits."""
    state = hidden.astype(jnp.float32)
    if arch.scale_input:
        state = l2_norm_scaled(state, None, None) / SQRT2
    tok = tok0
    alpha = arch.emb_weight / arch.state_weight
    out = []
    for i in range(arch.n_predict):
        e, p, h, lw, lb = _mlp_head_params(params, arch, i)
        z = _embed(e, tok)
        states = _mm(state, p) + alpha * z
        states = jax.nn.gelu(
            l2_norm_scaled(states, lw, lb).astype(jnp.float32),
            approximate=False)
        out.append(_mm(states, h))
        tok = targets[:, i]          # teacher forcing
        state = states
    return out


def distill_mlp(target_params, hidden, tok0, targets, mask,
                n_predict: int = 3, steps: int = 400,
                batch_size: int = 1024, lr: float = 1e-3,
                seed: int = 0, log_every: int = 100):
    """Train a tied-table MLP drafter to predict the target's next-K
    tokens from its hidden states.

    Returns ``(params, arch, per_head_accuracy)`` where params is the
    inference pytree (fp32 projections; embedding/head are references to
    the target model's own tables).
    """
    import optax

    emb_t, head_t = _tied_tables(target_params)
    d = hidden.shape[1]
    vocab = (head_t.weight.shape[-1] if hasattr(head_t, "weight")
             else head_t.shape[-1])
    arch = MLPSpecArch(vocab_size=int(vocab), emb_dim=int(d),
                       inner_dim=int(d), n_predict=n_predict,
                       tie_weights=False, scale_input=True)

    rng = jax.random.PRNGKey(seed)
    ks = jax.random.split(rng, n_predict + 1)

    def w(key, shape):
        return jax.random.normal(key, shape, jnp.float32) / math.sqrt(
            shape[0])

    train = {
        "proj": [w(ks[i], (d, d)) for i in range(n_predict)],
        "ln_w": [jnp.ones((d,), jnp.float32) for _ in range(n_predict)],
        "ln_b": [jnp.zeros((d,), jnp.float32) for _ in range(n_predict)],
    }
    # The frozen target tables (and the dataset) must be jit ARGUMENTS,
    # never closed-over: captured arrays become inline HLO constants, and
    # a program carrying ~1 GB of fp8 table constants breaks remote
    # compile services (and bloats every cache entry).
    frozen = {"emb": emb_t, "head": head_t}

    def full_params(train, frozen):
        return {"emb": [frozen["emb"]] * n_predict,
                "head": [frozen["head"]] * n_predict, **train}

    n = hidden.shape[0]
    batch_size = min(batch_size, n)
    hidden_d = jax.device_put(hidden)
    tok0_d = jax.device_put(tok0)
    targets_d = jax.device_put(targets)
    mask_d = jax.device_put(mask)

    opt = optax.adam(lr)
    opt_state = opt.init(train)

    def loss_fn(train, frozen, h, t0, tgt, m):
        logits = _chain_logits(full_params(train, frozen), arch, h, t0,
                               tgt)
        total = 0.0
        for i, lg in enumerate(logits):
            lse = jax.scipy.special.logsumexp(lg, axis=-1)
            ce = lse - jnp.take_along_axis(
                lg, tgt[:, i][:, None], axis=1)[:, 0]
            total = total + jnp.sum(ce * m[:, i]) / jnp.maximum(
                jnp.sum(m[:, i]), 1.0)
        return total

    @jax.jit
    def train_step(train, opt_state, key, frozen, hd, td, tg, mk):
        idx = jax.random.randint(key, (batch_size,), 0, n)
        h, t0 = hd[idx], td[idx]
        tgt, m = tg[idx], mk[idx]
        loss, grads = jax.value_and_grad(loss_fn)(train, frozen, h, t0,
                                                  tgt, m)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(train, updates), opt_state, loss

    @jax.jit
    def eval_acc(train, frozen, h, t0, tgt, m):
        logits = _chain_logits(full_params(train, frozen), arch, h, t0,
                               tgt)
        accs = []
        for i, lg in enumerate(logits):
            pred = jnp.argmax(lg, axis=-1).astype(jnp.int32)
            accs.append(jnp.sum((pred == tgt[:, i]) * m[:, i])
                        / jnp.maximum(jnp.sum(m[:, i]), 1.0))
        return jnp.stack(accs)

    key = jax.random.PRNGKey(seed + 1)
    for step in range(steps):
        key, sub = jax.random.split(key)
        train, opt_state, loss = train_step(
            train, opt_state, sub, frozen, hidden_d, tok0_d, targets_d,
            mask_d)
        if log_every and (step + 1) % log_every == 0:
            logger.info("distill step %d: loss %.4f", step + 1,
                        float(loss))

    # Full-set accuracy, evaluated in eval-sized chunks.
    accs = np.zeros(n_predict, np.float64)
    wsum = np.zeros(n_predict, np.float64)
    for lo in range(0, n, batch_size):
        hi = min(lo + batch_size, n)
        if hi - lo < batch_size:      # reuse the compiled shape
            lo = max(0, hi - batch_size)
        a = np.asarray(eval_acc(train, frozen, hidden_d[lo:hi],
                                tok0_d[lo:hi], targets_d[lo:hi],
                                mask_d[lo:hi]))
        msum = np.asarray(mask[lo:hi].sum(0))
        accs += a * msum
        wsum += msum
    per_head = accs / np.maximum(wsum, 1.0)
    logger.info("distill done: per-head accuracy %s",
                np.round(per_head, 4).tolist())
    return full_params(train, frozen), arch, per_head


def _lstm_chain_logits(params, arch, hidden, tok0, targets):
    """Teacher-forced sum_lstm chain (mirrors
    ``speculators.lstm_generate_proposals`` with the argmax feedback
    replaced by the target's next token); yields per-head fp32 logits."""
    b = hidden.shape[0]
    p0 = arch.proj_dim[0]
    state = hidden.astype(jnp.float32)
    if arch.scale_input:
        state = l2_norm_scaled(state, None, None) / SQRT2
    cell = jnp.zeros((b, arch.inner_dim[0]), jnp.float32)
    tok = tok0
    alpha = arch.emb_weight / arch.state_weight
    out = []
    for i in range(arch.n_predict):
        proj = params["proj_first"] if i == 0 else params["proj_rest"]
        z = _embed(params["forget_emb"], tok)
        z4 = jnp.tile(z, (1, 4))
        states = _mm(state, proj) + alpha * z4
        gates, cand = states[:, :3 * p0], states[:, 3 * p0:]
        gates = jax.nn.sigmoid(gates)
        fg, ig, og = (gates[:, :p0], gates[:, p0:2 * p0],
                      gates[:, 2 * p0:])
        cand = jax.nn.gelu(
            l2_norm_scaled(cand, params["cell_ln_w"],
                           params["cell_ln_b"]).astype(jnp.float32),
            approximate=False) * ig
        cell = cell * fg + cand
        state = jax.nn.gelu(
            l2_norm_scaled(cell, params["state_ln_w"],
                           params["state_ln_b"]).astype(jnp.float32),
            approximate=False) * og
        out.append(_mm(state, params["head"]))
        tok = targets[:, i]          # teacher forcing
    return out


def distill_lstm(hidden_dim: int, vocab_size: int, hidden, tok0, targets,
                 mask, n_predict: int = 3, steps: int = 400,
                 batch_size: int = 1024, lr: float = 1e-3, seed: int = 0,
                 log_every: int = 100):
    """Train a full ``sum_lstm`` drafter (the reference's second
    speculator architecture, ``arctic_speculator.py:404-470``) on
    captured (hidden, next-K) pairs.

    Unlike :func:`distill_mlp` the LSTM trains its own embedding and
    head (the sum_lstm cell consumes a 4x-tiled forget embedding that
    has no tied-table analogue); intended for small-vocab teachers
    (benchmarks/transfer_drafter.py --kind lstm).  Returns
    ``(params, LSTMSpecArch, per_head_accuracy)`` in the inference
    pytree layout of ``speculators.lstm_generate_proposals``.
    """
    import optax

    from arcticinference_tpu.models.speculators import LSTMSpecArch

    d = int(hidden_dim)
    # emb_dim == proj_dim: the cell consumes the forget embedding tiled
    # 4x against the [b, 4*p0] gate projection (lstm_generate_proposals).
    arch = LSTMSpecArch(vocab_size=int(vocab_size), input_hidden_dim=d,
                        emb_dim=(d,), inner_dim=(d,), proj_dim=(d,),
                        n_predict=n_predict)
    rng = jax.random.PRNGKey(seed)
    ks = iter(jax.random.split(rng, 8))

    def w(shape):
        return jax.random.normal(next(ks), shape, jnp.float32) \
            / math.sqrt(shape[0])

    train = {
        "forget_emb": w((arch.vocab_size, arch.emb_dim[0])),
        "proj_first": w((d, d * 4)),
        "proj_rest": w((d, d * 4)),
        "cell_ln_w": jnp.ones((d,), jnp.float32),
        "cell_ln_b": jnp.zeros((d,), jnp.float32),
        "state_ln_w": jnp.ones((d,), jnp.float32),
        "state_ln_b": jnp.zeros((d,), jnp.float32),
        "head": w((d, arch.vocab_size)),
    }

    n = hidden.shape[0]
    batch_size = min(batch_size, n)
    data = tuple(jax.device_put(x)
                 for x in (hidden, tok0, targets, mask))

    opt = optax.adam(lr)
    opt_state = opt.init(train)

    def loss_fn(train, h, t0, tgt, m):
        logits = _lstm_chain_logits(train, arch, h, t0, tgt)
        total = 0.0
        for i, lg in enumerate(logits):
            lse = jax.scipy.special.logsumexp(lg, axis=-1)
            ce = lse - jnp.take_along_axis(
                lg, tgt[:, i][:, None], axis=1)[:, 0]
            total = total + jnp.sum(ce * m[:, i]) / jnp.maximum(
                jnp.sum(m[:, i]), 1.0)
        return total

    @jax.jit
    def train_step(train, opt_state, key, hd, td, tg, mk):
        idx = jax.random.randint(key, (batch_size,), 0, n)
        loss, grads = jax.value_and_grad(loss_fn)(
            train, hd[idx], td[idx], tg[idx], mk[idx])
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(train, updates), opt_state, loss

    @jax.jit
    def eval_acc(train, h, t0, tgt, m):
        logits = _lstm_chain_logits(train, arch, h, t0, tgt)
        return jnp.stack([
            jnp.sum((jnp.argmax(lg, axis=-1).astype(jnp.int32)
                     == tgt[:, i]) * m[:, i])
            / jnp.maximum(jnp.sum(m[:, i]), 1.0)
            for i, lg in enumerate(logits)])

    key = jax.random.PRNGKey(seed + 1)
    for step in range(steps):
        key, sub = jax.random.split(key)
        train, opt_state, loss = train_step(train, opt_state, sub, *data)
        if log_every and (step + 1) % log_every == 0:
            logger.info("lstm distill step %d: loss %.4f", step + 1,
                        float(loss))

    accs = np.zeros(n_predict, np.float64)
    wsum = np.zeros(n_predict, np.float64)
    for lo in range(0, n, batch_size):
        hi = min(lo + batch_size, n)
        if hi - lo < batch_size:
            lo = max(0, hi - batch_size)
        a = np.asarray(eval_acc(train, data[0][lo:hi], data[1][lo:hi],
                                data[2][lo:hi], data[3][lo:hi]))
        msum = np.asarray(mask[lo:hi].sum(0))
        accs += a * msum
        wsum += msum
    per_head = accs / np.maximum(wsum, 1.0)
    logger.info("lstm distill done: per-head accuracy %s",
                np.round(per_head, 4).tolist())
    return train, arch, per_head


def save_lstm(out_dir, params: dict, arch, metrics: Optional[dict] = None
              ) -> None:
    """Write a trained sum_lstm drafter in the HF-style key layout
    ``speculators.load_lstm_state`` expects (projs transposed back)."""
    from safetensors.numpy import save_file

    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    def t(x):
        # safetensors writes the raw buffer: a transposed VIEW would be
        # saved with its pre-transpose layout (silently scrambling the
        # matrix); force a contiguous copy of the transposed data.
        return np.ascontiguousarray(np.asarray(x).T)

    tensors = {
        "forget_emb.0.weight": np.asarray(params["forget_emb"]),
        "projs.0.weight": t(params["proj_first"]),
        "projs.1.weight": t(params["proj_rest"]),
        "cell_ln.0.weight": np.asarray(params["cell_ln_w"]),
        "cell_ln.0.bias": np.asarray(params["cell_ln_b"]),
        "state_ln.0.weight": np.asarray(params["state_ln_w"]),
        "state_ln.0.bias": np.asarray(params["state_ln_b"]),
        "head.0.weight": t(params["head"]),
    }
    save_file(tensors, str(out / "model.safetensors"))
    cfg = {
        "method": "sum_lstm",
        "architectures": ["ArcticLSTMSpeculator"],
        "n_predict": arch.n_predict,
        "input_hidden_dim": arch.input_hidden_dim,
        "emb_dim": list(arch.emb_dim),
        "inner_dim": list(arch.inner_dim),
        "proj_dim": list(arch.proj_dim),
        "vocab_size": arch.vocab_size,
        "tie_weights": True,
        "tie_lstm_embs": True,
        "scale_input": arch.scale_input,
    }
    if metrics:
        cfg["distill_metrics"] = metrics
    (out / "config.json").write_text(json.dumps(cfg, indent=2))


# --------------------------------------------------------------------- #
# Checkpoint format ("distilled_tied")
# --------------------------------------------------------------------- #

def init_tied_drafter(target_params, n_predict: int = 3,
                      seed: int = 0) -> tuple:
    """Random tied-table drafter with the *distilled* architecture.

    Spec-shaped capture runs the engine with this drafter so the fused
    program compiled during capture is byte-identical to the one the
    trained drafter runs at bench time — a different drafter graph could
    shift XLA fusion and, on a random-weight target, flip greedy argmax
    enough to derail the memorised trajectory.  Only the weights differ
    (jit arguments, not compile-time structure).

    ``target_params`` may be the target pytree or a plain
    ``(hidden_size, vocab_size)`` tuple (shapes are all that is used).
    """
    if isinstance(target_params, tuple):
        d, vocab = target_params
    else:
        emb_t, head_t = _tied_tables(target_params)
        d = (emb_t.weight.shape[-1] if hasattr(emb_t, "weight")
             else emb_t.shape[-1])
        vocab = (head_t.weight.shape[-1] if hasattr(head_t, "weight")
                 else head_t.shape[-1])
    arch = MLPSpecArch(vocab_size=int(vocab), emb_dim=int(d),
                       inner_dim=int(d), n_predict=n_predict,
                       tie_weights=False, scale_input=True)
    ks = jax.random.split(jax.random.PRNGKey(seed), n_predict)
    params = {
        "proj": [jax.random.normal(ks[i], (d, d), jnp.float32)
                 / math.sqrt(d) for i in range(n_predict)],
        "ln_w": [jnp.ones((d,), jnp.float32) for _ in range(n_predict)],
        "ln_b": [jnp.zeros((d,), jnp.float32) for _ in range(n_predict)],
    }
    return params, arch


def save_distilled(out_dir, params: dict, arch: MLPSpecArch,
                   metrics: Optional[dict] = None) -> None:
    """Write the trained projections + config; tables stay tied."""
    from safetensors.numpy import save_file

    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    tensors = {}
    for i in range(arch.n_predict):
        tensors[f"proj.{i}.weight"] = np.asarray(params["proj"][i])
        tensors[f"ln.{i}.weight"] = np.asarray(params["ln_w"][i])
        tensors[f"ln.{i}.bias"] = np.asarray(params["ln_b"][i])
    save_file(tensors, str(out / "model.safetensors"))
    cfg = {
        "method": "sum_rnn",
        "architectures": ["ArcticMLPSpeculatorDistilled"],
        "distilled_tied": True,
        "n_predict": arch.n_predict,
        "emb_dim": arch.emb_dim,
        "inner_dim": arch.inner_dim,
        "vocab_size": arch.vocab_size,
        "tie_weights": False,
        "scale_input": arch.scale_input,
    }
    if metrics:
        cfg["distill_metrics"] = metrics
    (out / "config.json").write_text(json.dumps(cfg, indent=2))


def load_distilled(model_dir, cfg: dict, target_params) -> tuple:
    """Load a distilled_tied checkpoint; returns (params, MLPSpecArch)."""
    from safetensors import safe_open

    emb_t, head_t = _tied_tables(target_params)
    arch = MLPSpecArch.from_hf_config(cfg)
    n = arch.n_predict
    tensors = {}
    f = Path(model_dir) / "model.safetensors"
    with safe_open(str(f), framework="numpy") as st:
        for name in st.keys():
            tensors[name] = st.get_tensor(name)
    params = {
        "emb": [emb_t] * n,
        "head": [head_t] * n,
        "proj": [jnp.asarray(tensors[f"proj.{i}.weight"])
                 for i in range(n)],
        "ln_w": [jnp.asarray(tensors[f"ln.{i}.weight"])
                 for i in range(n)],
        "ln_b": [jnp.asarray(tensors[f"ln.{i}.bias"])
                 for i in range(n)],
    }
    return params, arch
