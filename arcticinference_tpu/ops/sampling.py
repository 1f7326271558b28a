"""Token sampling and speculative verification.

The reference delegates verification to vLLM's RejectionSampler (reference
``model_runner.py:383-412``).  Here both live as jittable jnp functions:

- :func:`sample` — greedy / temperature / top-k / top-p over a batch of
  logit rows with per-request parameters.
- :func:`verify_greedy` — greedy-accept speculative verification: accept
  the longest prefix of draft tokens matching the target argmax chain and
  emit the bonus token (the semantics vLLM's rejection sampler reduces to
  under greedy sampling, which is how the Arctic speculators are served).
- :func:`verify_stochastic` — Leviathan rejection sampling; exact for
  deterministic (one-hot) drafters, see its docstring for the residual
  caveat with stochastic drafters.

All functions are shape-static: the draft dimension is padded to
``max_spec_len`` and masked by ``num_draft``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NO_TOKEN = -1


def sample(logits: jax.Array, temperature: jax.Array, top_k: jax.Array,
           top_p: jax.Array, rng: jax.Array,
           min_p: jax.Array | None = None,
           seeds: jax.Array | None = None,
           counters: jax.Array | None = None) -> jax.Array:
    """Sample one token per row.

    logits: [N, V] fp32; temperature/top_k/top_p: [N] (temperature 0 =>
    greedy; top_k 0 => disabled; top_p 1 => disabled); rng: PRNG key.
    min_p: [N] (0 => disabled): drop tokens whose probability is below
    min_p * max-probability (after temperature), vLLM semantics.
    seeds/counters: [N] per-request seeded sampling — rows with seed >= 0
    draw from PRNGKey(seed) folded with the row's token position, so a
    request with a fixed seed reproduces its output regardless of how it
    was co-scheduled; rows with seed < 0 use the engine step key.
    Returns [N] int32.
    """
    n, v = logits.shape
    greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)

    # Temperature scale (guard zero).
    t = jnp.where(temperature > 0, temperature, 1.0)[:, None]
    scaled = logits / t

    # min-p mask: prob < min_p * max_prob (on the temperature-scaled
    # distribution) is filtered before top-k/top-p.
    if min_p is not None:
        probs = jax.nn.softmax(scaled, axis=-1)
        cutoff = min_p[:, None] * jnp.max(probs, axis=-1, keepdims=True)
        scaled = jnp.where((probs < cutoff) & (min_p[:, None] > 0),
                           -jnp.inf, scaled)

    # Top-k mask.
    sorted_desc = jnp.sort(scaled, axis=-1)[:, ::-1]
    k = jnp.where(top_k > 0, top_k, v).astype(jnp.int32)
    kth = jnp.take_along_axis(sorted_desc,
                              jnp.clip(k[:, None] - 1, 0, v - 1), axis=-1)
    scaled = jnp.where(scaled < kth, -jnp.inf, scaled)

    # Top-p (nucleus) mask over the sorted distribution.
    probs_sorted = jax.nn.softmax(sorted_desc, axis=-1)
    cum = jnp.cumsum(probs_sorted, axis=-1)
    # Keep tokens whose cumulative prob (exclusive) < top_p.
    cutoff_mask = (cum - probs_sorted) < top_p[:, None]
    # Find per-row threshold value: smallest logit still kept.
    thresh = jnp.min(jnp.where(cutoff_mask, sorted_desc, jnp.inf), axis=-1)
    scaled = jnp.where(scaled < thresh[:, None], -jnp.inf, scaled)

    if seeds is None:
        sampled = jax.random.categorical(rng, scaled,
                                         axis=-1).astype(jnp.int32)
    else:
        # Per-row keys via the Gumbel trick (categorical == argmax of
        # logits + Gumbel noise): seeded rows get a deterministic
        # per-(seed, position) stream, unseeded rows ride the step key.
        if counters is None:
            counters = jnp.zeros((n,), jnp.int32)

        def row_key(seed, counter, i):
            seeded = jax.random.fold_in(
                jax.random.fold_in(jax.random.PRNGKey(
                    jnp.maximum(seed, 0)), counter), 7)
            unseeded = jax.random.fold_in(rng, i)
            return jax.lax.select(seed >= 0, seeded, unseeded)

        keys = jax.vmap(row_key)(seeds, counters,
                                 jnp.arange(n, dtype=jnp.int32))
        gumbel = jax.vmap(
            lambda kk: jax.random.gumbel(kk, (v,), jnp.float32))(keys)
        sampled = jnp.argmax(scaled + gumbel, axis=-1).astype(jnp.int32)
    return jnp.where(temperature == 0, greedy, sampled)


def apply_penalties(logits: jax.Array, output_tokens: jax.Array,
                    all_tokens: jax.Array, repetition_penalty: jax.Array,
                    presence_penalty: jax.Array,
                    frequency_penalty: jax.Array) -> jax.Array:
    """Repetition / presence / frequency penalties (vLLM semantics, which
    the reference inherits from vLLM's sampler).

    logits: [N, V]; output_tokens: [N, Lo] this request's generated
    tokens (-1 padded); all_tokens: [N, La] prompt + generated (-1
    padded); penalties: [N] (repetition 1.0 / presence 0.0 / frequency
    0.0 => no-op).  Frequency/presence act on output counts; repetition
    divides positive (multiplies negative) logits of any token present in
    prompt or output.
    """
    n, v = logits.shape
    rows = jnp.arange(n, dtype=jnp.int32)[:, None]

    out_valid = output_tokens >= 0
    out_idx = jnp.clip(output_tokens, 0, v - 1)
    counts = jnp.zeros((n, v), jnp.float32).at[
        jnp.broadcast_to(rows, output_tokens.shape), out_idx].add(
        out_valid.astype(jnp.float32))

    all_valid = all_tokens >= 0
    all_idx = jnp.clip(all_tokens, 0, v - 1)
    seen = jnp.zeros((n, v), jnp.float32).at[
        jnp.broadcast_to(rows, all_tokens.shape), all_idx].max(
        all_valid.astype(jnp.float32))

    logits = logits - frequency_penalty[:, None] * counts
    logits = logits - presence_penalty[:, None] * (counts > 0)
    rp = repetition_penalty[:, None]
    penalized = jnp.where(logits > 0, logits / rp, logits * rp)
    return jnp.where(seen > 0, penalized, logits)


def apply_vocab_mask(logits: jax.Array, rows: jax.Array,
                     mask_words: jax.Array) -> jax.Array:
    """Grammar-guided vocab bitmask (xgrammar/outlines design; the
    reference inherits token-bitmask guided decoding from vLLM's
    backends).

    logits: [N, V]; rows: [G] sample-row indices (-1 = padding, dropped);
    mask_words: [G, W] packed little-endian bitmask (int32 bit i of word
    w = token ``32*w + i``), W*32 >= V.  Disallowed tokens' logits become
    dtype-min, so constrained argmax/top-k/top-p sampling is exact over
    the renormalised allowed set.
    """
    g, w = mask_words.shape
    v = logits.shape[-1]
    bits = (mask_words[:, :, None]
            >> jnp.arange(32, dtype=mask_words.dtype)) & 1
    allow = bits.reshape(g, w * 32)[:, :v] != 0
    safe = jnp.clip(rows, 0, logits.shape[0] - 1)
    cur = logits[safe]
    masked = jnp.where(allow, cur, jnp.finfo(logits.dtype).min)
    # -1 padding -> an explicit out-of-bounds scatter row (negative
    # indices would wrap; mode="drop" discards OOB rows).
    tgt = jnp.where(rows < 0, logits.shape[0], rows)
    return logits.at[tgt].set(masked, mode="drop")


def verify_greedy(
    draft_tokens: jax.Array,
    num_draft: jax.Array,
    target_argmax: jax.Array,
) -> tuple[jax.Array, jax.Array]:
    """Greedy-accept verification.

    draft_tokens: [B, K] (padded with anything); num_draft: [B] how many
    drafts each row actually has; target_argmax: [B, K+1] the target
    model's argmax at each draft position (row j = argmax of logits after
    consuming j drafts; position 0 is the argmax following the last
    verified token).

    Returns (out_tokens [B, K+1] int32 padded with NO_TOKEN, num_out [B]).
    Accepted drafts are the longest prefix with draft[j] == argmax[j];
    output = accepted drafts + one bonus token (argmax at the first
    mismatch / after all drafts).
    """
    b, k = draft_tokens.shape
    pos = jnp.arange(k)[None, :]
    is_draft = pos < num_draft[:, None]
    match = (draft_tokens == target_argmax[:, :k]) & is_draft
    # Longest all-true prefix: cumprod trick.
    prefix = jnp.cumprod(match.astype(jnp.int32), axis=-1)
    num_accepted = jnp.sum(prefix, axis=-1)                    # [B]
    # Output: drafts 0..num_accepted-1, then bonus target_argmax[num_accepted]
    out_pos = jnp.arange(k + 1)[None, :]
    keep = out_pos <= num_accepted[:, None]
    drafts_ext = jnp.concatenate(
        [draft_tokens, jnp.zeros((b, 1), draft_tokens.dtype)], axis=-1)
    bonus = jnp.take_along_axis(
        target_argmax, num_accepted[:, None], axis=-1)         # [B, 1]
    out = jnp.where(out_pos == num_accepted[:, None], bonus, drafts_ext)
    out = jnp.where(keep, out, NO_TOKEN).astype(jnp.int32)
    return out, num_accepted + 1


def verify_stochastic(
    draft_tokens: jax.Array,
    draft_probs: jax.Array,
    num_draft: jax.Array,
    target_probs: jax.Array,
    rng: jax.Array,
) -> tuple[jax.Array, jax.Array]:
    """Rejection sampling (Leviathan et al.) against the target model.

    draft_tokens: [B, K]; draft_probs: [B, K] probability the drafter
    assigned to each drafted token; target_probs: [B, K+1, V] target model
    distributions. Returns (out_tokens [B, K+1], num_out [B]).

    Exactness: the residual resample subtracts only the drafted token's
    point mass from the target distribution.  For DETERMINISTIC (greedy /
    one-hot) drafters — our MLP/LSTM speculators and suffix drafts — that
    IS the classic residual, so this op is the exact Leviathan sampler.
    For genuinely stochastic drafters the full residual
    ``norm(max(p - q, 0))`` would need the drafter's whole distribution,
    which callers here never materialise; the engine's default
    temperature>0 path therefore uses sample-and-compare (unbiased
    without drafter distributions) instead of this op.
    """
    b, k = draft_tokens.shape
    v = target_probs.shape[-1]
    u = jax.random.uniform(rng, (b, k))
    p_target = jnp.take_along_axis(
        target_probs[:, :k, :], draft_tokens[..., None], axis=-1)[..., 0]
    accept = (u * jnp.maximum(draft_probs, 1e-20)) <= p_target
    pos = jnp.arange(k)[None, :]
    accept = accept & (pos < num_draft[:, None])
    prefix = jnp.cumprod(accept.astype(jnp.int32), axis=-1)
    num_accepted = jnp.sum(prefix, axis=-1)

    # Residual distribution at the first rejected position:
    # p_res = normalize(max(p_target - p_draft_onehot*inf?, 0)) — for a
    # greedy drafter we only know the drafted token's prob, so subtract the
    # point mass on the drafted token.
    first_rej = jnp.minimum(num_accepted, k - 1)
    pt = jnp.take_along_axis(
        target_probs, first_rej[:, None, None].repeat(v, -1), axis=1)[:, 0]
    rej_tok = jnp.take_along_axis(draft_tokens, first_rej[:, None], axis=-1)
    p_res = pt.at[jnp.arange(b), rej_tok[:, 0]].mul(0.0)
    p_res = p_res / jnp.maximum(jnp.sum(p_res, -1, keepdims=True), 1e-20)
    resample = jax.random.categorical(
        jax.random.fold_in(rng, 1), jnp.log(jnp.maximum(p_res, 1e-20)))

    # Bonus token when everything accepted: sample from the last target row.
    bonus_probs = jnp.take_along_axis(
        target_probs, num_draft[:, None, None].repeat(v, -1), axis=1)[:, 0]
    bonus = jax.random.categorical(
        jax.random.fold_in(rng, 2),
        jnp.log(jnp.maximum(bonus_probs, 1e-20)))

    all_accepted = num_accepted >= num_draft
    extra = jnp.where(all_accepted, bonus, resample).astype(jnp.int32)

    out_pos = jnp.arange(k + 1)[None, :]
    keep = out_pos <= num_accepted[:, None]
    drafts_ext = jnp.concatenate(
        [draft_tokens, jnp.zeros((b, 1), draft_tokens.dtype)], axis=-1)
    out = jnp.where(out_pos == num_accepted[:, None], extra[:, None],
                    drafts_ext)
    out = jnp.where(keep, out, NO_TOKEN).astype(jnp.int32)
    return out, num_accepted + 1
