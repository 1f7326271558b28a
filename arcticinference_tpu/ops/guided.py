"""Device-resident grammar state for pipelined guided decoding.

The sync guided path ships one host-computed vocab bitmask per step
(``serving/guided_dfa.py``).  This module is the *pipelined* variant:
the whole grammar — per-state mask table + interval transition table —
lives in a device pool, the automaton state rides the step-output token
vector (the same device-to-device passthrough asynchronous scheduling
uses for tokens), and the state advance happens on device by walking the
sampled token's codepoints through the transition table.  Guided
requests therefore run at full pipelined speed with zero per-step host
work — beyond the reference design, where vLLM's structured-output
backends compute a bitmask on host every step.

Data layout (built by ``TokenDfaIndex.device_tables``):
- ``masks  [P, S_pad, W] int32``  — per-slot per-state vocab bitmask
- ``keys   [P, I_pad] int32``     — ``state << 21 | interval_lo``,
  ascending (one searchsorted resolves a (state, codepoint) step);
  padded with int32 max
- ``hi     [P, I_pad] int32``     — interval upper bounds (inclusive)
- ``nxt    [P, I_pad] int32``     — interval target states
- ``cps    [V, L] int32``         — per-token codepoint rows, PAD_CP
  padded (shared across slots/grammars)

Dead state is -1; its mask is the sentinel "bit 0 only" so sampling
stays defined after grammar completion (the host trims overshoot tokens
at drain time, exactly like length overshoot under async scheduling).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from arcticinference_tpu.serving.guided_dfa import PAD_CP


def guided_mask_rows(states: jax.Array, slots: jax.Array,
                     masks_pool: jax.Array) -> jax.Array:
    """Gather each guided row's current mask: [G, W] int32.

    states/slots: [G] (-1 padded).  Dead/padded rows get the sentinel
    bit-0 mask.
    """
    p, s_pad, w = masks_pool.shape
    safe_slot = jnp.clip(slots, 0, p - 1)
    safe_state = jnp.clip(states, 0, s_pad - 1)
    rows = masks_pool[safe_slot, safe_state]
    sentinel = jnp.zeros((w,), masks_pool.dtype).at[0].set(1)
    ok = (states >= 0) & (states < s_pad) & (slots >= 0)
    return jnp.where(ok[:, None], rows, sentinel[None, :])


def guided_advance(states: jax.Array, slots: jax.Array,
                   tokens: jax.Array, cps_matrix: jax.Array,
                   keys_pool: jax.Array, hi_pool: jax.Array,
                   nxt_pool: jax.Array) -> jax.Array:
    """Advance each row's DFA state by its sampled token's codepoints.

    states/slots/tokens: [G]; returns next states [G] (-1 = dead).
    Padded rows (slot < 0) pass through unchanged.
    """
    g = states.shape[0]
    p, i_pad = keys_pool.shape
    v, l = cps_matrix.shape
    safe_slot = jnp.clip(slots, 0, p - 1)
    cps = cps_matrix[jnp.clip(tokens, 0, v - 1)].astype(jnp.int32)
    keys = keys_pool[safe_slot]          # [G, I]
    his = hi_pool[safe_slot]
    nxts = nxt_pool[safe_slot]
    rng = jnp.arange(g)

    def body(i, st):
        cp = cps[:, i]
        key = jnp.where(st >= 0, (st << 21) | cp, 0)
        j = jax.vmap(
            lambda row, k: jnp.searchsorted(row, k, side="right"))(
                keys, key) - 1
        sj = jnp.clip(j, 0, i_pad - 1)
        kk = keys[rng, sj]
        hit = (j >= 0) & ((kk >> 21) == st) & (cp <= his[rng, sj])
        stepped = jnp.where(hit, nxts[rng, sj], -1)
        alive = st >= 0
        return jnp.where(cp == PAD_CP, st,
                         jnp.where(alive, stepped, -1))

    out = jax.lax.fori_loop(0, l, body, states)
    return jnp.where(slots >= 0, out, states)
