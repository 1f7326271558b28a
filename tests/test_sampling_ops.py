"""Unit tests for sampling + speculative verification ops."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from arcticinference_tpu.ops.sampling import (NO_TOKEN, sample,
                                              verify_greedy,
                                              verify_stochastic)


class TestSample:

    def test_greedy_rows(self):
        logits = jnp.asarray([[0.1, 2.0, 0.3], [5.0, 0.0, 1.0]],
                             jnp.float32)
        out = sample(logits, jnp.zeros(2), jnp.zeros(2, jnp.int32),
                     jnp.ones(2), jax.random.PRNGKey(0))
        assert out.tolist() == [1, 0]

    def test_top_k_restricts_support(self):
        logits = jnp.asarray([[0.0, 1.0, 2.0, 3.0]] * 64, jnp.float32)
        out = sample(logits, jnp.full(64, 5.0),
                     jnp.full(64, 2, jnp.int32), jnp.ones(64),
                     jax.random.PRNGKey(1))
        assert set(np.asarray(out).tolist()) <= {2, 3}

    def test_top_p_restricts_support(self):
        logits = jnp.asarray([[0.0, 0.0, 10.0, 10.0]] * 64, jnp.float32)
        out = sample(logits, jnp.ones(64), jnp.zeros(64, jnp.int32),
                     jnp.full(64, 0.9), jax.random.PRNGKey(2))
        assert set(np.asarray(out).tolist()) <= {2, 3}

    def test_mixed_greedy_and_sampled(self):
        logits = jnp.asarray([[0.0, 3.0, 0.0]] * 4, jnp.float32)
        temps = jnp.asarray([0.0, 1.0, 0.0, 1.0])
        out = sample(logits, temps, jnp.zeros(4, jnp.int32), jnp.ones(4),
                     jax.random.PRNGKey(3))
        assert out[0] == 1 and out[2] == 1


class TestVerifyGreedy:

    def test_full_accept_plus_bonus(self):
        drafts = jnp.asarray([[7, 8, 9]], jnp.int32)
        argmax = jnp.asarray([[7, 8, 9, 4]], jnp.int32)
        out, n = verify_greedy(drafts, jnp.asarray([3]), argmax)
        assert n.tolist() == [4]
        assert out[0].tolist() == [7, 8, 9, 4]

    def test_first_reject(self):
        drafts = jnp.asarray([[7, 8, 9]], jnp.int32)
        argmax = jnp.asarray([[1, 8, 9, 4]], jnp.int32)
        out, n = verify_greedy(drafts, jnp.asarray([3]), argmax)
        assert n.tolist() == [1]
        assert out[0].tolist() == [1, NO_TOKEN, NO_TOKEN, NO_TOKEN]

    def test_mid_reject(self):
        drafts = jnp.asarray([[7, 8, 9]], jnp.int32)
        argmax = jnp.asarray([[7, 2, 9, 4]], jnp.int32)
        out, n = verify_greedy(drafts, jnp.asarray([3]), argmax)
        assert n.tolist() == [2]
        assert out[0].tolist() == [7, 2, NO_TOKEN, NO_TOKEN]

    def test_num_draft_masking(self):
        # Only 1 real draft; padding values must not be compared.
        drafts = jnp.asarray([[7, 999, 999]], jnp.int32)
        argmax = jnp.asarray([[7, 8, 9, 4]], jnp.int32)
        out, n = verify_greedy(drafts, jnp.asarray([1]), argmax)
        assert n.tolist() == [2]
        assert out[0].tolist() == [7, 8, NO_TOKEN, NO_TOKEN]

    def test_batch_mixed(self):
        drafts = jnp.asarray([[1, 2], [3, 4]], jnp.int32)
        argmax = jnp.asarray([[1, 2, 5], [9, 9, 9]], jnp.int32)
        out, n = verify_greedy(drafts, jnp.asarray([2, 2]), argmax)
        assert n.tolist() == [3, 1]
        assert out[0].tolist() == [1, 2, 5]
        assert out[1].tolist() == [9, NO_TOKEN, NO_TOKEN]


class TestVerifyStochastic:

    def test_deterministic_target_accepts(self):
        # Target distribution is a point mass on the drafted tokens =>
        # acceptance is certain regardless of rng.
        v = 8
        drafts = jnp.asarray([[3, 5]], jnp.int32)
        dprobs = jnp.asarray([[1.0, 1.0]], jnp.float32)
        tp = np.full((1, 3, v), 1e-9, np.float32)
        tp[0, 0, 3] = 1.0
        tp[0, 1, 5] = 1.0
        tp[0, 2, 7] = 1.0  # bonus row
        out, n = verify_stochastic(
            drafts, dprobs, jnp.asarray([2]), jnp.asarray(tp),
            jax.random.PRNGKey(0))
        assert n.tolist() == [3]
        assert out[0].tolist() == [3, 5, 7]

    def test_zero_target_prob_rejects(self):
        v = 8
        drafts = jnp.asarray([[3]], jnp.int32)
        dprobs = jnp.asarray([[1.0]], jnp.float32)
        tp = np.full((1, 2, v), 1e-9, np.float32)
        tp[0, 0, 4] = 1.0   # target puts ~all mass elsewhere
        tp[0, 1, 6] = 1.0
        out, n = verify_stochastic(
            drafts, dprobs, jnp.asarray([1]), jnp.asarray(tp),
            jax.random.PRNGKey(0))
        assert n.tolist() == [1]
        assert out[0].tolist()[0] == 4  # resampled from residual
