"""BERT encoder family: differential tests vs HuggingFace transformers.

The gold model is ``transformers.BertModel`` on CPU torch — the exact
family the reference's embedding service serves through vLLM encode mode
(reference ``embedding/replica.py:213-224``).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from arcticinference_tpu.config import (CacheConfig, EngineConfig,
                                        ModelConfig, SchedulerConfig)
from arcticinference_tpu.models import bert as bert_mod

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

TINY = dict(vocab_size=211, hidden_size=48, num_hidden_layers=3,
            num_attention_heads=4, intermediate_size=96,
            max_position_embeddings=64, type_vocab_size=2,
            hidden_act="gelu")


@pytest.fixture(scope="module")
def hf_model():
    torch.manual_seed(0)
    cfg = transformers.BertConfig(**TINY)
    model = transformers.BertModel(cfg)
    model.eval()
    return model


@pytest.fixture(scope="module")
def our_model(hf_model):
    tensors = {k: v.detach().numpy() for k, v in
               hf_model.state_dict().items()}
    arch = bert_mod.BertArch.from_hf_config(TINY)
    params = bert_mod.load_hf_state(arch, tensors, jnp.float32)
    return arch, params


def _rand_batch(rng, b, t):
    ids = rng.integers(1, TINY["vocab_size"], (b, t)).astype(np.int32)
    lens = rng.integers(max(t // 2, 1), t + 1, b)
    mask = (np.arange(t)[None, :] < lens[:, None]).astype(np.int32)
    ids = np.where(mask > 0, ids, 0)
    return ids, mask


class TestForward:

    def test_matches_hf_hidden_states(self, hf_model, our_model):
        arch, params = our_model
        rng = np.random.default_rng(0)
        ids, mask = _rand_batch(rng, 3, 17)
        with torch.no_grad():
            want = hf_model(input_ids=torch.tensor(ids.astype(np.int64)),
                            attention_mask=torch.tensor(mask)
                            ).last_hidden_state.numpy()
        got = np.asarray(bert_mod.forward(
            params, arch, {"input_ids": jnp.asarray(ids),
                           "attention_mask": jnp.asarray(mask)}))
        # Only real-token rows are comparable (HF computes padded rows
        # too, but they see the same masked attention; both match).
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)

    def test_padding_invariance(self, our_model):
        """Extra padding must not change real-token hidden states."""
        arch, params = our_model
        rng = np.random.default_rng(1)
        ids, _ = _rand_batch(rng, 1, 12)
        mask = np.ones((1, 12), np.int32)
        h1 = np.asarray(bert_mod.forward(
            params, arch, {"input_ids": jnp.asarray(ids),
                           "attention_mask": jnp.asarray(mask)}))
        ids_p = np.zeros((1, 20), np.int32)
        ids_p[:, :12] = ids
        mask_p = np.zeros((1, 20), np.int32)
        mask_p[:, :12] = 1
        h2 = np.asarray(bert_mod.forward(
            params, arch, {"input_ids": jnp.asarray(ids_p),
                           "attention_mask": jnp.asarray(mask_p)}))
        np.testing.assert_allclose(h2[:, :12], h1, rtol=1e-5, atol=1e-5)


class TestPooling:

    def test_mean_ignores_padding(self):
        h = jnp.asarray(np.arange(24, dtype=np.float32).reshape(1, 4, 6))
        mask = jnp.asarray([[1, 1, 0, 0]], jnp.int32)
        out = np.asarray(bert_mod.pool(h, mask, "mean", normalize=False))
        np.testing.assert_allclose(out[0], np.asarray(h)[0, :2].mean(0))

    def test_cls_and_last(self):
        h = jnp.asarray(np.random.default_rng(2).normal(
            size=(2, 5, 4)).astype(np.float32))
        mask = jnp.asarray([[1, 1, 1, 0, 0], [1, 1, 1, 1, 1]], jnp.int32)
        cls = np.asarray(bert_mod.pool(h, mask, "cls", normalize=False))
        last = np.asarray(bert_mod.pool(h, mask, "last", normalize=False))
        np.testing.assert_allclose(cls, np.asarray(h)[:, 0])
        np.testing.assert_allclose(last[0], np.asarray(h)[0, 2])
        np.testing.assert_allclose(last[1], np.asarray(h)[1, 4])

    def test_normalize(self):
        h = jnp.asarray(np.random.default_rng(3).normal(
            size=(2, 3, 8)).astype(np.float32))
        mask = jnp.ones((2, 3), jnp.int32)
        out = np.asarray(bert_mod.pool(h, mask, "mean", normalize=True))
        np.testing.assert_allclose(np.linalg.norm(out, axis=-1), 1.0,
                                   rtol=1e-5)


class TestEncoderRunner:

    def _config(self, model_dir):
        return EngineConfig(
            model=ModelConfig(model=str(model_dir), dtype="float32",
                              max_model_len=64),
            cache=CacheConfig(block_size=8, num_blocks=16),
            scheduler=SchedulerConfig(max_num_seqs=4,
                                      max_num_batched_tokens=128))

    @pytest.fixture(scope="class")
    def model_dir(self, hf_model, tmp_path_factory):
        d = tmp_path_factory.mktemp("bert_ckpt")
        hf_model.save_pretrained(d, safe_serialization=True)
        return d

    def test_llm_encode_end_to_end(self, model_dir, hf_model):
        from arcticinference_tpu.engine.llm import LLM

        llm = LLM(self._config(model_dir))
        assert llm.encoder is not None and llm.engine is None
        rng = np.random.default_rng(4)
        prompts = [list(rng.integers(1, 200, n)) for n in (5, 11, 30, 7, 3)]
        embs = llm.encode(prompt_token_ids=prompts)
        assert len(embs) == 5
        # Gold: HF forward + masked mean + L2 normalise, per prompt.
        for ids, e in zip(prompts, embs):
            with torch.no_grad():
                h = hf_model(
                    input_ids=torch.tensor([ids]),
                    attention_mask=torch.ones(1, len(ids),
                                              dtype=torch.long)
                ).last_hidden_state.numpy()[0]
            want = h.mean(0)
            want = want / np.linalg.norm(want)
            np.testing.assert_allclose(e, want, rtol=2e-3, atol=2e-3)

    def test_batch_composition_invariance(self, model_dir):
        from arcticinference_tpu.engine.llm import LLM

        llm = LLM(self._config(model_dir))
        rng = np.random.default_rng(5)
        prompts = [list(rng.integers(1, 200, n))
                   for n in (4, 40, 9, 22, 13, 6)]
        together = llm.encode(prompt_token_ids=prompts)
        alone = [llm.encode(prompt_token_ids=[p])[0] for p in prompts]
        for a, b in zip(together, alone):
            np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4)

    def test_generate_raises(self, model_dir):
        from arcticinference_tpu.engine.llm import LLM

        llm = LLM(self._config(model_dir))
        with pytest.raises(ValueError, match="encoder-only"):
            llm.generate(prompt_token_ids=[[1, 2, 3]])
