"""Shared fixture machinery for the quality gate and accuracy harness:
a tiny, genuinely *trained* checkpoint (HF Llama + byte-level tokenizer)
whose outputs have learnable structure, so perplexity/accuracy deltas
between precisions are meaningful (unlike random weights, where every
precision scores uniform-ish).

The corpus is a sparse first-order Markov "language" over a small word
lexicon; transitions are peaked so greedy continuation is predictable.
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np

LEXICON = [
    "sun", "moon", "star", "wind", "rain", "snow", "tree", "leaf",
    "bird", "fish", "stone", "river", "cloud", "fire", "ice", "sand",
]
HIDDEN = 128


def make_corpus(n_words: int = 4000, seed: int = 0,
                peak: float = 0.85) -> str:
    """Peaked first-order Markov chain over LEXICON, space-joined."""
    rng = np.random.default_rng(seed)
    n = len(LEXICON)
    # Each word has one dominant successor + uniform tail.
    succ = rng.permutation(n)
    probs = np.full((n, n), (1 - peak) / (n - 1))
    probs[np.arange(n), succ] = peak
    words = [int(rng.integers(n))]
    for _ in range(n_words - 1):
        words.append(int(rng.choice(n, p=probs[words[-1]])))
    return " ".join(LEXICON[w] for w in words)


def make_byte_tokenizer(save_dir: Path) -> None:
    """Byte-level tokenizer (256-token vocab) written as tokenizer.json,
    loadable via AutoTokenizer -> PreTrainedTokenizerFast."""
    from tokenizers import Tokenizer, decoders, models, pre_tokenizers

    alphabet = pre_tokenizers.ByteLevel.alphabet()
    vocab = {ch: i for i, ch in enumerate(sorted(alphabet))}
    tok = Tokenizer(models.BPE(vocab=vocab, merges=[]))
    tok.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False)
    tok.decoder = decoders.ByteLevel()
    save_dir.mkdir(parents=True, exist_ok=True)
    tok.save(str(save_dir / "tokenizer.json"))
    (save_dir / "tokenizer_config.json").write_text(json.dumps(
        {"tokenizer_class": "PreTrainedTokenizerFast",
         "model_max_length": 4096}))


def train_tiny_checkpoint(save_dir, steps: int = 400, seed: int = 0,
                          seq_len: int = 64, batch: int = 16,
                          lr: float = 3e-3):
    """Train a tiny HF Llama on the Markov corpus (CPU torch, seconds);
    saves a complete checkpoint (weights + config + tokenizer) and
    returns (train_ids, heldout_ids)."""
    import torch
    import transformers

    save_dir = Path(save_dir)
    make_byte_tokenizer(save_dir)
    tokenizer = transformers.AutoTokenizer.from_pretrained(str(save_dir))

    text = make_corpus(seed=seed)
    ids = np.asarray(tokenizer.encode(text), np.int64)
    split = int(len(ids) * 0.9)
    train_ids, heldout_ids = ids[:split], ids[split:]

    torch.manual_seed(seed)
    cfg = transformers.LlamaConfig(
        vocab_size=256, hidden_size=HIDDEN, intermediate_size=256,
        num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, max_position_embeddings=4096,
        tie_word_embeddings=False, rope_theta=10000.0)
    model = transformers.LlamaForCausalLM(cfg)
    opt = torch.optim.Adam(model.parameters(), lr=lr)
    rng = np.random.default_rng(seed + 1)
    model.train()
    for _ in range(steps):
        starts = rng.integers(0, len(train_ids) - seq_len - 1, batch)
        x = np.stack([train_ids[s:s + seq_len] for s in starts])
        xt = torch.tensor(x)
        # HF shifts labels internally: labels == input_ids is the
        # standard next-token objective.
        out = model(input_ids=xt, labels=xt)
        opt.zero_grad()
        out.loss.backward()
        opt.step()
    model.eval()
    model.save_pretrained(str(save_dir))
    return train_ids, heldout_ids
