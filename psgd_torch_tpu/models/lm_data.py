"""Real-text LM data for the convergence benchmark.

``data/corpus.txt.gz`` is a committed ~4.6 MB corpus of license prose +
open-source Python sources (provenance: tools/make_corpus.py) — the honest
replacement for round 1's synthetic mixing-rule stream.  The reference's
convergence claim is measured on WikiText-103 (misc/gpt2.py:40-76); dataset
egress is impossible here, so this tiny-Shakespeare-class corpus is the
closest reproducible stand-in, and every README number citing it says so.

Tokenization: word-level (words / punctuation / newlines), frequency-ranked
vocab capped at the model's vocab size, deterministic.  Batches are random
contiguous windows keyed by a PRNG key (fresh batch per step, like the
reference's ``get_batch``, misc/gpt2.py:78-90).
"""

from __future__ import annotations

import gzip
import os
import re
from functools import lru_cache
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

_CORPUS = os.path.join(os.path.dirname(__file__), "..", "..", "data",
                       "corpus.txt.gz")
_TOKEN_RE = re.compile(r"\w+|[^\w\s]|\n")


@lru_cache(maxsize=2)
def load_tokens(vocab_size: int, path: str = None,
                val_fraction: float = 0.05):
    """Returns (train_tokens, val_tokens, vocab_used) as numpy int32."""
    path = path or _CORPUS
    with gzip.open(path, "rt", encoding="utf-8", errors="ignore") as f:
        text = f.read()
    words = _TOKEN_RE.findall(text)
    from collections import Counter
    counts = Counter(words)
    # id 0 = <unk>; the rest by frequency
    vocab = [w for w, _ in counts.most_common(vocab_size - 1)]
    ids = {w: i + 1 for i, w in enumerate(vocab)}
    toks = np.fromiter((ids.get(w, 0) for w in words), dtype=np.int32,
                       count=len(words))
    n_val = max(int(len(toks) * val_fraction), 1)
    return toks[:-n_val], toks[-n_val:], len(vocab) + 1


def corpus_batch(key: jax.Array, tokens: np.ndarray, batch: int,
                 seq_len: int) -> Tuple[jax.Array, jax.Array]:
    """Random contiguous windows (tokens, next-token targets)."""
    toks = jnp.asarray(tokens)
    starts = jax.random.randint(key, (batch,), 0, toks.size - seq_len - 1)
    idx = starts[:, None] + jnp.arange(seq_len)[None, :]
    x = toks[idx]
    y = toks[idx + 1]
    return x, y
