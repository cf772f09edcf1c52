"""L4 demo / benchmark models, TPU-first (stacked layers + lax.scan)."""

from . import gpt2, lenet5, llama, rnn, vit
