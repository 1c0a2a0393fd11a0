"""Prompt encoding (CFG layout) for the sampler.

Equivalent of the reference's ``pipe._encode_prompt`` usage
(reference run_fresco.py:190-196): encode positive and negative prompts
with the CLIP tokenizer+encoder and concatenate [uncond; cond] along the
batch axis.

Tokenization: uses the HuggingFace ``CLIPTokenizer(Fast)`` when vocab
files are available locally (``tokenizer_path``); falls back to a
deterministic hash tokenizer otherwise (useful for tests and random-
weight smoke runs — this environment has no network egress to fetch the
BPE vocab).
"""
from __future__ import annotations

import hashlib
from typing import Sequence

import numpy as np

import jax.numpy as jnp


class HashTokenizer:
    """Deterministic stand-in tokenizer: word -> stable id.

    NOT a BPE tokenizer — only for tests / random-weight runs where the
    real CLIP vocab is unavailable.
    """

    def __init__(self, vocab_size: int = 49408, max_length: int = 77):
        self.vocab_size = vocab_size
        self.max_length = max_length
        self.bos, self.eos = 49406 % vocab_size, 49407 % vocab_size

    def __call__(self, texts: Sequence[str]) -> np.ndarray:
        out = np.full((len(texts), self.max_length), self.eos, np.int32)
        for i, t in enumerate(texts):
            ids = [self.bos]
            for word in t.lower().split()[: self.max_length - 2]:
                h = int(hashlib.md5(word.encode()).hexdigest()[:8], 16)
                ids.append(h % (self.vocab_size - 3))
            ids.append(self.eos)
            out[i, : len(ids)] = ids
        return out


class CLIPTokenizerWrapper:
    def __init__(self, tokenizer_path: str, max_length: int = 77):
        from transformers import CLIPTokenizer

        self.tok = CLIPTokenizer.from_pretrained(tokenizer_path)
        self.max_length = max_length

    def __call__(self, texts: Sequence[str]) -> np.ndarray:
        enc = self.tok(
            list(texts),
            padding="max_length",
            max_length=self.max_length,
            truncation=True,
            return_tensors="np",
        )
        return enc["input_ids"].astype(np.int32)


def make_tokenizer(tokenizer_path: str | None, vocab_size: int = 49408):
    if tokenizer_path:
        try:
            return CLIPTokenizerWrapper(tokenizer_path)
        except Exception:
            pass
    return HashTokenizer(vocab_size)


def encode_prompts(
    text_encoder,
    text_params,
    tokenizer,
    prompts: Sequence[str],
    negative_prompts: Sequence[str],
    clip_skip: int = 0,
) -> jnp.ndarray:
    """Returns [2F, 77, C] embeddings, uncond first (reference CFG layout).

    Keyframe batches usually repeat one prompt F times — only unique
    prompts hit the encoder; rows are gathered back afterwards (the
    reference encodes all 2F copies, run_fresco.py:190-196)."""
    texts = list(negative_prompts) + list(prompts)
    uniq = list(dict.fromkeys(texts))
    ids = tokenizer(uniq)
    emb = _jitted_apply(text_encoder, clip_skip)(text_params, jnp.asarray(ids))
    index = {t: i for i, t in enumerate(uniq)}
    return jnp.take(emb, jnp.asarray([index[t] for t in texts]), axis=0)


# Identity-keyed weak cache: a dead encoder's entry (and the compiled
# closure pinning it) is evicted by the weakref callback, so repeated
# pipeline construction doesn't leak (r2 advisor: the plain id()-keyed
# dict grew unboundedly and pinned encoders alive).  NOT a
# WeakKeyDictionary: flax modules are frozen dataclasses, so two
# different encoder INSTANCES with equal config hash equal — an
# equality-keyed cache could return a closure weakly bound to the other
# instance, which crashes once that instance is collected.
import weakref

_ENCODE_JIT_CACHE: dict = {}  # id(enc) -> (weakref(enc), {clip_skip: fn})


def _jitted_apply(text_encoder, clip_skip: int):
    """Jit the CLIP forward per (encoder instance, clip_skip).  Eager
    flax apply dispatches hundreds of ops individually — ~1.3 s/batch
    over the remote-tunnel TPU vs ~10 ms jitted."""
    import jax

    key = id(text_encoder)
    entry = _ENCODE_JIT_CACHE.get(key)
    if entry is None or entry[0]() is not text_encoder:
        def _evict(_ref, key=key):
            _ENCODE_JIT_CACHE.pop(key, None)

        # weak capture: a strong ref in the closure would keep the
        # encoder alive through the cache's own value, defeating eviction
        entry = _ENCODE_JIT_CACHE[key] = (
            weakref.ref(text_encoder, _evict), {},
        )
    enc_ref, per_skip = entry
    fn = per_skip.get(clip_skip)
    if fn is None:
        fn = per_skip[clip_skip] = jax.jit(
            lambda p, ids: enc_ref().apply(p, ids, clip_skip=clip_skip)
        )
    return fn
