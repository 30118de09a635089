"""Calibration / evaluation data loaders.

Capability parity with /root/reference/datautils.py:10-190: wikitext2, ptb,
c4 (+ '-new' eval variants), seed-compatible random window sampling. Returns
numpy token arrays (the TPU framework's native currency) instead of torch
tensors.

Offline operation: 'synthetic' generates a deterministic Markov-ish token
stream so every pipeline stage can run with zero network access (this
container has no egress; the reference would simply crash).
"""
from __future__ import annotations

import random
from typing import Tuple

import numpy as np


def _tokenizer(model: str):
    from transformers import AutoTokenizer

    return AutoTokenizer.from_pretrained(model, use_fast=False)


def _sample_windows(input_ids: np.ndarray, nsamples: int, seed: int,
                    seqlen: int) -> np.ndarray:
    """Random seqlen-windows, reference RNG semantics (datautils.py:20-29)."""
    rng = random.Random(seed)
    out = np.empty((nsamples, seqlen), np.int32)
    n = input_ids.shape[-1]
    for k in range(nsamples):
        i = rng.randint(0, n - seqlen - 1)
        out[k] = input_ids[i:i + seqlen]
    return out


def get_wikitext2(nsamples, seed, seqlen, model):
    """datautils.py:10-30."""
    from datasets import load_dataset

    traindata = load_dataset("wikitext", "wikitext-2-raw-v1", split="train")
    testdata = load_dataset("wikitext", "wikitext-2-raw-v1", split="test")
    tok = _tokenizer(model)
    trainenc = np.asarray(tok("\n\n".join(traindata["text"]))["input_ids"])
    testenc = np.asarray(tok("\n\n".join(testdata["text"]))["input_ids"])
    return _sample_windows(trainenc, nsamples, seed, seqlen), testenc


def get_ptb(nsamples, seed, seqlen, model, new: bool = False):
    """datautils.py:33-56 / 116-136 ('-new' uses the test split + space
    join)."""
    from datasets import load_dataset

    traindata = load_dataset("ptb_text_only", "penn_treebank", split="train")
    evaldata = load_dataset(
        "ptb_text_only", "penn_treebank",
        split="test" if new else "validation")
    tok = _tokenizer(model)
    joiner = " " if new else "\n\n"
    trainenc = np.asarray(tok(joiner.join(traindata["sentence"]))["input_ids"])
    testenc = np.asarray(tok(joiner.join(evaldata["sentence"]))["input_ids"])
    return _sample_windows(trainenc, nsamples, seed, seqlen), testenc


def get_c4(nsamples, seed, seqlen, model, new: bool = False):
    """datautils.py:59-113 / 139-175."""
    from datasets import load_dataset

    traindata = load_dataset(
        "allenai/c4",
        data_files={"train": "en/c4-train.00000-of-01024.json.gz"},
        split="train")
    valdata = load_dataset(
        "allenai/c4",
        data_files={"validation": "en/c4-validation.00000-of-00008.json.gz"},
        split="validation")
    tok = _tokenizer(model)

    rng = random.Random(seed)
    train = np.empty((nsamples, seqlen), np.int32)
    for k in range(nsamples):
        while True:
            i = rng.randint(0, len(traindata) - 1)
            enc = np.asarray(tok(traindata[i]["text"])["input_ids"])
            if len(enc) > seqlen:
                break
        i = rng.randint(0, len(enc) - seqlen - 1)
        train[k] = enc[i:i + seqlen]

    if new:
        enc = np.asarray(
            tok(" ".join(valdata[:1100]["text"]))["input_ids"])
        val = enc[: 256 * seqlen]
    else:
        rng0 = random.Random(0)
        pieces = []
        for _ in range(256):
            while True:
                i = rng0.randint(0, len(valdata) - 1)
                enc = np.asarray(tok(valdata[i]["text"])["input_ids"])
                if len(enc) >= seqlen:
                    break
            i = rng0.randint(0, len(enc) - seqlen - 1)
            pieces.append(enc[i:i + seqlen])
        val = np.concatenate(pieces)
    return train, val


def get_synthetic(nsamples, seed, seqlen, vocab_size: int = 512,
                  test_tokens: int = 16384):
    """Deterministic offline stream (no reference counterpart — required for
    zero-egress environments and hermetic tests)."""
    rng = np.random.default_rng(seed)
    n = nsamples * seqlen + test_tokens
    toks = np.empty(n, np.int32)
    toks[0] = rng.integers(vocab_size)
    jumps = rng.random(n)
    rnd_toks = rng.integers(0, vocab_size, n)
    for i in range(1, n):
        if jumps[i] < 0.7:
            toks[i] = (toks[i - 1] * 7 + 3) % vocab_size
        else:
            toks[i] = rnd_toks[i]
    train = toks[: nsamples * seqlen].reshape(nsamples, seqlen)
    return train, toks[nsamples * seqlen:]


def get_loaders(name: str, nsamples: int = 128, seed: int = 0,
                seqlen: int = 2048, model: str = "",
                vocab_size: int = 512) -> Tuple[np.ndarray, np.ndarray]:
    """Dispatcher (datautils.py:180-190). Returns (calib (nsamples, seqlen)
    int32, test token stream 1-D int32)."""
    if "synthetic" in name:
        return get_synthetic(nsamples, seed, seqlen, vocab_size)
    if "wikitext2" in name:
        return get_wikitext2(nsamples, seed, seqlen, model)
    if "ptb" in name:
        return get_ptb(nsamples, seed, seqlen, model, new="ptb-new" in name)
    if "c4" in name:
        return get_c4(nsamples, seed, seqlen, model, new="c4-new" in name)
    raise ValueError(f"unknown dataset {name!r}")
