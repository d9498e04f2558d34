"""Decoding engines: beam search as a single lax.scan graph.

The reference's BLIP-2 path generates with num_beams=5,
no_repeat_ngram_size=2, early_stopping (util/utils.py:117); HF's generate
loop re-dispatches from host per token.  Here beam search is one jitted
scan: beams fold into the batch axis, KV caches are gathered on beam
reorder, and the bigram ban is a fixed-shape scatter mask.

HF parity details:
  * the n-gram ban scans the FULL running sequence — prompt tokens
    included for decoder-only models (pass `prompt_tokens`), so bigrams
    crossing the prompt/generation boundary are banned too;
  * final ranking divides by the full hypothesis length (prompt + new
    tokens for decoder-only, i.e. `length_offset`), matching HF's
    BeamHypotheses.add.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

NEG_INF = -1e9


class BeamState(NamedTuple):
    tokens: jnp.ndarray  # [B, K, P+T] prompt ++ emitted tokens (pad-filled)
    last: jnp.ndarray  # [B, K] last token fed to the decoder
    scores: jnp.ndarray  # [B, K] cumulative logprob
    done: jnp.ndarray  # [B, K] beam finished
    caches: Any  # pytree with leading dims [B*K, ...]


def _ban_repeated_bigrams(tokens, last, length, vocab: int):
    """Mask [B, K, V]: forbid token v if (last, v) already occurred in the
    running sequence (HF no_repeat_ngram_size=2 semantics).  `tokens`
    includes the prompt prefix; `length` is the current sequence length."""
    b, k, t = tokens.shape
    pos = jnp.arange(t)
    # pairs (tokens[i], tokens[i+1]) for i+1 < length
    first = tokens
    second = jnp.concatenate([tokens[..., 1:], jnp.zeros((b, k, 1), tokens.dtype)], -1)
    pair_valid = (pos[None, None, :] + 1 < length[..., None]) & (first == last[..., None])
    mask = jnp.zeros((b, k, vocab), bool)
    ban = jnp.where(pair_valid, second, 0)
    mask = mask.at[
        jnp.arange(b)[:, None, None], jnp.arange(k)[None, :, None], ban
    ].max(pair_valid)
    return mask


def beam_search(
    decode_step: Callable[[jnp.ndarray, jnp.ndarray, Any], Tuple[jnp.ndarray, Any]],
    init_logits: jnp.ndarray,
    init_caches: Any,
    batch: int,
    num_beams: int,
    max_new_tokens: int,
    vocab_size: int,
    eos_token_id: int,
    pad_token_id: int,
    length_penalty: float = 1.0,
    no_repeat_ngram_size: int = 0,
    prompt_tokens: Optional[jnp.ndarray] = None,
    length_offset: int = 0,
):
    """Generic beam search.

    init_logits [B, V]: the prefill's last-position logits — token_0 of
    every beam is drawn from them (standard encoder-prefill semantics).
    decode_step(flat_tokens [B*K, 1], s, caches) is then called for
    s = 0..max_new_tokens-2, feeding token_s (which lives at absolute
    position prefix+s) and returning logits for token_{s+1}.
    init_caches leaves must already be beam-flattened to leading dim B*K.

    prompt_tokens [B, P] (optional): text prompt for decoder-only models —
    participates in the n-gram ban.  length_offset: token count added to
    the generated length when rank-normalizing (HF counts the prompt for
    decoder-only models).

    Returns (tokens [B, max_new_tokens] of the best beam, norm scores [B]).
    """
    k = num_beams
    p = 0 if prompt_tokens is None else prompt_tokens.shape[1]

    def flatten(x):  # [B, K, ...] -> [B*K, ...]
        return x.reshape((batch * k,) + x.shape[2:])

    # seed beams from the prefill logits, honoring the prompt-boundary ban
    logp0 = jax.nn.log_softmax(init_logits.astype(jnp.float32), axis=-1)
    buf = jnp.full((batch, k, p + max_new_tokens), pad_token_id, jnp.int32)
    if p:
        buf = buf.at[:, :, :p].set(
            jnp.tile(prompt_tokens.astype(jnp.int32)[:, None, :], (1, k, 1))
        )
        if no_repeat_ngram_size == 2:
            banned0 = _ban_repeated_bigrams(
                buf, prompt_tokens[:, -1].astype(jnp.int32)[:, None].repeat(k, 1),
                jnp.full((batch, k), p), vocab_size,
            )[:, 0]  # beams identical at t=0
            logp0 = jnp.where(banned0, NEG_INF, logp0)
    scores0, tok0 = jax.lax.top_k(logp0, k)  # [B, K]
    tok0 = tok0.astype(jnp.int32)
    init = BeamState(
        tokens=buf.at[:, :, p].set(tok0),
        last=tok0,
        scores=scores0,
        done=tok0 == eos_token_id,
        caches=init_caches,
    )

    def step(state: BeamState, s):
        t = p + s + 1  # buffer index of the token being chosen this step
        logits, caches = decode_step(flatten(state.last)[:, None], s, state.caches)
        logp = jax.nn.log_softmax(logits[:, -1].astype(jnp.float32), axis=-1)
        logp = logp.reshape(batch, k, vocab_size)

        if no_repeat_ngram_size == 2:
            banned = _ban_repeated_bigrams(state.tokens, state.last,
                                           jnp.full((batch, k), t), vocab_size)
            logp = jnp.where(banned, NEG_INF, logp)

        # finished beams only extend with pad at no cost
        pad_only = jnp.full((vocab_size,), NEG_INF).at[pad_token_id].set(0.0)
        logp = jnp.where(state.done[..., None], pad_only[None, None], logp)

        cand = state.scores[..., None] + logp  # [B, K, V]
        flat = cand.reshape(batch, k * vocab_size)
        top_scores, top_idx = jax.lax.top_k(flat, k)  # [B, K]
        src_beam = top_idx // vocab_size
        new_tok = (top_idx % vocab_size).astype(jnp.int32)

        tokens = jnp.take_along_axis(
            state.tokens, src_beam[..., None], axis=1
        ).at[:, :, t].set(jnp.where(
            jnp.take_along_axis(state.done, src_beam, axis=1), pad_token_id, new_tok
        ))
        done = jnp.take_along_axis(state.done, src_beam, axis=1) | (new_tok == eos_token_id)

        # reorder caches: leading dim [B*K] gathered by source beam
        flat_src = (jnp.arange(batch)[:, None] * k + src_beam).reshape(-1)
        caches = jax.tree.map(lambda c: c[flat_src], caches)

        return BeamState(tokens, new_tok, top_scores, done, caches), None

    final, _ = jax.lax.scan(step, init, jnp.arange(max_new_tokens - 1))

    # rank by length-penalized score; HF counts the full hypothesis length
    gen = final.tokens[:, :, p:]
    lengths = (gen != pad_token_id).sum(-1).astype(jnp.float32) + length_offset
    norm = final.scores / jnp.maximum(lengths, 1.0) ** length_penalty
    best = jnp.argmax(norm, axis=1)
    tokens = jnp.take_along_axis(gen, best[:, None, None], axis=1)[:, 0]
    scores = jnp.take_along_axis(norm, best[:, None], axis=1)[:, 0]
    return tokens, scores
