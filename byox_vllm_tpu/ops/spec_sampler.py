"""Speculative-decode verification: vectorized rejection sampling.

Standard draft-verify acceptance (Leviathan et al. 2023) specialized to
point-mass proposers (ngram lookup proposes exact tokens, q = delta):

  - position i accepts draft d_i with probability p_i(d_i) (temperature
    sampling) or iff argmax p_i == d_i (greedy)
  - at the first rejection, the replacement token is sampled from the
    residual p_i with the rejected token masked out (renormalized max(p-q,0)
    for a point mass is exactly that)
  - if every draft is accepted, a bonus token is sampled from the last
    position's distribution — so each verify emits accepted+1 tokens.

Draft probabilities are read via logsumexp + gather (no [B, K+1, V] softmax
materialization); only the single final-sample position gathers a full
vocab row per sequence.
"""

import jax
import jax.numpy as jnp

from byox_vllm_tpu.ops.sampler import _filter_top_k_top_p, derive_row_keys


def verify_and_sample(
    logits: jnp.ndarray,  # [B, T, V] fp32; position i scores token len+i
    draft_tokens: jnp.ndarray,  # [B, K] int32 (padding arbitrary)
    num_drafts: jnp.ndarray,  # [B] int32 in [0, K]
    temperatures: jnp.ndarray,  # [B] fp32 (0 = greedy)
    key: jax.Array,
    top_k: jnp.ndarray | None = None,  # [B] int32, 0 = off
    top_p: jnp.ndarray | None = None,  # [B] fp32, 1.0 = off
    seeds: jnp.ndarray | None = None,  # [B] int32, -1 = engine key stream
    steps: jnp.ndarray | None = None,  # [B] int32 per-seq sample counter
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (tokens [B, K+1] int32, num_emitted [B] int32). Row b's first
    ``num_emitted[b]`` = accepted drafts + one sampled token. With top-k/p
    the *filtered* distribution is the verification target: filtered-out
    draft tokens have probability 0 and are always rejected."""
    b, t, v = logits.shape
    k = draft_tokens.shape[1]
    assert t >= k + 1

    logits = logits.astype(jnp.float32)
    if top_k is not None or top_p is not None:
        flat = logits.reshape(b * t, v)
        rep = lambda x: None if x is None else jnp.repeat(x, t, axis=0)
        logits = _filter_top_k_top_p(flat, rep(top_k), rep(top_p)).reshape(b, t, v)
    temps = jnp.maximum(temperatures, 1e-6)[:, None]
    greedy = (temperatures == 0.0)[:, None]

    scaled = logits / temps[..., None]  # [B, T, V]
    lse = jax.nn.logsumexp(scaled, axis=-1)  # [B, T]
    draft_logit = jnp.take_along_axis(
        scaled[:, :k, :], draft_tokens[:, :, None], axis=-1
    )[..., 0]  # [B, K]
    p_draft = jnp.exp(draft_logit - lse[:, :k])  # [B, K]
    argmax_tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)  # [B, T]

    if seeds is None:
        key_u, key_g = jax.random.split(key)
        u = jax.random.uniform(key_u, (b, k), dtype=jnp.float32)
        gumbel = jax.random.gumbel(key_g, (b, v), dtype=jnp.float32)
    else:
        # per-request reproducible randomness: one row key per verify call,
        # split into acceptance-uniform and final-sample-gumbel streams
        row_keys = derive_row_keys(key, seeds, steps, b)
        u = jax.vmap(
            lambda kd: jax.random.uniform(
                jax.random.fold_in(jax.random.wrap_key_data(kd), 0), (k,), dtype=jnp.float32
            )
        )(row_keys)
        gumbel = jax.vmap(
            lambda kd: jax.random.gumbel(
                jax.random.fold_in(jax.random.wrap_key_data(kd), 1), (v,), dtype=jnp.float32
            )
        )(row_keys)
    accept_sample = u < p_draft
    accept_greedy = argmax_tok[:, :k] == draft_tokens
    accept = jnp.where(greedy, accept_greedy, accept_sample)
    pos = jnp.arange(k, dtype=jnp.int32)[None, :]
    accept = accept & (pos < num_drafts[:, None])

    # length of the accepted prefix
    accept_len = jnp.sum(jnp.cumprod(accept.astype(jnp.int32), axis=1), axis=1)  # [B]
    all_accepted = accept_len >= num_drafts

    # final sample position: first rejection, or the bonus position
    final_pos = jnp.where(all_accepted, num_drafts, accept_len)  # [B] in [0, K]
    final_logits = jnp.take_along_axis(
        scaled, final_pos[:, None, None], axis=1
    )[:, 0]  # [B, V]
    # mask the rejected draft token out of the residual distribution
    rejected_tok = jnp.take_along_axis(
        draft_tokens, jnp.minimum(final_pos, k - 1)[:, None], axis=1
    )[:, 0]
    mask_rejected = ~all_accepted
    final_logits = jnp.where(
        (jax.nn.one_hot(rejected_tok, v, dtype=jnp.bool_) & mask_rejected[:, None]),
        -jnp.inf,
        final_logits,
    )
    sampled = jnp.argmax(final_logits + gumbel, axis=-1).astype(jnp.int32)
    greedy_tok = jnp.argmax(final_logits, axis=-1).astype(jnp.int32)
    final_token = jnp.where(greedy[:, 0], greedy_tok, sampled)

    # assemble output: accepted drafts then the final token
    out_pos = jnp.arange(k + 1, dtype=jnp.int32)[None, :]
    tokens = jnp.where(
        out_pos < accept_len[:, None],
        jnp.pad(draft_tokens, ((0, 0), (0, 1))),
        jnp.where(out_pos == accept_len[:, None], final_token[:, None], 0),
    ).astype(jnp.int32)
    num_emitted = accept_len + 1
    return tokens, num_emitted
