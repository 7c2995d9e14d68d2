"""Token sampling (jitted, explicit PRNG).

Parity with the reference sampler (nanovllm/layers/sampler.py:5-15): the
Gumbel-max trick gives one categorical sample per row from temperature-scaled
logits without materializing a softmax. Improvements over the reference:

- explicit ``jax.random`` keys (the reference's torch sampler is unseeded —
  results are unreproducible)
- temperature 0 selects greedy argmax (the reference asserts greedy away)
- optional top-k / top-p filtering.
"""

import jax
import jax.numpy as jnp


def sample_tokens(
    logits: jnp.ndarray,  # [B, V] any float dtype
    temperatures: jnp.ndarray,  # [B] fp32
    key: jax.Array,
    top_k: jnp.ndarray | None = None,  # [B] int32, 0 = off
    top_p: jnp.ndarray | None = None,  # [B] fp32, 1.0 = off
) -> jnp.ndarray:
    logits = logits.astype(jnp.float32)
    greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)

    if top_k is not None or top_p is not None:
        logits = _filter_top_k_top_p(logits, top_k, top_p)

    t = jnp.maximum(temperatures, 1e-6)[:, None]
    gumbel = jax.random.gumbel(key, logits.shape, dtype=jnp.float32)
    sampled = jnp.argmax(logits / t + gumbel, axis=-1).astype(jnp.int32)
    return jnp.where(temperatures > 0.0, sampled, greedy)


def _filter_top_k_top_p(logits, top_k, top_p):
    """Mask logits outside the per-row top-k / nucleus to -inf."""
    v = logits.shape[-1]
    sorted_logits = jnp.sort(logits, axis=-1)[:, ::-1]  # descending
    if top_k is not None:
        k = jnp.where(top_k > 0, top_k, v)
        kth = jnp.take_along_axis(sorted_logits, jnp.minimum(k - 1, v - 1)[:, None], axis=-1)
        logits = jnp.where(logits >= kth, logits, -jnp.inf)
    if top_p is not None:
        probs = jax.nn.softmax(sorted_logits, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        # keep the smallest set of top tokens with cumulative prob >= top_p
        keep_sorted = cum - probs < top_p[:, None]
        # threshold = smallest kept logit
        thresh = jnp.min(jnp.where(keep_sorted, sorted_logits, jnp.inf), axis=-1, keepdims=True)
        logits = jnp.where(logits >= thresh, logits, -jnp.inf)
    return logits
