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


def derive_row_keys(key: jax.Array, seeds: jnp.ndarray, steps: jnp.ndarray, b: int) -> jnp.ndarray:
    """Per-row PRNG key data [B, 2]: a seeded row's key depends only on
    (seed, its own sample index) — independent of batch composition, which
    the engine-level key stream cannot give. Unseeded rows (-1) draw from
    the engine key folded with their row index."""
    stream = jax.vmap(lambda i: jax.random.key_data(jax.random.fold_in(key, i)))(
        jnp.arange(b, dtype=jnp.int32)
    )
    seeded = jax.vmap(
        lambda s, st: jax.random.key_data(jax.random.fold_in(jax.random.PRNGKey(s), st))
    )(jnp.maximum(seeds, 0), steps)
    return jnp.where((seeds >= 0)[:, None], seeded, stream)


def sample_tokens(
    logits: jnp.ndarray,  # [B, V] any float dtype (may be vocab-PADDED)
    temperatures: jnp.ndarray,  # [B] fp32
    key: jax.Array,
    top_k: jnp.ndarray | None = None,  # [B] int32, 0 = off
    top_p: jnp.ndarray | None = None,  # [B] fp32, 1.0 = off
    seeds: jnp.ndarray | None = None,  # [B] int32, -1 = engine key stream
    steps: jnp.ndarray | None = None,  # [B] int32 per-seq sample counter
    vocab: int | None = None,  # real vocab size: mask padded head columns
) -> jnp.ndarray:
    logits = logits.astype(jnp.float32)
    if vocab is not None and logits.shape[-1] > vocab:
        # the quantized LM head keeps its padded columns (slicing [.., :V]
        # copies the full 78 MB logits array at 8B every step); the mask
        # fuses into the argmax consumers instead
        cols = jax.lax.broadcasted_iota(jnp.int32, logits.shape[-1:], 0)
        logits = jnp.where(cols[None, :] < vocab, logits, -jnp.inf)
    greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)

    if top_k is not None or top_p is not None:
        logits = _filter_top_k_top_p(logits, top_k, top_p)

    t = jnp.maximum(temperatures, 1e-6)[:, None]
    if seeds is None:
        gumbel = jax.random.gumbel(key, logits.shape, dtype=jnp.float32)
    else:
        b, v = logits.shape
        row_keys = derive_row_keys(key, seeds, steps, b)
        gumbel = jax.vmap(
            lambda kd: jax.random.gumbel(jax.random.wrap_key_data(kd), (v,), dtype=jnp.float32)
        )(row_keys)
    sampled = jnp.argmax(logits / t + gumbel, axis=-1).astype(jnp.int32)
    return jnp.where(temperatures > 0.0, sampled, greedy)


def sample_tokens_tp(
    logits_local: jnp.ndarray,  # [B, V_local] this shard's vocab columns
    temperatures: jnp.ndarray,
    key: jax.Array,
    tp_axis: str,
    global_vocab: int,
    top_k=None,
    top_p=None,
    seeds=None,
    steps=None,
) -> jnp.ndarray:
    """Vocab-parallel sampling under shard_map: every shard holds a
    contiguous slice of the vocab's logits. Gumbel-max distributes exactly —
    each shard draws INDEPENDENT noise for its own columns (fold the shard
    index into the key), takes its local argmax, and the global argmax over
    shards is a correct categorical sample. Padded head columns (global
    index >= vocab) mask to -inf. top-k / top-p rows fall back to gathering
    the full row (a per-request rarity; global sorts don't distribute)."""
    b, vl = logits_local.shape
    idx = jax.lax.axis_index(tp_axis)
    cols = idx * vl + jnp.arange(vl, dtype=jnp.int32)
    logits_local = jnp.where(
        cols[None, :] < global_vocab, logits_local.astype(jnp.float32), -jnp.inf
    )
    if top_k is not None or top_p is not None:
        full = jax.lax.all_gather(logits_local, tp_axis, axis=1, tiled=True)
        return sample_tokens(
            full, temperatures, key, top_k=top_k, top_p=top_p, seeds=seeds, steps=steps
        )

    greedy_val = jnp.max(logits_local, axis=-1)
    greedy_idx = cols[jnp.argmax(logits_local, axis=-1)]

    t = jnp.maximum(temperatures, 1e-6)[:, None]
    if seeds is None:
        gumbel = jax.random.gumbel(
            jax.random.fold_in(key, idx), logits_local.shape, dtype=jnp.float32
        )
    else:
        row_keys = derive_row_keys(key, seeds, steps, b)
        gumbel = jax.vmap(
            lambda kd: jax.random.gumbel(
                jax.random.fold_in(jax.random.wrap_key_data(kd), idx), (vl,),
                dtype=jnp.float32,
            )
        )(row_keys)
    scores = logits_local / t + gumbel
    samp_val = jnp.max(scores, axis=-1)
    samp_idx = cols[jnp.argmax(scores, axis=-1)]

    val = jnp.where(temperatures > 0.0, samp_val, greedy_val)  # [B]
    tok = jnp.where(temperatures > 0.0, samp_idx, greedy_idx)
    # global argmax across shards: gather the tp (value, token) candidates
    vals = jax.lax.all_gather(val, tp_axis, axis=0)  # [tp, B]
    toks = jax.lax.all_gather(tok, tp_axis, axis=0)
    # ties broken toward the lower shard (matches single-device argmax for
    # greedy: the first maximal index wins)
    best = jnp.argmax(vals == jnp.max(vals, axis=0, keepdims=True), axis=0)  # [B]
    return jnp.take_along_axis(toks, best[None, :], axis=0)[0].astype(jnp.int32)


def _filter_top_k_top_p(logits, top_k, top_p, k_cap: int = 2048):
    """Mask logits outside the per-row top-k / nucleus to -inf.

    A full-vocab row sort every decode step is brutal on TPU (V = 151936 for
    Qwen; sorts don't tile onto the MXU). The serving-shaped path instead
    takes the top ``k_cap`` candidates with lax.top_k (one O(V) pass), does
    the cutoff arithmetic on that slice, and the whole batch falls back to
    the exact full-sort path only if some row's request is not contained in
    the slice (top_k > k_cap, or nucleus mass of the slice < top_p — which
    for a trained model's logits essentially never happens: the top-2048
    tokens carry ~all probability mass)."""
    v = logits.shape[-1]
    if v <= 2 * k_cap:  # small vocabs (tests/draft models): sort is cheap
        return _filter_sorted(logits, top_k, top_p)
    neg = -jnp.inf
    vals = jax.lax.top_k(logits, k_cap)[0]  # [B, k_cap] descending
    exact = jnp.ones(logits.shape[0], bool)
    thresh = jnp.full(logits.shape[:1], neg, logits.dtype)
    if top_k is not None:
        on = top_k > 0
        kth = jnp.take_along_axis(
            vals, jnp.clip(top_k - 1, 0, k_cap - 1)[:, None], axis=-1
        )[:, 0]
        thresh = jnp.maximum(thresh, jnp.where(on, kth, neg))
        exact &= ~on | (top_k <= k_cap)
    if top_p is not None:
        on = top_p < 1.0
        lse = jax.nn.logsumexp(logits, axis=-1, keepdims=True)
        p = jnp.exp(vals - lse)  # true probabilities of the slice
        cum = jnp.cumsum(p, axis=-1)
        # smallest set of top tokens with cumulative prob >= top_p
        keep = cum - p < top_p[:, None]
        pth = jnp.min(jnp.where(keep, vals, jnp.inf), axis=-1)
        thresh = jnp.maximum(thresh, jnp.where(on, pth, neg))
        exact &= ~on | (cum[:, -1] >= top_p)
    fast = jnp.where(logits >= thresh[:, None], logits, neg)
    return jax.lax.cond(
        jnp.all(exact),
        lambda: fast,
        lambda: _filter_sorted(logits, top_k, top_p),
    )


def _filter_sorted(logits, top_k, top_p):
    """Exact full-sort filter (reference semantics; fallback path)."""
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
        # threshold = smallest kept logit; top_p >= 1 disables (cumsum float
        # saturation would otherwise clip the unreachable tail — and 1.0 is
        # the padding-row value)
        thresh = jnp.min(jnp.where(keep_sorted, sorted_logits, jnp.inf), axis=-1, keepdims=True)
        thresh = jnp.where(top_p[:, None] >= 1.0, -jnp.inf, thresh)
        logits = jnp.where(logits >= thresh, logits, -jnp.inf)
    return logits
