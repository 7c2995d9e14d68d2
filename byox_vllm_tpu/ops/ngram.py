"""On-device ngram prompt-lookup drafting (speculative decoding).

The host proposer (engine/spec.py::NgramProposer) costs one host round trip
per verify round: drafts for round n+1 need round n's accepted tokens. Over
the tunneled backend that RTT (~tens of ms) dwarfs the verify compute —
SPEC_r04 measured a 5x wall-clock LOSS with correct acceptance. Moving the
propose onto the device lets the runner scan M verify rounds in ONE compiled
program (engine/model_runner.py::_spec_multi_step), amortizing the host trip
over M rounds exactly like the multi-step decode window does for plain
decode.

Matching runs over a fixed per-sequence window of the most recent ``R``
tokens (a [B, R] right-aligned buffer carried through the scan) rather than
the full history the host proposer sees. Drafting is heuristic by
construction — the rejection sampler keeps outputs exact for ANY drafts
(ops/spec_sampler.py) — so a window-limited match only affects acceptance,
and lookup hits in natural text are overwhelmingly recent. Semantics
otherwise mirror the host proposer: longest n in [min_n, max_n] first, most
recent occurrence wins, drafts cycle-extended to the full k (behavioral spec:
/root/reference/vllm_ngram.py:76-104 demonstrates the target metric surface).
"""

import jax.numpy as jnp


def ngram_propose_device(
    toks: jnp.ndarray,  # [B, R] int32, right-aligned (col R-1 = newest); left-pad -1
    lens: jnp.ndarray,  # [B] int32 valid token count (<= R)
    min_n: int,
    max_n: int,
    k: int,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Vectorized prompt-lookup over the recent-token window.

    Returns (drafts [B, k] int32, num_drafts [B] int32 in {0, k}). A row with
    no recurring n-gram gets num_drafts 0 (its draft tokens are arbitrary and
    the verify step treats it as plain decode)."""
    b, r = toks.shape
    found = jnp.zeros((b,), bool)
    q = jnp.ones((b,), jnp.int32)  # inferred period (match-end distance)
    for n in range(min(max_n, r - 1), min_n - 1, -1):  # static: longest first
        dmax = r - n  # candidate lags d = 1..dmax (window start r-n-d >= 0)
        eq = jnp.ones((b, dmax), bool)
        for j in range(n):
            tail_j = toks[:, r - n + j][:, None]  # [B, 1]
            # window token at offset j for lag d is toks[:, r-n+j-d]; the
            # slice below runs d = dmax..1, reversed to d = 1..dmax
            seg = toks[:, r - n + j - dmax : r - n + j]
            eq &= seg[:, ::-1] == tail_j
        dvals = jnp.arange(1, dmax + 1, dtype=jnp.int32)[None, :]
        # the window must lie inside the valid region: r-n-d >= r-lens
        ok = eq & (dvals <= (lens - n)[:, None])
        any_n = ok.any(axis=1)
        d_first = jnp.argmax(ok, axis=1).astype(jnp.int32) + 1  # most recent
        newly = any_n & ~found
        q = jnp.where(newly, d_first, q)
        found = found | any_n
    i = jnp.arange(k, dtype=jnp.int32)[None, :]
    idx = r - q[:, None] + jnp.mod(i, q[:, None])  # cycle-extended continuation
    drafts = jnp.take_along_axis(toks, idx, axis=1).astype(jnp.int32)
    num_drafts = jnp.where(found, k, 0).astype(jnp.int32)
    return drafts, num_drafts


def append_tokens_device(
    toks: jnp.ndarray,  # [B, R] right-aligned buffer
    lens: jnp.ndarray,  # [B] valid counts
    new_tokens: jnp.ndarray,  # [B, E] left-aligned; entries past counts ignored
    counts: jnp.ndarray,  # [B] number of valid new tokens per row
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Shift ``counts`` new tokens into the right-aligned buffer.

    For every output index j in [0, R): cat[j + counts] with cat =
    [toks | new_tokens] lands either in the old buffer (j < R - counts) or in
    the valid new-token prefix (j >= R - counts) — no masking needed."""
    b, r = toks.shape
    cat = jnp.concatenate([toks, new_tokens.astype(toks.dtype)], axis=1)
    idx = jnp.arange(r, dtype=jnp.int32)[None, :] + counts[:, None]
    out = jnp.take_along_axis(cat, idx, axis=1)
    return out, jnp.minimum(lens + counts, r)
