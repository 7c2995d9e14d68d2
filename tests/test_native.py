"""Native C++ extension: bit parity with the Python fallbacks."""

import pytest

from byox_vllm_tpu.utils.native import load_native

native = load_native()
pytestmark = pytest.mark.skipif(native is None, reason="no C++ toolchain")


def test_hash_block_matches_python_fallback():
    import numpy as np
    import xxhash

    for tokens, prefix in [([1, 2, 3, 4], -1), ([100, 5], 1234567), (list(range(64)), 2**63)]:
        parts = bytearray()
        if prefix != -1:
            parts += prefix.to_bytes(8, "little", signed=False)
        parts += np.array(tokens, dtype=np.int64).tobytes()
        expect = xxhash.xxh64(bytes(parts)).intdigest()
        got = native.hash_block(tokens, 0 if prefix == -1 else prefix, prefix != -1)
        assert got == expect


def test_ngram_propose_matches_python():
    from byox_vllm_tpu.engine import spec as spec_mod
    from byox_vllm_tpu.engine.spec import NgramProposer

    cases = [
        [5, 6, 7, 9, 9, 5, 6, 7],
        [1, 2, 8, 1, 2, 3, 1, 2],
        [4, 9, 3, 4, 7, 4, 8, 3, 4],
        [1, 2, 3, 4, 5],
        [7, 7, 7, 7, 7, 7],
    ]
    p = NgramProposer(3, 1, 3)
    saved = spec_mod._native
    for tokens in cases:
        got = native.ngram_propose(tokens, 1, 3, 3)
        try:
            spec_mod._native = None
            expect = p.propose(tokens)
        finally:
            spec_mod._native = saved
        assert got == expect, (tokens, got, expect)


def test_block_manager_uses_native_hash():
    from byox_vllm_tpu.engine.block_manager import compute_block_hash

    # identical chained results through the public entry point
    h0 = compute_block_hash([1, 2, 3, 4], -1)
    h1 = compute_block_hash([5, 6, 7, 8], h0)
    assert h0 != h1
    assert compute_block_hash([5, 6, 7, 8], h0) == h1
