// byox_vllm_tpu native host-side runtime (C++ CPython extension).
//
// The TPU data plane is JAX/XLA/Pallas; this module is the native muscle for
// the *host* control plane, the part of the serving loop that runs every
// step in Python in the reference (nanovllm keeps it pure Python and leans
// on the xxhash C extension + numpy): chained block hashing for the prefix
// cache and the ngram draft-proposal scan. At large
// batch x small step times these loops show up; here they are O(n) C++ with
// no interpreter in the loop. Python fallbacks exist for every entry point
// (byox_vllm_tpu/utils/native.py) so the extension is an acceleration, not
// a requirement.

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <cstdint>
#include <cstring>
#include <vector>

// ---------------------------------------------------------------------------
// xxHash64 (Yann Collet's public-domain algorithm), used for chained
// prefix-cache block hashes. Matches python-xxhash's xxh64 output so the
// native and fallback paths agree byte-for-byte.
// ---------------------------------------------------------------------------

static const uint64_t P1 = 11400714785074694791ULL;
static const uint64_t P2 = 14029467366897019727ULL;
static const uint64_t P3 = 1609587929392839161ULL;
static const uint64_t P4 = 9650029242287828579ULL;
static const uint64_t P5 = 2870177450012600261ULL;

static inline uint64_t rotl64(uint64_t x, int r) { return (x << r) | (x >> (64 - r)); }

static inline uint64_t round1(uint64_t acc, uint64_t input) {
  acc += input * P2;
  acc = rotl64(acc, 31);
  return acc * P1;
}

static inline uint64_t merge_round(uint64_t acc, uint64_t val) {
  acc ^= round1(0, val);
  return acc * P1 + P4;
}

static uint64_t xxh64(const uint8_t* data, size_t len, uint64_t seed) {
  const uint8_t* end = data + len;
  uint64_t h;
  if (len >= 32) {
    uint64_t v1 = seed + P1 + P2, v2 = seed + P2, v3 = seed, v4 = seed - P1;
    const uint8_t* limit = end - 32;
    do {
      uint64_t k;
      std::memcpy(&k, data, 8); v1 = round1(v1, k); data += 8;
      std::memcpy(&k, data, 8); v2 = round1(v2, k); data += 8;
      std::memcpy(&k, data, 8); v3 = round1(v3, k); data += 8;
      std::memcpy(&k, data, 8); v4 = round1(v4, k); data += 8;
    } while (data <= limit);
    h = rotl64(v1, 1) + rotl64(v2, 7) + rotl64(v3, 12) + rotl64(v4, 18);
    h = merge_round(h, v1);
    h = merge_round(h, v2);
    h = merge_round(h, v3);
    h = merge_round(h, v4);
  } else {
    h = seed + P5;
  }
  h += (uint64_t)len;
  while (data + 8 <= end) {
    uint64_t k;
    std::memcpy(&k, data, 8);
    h ^= round1(0, k);
    h = rotl64(h, 27) * P1 + P4;
    data += 8;
  }
  if (data + 4 <= end) {
    uint32_t k;
    std::memcpy(&k, data, 4);
    h ^= (uint64_t)k * P1;
    h = rotl64(h, 23) * P2 + P3;
    data += 4;
  }
  while (data < end) {
    h ^= (*data) * P5;
    h = rotl64(h, 11) * P1;
    ++data;
  }
  h ^= h >> 33;
  h *= P2;
  h ^= h >> 29;
  h *= P3;
  h ^= h >> 32;
  return h;
}

// hash_block(token_ids: sequence[int], prefix: uint64, has_prefix: int)
// Chained block hash: covers the parent hash (when has_prefix, little-endian
// 8 bytes) followed by each token id as int64 little-endian — the same byte
// stream as the Python fallback in engine/block_manager.py. The prefix is a
// full-range uint64 (hashes exceed int64), hence the separate flag instead
// of a -1 sentinel.
static PyObject* py_hash_block(PyObject*, PyObject* args) {
  PyObject* tokens;
  unsigned long long prefix = 0;
  int has_prefix = 0;
  if (!PyArg_ParseTuple(args, "O|Kp", &tokens, &prefix, &has_prefix)) return nullptr;
  PyObject* fast = PySequence_Fast(tokens, "hash_block expects a sequence");
  if (!fast) return nullptr;
  Py_ssize_t n = PySequence_Fast_GET_SIZE(fast);
  std::vector<uint8_t> buf;
  buf.reserve(8 * (size_t)(n + 1));
  if (has_prefix) {
    uint64_t p = (uint64_t)prefix;
    for (int i = 0; i < 8; i++) buf.push_back((uint8_t)(p >> (8 * i)));
  }
  for (Py_ssize_t i = 0; i < n; i++) {
    long long t = PyLong_AsLongLong(PySequence_Fast_GET_ITEM(fast, i));
    if (t == -1 && PyErr_Occurred()) { Py_DECREF(fast); return nullptr; }
    uint64_t u = (uint64_t)t;
    for (int b = 0; b < 8; b++) buf.push_back((uint8_t)(u >> (8 * b)));
  }
  Py_DECREF(fast);
  uint64_t h = xxh64(buf.data(), buf.size(), 0);
  return PyLong_FromUnsignedLongLong(h);
}

// ngram_propose(token_ids: sequence[int], min_n, max_n, k) -> list[int]
// Most recent earlier occurrence of the trailing n-gram (longest n first),
// returning k following tokens, CYCLE-EXTENDED when the continuation runs
// off the end of the sequence (the match ending q tokens before the end
// implies period q; see engine/spec.py NgramProposer.propose for why short
// drafts wasted the verify window). Mirrors the Python fallback exactly.
static PyObject* py_ngram_propose(PyObject*, PyObject* args) {
  PyObject* tokens;
  int min_n, max_n, k;
  if (!PyArg_ParseTuple(args, "Oiii", &tokens, &min_n, &max_n, &k)) return nullptr;
  PyObject* fast = PySequence_Fast(tokens, "ngram_propose expects a sequence");
  if (!fast) return nullptr;
  Py_ssize_t size = PySequence_Fast_GET_SIZE(fast);
  std::vector<int64_t> ids((size_t)size);
  for (Py_ssize_t i = 0; i < size; i++) {
    ids[(size_t)i] = PyLong_AsLongLong(PySequence_Fast_GET_ITEM(fast, i));
    if (ids[(size_t)i] == -1 && PyErr_Occurred()) { Py_DECREF(fast); return nullptr; }
  }
  Py_DECREF(fast);

  int hi = max_n < (int)size - 1 ? max_n : (int)size - 1;
  for (int n = hi; n >= min_n; --n) {
    const int64_t* tail = ids.data() + size - n;
    // scan candidate starts from most recent to oldest; windows must end
    // strictly before the trailing n-gram (start <= size - 1 - n)
    for (Py_ssize_t start = size - 1 - n; start >= 0; --start) {
      if (std::memcmp(ids.data() + start, tail, sizeof(int64_t) * (size_t)n) == 0) {
        Py_ssize_t from = start + n;
        Py_ssize_t q = size - from;  // inferred period, >= 1
        PyObject* out = PyList_New(k);
        if (!out) return nullptr;
        for (Py_ssize_t i = 0; i < (Py_ssize_t)k; i++) {
          PyList_SET_ITEM(out, i, PyLong_FromLongLong(ids[(size_t)(from + (i % q))]));
        }
        return out;
      }
    }
  }
  return PyList_New(0);
}

static PyMethodDef methods[] = {
    {"hash_block", py_hash_block, METH_VARARGS,
     "Chained xxh64 prefix-cache block hash (parity with the Python fallback)."},
    {"ngram_propose", py_ngram_propose, METH_VARARGS,
     "Ngram prompt-lookup draft proposal scan."},
    {nullptr, nullptr, 0, nullptr},
};

static struct PyModuleDef moduledef = {
    PyModuleDef_HEAD_INIT, "_byox_native",
    "Native host-side runtime for byox_vllm_tpu", -1, methods,
};

PyMODINIT_FUNC PyInit__byox_native(void) { return PyModule_Create(&moduledef); }
