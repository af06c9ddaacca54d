"""Property-based tests (hypothesis) for the pure-numpy hot kernels.

These kernels sit inside Arrow UDFs on the pipeline's hottest path, where a
vectorization bug would corrupt scores silently (a wrong-but-plausible
similarity still clusters — it just clusters WRONG). Random-input properties
pin the vectorized kernels to their readable scalar references and to the
algebraic invariants the blocking/scoring math relies on:

- jaro_winkler_np (the chunked numpy kernel, similarity.py:176-268) must
  agree elementwise with jaro_winkler_py (the scalar reference) — plus
  bounds, identity, and symmetry of the metric itself;
- _minhash_matrix (fused multiply-add + minimum.reduceat,
  similarity.py:54-72) must equal the obvious per-doc/per-perm loop, and a
  signature must be invariant to token ORDER and token MULTIPLICITY (min
  over a multiset is min over its support — the property LSH banding
  correctness rests on);
- _band_keys must be a pure function of the signature rows (equal sigs →
  equal band keys, the LSH bucket-join soundness condition).

No Spark session: pure numpy/python, runs in milliseconds per example.
"""
from __future__ import annotations

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

hypothesis = pytest.importorskip("hypothesis")
from hypothesis import given, settings, strategies as st  # noqa: E402

from takco_spark.functions.similarity import (  # noqa: E402
    _band_keys,
    _minhash_matrix,
    jaro_winkler_np,
    jaro_winkler_py,
    minhash_params,
)

# keep examples fast and the suite deterministic across runs
COMMON = dict(deadline=None, max_examples=120, print_blob=True)

words = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=0x2FF),
    min_size=0, max_size=24,
)


@settings(**COMMON)
@given(st.lists(st.tuples(words, words), min_size=1, max_size=16))
def test_jw_vectorized_matches_scalar_reference(pairs):
    s1 = [a for a, _ in pairs]
    s2 = [b for _, b in pairs]
    vec = jaro_winkler_np(s1, s2)
    ref = [jaro_winkler_py(a, b) for a, b in pairs]
    assert np.allclose(vec, ref, atol=1e-12), (vec, ref)


@settings(**COMMON)
@given(words, words)
def test_jw_bounds_identity_symmetry(a, b):
    v = jaro_winkler_py(a, b)
    assert 0.0 <= v <= 1.0
    assert jaro_winkler_py(a, a) == 1.0
    # Jaro-Winkler is symmetric: match count, transpositions, and common
    # prefix are all order-free quantities
    assert jaro_winkler_py(b, a) == pytest.approx(v, abs=1e-12)


@settings(**COMMON)
@given(words, words)
def test_jw_vectorized_symmetry(a, b):
    f, r = jaro_winkler_np([a], [b])[0], jaro_winkler_np([b], [a])[0]
    assert f == pytest.approx(r, abs=1e-12)


token_runs = st.lists(
    st.lists(st.integers(min_value=0, max_value=(1 << 64) - 1),
             min_size=1, max_size=12),
    min_size=1, max_size=8,
)


def _sig_of_runs(runs, a, b):
    hashes = np.concatenate([np.asarray(r, dtype=np.uint64) for r in runs])
    offsets = np.zeros(len(runs), dtype=np.int64)
    np.cumsum([len(r) for r in runs[:-1]], out=offsets[1:])
    return _minhash_matrix(hashes, offsets, a, b)


@settings(**COMMON)
@given(token_runs, st.integers(min_value=0, max_value=2**31 - 1))
def test_minhash_matrix_equals_naive_loop(runs, seed):
    a, b = minhash_params(num_perm=16, seed=seed)
    sigs = _sig_of_runs(runs, a, b)
    assert sigs.shape == (len(runs), 16)
    for d, run in enumerate(runs):
        xs = np.asarray(run, dtype=np.uint64)
        for p in range(16):
            with np.errstate(over="ignore"):
                expect = np.min(a[p] * xs + b[p])
            assert sigs[d, p] == expect


@settings(**COMMON)
@given(st.lists(st.integers(min_value=0, max_value=(1 << 64) - 1),
                min_size=1, max_size=16),
       st.integers(min_value=0, max_value=2**31 - 1),
       st.randoms(use_true_random=False))
def test_minhash_signature_is_set_semantics(tokens, seed, rnd):
    # order-shuffled and duplicate-inflated runs must produce the SAME
    # signature: minhash is a function of the token SET
    a, b = minhash_params(num_perm=8, seed=seed)
    base = _sig_of_runs([tokens], a, b)
    shuffled = list(tokens)
    rnd.shuffle(shuffled)
    dup = shuffled + [rnd.choice(tokens) for _ in range(3)]
    assert (_sig_of_runs([shuffled], a, b) == base).all()
    assert (_sig_of_runs([dup], a, b) == base).all()


@settings(**COMMON)
@given(token_runs, st.integers(min_value=0, max_value=2**31 - 1))
def test_band_keys_pure_function_of_signature(runs, seed):
    # equal signatures -> equal band keys (bucket-join soundness): compute
    # sigs twice independently and also duplicate a row
    a, b = minhash_params(num_perm=16, seed=seed)
    sigs = _sig_of_runs(runs, a, b)
    again = _sig_of_runs(runs, a, b)
    doubled = np.vstack([sigs, sigs[:1]])
    k1, k2, k3 = (_band_keys(s, bands=4) for s in (sigs, again, doubled))
    assert (k1 == k2).all()
    assert (k3[-1] == k1[0]).all()
    assert k1.shape == (len(runs), 4) and k1.dtype == np.int64


@settings(**COMMON)
@given(st.integers(min_value=0, max_value=2**31 - 1))
def test_minhash_params_are_odd_multipliers(seed):
    # a must be odd so x -> a*x+b mod 2^64 is a bijection (a true
    # permutation family — the minhash estimate's unbiasedness condition)
    a, _ = minhash_params(num_perm=32, seed=seed)
    assert (a % 2 == 1).all()
    a2, b2 = minhash_params(num_perm=32, seed=seed)
    assert (a == a2).all()  # deterministic given seed
