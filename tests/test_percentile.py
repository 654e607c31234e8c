"""ops/percentile.py — sort-free exact percentiles vs jnp.percentile.

The bit-bisection selector replaces the per-frame lax.sort inside the
default `robust`/`exprobust` post-norm (reference eval.py:380-395). Its
order statistics must equal the sorted values BIT-FOR-BIT; the final
linear interpolation uses float64-static weights (numpy-exact), so the
oracle here is np.percentile computed in f64, within a few value-ulps
(the device lerp itself rounds in f32 and XLA may contract it).
jnp.percentile is deliberately NOT the oracle: its executed weights
wobble 1-2 ulps with XLA's divide->reciprocal rewrite per backend.
"""

import zlib

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from evreal_tpu.ops.normalize import post_process_normalization
from evreal_tpu.ops.percentile import _f32_keys, order_stats, percentiles


def bits(a):
    return np.asarray(a, np.float32).view(np.uint32)


def assert_biteq(got, want):
    got = np.asarray(got, np.float32)
    want = np.asarray(want, np.float32)
    both_nan = np.isnan(got) & np.isnan(want)
    np.testing.assert_array_equal(np.where(both_nan, 0, bits(got)),
                                  np.where(both_nan, 0, bits(want)))


def ulp_dist(a, b):
    """Distance in total-order steps (the sort key space of
    ops/percentile._f32_keys) — 0 means bit-identical."""
    ka = np.asarray(_f32_keys(jnp.asarray(a, jnp.float32))).astype(np.int64)
    kb = np.asarray(_f32_keys(jnp.asarray(b, jnp.float32))).astype(np.int64)
    return np.abs(ka - kb)


def assert_ulp(got, want, max_ulp=4):
    got = np.asarray(got, np.float32)
    want = np.asarray(want, np.float32)
    both_nan = np.isnan(got) & np.isnan(want)
    # XLA flushes subnormals in f32 arithmetic (the lerp); the f64 oracle
    # keeps them — FTZ-equivalent results count as equal
    tiny = np.float32(np.finfo(np.float32).tiny)
    both_sub = (np.abs(got) < tiny) & (np.abs(want) < tiny)
    d = np.where(both_nan | both_sub, 0, ulp_dist(got, want))
    assert (d <= max_ulp).all(), (got, want, d)


CASES = [
    ("uniform", lambda rng: rng.uniform(-3, 7, 4096).astype(np.float32)),
    ("normal", lambda rng: rng.normal(size=999).astype(np.float32)),
    ("heavy ties", lambda rng: rng.integers(0, 5, 2048).astype(np.float32)),
    ("constant", lambda rng: np.full(777, 2.5, np.float32)),
    ("constant zero", lambda rng: np.zeros(64, np.float32)),
    ("signed zeros", lambda rng: rng.choice(
        np.asarray([-0.0, 0.0], np.float32), 513)),
    ("mixed zeros/values", lambda rng: rng.choice(
        np.asarray([-0.0, 0.0, -1.0, 1.0, 0.5], np.float32), 1024)),
    ("with infs", lambda rng: rng.choice(
        np.asarray([-np.inf, np.inf, 0.3, -2.0], np.float32), 2048)),
    ("tiny denormals", lambda rng: (rng.uniform(-1, 1, 512) * 1e-42)
     .astype(np.float32)),
    ("huge range", lambda rng: (rng.uniform(-1, 1, 512) *
                                np.logspace(-30, 30, 512)).astype(
                                    np.float32)),
    ("single element", lambda rng: rng.normal(size=1).astype(np.float32)),
    ("two elements", lambda rng: rng.normal(size=2).astype(np.float32)),
]


def percentile_oracle(x, q):
    """Exact f64 linear-interpolation percentile in the a*lw + b*hw form
    (jnp/_quantile's form — numpy's a + (b-a)*t form NaNs on tied infs;
    hw == 0 takes the order stat directly, matching ops/percentile)."""
    xs = np.sort(x.astype(np.float64))
    n = len(xs)
    rf = q / 100.0 * (n - 1)
    k0, k1 = int(np.floor(rf)), int(min(np.ceil(rf), n - 1))
    hw = rf - np.floor(rf)
    if hw == 0.0:
        return np.float32(xs[k0])
    return np.float32(xs[k0] * (1.0 - hw) + xs[k1] * hw)


@pytest.mark.parametrize("name,gen", CASES, ids=[c[0] for c in CASES])
@pytest.mark.parametrize("qs", [(1, 99), (0, 100), (50,), (2.5, 97.5)])
def test_percentiles_vs_f64_oracle(name, gen, qs):
    rng = np.random.default_rng(zlib.crc32(name.encode()))
    x = gen(rng)
    got = jax.jit(lambda a: percentiles(a, qs))(jnp.asarray(x))
    want = np.stack([percentile_oracle(x, q) for q in qs])
    assert_ulp(got, want)


def test_percentiles_all_inf_integer_rank():
    """Integer-rank percentiles of an all-inf array return inf (the order
    stat, hw==0 -> no lerp); numpy/jnp produce NaN there from inf*0 in the
    a*lw+b*hw form — a deliberate, documented improvement."""
    x = jnp.asarray(np.full(100, np.inf, np.float32))
    got = np.asarray(percentiles(x, (0, 100)))
    assert np.isposinf(got).all()


def test_percentiles_nan_floods():
    x = jnp.asarray(np.r_[np.random.default_rng(0).normal(size=100),
                          np.nan].astype(np.float32))
    got = percentiles(x, (1, 99))
    assert np.isnan(np.asarray(got)).all()
    want = jnp.stack([jnp.percentile(x, q) for q in (1, 99)])
    assert np.isnan(np.asarray(want)).all()


def test_order_stats_match_sort_biteq():
    rng = np.random.default_rng(7)
    x = rng.choice(np.asarray(
        [-np.inf, -1.5, -0.0, 0.0, 0.25, 3.0, np.inf], np.float32), 300)
    xs = np.asarray(jnp.sort(jnp.asarray(x)))
    ks = (0, 1, 7, 150, 298, 299)
    got = np.asarray(order_stats(jnp.asarray(x), ks))
    assert_biteq(got, xs[list(ks)])


def test_order_stats_fuzz_biteq():
    rng = np.random.default_rng(3)
    for _ in range(20):
        n = int(rng.integers(1, 2000))
        x = rng.normal(size=n).astype(np.float32)
        # duplicate a random slice to force ties
        if n > 10:
            x[: n // 3] = x[n // 3: 2 * (n // 3)]
        ks = tuple(sorted(set(
            int(k) for k in rng.integers(0, n, size=4))))
        xs = np.sort(x)
        got = np.asarray(order_stats(jnp.asarray(x), ks))
        assert_biteq(got, xs[list(ks)])


@pytest.mark.parametrize("norm", ["robust", "standard", "exprobust"])
def test_postnorm_bits_vs_sort(norm, monkeypatch):
    """The default (bits) post-norm matches the sort lowering to within
    lerp-contraction ulps on the normalizers, under the same double-vmap
    the runners use."""
    rng = np.random.default_rng(11)
    imgs = jnp.asarray(rng.normal(size=(2, 3, 24, 32)).astype(np.float32))
    vv = lambda: jax.jit(jax.vmap(jax.vmap(
        lambda im: post_process_normalization(im, norm))))
    monkeypatch.setenv("EVREAL_PCT", "sort")
    want = np.asarray(vv()(imgs))
    monkeypatch.setenv("EVREAL_PCT", "bits")
    got = np.asarray(vv()(imgs))
    # the two impls' interpolation WEIGHTS differ by design (f64-static
    # vs jnp's f32 chain + XLA reciprocal rewrite): normalized images
    # shift by ~delta_weight * stat_gap / (hi - lo) — atol covers that,
    # far inside the harness's 2e-4 golden tolerances
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-4)
