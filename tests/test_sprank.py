"""Distributed SP suffix ranking vs the replicated ranker.

Ranks are order encodings, so equivalence is checked via the suffix
order they induce (argsort), not via the values."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from debwt_tpu.bluesort import sp_suffix_ranks
from debwt_tpu.parallel.mesh import make_mesh
from debwt_tpu.parallel.sprank import sp_ranks_sharded
from debwt_tpu.pipeline import _pow2

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the 8-device CPU mesh"
)


def _blocks(sp6, n):
    L = sp6.shape[0]
    Pb = max(8, -(-L // n))
    full = np.zeros(n * Pb, dtype=np.uint8)
    full[:L] = sp6
    return full.reshape(n, Pb), Pb


def _check(sp6):
    mesh = make_mesh(8)
    blk, Pb = _blocks(sp6, 8)
    from jax.sharding import NamedSharding, PartitionSpec as P

    blk_d = jax.device_put(jnp.asarray(blk), NamedSharding(mesh, P("d")))
    L = sp6.shape[0]
    rank_blk = sp_ranks_sharded(mesh, blk_d, L)
    assert rank_blk is not None, "unexpected partition overflow"
    got = np.asarray(jax.device_get(rank_blk)).reshape(-1)[:L]

    Lc = _pow2(max(1, L))
    ext = np.zeros(Lc, dtype=np.uint8)
    ext[:L] = sp6
    want = np.asarray(jax.device_get(
        sp_suffix_ranks(jnp.asarray(ext), jnp.int32(L))
    ))[:L]
    # same suffix order
    assert (np.argsort(got, kind="stable")
            == np.argsort(want, kind="stable")).all()
    # ranks distinct
    assert np.unique(got).shape[0] == L


def test_random_small(rng):
    _check(rng.integers(0, 6, size=100).astype(np.uint8))


def test_random_larger(rng):
    _check(rng.integers(0, 6, size=3001).astype(np.uint8))


def test_repetitive_deep_ties(rng):
    # long periodic content: maximal tie depth for the tripling loop
    base = np.tile(np.array([0, 1, 2, 3], dtype=np.uint8), 600)
    base[-1] = 5
    _check(base)


def test_all_same_char():
    sp6 = np.zeros(500, dtype=np.uint8)
    sp6[-1] = 5
    _check(sp6)


def test_tiny():
    _check(np.array([1, 4, 2, 5], dtype=np.uint8))


def test_block_boundary_exact_multiple(rng):
    # L an exact multiple of the block size
    _check(rng.integers(0, 6, size=8 * 64).astype(np.uint8))
