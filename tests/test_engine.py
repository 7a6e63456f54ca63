"""Direct unit tests of the fused engine's stage_graph against the
NumPy model trace (flags, coordinates, SP stream)."""

import jax.numpy as jnp
import numpy as np
import pytest

from debwt_tpu import constants as K
from debwt_tpu import engine
from debwt_tpu.model import build_model
from debwt_tpu.pipeline import _bucket, _pow2, _split64
from debwt_tpu.special import build_special
from debwt_tpu.types import SequenceCollection


def _run_graph(coll, m=32):
    sp = build_special(coll, m)
    N = coll.bwt_len
    n = coll.n_reads
    N_cap = _bucket(N)
    x2p = np.full(N_cap + K.TAIL_PAD, K.T, dtype=np.uint8)
    x2p[:N] = coll.x2
    s_hi, s_lo = _split64(sp.spec_tfill)

    def pad(a, cap, fill):
        out = np.full(cap, fill, dtype=a.dtype)
        out[: a.shape[0]] = a
        return jnp.asarray(out)

    ns_cap = _pow2(s_hi.shape[0])
    from debwt_tpu import ops

    return engine.stage_graph(
        jnp.asarray(ops.pack_2bit_words_host(x2p)),
        pad(coll.sep.astype(np.int32), _pow2(n), N_cap),
        pad(s_hi, ns_cap, np.uint32(0xFFFFFFFF)),
        pad(s_lo, ns_cap, np.uint32(0xFFFFFFFF)),
        pad(sp.spec_bwt6, ns_cap, 0),
        pad(sp.spec_branch_pos.astype(np.int32),
            _pow2(max(1, sp.spec_branch_pos.shape[0])), N_cap),
        jnp.int32(N),
        m, N_cap,
    ), N


@pytest.fixture
def coll():
    rng = np.random.default_rng(3)
    frags = ["".join(rng.choice(list("ACGT"), size=25)) for _ in range(4)]
    reads = [
        "".join(rng.choice(frags) for _ in range(4)) for _ in range(4)
    ] + ["".join(rng.choice(list("ACGT"), size=120)) for _ in range(3)]
    return SequenceCollection.from_reads(reads)


def _pos_masks(out, N, coll, m):
    """Reconstruct position-space mo/mi masks from the row-space
    outputs (multi-out rows carry a pos<<3|char ev_key; mi_row flags
    at rows, positions in r_pos)."""
    (_, ev_key, mi_row, _seg, r_pos, _bc, _L, _B, _x) = out
    ev_key, mi_row, r_pos = map(np.asarray, (ev_key, mi_row, r_pos))
    mo_row = ev_key != np.uint32(0xFFFFFFFF)
    mo = np.zeros(N, bool)
    mo[r_pos[mo_row & (r_pos < N)]] = True
    mi = np.zeros(N, bool)
    mi[r_pos[mi_row & (r_pos < N)]] = True
    from debwt_tpu.special import build_special

    sp = build_special(coll, m)
    is_sp = mo.copy()
    is_sp[sp.spec_branch_pos] = True
    return mo, mi, is_sp


def test_flags_and_sp_match_model(coll):
    m = 32
    _, tr = build_model(coll, m=m, trace=True)
    out, N = _run_graph(coll, m)
    L, B = out[6], out[7]
    _mo, mi_h, is_sp_h = _pos_masks(out, N, coll, m)
    sp_pos = np.nonzero(is_sp_h)[0]
    assert (sp_pos == tr.sp_positions).all()
    assert int(L) == tr.sp_positions.shape[0]
    # mi flags: blue positions are main positions of multi-in nodes
    # reconstruct expected blue mask from the model
    nxt = np.searchsorted(coll.sep, np.arange(N))
    d = coll.sep[nxt] - np.arange(N)
    main = d >= (m - 1)
    # model: per main position, node multi_in
    from debwt_tpu.model import key_of_rows, window_matrix

    x6p = np.concatenate([coll.x6, np.full(32, 3, np.uint8)])
    W = window_matrix(x6p, N, m - 1)
    keys = key_of_rows(np.where(W[:, : m - 1] >= 4, 3, W[:, : m - 1]))
    node_idx = np.searchsorted(tr.node_keys, keys)
    node_idx = np.minimum(node_idx, len(tr.node_keys) - 1)
    want_mi = main & tr.node_multi_in[node_idx] & (
        tr.node_keys[node_idx] == keys
    )
    assert (mi_h == want_mi).all()
    assert int(B) == int(want_mi.sum())


def test_ord_encoding_row_classes(coll):
    """The unified sort path encodes (class, position) in one int32:
    main = pos - 2^29, special in [0, 2^29), invalid >= 2^29. Check
    the decoded row classes partition [0, n_real) exactly: valid rows
    (mains + specials) occupy a prefix of the sorted order of length
    n_real, and node-row positions are a permutation of the main
    positions."""
    m = 32
    out, N = _run_graph(coll, m)
    (_b, ev_key, mi_row, _seg, r_pos, _bc, _L, _B, _x) = out
    r_pos = np.asarray(r_pos)
    node = r_pos < _bucket(N)
    n_main = int(node.sum())
    nxt = np.searchsorted(coll.sep, np.arange(N))
    d = coll.sep[nxt] - np.arange(N)
    want_main = np.nonzero(d >= m - 1)[0]
    assert n_main == want_main.shape[0]
    assert (np.sort(r_pos[node]) == want_main).all()
    # flags only on node rows
    mo_row = np.asarray(ev_key) != np.uint32(0xFFFFFFFF)
    mi_row = np.asarray(mi_row)
    assert not (mo_row & ~node).any()
    assert not (mi_row & ~node).any()
    # ev_key positions match the row's r_pos and chars are in range
    sel = mo_row & node
    assert ((np.asarray(ev_key)[sel] >> 3) == r_pos[sel]).all()
    assert (np.asarray(ev_key)[sel] & 7 < 6).all()


def test_stage_finish_cap_insensitive(coll):
    """stage_finish outputs must not depend on the (bucketed) L_cap /
    B_cap sizing: tight caps and wildly inflated caps give identical
    results (pad rows are inert by construction)."""
    m = 32
    out, N = _run_graph(coll, m)
    (bwt6_partial, ev_key, mi_row, seg_start, r_pos,
     bwt_char, L, B, x2p) = out
    sp = build_special(coll, m)
    N_cap = _bucket(N)
    R = int(ev_key.shape[0])
    spec_branch = np.full(_pow2(max(1, sp.spec_branch_pos.shape[0])),
                          N_cap, np.int32)
    spec_branch[: sp.spec_branch_pos.shape[0]] = sp.spec_branch_pos
    spec_branch = jnp.asarray(spec_branch)
    small = engine.stage_finish(
        x2p, ev_key, mi_row, seg_start, r_pos, bwt_char,
        bwt6_partial, spec_branch, jnp.int32(N),
        m, N_cap, _bucket(int(L)), _bucket(int(B)), _pow2(coll.n_reads),
    )
    big_cap = _pow2(max(int(L), int(B), (R + 15) // 16)) * 2
    big = engine.stage_finish(
        x2p, ev_key, mi_row, seg_start, r_pos, bwt_char,
        bwt6_partial, spec_branch, jnp.int32(N),
        m, N_cap, big_cap, big_cap, _pow2(coll.n_reads),
    )
    for a, b in zip(small, big):
        assert (np.asarray(a) == np.asarray(b)).all()


def test_partial_bwt_case2_and_specials(coll):
    m = 32
    res, tr = build_model(coll, m=m, trace=True)
    out, N = _run_graph(coll, m)
    bwt6_partial = np.asarray(out[0])[:N]
    # partial equals the final BWT everywhere except case-3 slots
    # (which the model fills via blue sort; partial holds 0 there)
    mismatch = bwt6_partial != res.bwt6
    assert (bwt6_partial[mismatch] == 0).all()
    # and at least the specials + case2 agree somewhere nontrivial
    assert (~mismatch).sum() > 0.5 * N
