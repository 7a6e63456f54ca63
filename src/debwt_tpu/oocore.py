"""Out-of-core chunked BWT construction — the 30 Gbp tier.

The reference is an out-of-core pipeline by design: every stage
boundary is a 32 MiB-buffered disk file (src/collect#$.h:12), deleted
as consumed (src/INandOut.c:915-918), and its LF-walk capacity constant
is sized for ~30 Gbp (src/LFsearch.c:56). This module is the TPU-native
equivalent: device memory is bounded by two static caps (the text
chunk and the key bucket) no matter how large the collection is, and
the working set between passes lives in host DRAM — or on disk when a
spill directory is given (np.memmap-backed bucket files, the moral
equivalent of the reference's temp-file tiering).

Structure (two device passes over bounded windows + host routing):

  pass A  (text chunks)   device: k-window node keys per position
                          host:   row metadata (choice/pred/head bits),
                                  bin rows into key-range buckets by
                                  sampled splitters (the distributed
                                  analogue of mySort's bucket histogram
                                  prefix-sums, src/mySort.c:98-110)
  pass B  (key buckets)   device: ONE sort per bucket + segment-scan
                          classification (same row semantics as
                          engine.stage_graph's wide path); the sorted
                          row index inside bucket b plus the bucket
                          base IS the global BWT coordinate
  SP rank (device)        the compressed SP string (branch events
                          only, tiny next to the text) ranked by
                          prefix tripling (engine._suffix_ranks)
  finish  (host)          blue entries ordered by (block base, SP
                          rank, position) and scattered into the
                          coordinate-ordered bwt array

Coordinates are int64 on the HOST and chunk/bucket-local int32 on the
DEVICE — the "split index" discipline: no device array ever holds a
global position, so the 2^31/2^32 ceilings of the single-chip and
distributed tiers do not exist here. Global bases are added back in
NumPy (int64) when bucket outputs are stitched.
"""

from __future__ import annotations

import dataclasses
import functools
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from debwt_tpu import constants as K
from debwt_tpu import ops
from debwt_tpu.engine import _suffix_ranks

# one device dispatch for host-driven rank calls: eager-mode padding +
# while_loop setup costs ~10 round trips of tunnel latency otherwise
_suffix_ranks_jit = jax.jit(_suffix_ranks)
from debwt_tpu.pipeline import BwtResult, _bucket, _pow2
from debwt_tpu.special import build_special
from debwt_tpu.types import PipelineConfig, SequenceCollection

I32 = jnp.int32
KEY_MAX = np.uint32(0xFFFFFFFF)


def _malloc_trim():
    """Return freed arena pages to the OS. The pass loops allocate and
    free GB-scale transients; glibc keeps the high-water mark resident
    otherwise (measured r04: 46 GB RSS at 1 Gbp against a ~4 GB logical
    working set — the reference streams everything through 32 MiB
    buffers, src/collect#$.h:12, and this is the host-side analogue)."""
    try:
        import ctypes

        ctypes.CDLL("libc.so.6").malloc_trim(0)
    except Exception:
        pass


@dataclasses.dataclass(frozen=True)
class OocConfig:
    """Knobs for the out-of-core tier.

    chunk:      text positions per pass-A device dispatch.
    n_buckets:  key-range buckets (pass-B sorts); device peak memory is
                O(max bucket size), so more buckets = less HBM.
    spill_dir:  when set, bucket rows spill to files under this
                directory instead of host DRAM lists (the 30 Gbp
                disk tier); files are deleted as consumed, like the
                reference's temp files (src/INandOut.c:915-918).
    sp_cap:     max SP-string length rankable on one device.
    checkpoint: persist stage progress under spill_dir (manifest +
                per-bucket outputs) so an interrupted run resumes at
                the last completed bucket instead of restarting — the
                resumable version of the reference's stage-file
                discipline (SURVEY §5 checkpoint/resume). Requires
                spill_dir.
    """

    chunk: int = 1 << 26
    n_buckets: int = 64
    spill_dir: str | None = None
    sp_cap: int = 1 << 28
    checkpoint: bool = False
    # ceiling on per-dispatch device rows; buckets larger than this
    # take the oversized fallback (host full-key sort into
    # node-boundary slabs; single-key giants reduced directly).
    # Defaults to the segment-scan bound; tests shrink it to exercise
    # the fallback at toy sizes.
    bucket_cap: int | None = None


# ---------------------------------------------------------------------------
# pass A: device window keys per text chunk
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("k", "C"))
def _chunk_keys(x2w, k: int, C: int):
    """(hi, lo) node keys for the C positions of one text chunk.

    x2w: uint32[(C + k + 15) // 16] packed 2-bit codes of the chunk
    plus a k-char forward halo (separators stored as T).
    """
    x2c = ops.unpack_2bit_words(x2w, C + k)
    return ops.window_keys(x2c[: C + k - 1], k)


def sample_splitters(x2: np.ndarray, n: int, c: int, seed: int = 17,
                     samples: int = 1 << 16) -> np.ndarray:
    """n-1 equal-depth uint32 splitters over c-char window prefixes
    (the balance role of mySort's cumulative bucket counts,
    src/mySort.c:104-110). c = min(16, k) chars: deep enough to split
    hot 8-char buckets under low-complexity skew; only a single k-mer
    with > 1/n mass is unsplittable (node groups must stay
    bucket-local by design)."""
    P = max(1, x2.shape[0] - c)
    idx = np.random.default_rng(seed).integers(0, P, size=samples)
    v = np.zeros(samples, dtype=np.uint32)
    for i in range(c):
        v = (v << 2) | x2[np.minimum(idx + i, x2.shape[0] - 1)].astype(np.uint32)
    v.sort()
    qs = (np.arange(1, n) * samples) // n
    return v[qs]


class _BucketStore:
    """Per-bucket row spill: host-DRAM lists, or append-only files
    under spill_dir (one file per bucket per column). `reopen=True`
    attaches to a completed pass-A spill (checkpoint resume) instead
    of truncating it."""

    COLS = (("hi", np.uint32), ("lo", np.uint32), ("k16", np.uint16),
            ("pos", np.int64))

    def __init__(self, n_buckets: int, spill_dir: str | None,
                 reopen: bool = False):
        self.n = n_buckets
        self.dir = spill_dir
        if spill_dir:
            os.makedirs(spill_dir, exist_ok=True)
            if reopen:
                self._fh = {}
            else:
                self._fh = {
                    (b, c): open(
                        os.path.join(spill_dir, f"bk{b}.{c}"), "wb"
                    )
                    for b in range(n_buckets) for c, _ in self.COLS
                }
        else:
            assert not reopen
            self._mem = [
                {c: [] for c, _ in self.COLS} for _ in range(n_buckets)
            ]
        self.sizes = np.zeros(n_buckets, dtype=np.int64)

    def append(self, b: int, hi, lo, k16, pos):
        self.sizes[b] += hi.shape[0]
        cols = dict(hi=hi, lo=lo, k16=k16, pos=pos)
        if self.dir:
            for c, dt in self.COLS:
                self._fh[(b, c)].write(
                    np.ascontiguousarray(cols[c].astype(dt)).tobytes()
                )
        else:
            for c, dt in self.COLS:
                self._mem[b][c].append(cols[c].astype(dt))

    def load(self, b: int, consume: bool = True, staging: dict | None = None):
        """Fetch bucket b's rows; consume=True deletes them (pass
        consume=False under checkpointing and call delete(b) after the
        manifest records the bucket complete). `staging`, when given,
        maps column name -> a preallocated array of >= bucket rows:
        files are read INTO it (bounded, alloc-free) and views are
        returned — the 30 Gbp RSS discipline."""
        if self.dir:
            out = {}
            for c, dt in self.COLS:
                fh = self._fh.get((b, c))
                if fh is not None:
                    fh.close()
                path = os.path.join(self.dir, f"bk{b}.{c}")
                if staging is not None:
                    rows = int(self.sizes[b])
                    view = staging[c][:rows]
                    with open(path, "rb") as f:
                        got = f.readinto(memoryview(view).cast("B"))
                    assert got == rows * view.dtype.itemsize, (got, rows)
                    out[c] = view
                else:
                    out[c] = np.fromfile(path, dtype=dt)
                if consume:
                    os.unlink(path)   # deleted as consumed
            return out["hi"], out["lo"], out["k16"], out["pos"]
        cols = self._mem[b]
        out = tuple(
            np.concatenate(cols[c]) if cols[c] else np.empty(0, dt)
            for c, dt in self.COLS
        )
        self._mem[b] = None   # release as consumed
        return out

    def delete(self, b: int):
        if self.dir:
            for c, _ in self.COLS:
                path = os.path.join(self.dir, f"bk{b}.{c}")
                if os.path.exists(path):
                    os.unlink(path)

    def close(self):
        if self.dir:
            for fh in self._fh.values():
                if not fh.closed:
                    fh.close()


# ---------------------------------------------------------------------------
# pass B: one sort + segment-scan classification per bucket
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("cap",))
def _classify_bucket(r_hi, r_lo, r_k16, r_ord, cap: int):
    """Classify one bucket of rows (same semantics as the wide path of
    engine.stage_graph, reference mergeKmer src/INandOut.c:252-445).

    Row layout (r_k16, int32):
      main row:  choice<<8 | bwt_char<<4 | head<<3 | predf   (< 1<<12)
      special:   1<<12                                        (char in ord)
      padding:   2<<12
    r_ord: main = input row index; special = true_rank<<3 | char6.

    Returns per SORTED row:
      fill6      uint8  partial BWT char (0 in blue slots)
      mo, mi     bool   per-node flags broadcast to node rows
      seg_start  int32  local sorted index of the row's segment start
      ord_s      int32  input row index (-1 for non-main rows)
      bwt3       uint8  the row's BWT char (blue char source)
      total      int32  number of valid rows (== bucket coordinate span)
    """
    r_hi, r_lo, r_k16, r_ord = jax.lax.sort(
        (r_hi, r_lo, r_k16, r_ord), num_keys=4
    )
    r_spec = r_k16 >> 12
    is_node_row = r_spec == 0
    row_valid = r_spec <= 1
    choice = (r_k16 >> 8) & 15
    r_pred = r_k16 & 7
    r_head = (r_k16 & 8) != 0
    newseg = jnp.ones(cap, bool)
    newseg = newseg.at[1:].set(
        (r_hi[1:] != r_hi[:-1])
        | (r_lo[1:] != r_lo[:-1])
        | (r_spec[1:] != r_spec[:-1])
    )
    choice_chg = jnp.zeros(cap, bool).at[1:].set(choice[1:] != choice[:-1])
    mo_ind = ((choice_chg & ~newseg) | (choice >= 4)) & is_node_row

    is_last = jnp.concatenate([newseg[1:], jnp.ones(1, bool)])
    cols = jnp.stack([
        (r_pred == 0) & is_node_row,
        (r_pred == 1) & is_node_row,
        (r_pred == 2) & is_node_row,
        (r_pred == 3) & is_node_row,
        r_head & is_node_row,
        mo_ind,
    ]).astype(I32)
    S = jnp.cumsum(cols, axis=1)
    S_excl = S - cols
    BIG = jnp.iinfo(jnp.int32).max
    seg_end = jax.lax.cummin(
        jnp.where(is_last[None, :], S, BIG), axis=1, reverse=True
    )
    tot = seg_end - S_excl
    in_d = (
        (tot[0] > 0).astype(I32) + (tot[1] > 0).astype(I32)
        + (tot[2] > 0).astype(I32) + (tot[3] > 0).astype(I32)
    )
    mo_seg = tot[5] > 0
    mi_seg = (in_d >= 2) | (tot[4] > 0)
    pred_sum = (
        (tot[1] > 0).astype(I32) + 2 * (tot[2] > 0).astype(I32)
        + 3 * (tot[3] > 0).astype(I32)
    )
    pred_single = jnp.where(in_d == 1, pred_sum, 0)
    assert cap < (1 << 27), cap   # idx<<4|facts fits int32
    idx = jnp.arange(cap, dtype=I32)
    facts = (
        (pred_single << 2) | (mi_seg.astype(I32) << 1) | mo_seg.astype(I32)
    )
    bcast = jax.lax.cummax(jnp.where(newseg, (idx << 4) | facts, -1))
    seg_start = bcast >> 4
    f_row = bcast & 15
    mo_row = ((f_row & 1) != 0) & is_node_row
    mi_row = ((f_row & 2) != 0) & is_node_row
    pred_single_row = ((f_row >> 2) & 3).astype(jnp.uint8)
    is_spec1 = r_spec == 1
    spec_char_row = (r_ord & 7).astype(jnp.uint8)
    fill_row = jnp.where(
        is_spec1, spec_char_row,
        jnp.where(mi_row, jnp.uint8(0), pred_single_row),
    )
    fill6 = jnp.where(row_valid, fill_row, 0).astype(jnp.uint8)
    ord_s = jnp.where(is_node_row, r_ord, -1)
    bwt3 = ((r_k16 >> 4) & 7).astype(jnp.uint8)
    total = jnp.sum(row_valid.astype(I32))
    return fill6, mo_row, mi_row, seg_start, ord_s, bwt3, total


# ---------------------------------------------------------------------------
# checkpoint manifest (resume-by-stage, SURVEY §5)
# ---------------------------------------------------------------------------


def _fingerprint(coll, m: int, nb: int, C: int) -> str:
    import hashlib

    h = hashlib.sha256()
    # the trailing 2 versions the splitter format (uint32, min(16,k)
    # chars) — manifests written by older splitter code must not resume
    h.update(np.asarray(
        [coll.bwt_len, coll.n_reads, m, nb, C, 2], dtype=np.int64
    ).tobytes())
    h.update(coll.x2[:4096].tobytes())
    h.update(coll.x2[-4096:].tobytes())
    return h.hexdigest()


def _manifest_path(d):
    return os.path.join(d, "manifest.json")


def _ckpt_load(d, fp):
    import json

    p = _manifest_path(d)
    if not os.path.exists(p):
        return None
    try:
        st = json.loads(open(p).read())
    except (OSError, ValueError):
        return None
    if st.get("fingerprint") != fp or st.get("stage") == "done":
        return None
    return st


def _ckpt_save(d, st):
    import json

    tmp = _manifest_path(d) + ".tmp"
    with open(tmp, "w") as f:
        f.write(json.dumps(st))
    os.replace(tmp, _manifest_path(d))   # atomic: crash-safe manifest


def _sp_ranks_host(sp6: np.ndarray, L: int, ooc: "OocConfig", mesh,
                   say) -> np.ndarray:
    """Suffix ranks of sp6[:L] as a host int32 array.

    L <= ooc.sp_cap: single-device prefix tripling (engine path).
    L  > ooc.sp_cap: the ooc x dist composition — the SP string is
    block-sharded over `mesh` and ranked by parallel/sprank's
    sample-sort prefix tripling; no device ever holds the whole
    string. The rank array lands on the HOST (int32, L*4 bytes), which
    is exactly the ooc tier's working store — the cap being removed is
    device memory, not host. Sampling-tail partition overflow retries
    with doubled slack (detected, never silent; see
    sprank.sp_ranks_sharded).
    """
    if L == 0:
        return np.empty(0, np.int32)
    if L <= ooc.sp_cap:
        # eighth-power bucket, not _pow2: at L = 157M (1 Gbp input) a
        # power-of-two cap pads every rank-round sort by up to 53%
        Lc = _bucket(L)
        ext = np.zeros(Lc, dtype=np.uint8)
        ext[:L] = sp6
        return np.asarray(jax.device_get(
            _suffix_ranks_jit(jnp.asarray(ext), jnp.int32(L))
        ))[:L]
    if mesh is None or int(mesh.devices.size) < 2:
        raise NotImplementedError(
            f"SP string ({L} events) exceeds the single-device rank cap "
            f"{ooc.sp_cap} and no multi-device mesh was given; pass "
            f"mesh= (build_bwt_ooc) or route via api.build"
        )
    from jax.sharding import NamedSharding, PartitionSpec
    from debwt_tpu.parallel.sprank import sp_ranks_sharded

    n = int(mesh.devices.size)
    Pb = max(8, _pow2(-(-L // n)))   # round0 uses an 8-char halo
    padded = np.zeros(n * Pb, dtype=np.uint8)
    padded[:L] = sp6
    sp6_blk = jax.device_put(
        padded.reshape(n, Pb), NamedSharding(mesh, PartitionSpec("d"))
    )
    for slack in (2, 4, 8):
        rank_blk = sp_ranks_sharded(mesh, sp6_blk, L, slack=slack)
        if rank_blk is not None:
            say(f"SP ranks: sharded over {n} devices "
                f"(block {Pb}, slack {slack})")
            return np.asarray(
                jax.device_get(rank_blk)
            ).reshape(-1)[:L].astype(np.int32)
    raise RuntimeError(
        "sharded SP ranking overflowed its routing partitions at "
        "slack=8 — pathological splitter-sample skew"
    )


def blue_coordinates(b_base, b_pos, b_char, rank, sp_pos):
    """Final BWT coordinates of the case-3 (blue) entries: sort by
    (block base, SP-suffix rank, position) — position ascending for
    equal ranks is the reference's LIFO-queue drain discipline
    (src/generateSP.c:662-680) — then coordinate = base + index within
    the equal-base run. All arithmetic is int64: bases past 2^32 (the
    30 Gbp tier) are exact."""
    b_base = b_base.astype(np.int64)
    L = sp_pos.shape[0]
    sp_idx = np.searchsorted(sp_pos, b_pos, side="left")
    sp_idx = np.minimum(sp_idx, max(0, L - 1))
    order = np.lexsort((b_pos, rank[sp_idx], b_base))
    base_s = b_base[order]
    n = base_s.shape[0]
    first = np.ones(n, dtype=bool)
    first[1:] = base_s[1:] != base_s[:-1]
    seg_start_idx = np.maximum.accumulate(
        np.where(first, np.arange(n, dtype=np.int64), 0)
    )
    within = np.arange(n, dtype=np.int64) - seg_start_idx
    return base_s + within, b_char[order]


# ---------------------------------------------------------------------------
# driver
# ---------------------------------------------------------------------------


def build_bwt_ooc(
    coll: SequenceCollection,
    config: PipelineConfig | None = None,
    ooc: OocConfig | None = None,
    stats: dict | None = None,
    mesh=None,
) -> BwtResult:
    """stats, when given, is filled with {'bucket_cap', 'chunk',
    'n_chunks', 'sp_len', 'n_blue', 'sharded_rank'} — the test hook
    that proves device arrays stay bounded by the caps while N is
    unbounded. mesh: a 1-D jax.sharding.Mesh; when given and the SP
    string exceeds OocConfig.sp_cap, SP ranking runs block-sharded
    over it (the ooc x dist composition — the 30 Gbp pod shape)."""
    config = config or PipelineConfig()
    ooc = ooc or OocConfig()
    m, k = config.m, config.k
    N = coll.bwt_len
    trace = os.environ.get("DEBWT_TRACE") == "1"

    def _say(msg):
        if trace:
            print(f"[debwt-tpu ooc] {msg}", file=sys.stderr)

    timings: dict = {}
    _t0 = [time.time()]

    def _mark(label):
        now = time.time()
        timings[label] = timings.get(label, 0.0) + (now - _t0[0])
        _t0[0] = now

    sp = build_special(coll, m)
    _mark("special module (host)")
    nb = ooc.n_buckets
    C = min(ooc.chunk, _pow2(N))
    n_chunks = -(-N // C)
    ckpt = bool(ooc.checkpoint and ooc.spill_dir)
    state = None
    fp = None
    if ckpt:
        os.makedirs(ooc.spill_dir, exist_ok=True)
        fp = _fingerprint(coll, m, nb, C)
        state = _ckpt_load(ooc.spill_dir, fp)
        if state is not None:
            _say(f"resuming from checkpoint: stage {state['stage']}"
                 + (f" bucket {state.get('next_bucket')}"
                    if state["stage"] == "B" else ""))
    split_c = min(16, k)
    if state is not None:
        splitters = np.asarray(state["splitters"], dtype=np.uint32)
    else:
        splitters = sample_splitters(coll.x2, nb, split_c)
    x2p = np.concatenate(
        [coll.x2, np.full(K.TAIL_PAD, K.T, dtype=np.uint8)]
    )

    # ---- pass A: keys on device, metadata + binning on host ----
    if state is not None:
        store = _BucketStore(nb, ooc.spill_dir, reopen=True)
        store.sizes = np.asarray(state["sizes"], dtype=np.int64)
    else:
        store = _BucketStore(nb, ooc.spill_dir)
    sep = coll.sep                         # int64, sorted, sep[-1] == N-1
    is_sep_prev = np.zeros(N, dtype=bool)  # position follows a separator
    is_sep_prev[0] = True
    is_sep_prev[sep[:-1] + 1] = True

    pending = None   # (c0, C_real, device keys) — one-deep pipeline so
    #                   chunk i+1's dispatch overlaps chunk i's binning

    from debwt_tpu.io import native as _native

    use_native = _native.has_ooc_bin()
    sep_c = np.ascontiguousarray(sep)
    spl_c = np.ascontiguousarray(splitters.astype(np.uint32))

    def _bin_rows(c0, C_real, hi_d, lo_d):
        hi = np.ascontiguousarray(np.asarray(jax.device_get(hi_d))[:C_real])
        lo = np.ascontiguousarray(np.asarray(jax.device_get(lo_d))[:C_real])
        if use_native:
            # streaming C++ binner: O(C), no argsort, no fancy gathers
            # (csrc/ooc_binner.cpp — the 30 Gbp ingest hot loop)
            o_hi, o_lo, o_k16, o_pos, cnts = _native.ooc_bin(
                hi, lo, c0, sep_c, x2p, N, spl_c, split_c, k
            )
            s = 0
            for b in range(nb):
                e = s + int(cnts[b])
                if e > s:
                    store.append(b, o_hi[s:e], o_lo[s:e], o_k16[s:e],
                                 o_pos[s:e])
                s = e
            return
        pos = c0 + np.arange(C_real, dtype=np.int64)
        nxt = np.searchsorted(sep, pos)
        dist = sep[nxt] - pos
        valid = dist >= k
        if not valid.any():
            return
        hi, lo, pos, dist = hi[valid], lo[valid], pos[valid], dist[valid]
        nextc = x2p[pos + k].astype(np.uint16)
        is_tailw = dist == k
        choice = np.where(
            is_tailw, np.where(pos + k == N - 1, 5, 4), nextc
        ).astype(np.uint16)
        head = is_sep_prev[pos]
        prev = x2p[np.maximum(pos - 1, 0)].astype(np.uint16)
        bwt_char = np.where(
            pos == 0, 5, np.where(head, 4, prev)
        ).astype(np.uint16)
        predf = np.where(head, 7, prev).astype(np.uint16)
        k16 = (
            (choice << 8) | (bwt_char << 4) | (head.astype(np.uint16) << 3)
            | predf
        )
        topc = ((hi.astype(np.uint64) << np.uint64(32)) | lo) >> np.uint64(
            2 * (k - split_c)
        )
        dest = np.searchsorted(splitters, topc.astype(np.uint32),
                               side="right")
        order = np.argsort(dest, kind="stable")
        dest_s = dest[order]
        bounds = np.searchsorted(dest_s, np.arange(nb + 1))
        for b in range(nb):
            s, e = bounds[b], bounds[b + 1]
            if s < e:
                sl = order[s:e]
                store.append(b, hi[sl], lo[sl], k16[sl], pos[sl])

    if state is None:
        for ci in range(n_chunks):
            c0 = ci * C
            C_real = min(C, N - c0)
            buf = np.full(C + k, K.T, dtype=np.uint8)
            take = min(C + k, x2p.shape[0] - c0)
            buf[:take] = x2p[c0 : c0 + take]
            kw = jnp.asarray(ops.pack_2bit_words_host(buf))
            keys = _chunk_keys(kw, k, C)
            if pending is not None:
                _bin_rows(*pending)
                _malloc_trim()
            pending = (c0, C_real, *keys)
        if pending is not None:
            _bin_rows(*pending)
            _malloc_trim()
        store.close()
        _mark("pass A (keys + binning)")
        _say(f"pass A: {n_chunks} chunks of {C}, bucket rows "
             f"max={int(store.sizes.max())} total={int(store.sizes.sum())}")
        if ckpt:
            state = {
                "fingerprint": fp, "stage": "A",
                "sizes": store.sizes.tolist(),
                "splitters": splitters.tolist(),
            }
            _ckpt_save(ooc.spill_dir, state)
    else:
        # checkpoint resume skipped pass A — reset the timing origin so
        # the attach time doesn't get folded into "pass B" (--timings)
        _mark("pass A (resume attach)")

    # special rows -> buckets (true suffix order preserved per bucket
    # because splitters partition the key space monotonically)
    spec_topc = (
        sp.spec_tfill >> np.uint64(2 * (k - split_c))
    ).astype(np.uint32)
    spec_dest = np.searchsorted(splitters, spec_topc, side="right")
    spec_hi = (sp.spec_tfill >> np.uint64(32)).astype(np.uint32)
    spec_lo = (sp.spec_tfill & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    spec_rank = np.arange(sp.spec_tfill.shape[0], dtype=np.int64)
    # spec payload rank<<3|char must fit the int32 sort operand
    assert (sp.spec_tfill.shape[0] << 3) < (1 << 31), sp.spec_tfill.shape

    # ---- pass B: per-bucket sort + classification ----
    # buckets past the device segment-scan bound (2^27 rows — a hot
    # shared prefix the u32 splitters could not cut) take the
    # oversized fallback below: host full-key sort into node-boundary
    # slabs, with single-key giants reduced directly. The device cap
    # is sized by the largest NORMAL bucket.
    DEV_BOUND = min(1 << 26, ooc.bucket_cap or (1 << 26))
    sizes_tot = store.sizes + np.bincount(spec_dest, minlength=nb)
    if int(sizes_tot.max(initial=16)) > DEV_BOUND:
        cap = DEV_BOUND
    else:
        cap = _pow2(int(sizes_tot.max(initial=16)))
    assert cap <= DEV_BOUND, cap
    start_b = 0
    base = 0                      # int64 host coordinate — no 2^32 cap
    if ckpt:
        bwt_path = os.path.join(ooc.spill_dir, "bwt6.u8")
        sp_path = os.path.join(ooc.spill_dir, "sp_pos.i64")
        bl_paths = [os.path.join(ooc.spill_dir, f"blue.{c}")
                    for c in ("base.i64", "pos.i64", "char.u8")]
        resuming_b = (
            state is not None and state["stage"] == "B"
            and os.path.exists(bwt_path)
        )
        if resuming_b:
            start_b = int(state["next_bucket"])
            base = int(state["base"])
            bwt6 = np.memmap(bwt_path, dtype=np.uint8, mode="r+",
                             shape=(N,))
            # drop any partial outputs from an interrupted bucket
            with open(sp_path, "ab") as f:
                f.truncate(int(state["sp_count"]) * 8)
            for p, w in zip(bl_paths, (8, 8, 1)):
                with open(p, "ab") as f:
                    f.truncate(int(state["blue_count"]) * w)
        else:
            bwt6 = np.memmap(bwt_path, dtype=np.uint8, mode="w+",
                             shape=(N,))
            for p in [sp_path] + bl_paths:
                open(p, "wb").close()
        sp_f = open(sp_path, "ab")
        bl_f = [open(p, "ab") for p in bl_paths]
        sp_count = start_b and int(state["sp_count"]) or 0
        blue_count = start_b and int(state["blue_count"]) or 0
    else:
        if ooc.spill_dir:
            # disk-spill mode always memmaps the output (not only under
            # checkpointing): the array pages to the spill dir instead
            # of pinning N bytes of RSS — the reference's bounded-buffer
            # discipline (src/collect#$.h:12) applied to the result
            bwt6 = np.memmap(
                os.path.join(ooc.spill_dir, "bwt6.u8"), dtype=np.uint8,
                mode="w+", shape=(N,),
            )
        else:
            bwt6 = np.zeros(N, dtype=np.uint8)
        sp_pos_parts = []             # SP event positions (int64)
        blue_parts = []               # (base int64, pos int64, char u8)
    # reusable pass-B staging: bucket files read INTO fixed buffers and
    # device operands built in fixed buffers — zero per-bucket GB
    # allocations (r04 measured 46 GB RSS/Gbp mostly as allocator
    # high-water from per-bucket transients)
    staging = (
        {c: np.empty(cap, dt) for c, dt in _BucketStore.COLS}
        if store.dir else None
    )
    r_hi_b = np.full(cap, KEY_MAX, dtype=np.uint32)
    r_lo_b = np.full(cap, KEY_MAX, dtype=np.uint32)
    r_k16_b = np.full(cap, 2 << 12, dtype=np.int32)
    r_ord_b = np.arange(cap, dtype=np.int32)
    hwm = 0                 # dirty prefix high-water mark
    spec_dirty = None       # last bucket's spec-row range in r_ord_b
    max_dev_rows = 0
    counters = {"sp": sp_count if ckpt else 0,
                "blue": blue_count if ckpt else 0}
    base_box = [base]

    def _emit(b_sp, b_blue):
        if ckpt:
            if b_sp is not None:
                sp_f.write(np.ascontiguousarray(b_sp).tobytes())
                counters["sp"] += b_sp.shape[0]
            if b_blue is not None:
                for f, arr in zip(bl_f, b_blue):
                    f.write(np.ascontiguousarray(arr).tobytes())
                counters["blue"] += b_blue[0].shape[0]
        else:
            if b_sp is not None:
                sp_pos_parts.append(b_sp)
            if b_blue is not None:
                blue_parts.append(b_blue)

    def _bucket_device(hi, lo, k16, pos, s_idx):
        """One device classification of <= cap rows (mains + specs),
        writing fills at base_box[0] and emitting SP/blue entries."""
        nonlocal hwm, spec_dirty, max_dev_rows
        nmain = hi.shape[0]
        nspec = s_idx.shape[0]
        n_rows = nmain + nspec
        bb = base_box[0]
        # restore the pristine state of the reused buffers where the
        # previous call dirtied them (tail beyond this call's rows,
        # plus the spec-row patch in the arange-valued r_ord)
        if spec_dirty is not None:
            s0, s1 = spec_dirty
            r_ord_b[s0:s1] = np.arange(s0, s1, dtype=np.int32)
            spec_dirty = None
        if hwm > n_rows:
            r_hi_b[n_rows:hwm] = KEY_MAX
            r_lo_b[n_rows:hwm] = KEY_MAX
            r_k16_b[n_rows:hwm] = 2 << 12
        hwm = max(hwm, n_rows)
        r_hi_b[:nmain] = hi
        r_lo_b[:nmain] = lo
        r_k16_b[:nmain] = k16
        if nspec:
            r_hi_b[nmain:n_rows] = spec_hi[s_idx]
            r_lo_b[nmain:n_rows] = spec_lo[s_idx]
            r_k16_b[nmain:n_rows] = 1 << 12
            r_ord_b[nmain:n_rows] = (
                (spec_rank[s_idx] << 3) | sp.spec_bwt6[s_idx]
            ).astype(np.int32)
            spec_dirty = (nmain, n_rows)
        fill6, mo_row, mi_row, seg_start, ord_s, bwt3, total = (
            _classify_bucket(
                jnp.asarray(r_hi_b), jnp.asarray(r_lo_b),
                jnp.asarray(r_k16_b), jnp.asarray(r_ord_b), cap,
            )
        )
        total = int(total)
        assert total == n_rows, (total, n_rows)
        max_dev_rows = max(max_dev_rows, cap)
        fill6 = np.asarray(jax.device_get(fill6))[:total]
        bwt6[bb : bb + total] = fill6
        mo_h = np.asarray(jax.device_get(mo_row))[:total]
        mi_h = np.asarray(jax.device_get(mi_row))[:total]
        ord_h = np.asarray(jax.device_get(ord_s))[:total]
        b_sp = pos[ord_h[mo_h]] if mo_h.any() else None
        b_blue = None
        if mi_h.any():
            seg_h = np.asarray(jax.device_get(seg_start))[:total]
            char_h = np.asarray(jax.device_get(bwt3))[:total]
            mrows = np.nonzero(mi_h)[0]
            b_blue = (
                bb + seg_h[mrows].astype(np.int64),
                pos[ord_h[mrows]],
                char_h[mrows],
            )
        _emit(b_sp, b_blue)
        base_box[0] = bb + total

    def _giant_run(k16r, posr, s_idx):
        """A single node key with more rows than the device cap: its
        rows are ONE segment, so the per-node facts are plain
        reductions and the rows are order-free (case-2 rows all take
        the same char; case-3 rows are blue slots whose order the SP
        rank sort decides later). The reference cannot split a hot
        node either — its balance machinery (src/mySort.c:98-110)
        redistributes buckets, not nodes."""
        bb = base_box[0]
        cnt = k16r.shape[0]
        choice = (k16r >> 8) & 15
        head_any = bool((k16r & 8).any())
        predf = k16r & 7
        pv = np.unique(predf[predf < 4])
        mo = bool((choice >= 4).any()) or np.unique(choice).shape[0] >= 2
        mi = head_any or pv.shape[0] >= 2
        if mo:
            _emit(np.ascontiguousarray(posr), None)
        if mi:
            bwt6[bb : bb + cnt] = 0
            bwt3 = ((k16r >> 4) & 7).astype(np.uint8)
            _emit(None, (
                np.full(cnt, bb, dtype=np.int64),
                np.ascontiguousarray(posr),
                bwt3,
            ))
        else:
            assert pv.shape[0] == 1, pv
            bwt6[bb : bb + cnt] = np.uint8(pv[0])
        bb += cnt
        if s_idx.shape[0]:
            order = np.argsort(spec_rank[s_idx], kind="stable")
            bwt6[bb : bb + s_idx.shape[0]] = sp.spec_bwt6[s_idx][order]
            bb += s_idx.shape[0]
        base_box[0] = bb

    def _oversized_bucket(b, s_idx_all):
        """Key-skew fallback (replaces the r04 hard assert): sort the
        bucket's rows by FULL key on the host, classify node-boundary
        slabs of <= cap rows through the normal device path, and
        reduce single-key giant runs directly."""
        hi, lo, k16, pos = store.load(b, consume=not ckpt)
        key64 = (hi.astype(np.uint64) << np.uint64(32)) | lo
        s_keys = sp.spec_tfill[s_idx_all]
        nmain = key64.shape[0]
        allk = np.concatenate([key64, s_keys])
        order = np.argsort(allk, kind="stable")
        allk_s = allk[order]
        run_start = np.nonzero(np.concatenate(
            [[True], allk_s[1:] != allk_s[:-1]]
        ))[0]
        run_end = np.concatenate([run_start[1:], [allk_s.shape[0]]])
        i = 0
        n_runs = run_start.shape[0]
        while i < n_runs:
            s0 = run_start[i]
            if run_end[i] - s0 > cap:
                rows = order[s0 : run_end[i]]
                mrows = rows[rows < nmain]
                srows = rows[rows >= nmain] - nmain
                _giant_run(k16[mrows], pos[mrows], s_idx_all[srows])
                i += 1
                continue
            j = i
            while j + 1 < n_runs and run_end[j + 1] - s0 <= cap:
                j += 1
            rows = order[s0 : run_end[j]]
            mrows = rows[rows < nmain]
            srows = rows[rows >= nmain] - nmain
            _bucket_device(
                hi[mrows], lo[mrows], k16[mrows], pos[mrows],
                s_idx_all[srows],
            )
            i = j + 1

    for b in range(start_b, nb):
        s_idx = np.nonzero(spec_dest == b)[0]
        n_tot = int(store.sizes[b]) + s_idx.shape[0]
        if n_tot > 0:
            if n_tot > cap:
                _say(f"bucket {b}: {n_tot} rows exceed the device cap "
                     f"{cap} — oversized fallback (host key sort)")
                _oversized_bucket(b, s_idx)
            else:
                hi, lo, k16, pos = store.load(b, consume=not ckpt,
                                              staging=staging)
                _bucket_device(hi, lo, k16, pos, s_idx)
        if ckpt:
            sp_f.flush()
            for f in bl_f:
                f.flush()
            bwt6.flush()
            state = {
                "fingerprint": fp, "stage": "B", "next_bucket": b + 1,
                "base": int(base_box[0]), "sp_count": counters["sp"],
                "blue_count": counters["blue"],
                "sizes": store.sizes.tolist(),
                "splitters": splitters.tolist(),
            }
            _ckpt_save(ooc.spill_dir, state)
            store.delete(b)   # safe only after the manifest bump
        _malloc_trim()
    base = base_box[0]
    assert base == N, (base, N)
    _mark("pass B (bucket sorts)")
    _say(f"pass B: {nb} buckets, device rows/bucket = {max_dev_rows}")

    # ---- SP string: events in text order, ranked on device ----
    if ckpt:
        sp_f.close()
        for f in bl_f:
            f.close()
        sp_raw = np.fromfile(sp_path, dtype=np.int64)
        sp_pos_parts = [sp_raw] if sp_raw.size else []
        blue_arrs = (
            np.fromfile(bl_paths[0], dtype=np.int64),
            np.fromfile(bl_paths[1], dtype=np.int64),
            np.fromfile(bl_paths[2], dtype=np.uint8),
        )
        blue_parts = [blue_arrs] if blue_arrs[0].size else []
    sp_pos = np.sort(np.concatenate(
        sp_pos_parts + [sp.spec_branch_pos.astype(np.int64)]
    )) if (sp_pos_parts or sp.spec_branch_pos.size) else np.empty(0, np.int64)
    L = sp_pos.shape[0]
    nxt = np.searchsorted(sep, sp_pos)
    d_at = sep[nxt] - sp_pos
    is_sepc = d_at == k
    sp6 = np.where(
        is_sepc, np.where(sp_pos + k == N - 1, 5, 4), x2p[sp_pos + k]
    ).astype(np.uint8)
    rank = _sp_ranks_host(sp6, L, ooc, mesh, _say)
    _mark("SP rank")
    _say(f"SP string: {L} events"
         + (" (sharded ranking)" if L > ooc.sp_cap else ""))

    # ---- blue fill: (block base, SP rank, position) order ----
    if blue_parts:
        b_base = np.concatenate([p[0] for p in blue_parts])
        b_pos = np.concatenate([p[1] for p in blue_parts])
        b_char = np.concatenate([p[2] for p in blue_parts])
        coords, chars = blue_coordinates(b_base, b_pos, b_char, rank, sp_pos)
        bwt6[coords] = chars
    _mark("blue fill")
    _say(f"blue entries: {sum(p[0].shape[0] for p in blue_parts)}")

    if stats is not None:
        stats.update(
            bucket_cap=cap, chunk=C, n_chunks=n_chunks, sp_len=L,
            n_blue=sum(p[0].shape[0] for p in blue_parts),
            sharded_rank=L > ooc.sp_cap,
            stage_s={k_: round(v, 3) for k_, v in timings.items()},
        )
    if ckpt:
        bwt6.flush()
        _ckpt_save(ooc.spill_dir, {"fingerprint": fp, "stage": "done"})
    (sharp,) = np.nonzero(bwt6 == K.SHARP)
    (dollar,) = np.nonzero(bwt6 == K.DOLLAR)
    assert dollar.shape[0] == 1, dollar
    return BwtResult(
        sharp_pos=sharp.astype(np.int64),
        dollar_pos=int(dollar[0]),
        _bwt6=bwt6,
        _n=N,
        timings=timings,
    )
