"""Pallas TPU kernel: multi-operand bitonic sort.

Replaces jax.lax.sort for the engine's large 1D sorts (the reference's
hot comparison loops: qsort in src/mySort.c:203-238, the streaming
merge of src/INandOut.c:159-943, the SP quicksort of
src/sortBlue.c:175-280 — all re-expressed as one-shot device sorts
here). XLA's TPU sort emitter produces a comparator program whose
compile time grows with the array (measured on the axon service:
21-94 s of compile per sort at 2^27); this kernel family compiles in
seconds and runs at HBM speed.

Network: classic bitonic sort over R_pad = 2^p elements, executed by
exactly THREE compiled kernels (compile cost must not scale with p —
the merge schedule is data to the program, not program structure):

  * phase A   one pass; each T-element tile runs the FULL bitonic
              network for levels 1..t (t = log2 T) in VMEM —
              t(t+1)/2 stages, one HBM read+write.
  * global    one kernel for EVERY cross-tile stride of every level:
              the (stride, direction) parameters arrive as
              scalar-prefetch arguments, and the kernel DMAs the two
              paired tiles HBM->VMEM itself (grid = tile pairs, a
              constant across strides). The stride-s step pairs tile
              j with tile j + s/T; direction = bit l of the global
              index = a parameter-indexed bit of the pair's block
              coordinate. Pure elementwise min/max — no shuffles.
  * local     the level's remaining strides (T/2 .. 1) fuse into one
              pass of t in-VMEM stages per tile; the direction shift
              is again a scalar-prefetch parameter.

The merge schedule (global steps and local finishes per level) runs
inside ONE lax.fori_loop whose body selects global/local via lax.cond
— so the XLA program contains each kernel once, and a p=29 sort
compiles exactly as fast as a p=17 one.

Total HBM passes: 2 + sum_{l=t+1}^{p} (l - t + 1); each pass moves
8 bytes/element/operand.

In-tile compare-exchange with partner i XOR s uses lane/sublane rolls
only (the XOR shuffle is two rolls + a parity select; see
kernels/seg_or.py for why unaligned cross-lane slices are avoided).
Mosaic rejects select on i1-vector VALUES, so all boolean selection is
expressed with and/or/xor.

All operands are uint32 and compared as uint32, lexicographically on
the first num_keys operands. Signed int32 keys are handled by the
caller XOR-ing the sign bit before and after (ops.msort does this).
Ties on the full key tuple may be emitted in any order (the network is
not stable) — every engine call site either has distinct key tuples or
order-independent downstream semantics (see ops.msort).

STATUS — opt-in only (round 4). The r03 re-execution crash
(INVALID_ARGUMENT on the SECOND build_bwt call, branch-dense input)
was bisected on hardware this round via DEBWT_PALLAS_SITES at
4.6 Mbp (every green row is 3 reps, byte-identical):

    all sites                          CRASH (2nd call)
    graph alone                        green
    rank alone                         green
    sp,bk,mg,blue                      green
    rank,sp,bk,mg,blue (all finish)    green
    graph+sp                           CRASH
    graph+rank                         CRASH
    two bare jitted bitonic_sort fns
    alternated (no other Pallas)       green
    isolated kernel repeat @ 2^21      green (test_tpu_smoke)

Conclusion: the crash needs a bitonic sort in stage_graph — whose
executable also carries the window_keys and seg_or Pallas kernels —
PLUS any bitonic sort in the stage_finish executable; every
single-program configuration and every isolated form is green. That
points at runtime-level interference across executables in the
Mosaic/axon stack (scratch or semaphore lifetime), not kernel math:
whenever a configuration runs, its output is byte-identical.

jax.lax.sort also measured as fast or faster at every size tried
(e.g. 4.6 Mbp: 15.9 Mbp/s XLA vs 10.7-12.4 for every Pallas-sort
config), so ops.msort routes to XLA's sort unless
DEBWT_SORT_MIN_PALLAS is set. Keep the flag off in production.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
KEY_MAX = jnp.uint32(0xFFFFFFFF)
I32 = jnp.int32


def _xor_shuffle(x, s, lane, rowi):
    """out[i] = in[i XOR s] over the row-major flat view of a
    (rows, 128) tile, for power-of-2 s (a TRACED scalar). XOR with s
    swaps adjacent blocks of size s: a roll by +s composed with a roll
    by -s, selected by the parity of bit log2(s) of the flat index.
    Dynamic rolls keep the kernel body one stage of code — the whole
    bitonic network is a fori_loop over this, so Mosaic compiles a
    ~constant-size kernel regardless of tile size."""
    rows = x.shape[0]

    def row_case(x):
        r = jax.lax.div(s, LANES)
        fwd = pltpu.roll(x, rows - r, 0)    # out[i] = in[i + s]
        bwd = pltpu.roll(x, r, 0)           # out[i] = in[i - s]
        return jnp.where((rowi & r) == 0, fwd, bwd)

    def lane_case(x):
        fwd = pltpu.roll(x, LANES - s, 1)
        bwd = pltpu.roll(x, s, 1)
        return jnp.where((lane & s) == 0, fwd, bwd)

    return jax.lax.cond(s >= LANES, row_case, lane_case, x)


def _cmp_gt(a_ops, b_ops, nk: int):
    """lexicographic a > b over the first nk operands (uint32)."""
    gt = None
    eq = None
    for j in range(nk):
        a, b = a_ops[j], b_ops[j]
        if gt is None:
            gt, eq = a > b, a == b
        else:
            gt = gt | (eq & (a > b))
            eq = eq & (a == b)
    return gt


def _stage_in_tile(ops_, nk: int, s, desc, lane, rowi):
    """One compare-exchange stage at stride s (< tile size). Element i
    pairs with i XOR s; with strict compares both partners make the
    same decision and ties keep their places. desc may be a scalar or
    per-element bool."""
    partner = [_xor_shuffle(x, s, lane, rowi) for x in ops_]
    gt = _cmp_gt(ops_, partner, nk)          # self > partner
    lt = _cmp_gt(partner, ops_, nk)          # self < partner
    flat = rowi * LANES + lane
    lower = (flat & s) == 0
    # ascending: lower takes partner iff self > partner; upper iff
    # self < partner; descending flips both. Logical ops only (no
    # select on i1 values — Mosaic restriction).
    sel = lower ^ desc
    take = (sel & gt) | (~sel & lt)
    return [jnp.where(take, p, x) for x, p in zip(ops_, partner)]


def _mk_phase_a(n_ops: int, nk: int, t: int):
    """Full bitonic network for levels 1..t inside one tile."""

    def kern(*refs):
        in_refs, out_refs = refs[:n_ops], refs[n_ops:]
        shape = in_refs[0].shape
        lane = jax.lax.broadcasted_iota(I32, shape, 1)
        rowi = jax.lax.broadcasted_iota(I32, shape, 0)
        flat = rowi * LANES + lane
        base = pl.program_id(0) << t
        ops_ = [r[:] for r in in_refs]

        # one compare-exchange stage of code; the network is loop
        # structure over (lvl, j) with stride = 1 << (lvl-1-j)
        def lvl_body(lvl, ops_t):
            desc = (((flat + base) >> lvl) & 1) == 1

            def j_body(j, ops_t):
                stride = jax.lax.shift_left(1, lvl - 1 - j)
                return tuple(_stage_in_tile(
                    list(ops_t), nk, stride, desc, lane, rowi
                ))

            return jax.lax.fori_loop(0, lvl, j_body, ops_t)

        ops_ = jax.lax.fori_loop(1, t + 1, lvl_body, tuple(ops_))
        for o, r in zip(ops_, out_refs):
            r[:] = o

    return kern


def _mk_local(n_ops: int, nk: int, t: int):
    """Strides 2^(t-1)..1 of merge level lvl > t: direction constant
    per tile, desc = bit (lvl - t) of the tile index — the shift
    arrives as the scalar-prefetch parameter par[0]."""

    def kern(par, *refs):
        in_refs, out_refs = refs[:n_ops], refs[n_ops:]
        shape = in_refs[0].shape
        lane = jax.lax.broadcasted_iota(I32, shape, 1)
        rowi = jax.lax.broadcasted_iota(I32, shape, 0)
        desc = (
            jax.lax.shift_right_logical(pl.program_id(0), par[0]) & 1
        ) == 1
        ops_ = [r[:] for r in in_refs]

        def j_body(j, ops_t):
            stride = jax.lax.shift_left(1, t - 1 - j)
            return tuple(_stage_in_tile(
                list(ops_t), nk, stride, desc, lane, rowi
            ))

        ops_ = jax.lax.fori_loop(0, t, j_body, tuple(ops_))
        for o, r in zip(ops_, out_refs):
            r[:] = o

    return kern


def _mk_global(n_ops: int, nk: int, rows: int):
    """One cross-tile stride. Parameters par = (qc, dshift): the
    stride is qc tiles; pair i covers tiles (lo, lo + qc) with
    q = i % qc, b = i // qc, lo = 2*qc*b + q; desc = bit dshift of b.
    The kernel DMAs both tiles in, compare-exchanges elementwise, and
    DMAs the results back — operands live in HBM (ANY) so one compiled
    kernel serves every stride."""

    def kern(par, *refs):
        in_refs = refs[:n_ops]
        out_refs = refs[n_ops : 2 * n_ops]
        scr = refs[2 * n_ops : 3 * n_ops]
        sem = refs[3 * n_ops]
        qc = par[0]
        i = pl.program_id(0)
        q = jax.lax.rem(i, qc)
        b = jax.lax.div(i, qc)
        lo = (2 * qc * b + q) * rows
        hi = lo + qc * rows
        for j in range(n_ops):
            pltpu.make_async_copy(
                in_refs[j].at[pl.ds(lo, rows), :], scr[j].at[0],
                sem.at[2 * j],
            ).start()
            pltpu.make_async_copy(
                in_refs[j].at[pl.ds(hi, rows), :], scr[j].at[1],
                sem.at[2 * j + 1],
            ).start()
        for j in range(n_ops):
            pltpu.make_async_copy(
                in_refs[j].at[pl.ds(lo, rows), :], scr[j].at[0],
                sem.at[2 * j],
            ).wait()
            pltpu.make_async_copy(
                in_refs[j].at[pl.ds(hi, rows), :], scr[j].at[1],
                sem.at[2 * j + 1],
            ).wait()
        a = [scr[j][0] for j in range(n_ops)]
        c = [scr[j][1] for j in range(n_ops)]
        desc = (jax.lax.shift_right_logical(b, par[1]) & 1) == 1
        gt, lt = _cmp_gt(a, c, nk), _cmp_gt(c, a, nk)
        swap = (desc & lt) | (~desc & gt)    # no select on i1 values
        for j in range(n_ops):
            lo_v = jnp.where(swap, c[j], a[j])
            hi_v = jnp.where(swap, a[j], c[j])
            scr[j][0] = lo_v
            scr[j][1] = hi_v
        for j in range(n_ops):
            pltpu.make_async_copy(
                scr[j].at[0], out_refs[j].at[pl.ds(lo, rows), :],
                sem.at[2 * j],
            ).start()
            pltpu.make_async_copy(
                scr[j].at[1], out_refs[j].at[pl.ds(hi, rows), :],
                sem.at[2 * j + 1],
            ).start()
        for j in range(n_ops):
            pltpu.make_async_copy(
                scr[j].at[0], out_refs[j].at[pl.ds(lo, rows), :],
                sem.at[2 * j],
            ).wait()
            pltpu.make_async_copy(
                scr[j].at[1], out_refs[j].at[pl.ds(hi, rows), :],
                sem.at[2 * j + 1],
            ).wait()

    return kern


@functools.partial(
    jax.jit, static_argnames=("num_keys", "tile_log2", "interpret")
)
def bitonic_sort(
    operands,
    num_keys: int = 1,
    tile_log2: int = 16,
    interpret: bool | None = None,
):
    """Sort uint32 operands lexicographically by the first num_keys.

    Returns the sorted operands (uint32, same length). Key operands are
    padded with KEY_MAX up to the next power of two so pad rows sort to
    the tail; the pad is sliced off before returning.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    operands = tuple(operands)
    n_ops = len(operands)
    R = operands[0].shape[0]
    assert all(o.shape == (R,) and o.dtype == jnp.uint32 for o in operands)
    assert 1 <= num_keys <= n_ops
    p = max(10, (max(R, 2) - 1).bit_length())
    t = min(tile_log2, p)
    T = 1 << t
    rows = T // LANES
    R_pad = 1 << p
    n_tiles = R_pad // T

    def padded(o, is_key):
        fill = KEY_MAX if is_key else jnp.uint32(0)
        return jnp.concatenate([o, jnp.full(R_pad - R, fill, jnp.uint32)])

    ops_ = [padded(o, j < num_keys) for j, o in enumerate(operands)]
    shaped = [o.reshape(n_tiles * rows, LANES) for o in ops_]
    tile_spec = pl.BlockSpec((rows, LANES), lambda i, *_: (i, 0))

    def sds(arrs):
        return [
            jax.ShapeDtypeStruct(a.shape, jnp.uint32, vma=jax.typeof(a).vma)
            for a in arrs
        ]

    out = pl.pallas_call(
        _mk_phase_a(n_ops, num_keys, t),
        grid=(n_tiles,),
        in_specs=[tile_spec] * n_ops,
        out_specs=[tile_spec] * n_ops,
        out_shape=sds(shaped),
        interpret=interpret,
    )(*shaped)
    shaped = [out] if isinstance(out, jnp.ndarray) else list(out)

    # ---- merge schedule: data, not program structure ----
    sched = []                       # (is_global, qc, dshift)
    for lvl in range(t + 1, p + 1):
        for sl in range(lvl - 1, t - 1, -1):
            sched.append((1, 1 << (sl - t), lvl - (sl + 1)))
        sched.append((0, 1, lvl - t))
    if not sched:
        return tuple(o.reshape(-1)[:R] for o in shaped)
    kind_a = jnp.asarray([s[0] for s in sched], I32)
    qc_a = jnp.asarray([s[1] for s in sched], I32)
    dsh_a = jnp.asarray([s[2] for s in sched], I32)

    local_call = pl.pallas_call(
        _mk_local(n_ops, num_keys, t),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_tiles,),
            in_specs=[tile_spec] * n_ops,
            out_specs=[tile_spec] * n_ops,
        ),
        out_shape=sds(shaped),
        interpret=interpret,
    )
    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    global_call = pl.pallas_call(
        _mk_global(n_ops, num_keys, rows),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_tiles // 2,),
            in_specs=[any_spec] * n_ops,
            out_specs=[any_spec] * n_ops,
            scratch_shapes=(
                [pltpu.VMEM((2, rows, LANES), jnp.uint32)] * n_ops
                + [pltpu.SemaphoreType.DMA((2 * n_ops,))]
            ),
        ),
        out_shape=sds(shaped),
        interpret=interpret,
    )

    def body(j, ops_t):
        par2 = jnp.stack([qc_a[j], dsh_a[j]])
        out = jax.lax.cond(
            kind_a[j] == 1,
            lambda o: tuple(global_call(par2, *o)),
            lambda o: tuple(local_call(par2[1:], *o)),
            ops_t,
        )
        return out

    shaped = jax.lax.fori_loop(0, len(sched), body, tuple(shaped))
    return tuple(o.reshape(-1)[:R] for o in shaped)
