"""Batched anchor search + bidirectional de Bruijn walk (encode & decode).

This is the hot path of the whole compressor — the TPU-native re-design of
the reference's per-read DnaEncoder/DnaDecoder ([R] gatb-core
tools/compression/DnaCoder.{hpp,cpp}; behavior contract at
/root/reference/README.md:13: "each read is encoded as a path in this graph,
storing only an anchoring kmer and a list of bifurcations").

Instead of one thread per read (reference Dispatcher), every read is a
vector lane: a `lax.scan` over walk steps advances all lanes together, each
step doing 4 candidate Bloom probes per lane (gathered bit tests in HBM).

Performance shape: the scan body contains NO scatters — each step yields
per-lane event flags/values (`ys` planes, stacked by the scan itself), and
event-stream compaction happens afterwards with cumsum-offset scatters over
whole (B, ME) planes (TPU scatters are serialization-slow; 4 per plane
beats 4 per step by ~ME x). The walk policy is frozen in FORMAT.md §6.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from leon_tpu.ops import bloom
from leon_tpu.ops.kmer import U32, shl2, shr2_ins, words_for_k


def _rol1(x):
    return (x << U32(1)) | (x >> U32(31))


def _ror1(x):
    return (x >> U32(1)) | (x << U32(31))


def _tab(tab_np, kind):
    return jnp.asarray(tab_np[kind])  # (4,) u32 constant


def _take4(tabc, idx):
    """Lookup a (4,) u32 constant table at (...,)-int indices via one-hot
    select — XLA lowers jnp.take to a gather, and gathers inside the walk
    scan are the measured bottleneck (~94M gathered words/s on v5e); the
    one-hot sum is pure VPU."""
    oh = idx[..., None] == jnp.arange(4, dtype=idx.dtype)
    return jnp.sum(jnp.where(oh, tabc, jnp.uint32(0)), axis=-1)


def _sel4(arr, idx):
    """arr[..., idx] over a width-4 trailing axis, one-hot (gather-free)."""
    oh = idx[..., None] == jnp.arange(4, dtype=idx.dtype)
    return jnp.sum(jnp.where(oh, arr, jnp.zeros((), arr.dtype)), axis=-1)


# --- SCALARIZED forms ---------------------------------------------------
# TPU lays the minor-most axis onto the 128-lane vector unit, so any
# (B, 4) intermediate runs the VPU at 4/128 occupancy and forces a
# relayout against the (B,) scan carries. Measured on v5e: the identical
# probe scan is ~500x faster with four separate (B,) candidate arrays
# than with one (B, 4) array. The hot scans below therefore never build
# a trailing-4 axis: tables index as PYTHON scalars and width-4 selects
# are where-chains.


def _tabn(tab_np, kind):
    """(4,) python-int table row (embeds as scalar constants)."""
    return [int(x) for x in tab_np[kind]]


def _take4c(trow, idx):
    """trow[idx] for a python-int (4,) table and (B,) int idx, as a
    where-chain of scalar constants (no (B, 4) intermediate)."""
    return jnp.where(idx == 0, U32(trow[0]),
           jnp.where(idx == 1, U32(trow[1]),
           jnp.where(idx == 2, U32(trow[2]), U32(trow[3]))))


def _sel4w(vals, idx):
    """vals[idx] over a python list of four (B,) arrays (where-chain)."""
    return jnp.where(idx == 0, vals[0],
           jnp.where(idx == 1, vals[1],
           jnp.where(idx == 2, vals[2], vals[3])))


def _shl2_t(ws, base, k: int):
    """shl2 over a TUPLE of W (B,) words (no (B, W) stack in the scan)."""
    from leon_tpu.ops.kmer import top_mask

    W = len(ws)
    out = [(ws[0] << U32(2)) | base]
    for j in range(1, W):
        out.append((ws[j] << U32(2)) | (ws[j - 1] >> U32(30)))
    out[W - 1] = out[W - 1] & U32(top_mask(k))
    return tuple(out)


def _shr2_ins_t(ws, base, k: int):
    """shr2_ins over a tuple of W (B,) words."""
    W = len(ws)
    out = [(ws[j] >> U32(2)) | (ws[j + 1] << U32(30)) for j in range(W - 1)]
    out.append(ws[W - 1] >> U32(2))
    t = 2 * (k - 1)
    wi, bit = t // 32, t % 32
    out[wi] = out[wi] | (base << U32(bit))
    return tuple(out)


def _anchor_scan(codes, k: int, seed: int):
    """One pass over base columns: the two rolling strand-chain values at
    every k-mer position (FORMAT.md §4 v4). Returns hs 2x(B,P). The
    k-mer window itself is NOT carried: only the selected anchor's window
    is ever needed, and _anchor_state repacks it from the codes directly
    — carrying + stacking (B, P, W) word planes was ~40% of this scan."""
    B, L = codes.shape
    tab = bloom.tables(seed, k)
    T, Tc, Trot, Tcrot = (_tabn(tab, i) for i in range(4))
    cols = codes.T.astype(jnp.int32)  # (L, B)
    # leaving-base columns: base at j-k (garbage for j<k, masked by is_slide)
    leave = jnp.concatenate([jnp.zeros((k, B), jnp.int32), cols[:-k] if L > k else cols[:0]], axis=0)

    def step(carry, xs):
        f, r = carry
        x, o, j = xs
        is_slide = j >= k
        jm = jnp.minimum(j, k - 1) & 31  # scalar rotate amount (traced)

        # scalarized table lookups (_take4c): no (B, 4) intermediates
        f = _rol1(f ^ jnp.where(is_slide, _take4c(Trot, o), U32(0))) ^ _take4c(T, x)
        radd = _take4c(Tc, x)
        radd = (radd << jm.astype(U32)) | (radd >> ((U32(32) - jm.astype(U32)) & U32(31)))
        r_slide = _ror1(r ^ _take4c(Tc, o)) ^ _take4c(Tcrot, x)
        r = jnp.where(is_slide, r_slide, r ^ radd)
        return (f, r), (f, r)

    z = jnp.zeros(B, jnp.uint32)
    js = jnp.arange(L, dtype=jnp.int32)
    _, ys = lax.scan(step, (z, z), (cols, leave, js))
    # re-stack the per-position planes OUTSIDE the scan (bulk relayout)
    return tuple(jnp.moveaxis(y[k - 1 :], 0, 1) for y in ys)  # 2 x (B, P)


def _pack_window(codes, pos, k: int):
    """(B, W) u32 forward words of the k-mer window codes[i, pos[i]:+k]
    (kmer_words layout: base i at bit 2*(k-1-i))."""
    B, L = codes.shape
    idx = jnp.clip(pos[:, None] + jnp.arange(k, dtype=jnp.int32)[None, :], 0, L - 1)
    win = jnp.take_along_axis(codes, idx, axis=1).astype(jnp.uint32)
    words = []
    for j in range(words_for_k(k)):
        acc = jnp.zeros(B, jnp.uint32)
        for i in range(k):
            t = 2 * (k - 1 - i)
            if t // 32 == j:
                acc = acc | (win[:, i] << U32(t % 32))
        words.append(acc)
    return jnp.stack(words, axis=-1)


def _probe4_rolling(bitset, cf, cr, H, n_words):
    """Membership of 4 candidates given their strand hashes, each (B, 4).
    Blocked Bloom (FORMAT.md §4 v4): ONE gathered u32 word per candidate."""
    wi, mask = bloom.wordmask_from_hashes(cf, cr, H, n_words, jnp)
    return bloom.probe_wordmask(bitset, wi, mask, jnp)


def _walk_side(codes, lengths, apos, anchored, state0, bitset, k, H, n_words, seed, side, ME):
    """Scan one walk direction with rolling candidate hashes. state0 =
    (fwd words, f, r) at the anchor. Returns step-ordered planes
    (B, ME): is_bif, rank, is_err, errnt-rank (b among non-solid, v3),
    is_conf.

    Gather discipline: the scan body's ONLY gathers are the 4 Bloom-word
    probes (irreducible random HBM access). The read's next base per step
    is pre-gathered as a (ME, B) plane outside the scan (one vectorized
    take_along_axis instead of one gather per step), and every width-4
    candidate selection is a one-hot VPU sum (_sel4/_take4) — measured
    ~2.5x on the whole encode kernel vs the take_along_axis form."""
    B, L = codes.shape
    tab = bloom.tables(seed, k)
    T, Tc, Trot, Tcrot = (_tab(tab, i) for i in range(4))
    right = side == "right"
    # bit offset of the base leaving the window when advancing
    t_out = 2 * (k - 1) if right else 0

    # pre-gather the observed base and activity planes for all steps
    s_all = jnp.arange(ME, dtype=jnp.int32)[None, :]
    j_all = apos[:, None] + k + s_all if right else apos[:, None] - 1 - s_all
    active_all = anchored[:, None] & (j_all >= 0) & (j_all < lengths[:, None])
    b_all = jnp.take_along_axis(codes, jnp.clip(j_all, 0, L - 1), axis=1).astype(jnp.int32)

    def step(carry, xs):
        fwd, f, r = carry
        b, active = xs
        o = ((fwd[:, t_out // 32] >> U32(t_out % 32)) & U32(3)).astype(jnp.int32)

        if right:
            fbase = _rol1(f ^ _take4(Trot, o))
            rbase = _ror1(r ^ _take4(Tc, o))
            cf = fbase[:, None] ^ T[None, :]
            cr = rbase[:, None] ^ Tcrot[None, :]
        else:
            fbase = _ror1(f ^ _take4(T, o))
            rbase = _rol1(r ^ _take4(Tcrot, o))
            cf = fbase[:, None] ^ Trot[None, :]
            cr = rbase[:, None] ^ Tc[None, :]
        solid = _probe4_rolling(bitset, cf, cr, H, n_words)
        si = solid.astype(jnp.int32)
        scount = si.sum(axis=1)
        solid_b = _sel4(si, b).astype(bool)
        cum = jnp.cumsum(si, axis=1)
        rank = _sel4(cum, b) - 1  # valid when solid_b

        is_conf = active & solid_b & (scount == 1)
        is_bif = active & solid_b & (scount >= 2)
        is_err = active & ~solid_b
        # errnt value (FORMAT.md §6 v3): rank of b among NON-solid
        # candidates — the decoder recomputes the same solidity vector, so
        # this is decodable and skews the stream to <=3 values (~1.58 bits
        # after entropy coding vs 2.0 for the raw base code)
        cns = jnp.cumsum(1 - si, axis=1)
        ent = _sel4(cns, b) - 1

        # error correction (FORMAT.md §6): on an error, advance with the
        # smallest solid base so the walk rejoins the graph path — one
        # event per sequencing error instead of k
        b_min_solid = jnp.argmax(si, axis=1).astype(jnp.int32)
        b_adv = jnp.where(is_err & (scount >= 1), b_min_solid, b)
        fn = _sel4(cf, b_adv)
        rn = _sel4(cr, b_adv)
        bu = b_adv.astype(U32)
        if right:
            fwd = shl2(fwd, bu, k)
        else:
            fwd = shr2_ins(fwd, bu, k)
        ys = (is_bif, rank.astype(jnp.uint8), is_err, ent.astype(jnp.uint8), is_conf)
        return (fwd, fn, rn), ys

    _, ys = lax.scan(step, state0, (b_all.T, active_all.T))
    return tuple(jnp.moveaxis(y, 0, 1) for y in ys)  # each (B, ME)


def _walk_fused(codes, lengths, apos, anchored, state0, bitset, k, H, n_words,
                seed, ME):
    """Both walk directions in ONE scan of ME steps: lane i runs its
    nr_i = len_i - k - apos_i right steps, then resets to the anchor state
    and runs its nl_i = apos_i left steps — len_i - k total, bounded by ME,
    where the two side scans of _walk_side cost 2*ME steps. The 4 Bloom
    probes are the irreducible per-step cost, so the fused schedule halves
    the kernel time. Per-step event semantics are IDENTICAL to _walk_side
    (the walk policy is frozen, FORMAT.md §6); only the execution schedule
    changes — verified bit-exact against the two-scan form.

    Returns (B, ME) planes in fused step order (each lane's right events
    then its left events — exactly the container's per-segment stream
    order): is_bif, rank, is_err, ent, gap, is_conf, plus in_right and
    j_all (position per step) for the caller's masks/scatters.

    SCALARIZED: the step body keeps every per-candidate value as four
    separate (B,) arrays (see _take4c/_sel4w) — the (B, 4) form ran the
    VPU at 4/128 lane occupancy and measured ~500x slower on v5e."""
    B, L = codes.shape
    tab = bloom.tables(seed, k)
    T, Tc, Trot, Tcrot = (_tabn(tab, i) for i in range(4))
    t_hi = 2 * (k - 1)

    lengths = lengths.astype(jnp.int32)
    nr = jnp.clip(lengths - k - apos, 0, None)
    total = jnp.clip(lengths - k, 0, None)
    s_all = jnp.arange(ME, dtype=jnp.int32)[None, :]
    in_right_all = s_all < nr[:, None]
    ls_all = s_all - nr[:, None]  # left-side local index when !in_right
    j_all = jnp.where(in_right_all, apos[:, None] + k + s_all,
                      apos[:, None] - 1 - ls_all)
    active_all = anchored[:, None] & (s_all < total[:, None])
    b_all = jnp.take_along_axis(codes, jnp.clip(j_all, 0, L - 1), axis=1).astype(jnp.int32)
    lidx_all = jnp.where(in_right_all, s_all, ls_all)  # side-local step idx
    switch_all = s_all == nr[:, None]

    afwd, a1, a2 = state0
    # the k-mer window rides as a TUPLE of W (B,) words — a (B, W) carry
    # would re-tile against the (B,) carries every step (see the
    # scalarization note above)
    afwd_t = tuple(afwd[:, j] for j in range(afwd.shape[1]))

    def step(carry, xs):
        fwd, f, r, last = carry
        b, active, in_r, sw, lidx = xs
        # side switch: restart from the anchor state, fresh gap chain
        fwd = tuple(jnp.where(sw, a, w) for a, w in zip(afwd_t, fwd))
        f = jnp.where(sw, a1, f)
        r = jnp.where(sw, a2, r)
        last = jnp.where(sw, -1, last)

        o = jnp.where(
            in_r, (fwd[t_hi // 32] >> U32(t_hi % 32)) & U32(3), fwd[0] & U32(3)
        ).astype(jnp.int32)

        fb_r = _rol1(f ^ _take4c(Trot, o))
        rb_r = _ror1(r ^ _take4c(Tc, o))
        fb_l = _ror1(f ^ _take4c(T, o))
        rb_l = _rol1(r ^ _take4c(Tcrot, o))
        cfs, crs, sis = [], [], []
        for cb in range(4):
            cf = jnp.where(in_r, fb_r ^ U32(T[cb]), fb_l ^ U32(Trot[cb]))
            cr = jnp.where(in_r, rb_r ^ U32(Tcrot[cb]), rb_l ^ U32(Tc[cb]))
            wi, mask = bloom.wordmask_from_hashes(cf, cr, H, n_words, jnp)
            sis.append(bloom.probe_wordmask(bitset, wi, mask, jnp).astype(jnp.int32))
            cfs.append(cf); crs.append(cr)
        si0, si1, si2, si3 = sis
        scount = si0 + si1 + si2 + si3
        cums = [si0, si0 + si1, si0 + si1 + si2, scount]
        solid_b = _sel4w(sis, b).astype(bool)
        rank = _sel4w(cums, b) - 1

        is_conf = active & solid_b & (scount == 1)
        is_bif = active & solid_b & (scount >= 2)
        is_err = active & ~solid_b
        # rank among NON-solid candidates (errnt v3)
        ns = [1 - s for s in sis]
        cns = [ns[0], ns[0] + ns[1], ns[0] + ns[1] + ns[2],
               ns[0] + ns[1] + ns[2] + ns[3]]
        ent = _sel4w(cns, b) - 1

        gap = lidx - last - 1  # valid where is_err (side-local semantics)
        last = jnp.where(is_err, lidx, last)

        # first solid candidate (== argmax over the si row; 0 when none,
        # but that case is masked by scount >= 1 below)
        b_min_solid = jnp.where(si0 > 0, 0,
                      jnp.where(si1 > 0, 1,
                      jnp.where(si2 > 0, 2,
                      jnp.where(si3 > 0, 3, 0)))).astype(jnp.int32)
        b_adv = jnp.where(is_err & (scount >= 1), b_min_solid, b)
        fn = _sel4w(cfs, b_adv)
        rn = _sel4w(crs, b_adv)
        bu = b_adv.astype(U32)
        fl = _shl2_t(fwd, bu, k)
        fr = _shr2_ins_t(fwd, bu, k)
        fwd = tuple(jnp.where(in_r, a, c) for a, c in zip(fl, fr))
        ys = (is_bif, rank.astype(jnp.uint8), is_err, ent.astype(jnp.uint8),
              jnp.maximum(gap, 0).astype(jnp.uint16), is_conf)
        return (fwd, fn, rn, last), ys

    carry0 = (afwd_t, a1, a2, jnp.full(B, -1, jnp.int32))
    _, ys = lax.scan(step, carry0,
                     (b_all.T, active_all.T, in_right_all.T, switch_all.T,
                      lidx_all.T))
    planes = tuple(jnp.moveaxis(y, 0, 1) for y in ys)
    return planes + (in_right_all, j_all)


def _anchor_state(codes, lengths, bitset, k: int, H: int, n_words, seed: int):
    """Anchor search: (anchored (B,), apos (B,) i32, state0) where state0 =
    (afwd (B, W), f, r) is the walk state at the anchor."""
    lengths = lengths.astype(jnp.int32)
    hf, hr = _anchor_scan(codes, k, seed)
    P = hf.shape[1]
    pos = jnp.arange(P, dtype=jnp.int32)[None, :]
    valid = pos <= (lengths[:, None] - k)
    # membership at every position (B, P)
    hh = jnp.minimum(hf, hr)
    wi, mask = bloom.wordmask_from_hashes(hf, hr, H, n_words, jnp)
    member = bloom.probe_wordmask(bitset, wi, mask, jnp) & valid

    anchored = member.any(axis=1)
    # minimizer-style anchor (FORMAT.md §5): the solid position with the
    # smallest min-strand digest — overlapping reads pick the same anchor
    # k-mer, keeping the dictionary small; argmin ties break at the first
    # index
    apos = jnp.argmin(
        jnp.where(member, hh, jnp.uint32(0xFFFFFFFF)), axis=1
    ).astype(jnp.int32)
    sel = apos[:, None]
    afwd = _pack_window(codes, apos, k)
    a_h = tuple(jnp.take_along_axis(h, sel, axis=1)[:, 0] for h in (hf, hr))
    return anchored, apos, (afwd, *a_h)


@partial(jax.jit, static_argnames=("k", "H", "seed"))
def walk_planes(codes, lengths, bitset, k: int, H: int, n_words: int, seed: int):
    """Anchor search + both walk directions. Returns step-ordered planes.

    codes: (B, L) uint8 base codes (exceptions pre-substituted),
    lengths: (B,) int32, bitset: (>= n_words,) uint32 device array
    (padded to bloom.alloc_words; n_words itself is traced data).
    """
    B, L = codes.shape
    ME = max(1, L - k)
    lengths = lengths.astype(jnp.int32)
    anchored, apos, state0 = _anchor_state(codes, lengths, bitset, k, H, n_words, seed)
    r = _walk_side(codes, lengths, apos, anchored, state0, bitset, k, H, n_words, seed, "right", ME)
    l = _walk_side(codes, lengths, apos, anchored, state0, bitset, k, H, n_words, seed, "left", ME)
    return dict(
        anchored=anchored, apos=apos,
        bif_r=r[0], rank_r=r[1], err_r=r[2], bnt_r=r[3], conf_r=r[4],
        bif_l=l[0], rank_l=l[1], err_l=l[2], bnt_l=l[3], conf_l=l[4],
    )


def _gap_plane(is_err, ME):
    """Per-step error gaps (valid where is_err): step index minus previous
    error step minus one; the first error's gap is its step index — exactly
    the container's errpos gap semantics (FORMAT.md §6) because step s maps
    to position apos+k+s (right) / apos-1-s (left)."""
    s = jnp.arange(ME, dtype=jnp.int32)[None, :]
    marked = jnp.where(is_err, s, -1)
    prev_inclusive = lax.associative_scan(jnp.maximum, marked, axis=1)
    prev = jnp.concatenate(
        [jnp.full((is_err.shape[0], 1), -1, jnp.int32), prev_inclusive[:, :-1]], axis=1
    )
    return s - prev - 1


def _conf_mask(conf_r, conf_l, apos, k, L):
    """(B, L) confirmed-position mask from the two step planes (2 scatters)."""
    B, ME = conf_r.shape
    ar = jnp.arange(B)[:, None]
    s = jnp.arange(ME, dtype=jnp.int32)[None, :]
    jr = apos[:, None] + k + s
    jl = apos[:, None] - 1 - s
    out = jnp.zeros((B, L + 1), bool)
    out = out.at[ar, jnp.where(conf_r, jnp.clip(jr, 0, L), L)].set(True, mode="drop")
    out = out.at[ar, jnp.where(conf_l, jnp.clip(jl, -1, L - 1), L)].set(True, mode="drop")
    return out[:, :L]


def _encode_compact_impl(codes, lengths, bitset, k: int, H: int, n_words: int, seed: int,
                         cap_err: int, cap_bif: int, with_conf: bool):
    """Walk-encode with device-side event-stream compaction into ONE flat
    u16 buffer (the D2H tunnel is latency- and bandwidth-bound, so ship
    one small array). Event streams come out in exactly the container's
    layout (read-major, right-then-left; FORMAT.md §6): the host just
    slices and varint-encodes.

    Layout: [total_err u32x2 | total_bif u32x2] (as 4 u16)
            scal: when ME <= 255, 3 u16/read (apos|anchored<<15,
                  nerr_r|nbif_r<<8, nerr_l|nbif_l<<8 — counts fit u8
                  exactly); else 6 u16/read (anchored, apos, nbif_r,
                  nerr_r, nbif_l, nerr_l)
            errgap u16 (cap_err,) | errnt 2-bit in u16 (cap_err/8,)
            bif 2-bit in u16 (cap_bif/8,) | conf bits u16 (B, ceil(L/16)).
    Overflowing chunks are detected from the totals; the caller re-runs
    them with larger caps or the dense layout.
    """
    if cap_err % 8 or cap_bif % 8:
        raise ValueError("event capacities must be multiples of 8")
    B, L = codes.shape
    ME = max(1, L - k)
    lengths = lengths.astype(jnp.int32)
    anchored, apos, state0 = _anchor_state(codes, lengths, bitset, k, H, n_words, seed)
    (is_bif, rank, is_err, ent, gap, is_conf, in_right, j_all) = _walk_fused(
        codes, lengths, apos, anchored, state0, bitset, k, H, n_words, seed, ME
    )

    nerr_r = (is_err & in_right).sum(axis=1, dtype=jnp.int32)
    nerr_l = (is_err & ~in_right).sum(axis=1, dtype=jnp.int32)
    nbif_r = (is_bif & in_right).sum(axis=1, dtype=jnp.int32)
    nbif_l = (is_bif & ~in_right).sum(axis=1, dtype=jnp.int32)

    def compact(plane, vals, cap):
        """Scatter fused-plane values into the read-major flat stream
        (the fused step order IS right-then-left per read). Returns
        ((cap,) u32 values, total)."""
        n_tot = plane.sum(axis=1, dtype=jnp.int32)
        base = jnp.cumsum(n_tot) - n_tot  # exclusive prefix over reads
        slot = jnp.cumsum(plane, axis=1, dtype=jnp.int32) - 1
        off = jnp.where(plane, base[:, None] + slot, cap)
        out = jnp.zeros(cap + 1, jnp.uint32)
        out = out.at[off.reshape(-1)].set(vals.reshape(-1).astype(jnp.uint32), mode="drop")
        return out[:cap], base[-1] + n_tot[-1]

    errgap, total_err = compact(is_err, gap, cap_err)
    errnt, _ = compact(is_err, ent, cap_err)
    bifv, total_bif = compact(is_bif, rank, cap_bif)

    def pack2_16(v):  # 2-bit values -> u16 words of 8 symbols
        v = v.reshape(-1, 8)
        sh = (jnp.uint32(2) * jnp.arange(8, dtype=jnp.uint32))[None, :]
        return jnp.sum(v << sh, axis=1, dtype=jnp.uint32).astype(jnp.uint16)

    u16 = lambda x: jnp.maximum(x, 0).astype(jnp.uint16)
    if ME <= 255:
        scal = jnp.stack(
            [
                u16(apos) | (anchored.astype(jnp.uint16) << 15),
                u16(nerr_r) | (u16(nbif_r) << 8),
                u16(nerr_l) | (u16(nbif_l) << 8),
            ],
            axis=1,
        )
    else:
        scal = jnp.concatenate(
            [
                anchored.astype(jnp.uint16)[:, None],
                u16(apos)[:, None],
                u16(nbif_r)[:, None], u16(nerr_r)[:, None],
                u16(nbif_l)[:, None], u16(nerr_l)[:, None],
            ],
            axis=1,
        )

    if with_conf:  # only the lossy quality transform reads this
        # confirmed-position mask: one scatter over the fused j plane
        ar = jnp.arange(B)[:, None]
        conf = jnp.zeros((B, L + 1), bool)
        conf = conf.at[ar, jnp.where(is_conf, jnp.clip(j_all, 0, L), L)].set(
            True, mode="drop"
        )[:, :L]
        pad = (-L) % 16
        if pad:
            conf = jnp.concatenate([conf, jnp.zeros((B, pad), bool)], axis=1)
        conf16 = jnp.sum(
            conf.reshape(B, -1, 16).astype(jnp.uint32)
            * (jnp.uint32(1) << jnp.arange(16, dtype=jnp.uint32))[None, None, :],
            axis=2,
            dtype=jnp.uint32,
        ).astype(jnp.uint16)
    else:
        conf16 = jnp.zeros((B, 0), jnp.uint16)

    hdr = jnp.stack(
        [
            (total_err & 0xFFFF).astype(jnp.uint16),
            (total_err >> 16).astype(jnp.uint16),
            (total_bif & 0xFFFF).astype(jnp.uint16),
            (total_bif >> 16).astype(jnp.uint16),
        ]
    )
    return jnp.concatenate(
        [
            hdr,
            scal.reshape(-1),
            u16(errgap),
            pack2_16(errnt),
            pack2_16(bifv),
            conf16.reshape(-1),
        ]
    )


@partial(jax.jit, static_argnames=("k", "H", "seed", "cap_err", "cap_bif", "with_conf"))
def encode_batch_compact(codes, lengths, bitset, k: int, H: int, n_words: int, seed: int,
                         cap_err: int, cap_bif: int, with_conf: bool = True):
    """See _encode_compact_impl."""
    return _encode_compact_impl(codes, lengths, bitset, k, H, n_words, seed,
                                cap_err, cap_bif, with_conf)


@partial(jax.jit, static_argnames=("k", "H", "seed", "cap_err", "cap_bif",
                                   "with_conf", "L"))
def encode_batch_compact_packed(packed, lengths, bitset, k: int, H: int, n_words: int,
                                seed: int, cap_err: int, cap_bif: int,
                                with_conf: bool, L: int):
    """encode_batch_compact taking 2-bit packed codes (kmer.pack_codes_np
    layout) — 4x fewer H2D bytes over the tunnel."""
    from leon_tpu.ops.kmer import unpack_codes_dev

    return _encode_compact_impl(unpack_codes_dev(packed, L), lengths, bitset,
                                k, H, n_words, seed, cap_err, cap_bif, with_conf)


def unpack_compact(buf: np.ndarray, n: int, B: int, L: int,
                   cap_err: int, cap_bif: int, with_conf: bool = True,
                   k: int = 0) -> dict | None:
    """Host-side unpack of encode_batch_compact's flat u16 buffer. Returns
    None on capacity overflow (caller re-runs with larger caps or dense).
    `n` = true reads (pad lanes have anchored=0 and no events). `k` selects
    the packed-scal layout (ME = L - k <= 255 -> 3 u16/read)."""
    total_err = int(buf[0]) | (int(buf[1]) << 16)
    total_bif = int(buf[2]) | (int(buf[3]) << 16)
    if total_err > cap_err or total_bif > cap_bif:
        return None
    ME = max(1, L - k)
    o = 4
    if k and ME <= 255:
        sp = buf[o : o + 3 * B].reshape(B, 3)
        o += 3 * B
        scal = np.empty((B, 6), dtype=np.uint16)
        scal[:, 0] = sp[:, 0] >> 15                 # anchored
        scal[:, 1] = sp[:, 0] & 0x7FFF              # apos
        scal[:, 2] = sp[:, 1] >> 8                  # nbif_r
        scal[:, 3] = sp[:, 1] & 0xFF                # nerr_r
        scal[:, 4] = sp[:, 2] >> 8                  # nbif_l
        scal[:, 5] = sp[:, 2] & 0xFF                # nerr_l
    else:
        scal = buf[o : o + 6 * B].reshape(B, 6)
        o += 6 * B
    errgap = buf[o : o + cap_err]
    o += cap_err
    errnt16 = buf[o : o + cap_err // 8]
    o += cap_err // 8
    bif16 = buf[o : o + cap_bif // 8]
    o += cap_bif // 8
    L16 = (L + 15) // 16 if with_conf else 0
    conf16 = buf[o : o + B * L16].reshape(B, L16)

    def unpack2_16(v, m):
        out = np.empty((v.shape[0], 8), dtype=np.uint8)
        for i in range(8):
            out[:, i] = (v >> (2 * i)) & 3
        return out.reshape(-1)[:m]

    return dict(
        anchored=scal[:n, 0].astype(bool),
        apos=scal[:n, 1].astype(np.int32),
        nbif_r=scal[:n, 2].astype(np.int32), nerr_r=scal[:n, 3].astype(np.int32),
        nbif_l=scal[:n, 4].astype(np.int32), nerr_l=scal[:n, 5].astype(np.int32),
        errgap_flat=errgap[:total_err],
        errnt_flat=unpack2_16(errnt16, total_err),
        bif_flat=unpack2_16(bif16, total_bif),
        conf16=conf16[:n],
        compact=True,
    )


@partial(jax.jit, static_argnames=("k", "H", "seed"))
def encode_batch(codes, lengths, bitset, k: int, H: int, n_words: int, seed: int):
    """Dense slot-compacted event tensors (fallback path for chunks that
    overflow the compact capacities, and the tensor-level test interface).

    Returns a dict of (B,)-scalars and (B, ME) slot-ordered event arrays:
    bif/errpos(absolute)/errnt per side, + confirmed (B, L) mask.
    """
    B, L = codes.shape
    ME = max(1, L - k)
    e = walk_planes(codes, lengths, bitset, k, H, n_words, seed)

    ar = jnp.arange(B)[:, None]
    s = jnp.arange(ME, dtype=jnp.int32)[None, :]

    def slotify(plane, vals, dtype):
        """Scatter step-plane values into per-read slot order: out[i, m] =
        value of the m-th event of read i."""
        slot = jnp.cumsum(plane, axis=1, dtype=jnp.int32) - 1
        out = jnp.zeros((B, ME + 1), dtype)
        return out.at[ar, jnp.where(plane, slot, ME)].set(
            vals.astype(dtype), mode="drop"
        )[:, :ME]

    apos = e["apos"]
    jr = apos[:, None] + k + s
    jl = apos[:, None] - 1 - s
    out = dict(
        anchored=e["anchored"],
        apos=apos,
        nbif_r=e["bif_r"].sum(axis=1, dtype=jnp.int32),
        nerr_r=e["err_r"].sum(axis=1, dtype=jnp.int32),
        nbif_l=e["bif_l"].sum(axis=1, dtype=jnp.int32),
        nerr_l=e["err_l"].sum(axis=1, dtype=jnp.int32),
        bif_r=slotify(e["bif_r"], e["rank_r"], jnp.uint8),
        errpos_r=slotify(e["err_r"], jr, jnp.int32),
        errnt_r=slotify(e["err_r"], e["bnt_r"], jnp.uint8),
        gap_r=slotify(e["err_r"], _gap_plane(e["err_r"], ME), jnp.int32),
        bif_l=slotify(e["bif_l"], e["rank_l"], jnp.uint8),
        errpos_l=slotify(e["err_l"], jl, jnp.int32),
        errnt_l=slotify(e["err_l"], e["bnt_l"], jnp.uint8),
        gap_l=slotify(e["err_l"], _gap_plane(e["err_l"], ME), jnp.int32),
        confirmed=_conf_mask(e["conf_r"], e["conf_l"], apos, k, L),
    )
    return out


def unpack_dense(enc_np: dict, n: int) -> dict:
    """Adapt a host-transferred encode_batch dict to BlockEncoder's dense
    form (adds nothing; slices true reads)."""
    return {kk: v[:n] for kk, v in enc_np.items()}


def unpack_conf_bits(conf_bytes: np.ndarray, L: int) -> np.ndarray:
    """(B, ceil(L/8)) uint8 -> (B, L) bool confirmed mask."""
    bits = (conf_bytes[:, :, None] >> np.arange(8, dtype=np.uint8)[None, None, :]) & 1
    return bits.reshape(conf_bytes.shape[0], -1)[:, :L].astype(bool)


def unpack_conf16_bits(conf16: np.ndarray, L: int) -> np.ndarray:
    """(B, ceil(L/16)) uint16 -> (B, L) bool confirmed mask."""
    bits = (conf16[:, :, None] >> np.arange(16, dtype=np.uint16)[None, None, :]) & 1
    return bits.reshape(conf16.shape[0], -1)[:, :L].astype(bool)


# ---------------------------------------------------------------------------
# Decode
# ---------------------------------------------------------------------------


def _unpack_kmer(words, k: int):
    """(B, W) u32 -> (B, k) uint8 base codes (device, static unroll)."""
    cols = []
    for i in range(k):
        t = 2 * (k - 1 - i)
        cols.append(((words[:, t // 32] >> (t % 32)) & U32(3)).astype(jnp.uint8))
    return jnp.stack(cols, axis=1)


def _walk_decode_fused(lengths, apos, anchored, state0, bitset,
                       err_plane, qbif, k, H, n_words, seed, ME, L):
    """Fused-direction decode re-walk (the mirror of _walk_fused): each
    lane re-walks its nr right steps, resets to the anchor state, then its
    nl left steps — one scan of ME steps instead of two. err_plane:
    (B, L) uint8, 0 = no error at that position, else 4 + stored errnt
    rank. qbif: (B, MEv) per-lane bifurcation ranks in consumption order
    (right events then left — the container's stream order, so the flat
    stream slice IS the queue). Returns (bases (B, ME), j_all, active)."""
    B = lengths.shape[0]
    ar = jnp.arange(B)
    MEv = max(1, qbif.shape[1])
    tab = bloom.tables(seed, k)
    T, Tc, Trot, Tcrot = (_tabn(tab, i) for i in range(4))
    t_hi = 2 * (k - 1)

    lengths = lengths.astype(jnp.int32)
    nr = jnp.clip(lengths - k - apos, 0, None)
    total = jnp.clip(lengths - k, 0, None)
    s_all = jnp.arange(ME, dtype=jnp.int32)[None, :]
    in_right_all = s_all < nr[:, None]
    ls_all = s_all - nr[:, None]
    j_all = jnp.where(in_right_all, apos[:, None] + k + s_all,
                      apos[:, None] - 1 - ls_all)
    active_all = anchored[:, None] & (s_all < total[:, None])
    ev_all = jnp.take_along_axis(err_plane, jnp.clip(j_all, 0, L - 1), axis=1)
    switch_all = s_all == nr[:, None]

    afwd, a1, a2 = state0
    afwd_t = tuple(afwd[:, j] for j in range(afwd.shape[1]))

    def step(carry, xs):
        fwd, f, r, pbif = carry
        ev, active, in_r, sw = xs
        fwd = tuple(jnp.where(sw, a, w) for a, w in zip(afwd_t, fwd))
        f = jnp.where(sw, a1, f)
        r = jnp.where(sw, a2, r)

        is_err = active & (ev >= 4)
        rank_ns = (ev & 3).astype(jnp.int32)
        o = jnp.where(
            in_r, (fwd[t_hi // 32] >> U32(t_hi % 32)) & U32(3), fwd[0] & U32(3)
        ).astype(jnp.int32)

        # scalarized per-candidate arrays (see _walk_fused): no (B, 4)
        # intermediates inside the scan
        fb_r = _rol1(f ^ _take4c(Trot, o))
        rb_r = _ror1(r ^ _take4c(Tc, o))
        fb_l = _ror1(f ^ _take4c(T, o))
        rb_l = _rol1(r ^ _take4c(Tcrot, o))
        cfs, crs, sis = [], [], []
        for cb in range(4):
            cf = jnp.where(in_r, fb_r ^ U32(T[cb]), fb_l ^ U32(Trot[cb]))
            cr = jnp.where(in_r, rb_r ^ U32(Tcrot[cb]), rb_l ^ U32(Tc[cb]))
            wi, mask = bloom.wordmask_from_hashes(cf, cr, H, n_words, jnp)
            sis.append(bloom.probe_wordmask(bitset, wi, mask, jnp).astype(jnp.int32))
            cfs.append(cf); crs.append(cr)
        si0, si1, si2, si3 = sis
        scount = si0 + si1 + si2 + si3
        is_bif = active & ~is_err & (scount >= 2)

        pb = jnp.clip(pbif, 0, MEv - 1)
        rank = qbif[ar, pb].astype(jnp.int32)
        # exclusive prefix over solid / non-solid flags, per candidate
        excl = [jnp.zeros_like(si0), si0, si0 + si1, si0 + si1 + si2]
        ns = [1 - s for s in sis]
        exns = [jnp.zeros_like(si0), ns[0], ns[0] + ns[1], ns[0] + ns[1] + ns[2]]

        def first_match(flags):
            # argmax semantics: first True, else 0
            return jnp.where(flags[0], 0,
                   jnp.where(flags[1], 1,
                   jnp.where(flags[2], 2,
                   jnp.where(flags[3], 3, 0)))).astype(jnp.int32)

        b_bif = first_match([(sis[c] > 0) & (excl[c] == rank) for c in range(4)])
        b_uniq = first_match([sis[c] > 0 for c in range(4)])
        b_err = first_match([(ns[c] > 0) & (exns[c] == rank_ns) for c in range(4)])

        b = jnp.where(is_err, b_err, jnp.where(is_bif, b_bif, b_uniq))
        pbif = pbif + is_bif.astype(jnp.int32)

        b_adv = jnp.where(is_err & (scount >= 1), b_uniq, b)
        fn = _sel4w(cfs, b_adv)
        rn = _sel4w(crs, b_adv)
        bu = b_adv.astype(U32)
        fl = _shl2_t(fwd, bu, k)
        fr = _shr2_ins_t(fwd, bu, k)
        fwd = tuple(jnp.where(in_r, a, c) for a, c in zip(fl, fr))
        return (fwd, fn, rn, pbif), b.astype(jnp.uint8)

    carry = (afwd_t, a1, a2, jnp.zeros(B, jnp.int32))
    _, bs = lax.scan(step, carry,
                     (ev_all.T, active_all.T, in_right_all.T, switch_all.T))
    return jnp.moveaxis(bs, 0, 1), j_all, active_all


def pack_codes_u32(codes):
    """(B, L) 2-bit codes -> (B, ceil(L/16)) u32, 16 bases per word
    (base j in bits 2j..2j+1 of word j//16) — 4x fewer D2H bytes than raw
    codes over the latency/bandwidth-bound TPU tunnel."""
    B, L = codes.shape
    pad = (-L) % 16
    if pad:
        codes = jnp.concatenate([codes, jnp.zeros((B, pad), codes.dtype)], axis=1)
    c = codes.reshape(B, -1, 16).astype(jnp.uint32)
    sh = (jnp.uint32(2) * jnp.arange(16, dtype=jnp.uint32))[None, None, :]
    return jnp.sum(c << sh, axis=2, dtype=jnp.uint32)


def unpack_codes_u32_np(packed: np.ndarray, L: int) -> np.ndarray:
    """Host inverse of pack_codes_u32: (B, W16) u32 -> (B, L) uint8."""
    B = packed.shape[0]
    out = np.empty((B, packed.shape[1], 16), dtype=np.uint8)
    for j in range(16):
        out[:, :, j] = (packed >> np.uint32(2 * j)) & 3
    return out.reshape(B, -1)[:, :L]


@partial(jax.jit, static_argnames=("k", "H", "seed", "L", "W"))
def decode_batch_flat_packed(scal, errgaps, errnts, bifs, bitset,
                             k: int, H: int, n_words: int, seed: int,
                             L: int, W: int):
    """decode_batch_flat taking ONE packed (B, 9+W) int32 per-lane array:
    columns [apos, anchored, length, nerr_r, nerr_l, nbif_r, nbif_l,
    err_base, bif_base, afwd words (u32 bit-cast)]. The tunnel charges
    per-transfer overhead in its degraded mode, so the decode dispatch
    ships 4 arrays instead of 14 — dec.dispatch was the measured
    decompress majority (32.6s of a 43s 500k run)."""
    apos = scal[:, 0]
    anchored = scal[:, 1].astype(bool)
    lengths = scal[:, 2]
    nerr_r, nerr_l = scal[:, 3], scal[:, 4]
    nbif_r, nbif_l = scal[:, 5], scal[:, 6]
    err_base, bif_base = scal[:, 7], scal[:, 8]
    afwd = jax.lax.bitcast_convert_type(scal[:, 9:9 + W], jnp.uint32)
    return decode_batch_flat(apos, anchored, lengths, afwd, bitset,
                             nerr_r, nerr_l, nbif_r, nbif_l,
                             err_base, bif_base, errgaps, errnts, bifs,
                             k, H, n_words, seed, L)


@partial(jax.jit, static_argnames=("k", "H", "seed", "L"))
def decode_batch_flat(apos, anchored, lengths, afwd, bitset,
                      nerr_r, nerr_l, nbif_r, nbif_l,
                      err_base, bif_base, errgaps, errnts, bifs,
                      k: int, H: int, n_words: int, seed: int, L: int):
    """decode_batch taking the container's FLAT event streams (padded to a
    static capacity) — ~1-2 bytes/event over the H2D tunnel instead of
    dense (B, ME) planes. err_base/bif_base are chunk-relative exclusive
    offsets; gathers + gap-cumsum reconstruct the planes on device.
    Returns 2-bit-packed codes (pack_codes_u32 layout)."""
    B = apos.shape[0]
    ME = max(1, L - k)
    slot = jnp.arange(ME, dtype=jnp.int32)[None, :]

    def plane(flat, base, counts):
        idx = jnp.clip(base[:, None] + slot, 0, flat.shape[0] - 1)
        v = flat[idx]
        return jnp.where(slot < counts[:, None], v, 0)

    gap_r = plane(errgaps.astype(jnp.int32), err_base, nerr_r)
    gap_l = plane(errgaps.astype(jnp.int32), err_base + nerr_r, nerr_l)
    en_r = plane(errnts, err_base, nerr_r)
    en_l = plane(errnts, err_base + nerr_r, nerr_l)
    bf_r = plane(bifs, bif_base, nbif_r)
    bf_l = plane(bifs, bif_base + nbif_r, nbif_l)
    ap = apos.astype(jnp.int32)
    ep_r = ap[:, None] + k - 1 + jnp.cumsum(gap_r + 1, axis=1)
    ep_l = ap[:, None] - jnp.cumsum(gap_l + 1, axis=1)
    return pack_codes_u32(decode_batch(
        apos, anchored, lengths, afwd, bitset,
        nbif_r, bf_r, nerr_r, ep_r, en_r,
        nbif_l, bf_l, nerr_l, ep_l, en_l,
        k, H, n_words, seed, L,
    ))


@partial(jax.jit, static_argnames=("k", "H", "seed", "L"))
def decode_batch(apos, anchored, lengths, afwd, bitset,
                 nbif_r, bif_r, nerr_r, errpos_r, errnt_r,
                 nbif_l, bif_l, nerr_l, errpos_l, errnt_l,
                 k: int, H: int, n_words: int, seed: int, L: int):
    """Reconstruct anchored reads by re-walking the graph (FORMAT.md §6).

    afwd: (B, W) forward-orientation anchor k-mer words (host resolves the
    dictionary + orientation bit). Event arrays are (B, ME)-padded with
    absolute err positions. Returns (B, L) uint8 codes (anchored lanes).
    """
    B = apos.shape[0]
    ME = max(1, L - k)
    ar = jnp.arange(B)[:, None]
    lengths = lengths.astype(jnp.int32)
    MEv = errpos_r.shape[1]

    # error planes: one scatter per side instead of per-step event gathers
    def err_plane_of(ep, en, nerr):
        slot = jnp.arange(MEv, dtype=jnp.int32)[None, :]
        okm = slot < nerr[:, None]
        idx = jnp.where(okm, jnp.clip(ep, 0, L - 1), L)
        plane = jnp.zeros((B, L + 1), jnp.uint8)
        return plane.at[ar, idx].set(
            jnp.where(okm, en.astype(jnp.uint8) + 4, 0), mode="drop"
        )[:, :L]

    err_plane = err_plane_of(errpos_r, errnt_r, nerr_r) | err_plane_of(errpos_l, errnt_l, nerr_l)

    anchor_codes = _unpack_kmer(afwd, k)  # (B, k)
    posm = jnp.arange(L, dtype=jnp.int32)[None, :]
    rel = posm - apos[:, None]
    in_anchor = (rel >= 0) & (rel < k) & anchored[:, None]
    gathered = jnp.take_along_axis(anchor_codes, jnp.clip(rel, 0, k - 1), axis=1)
    codes0 = jnp.where(in_anchor, gathered, jnp.uint8(0))

    # initial rolling-hash state of the anchor k-mer (FORMAT.md §4 v4)
    f, r = bloom.hash_words(afwd, k, seed, jnp)
    state0 = (afwd, f, r)

    # fused bif queue per lane: right ranks then left ranks, the fused
    # walk's consumption order (and the container's stream order)
    qs = jnp.arange(2 * MEv, dtype=jnp.int32)[None, :]
    from_r = qs < nbif_r[:, None]
    qr = jnp.take_along_axis(bif_r, jnp.clip(qs, 0, MEv - 1), axis=1)
    ql = jnp.take_along_axis(bif_l, jnp.clip(qs - nbif_r[:, None], 0, MEv - 1), axis=1)
    qbif = jnp.where(from_r, qr, ql)

    bs, j_all, active = _walk_decode_fused(
        lengths, apos, anchored, state0, bitset, err_plane, qbif,
        k, H, n_words, seed, ME, L,
    )

    # place the decoded bases with one post-scan scatter
    out = jnp.concatenate([codes0, jnp.zeros((B, 1), jnp.uint8)], axis=1)
    out = out.at[ar, jnp.where(active, jnp.clip(j_all, 0, L - 1), L)].set(
        jnp.where(active, bs, 0), mode="drop"
    )
    return out[:, :L]
