"""Batched anchor search + bidirectional de Bruijn walk (encode & decode).

This is the hot path of the whole compressor — the TPU-native re-design of
the reference's per-read DnaEncoder/DnaDecoder ([R] gatb-core
tools/compression/DnaCoder.{hpp,cpp}; behavior contract at
/root/reference/README.md:13: "each read is encoded as a path in this graph,
storing only an anchoring kmer and a list of bifurcations").

Instead of one thread per read (reference Dispatcher), every read is a
vector lane: a `lax.scan` over walk steps advances all lanes together, each
step doing 4 candidate Bloom probes per lane (gathered bit tests in HBM).
Event emission uses per-lane counters + scatters into fixed-slot event
tensors (SURVEY.md §7.1.3). The walk policy is frozen in FORMAT.md §6.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from leon_tpu.ops import bloom
from leon_tpu.ops.kmer import U32, canonical, shl2, shr2_ins, words_for_k


def _kmer_scan_full(codes, k: int):
    """(fwds, rcs) at every position: (B, P, W) each."""
    B, L = codes.shape
    W = words_for_k(k)
    cols = codes.T.astype(U32)

    def step(state, b):
        fwd, rc = state
        fwd = shl2(fwd, b, k)
        rc = shr2_ins(rc, U32(3) - b, k)
        return (fwd, rc), (fwd, rc)

    init = (jnp.zeros((B, W), U32), jnp.zeros((B, W), U32))
    _, (fwds, rcs) = lax.scan(step, init, cols)
    return jnp.moveaxis(fwds[k - 1 :], 0, 1), jnp.moveaxis(rcs[k - 1 :], 0, 1)


def _candidates_right(fwd, rc, k):
    """Solid-candidate kmer forms when appending base x, for x in 0..3."""
    fs = [shl2(fwd, U32(x), k) for x in range(4)]
    rs = [shr2_ins(rc, U32(3 - x), k) for x in range(4)]
    return fs, rs


def _candidates_left(fwd, rc, k):
    fs = [shr2_ins(fwd, U32(x), k) for x in range(4)]
    rs = [shl2(rc, U32(3 - x), k) for x in range(4)]
    return fs, rs


def _probe4(bitset, fs, rs, H, log2_m, seed):
    """Membership of the 4 canonical candidates: (B, 4) bool."""
    f = jnp.stack(fs, axis=1)  # (B, 4, W)
    r = jnp.stack(rs, axis=1)
    canon, _ = canonical(f, r)
    return bloom.probe(bitset, canon, H, log2_m, seed)


def _append(arr, cnt, do, val, ar):
    old = arr[ar, cnt]
    return arr.at[ar, cnt].set(jnp.where(do, val.astype(arr.dtype), old))


def _walk_encode_side(codes, lengths, apos, anchored, fwd0, rc0, bitset, k, H, log2_m, seed, side, ME):
    B, L = codes.shape
    ar = jnp.arange(B)

    def step(carry, s):
        fwd, rc, nbif, nerr, bif, ep, en, conf = carry
        if side == "right":
            j = apos + k + s
        else:
            j = apos - 1 - s
        active = anchored & (j >= 0) & (j < lengths)
        jc = jnp.clip(j, 0, L - 1)
        b = jnp.take_along_axis(codes, jc[:, None], axis=1)[:, 0].astype(jnp.int32)
        if side == "right":
            fs, rs = _candidates_right(fwd, rc, k)
        else:
            fs, rs = _candidates_left(fwd, rc, k)
        solid = _probe4(bitset, fs, rs, H, log2_m, seed)  # (B,4) bool
        si = solid.astype(jnp.int32)
        scount = si.sum(axis=1)
        solid_b = jnp.take_along_axis(si, b[:, None], axis=1)[:, 0].astype(bool)
        cum = jnp.cumsum(si, axis=1)
        cum_b = jnp.take_along_axis(cum, b[:, None], axis=1)[:, 0]
        rank = cum_b - 1  # valid when solid_b

        is_none = active & solid_b & (scount == 1)
        is_bif = active & solid_b & (scount >= 2)
        is_err = active & ~solid_b

        bif = _append(bif, nbif, is_bif, rank, ar)
        ep = _append(ep, nerr, is_err, j, ar)
        en = _append(en, nerr, is_err, b, ar)
        nbif = nbif + is_bif.astype(jnp.int32)
        nerr = nerr + is_err.astype(jnp.int32)
        conf = conf.at[ar, jc].set(jnp.where(is_none, True, conf[ar, jc]))

        # error correction (FORMAT.md §6): on an error, advance with the
        # smallest solid base so the walk rejoins the graph path — one event
        # per sequencing error instead of k
        b_min_solid = jnp.argmax(si, axis=1)
        b_adv = jnp.where(is_err & (scount >= 1), b_min_solid, b)
        bu = b_adv.astype(U32)
        if side == "right":
            fwd = shl2(fwd, bu, k)
            rc = shr2_ins(rc, U32(3) - bu, k)
        else:
            fwd = shr2_ins(fwd, bu, k)
            rc = shl2(rc, U32(3) - bu, k)
        return (fwd, rc, nbif, nerr, bif, ep, en, conf), None

    zero_i = jnp.zeros(B, jnp.int32)
    carry = (
        fwd0,
        rc0,
        zero_i,
        zero_i,
        jnp.zeros((B, ME), jnp.uint8),
        jnp.zeros((B, ME), jnp.int32),
        jnp.zeros((B, ME), jnp.uint8),
        jnp.zeros((B, L), bool),
    )
    carry, _ = lax.scan(step, carry, jnp.arange(ME, dtype=jnp.int32))
    fwd, rc, nbif, nerr, bif, ep, en, conf = carry
    return nbif, nerr, bif, ep, en, conf


@partial(jax.jit, static_argnames=("k", "H", "log2_m", "seed"))
def encode_batch(codes, lengths, bitset, k: int, H: int, log2_m: int, seed: int):
    """Anchor + walk-encode a read batch. Returns a dict of event tensors.

    codes: (B, L) uint8 base codes (exceptions pre-substituted),
    lengths: (B,) int32, bitset: (2^log2_m/32,) uint32.
    """
    B, L = codes.shape
    ME = max(1, L - k)
    lengths = lengths.astype(jnp.int32)

    fwds, rcs = _kmer_scan_full(codes, k)
    canon, is_rc = canonical(fwds, rcs)
    P = canon.shape[1]
    pos = jnp.arange(P, dtype=jnp.int32)[None, :]
    valid = pos <= (lengths[:, None] - k)
    member = bloom.probe(bitset, canon, H, log2_m, seed) & valid

    anchored = member.any(axis=1)
    apos = jnp.argmax(member, axis=1).astype(jnp.int32)
    sel = apos[:, None, None]
    acanon = jnp.take_along_axis(canon, sel, axis=1)[:, 0, :]
    afwd = jnp.take_along_axis(fwds, sel, axis=1)[:, 0, :]
    arc_w = jnp.take_along_axis(rcs, sel, axis=1)[:, 0, :]
    aorient = jnp.take_along_axis(is_rc, apos[:, None], axis=1)[:, 0]

    nbif_r, nerr_r, bif_r, ep_r, en_r, conf_r = _walk_encode_side(
        codes, lengths, apos, anchored, afwd, arc_w, bitset, k, H, log2_m, seed, "right", ME
    )
    nbif_l, nerr_l, bif_l, ep_l, en_l, conf_l = _walk_encode_side(
        codes, lengths, apos, anchored, afwd, arc_w, bitset, k, H, log2_m, seed, "left", ME
    )
    return dict(
        anchored=anchored,
        apos=apos,
        acanon=acanon,
        aorient=aorient,
        nbif_r=nbif_r, nerr_r=nerr_r, bif_r=bif_r, errpos_r=ep_r, errnt_r=en_r,
        nbif_l=nbif_l, nerr_l=nerr_l, bif_l=bif_l, errpos_l=ep_l, errnt_l=en_l,
        confirmed=conf_r | conf_l,
    )


def _unpack_kmer(words, k: int):
    """(B, W) u32 -> (B, k) uint8 base codes (device, static unroll)."""
    cols = []
    for i in range(k):
        t = 2 * (k - 1 - i)
        cols.append(((words[:, t // 32] >> (t % 32)) & U32(3)).astype(jnp.uint8))
    return jnp.stack(cols, axis=1)


def _walk_decode_side(codes, lengths, apos, anchored, fwd0, rc0, bitset,
                      nbif, bif, nerr, ep, en, k, H, log2_m, seed, side, ME):
    B, L = codes.shape
    ar = jnp.arange(B)
    MEv = max(1, bif.shape[1])

    def step(carry, s):
        fwd, rc, pbif, perr, out = carry
        if side == "right":
            j = apos + k + s
        else:
            j = apos - 1 - s
        active = anchored & (j >= 0) & (j < lengths)
        jc = jnp.clip(j, 0, L - 1)

        pe = jnp.clip(perr, 0, MEv - 1)
        is_err = active & (perr < nerr) & (ep[ar, pe] == j)
        b_err = en[ar, pe].astype(jnp.int32)

        if side == "right":
            fs, rs = _candidates_right(fwd, rc, k)
        else:
            fs, rs = _candidates_left(fwd, rc, k)
        solid = _probe4(bitset, fs, rs, H, log2_m, seed)
        si = solid.astype(jnp.int32)
        scount = si.sum(axis=1)
        is_bif = active & ~is_err & (scount >= 2)

        pb = jnp.clip(pbif, 0, MEv - 1)
        rank = bif[ar, pb].astype(jnp.int32)
        excl = jnp.cumsum(si, axis=1) - si
        match = solid & (excl == rank[:, None])
        b_bif = jnp.argmax(match, axis=1).astype(jnp.int32)
        b_uniq = jnp.argmax(si, axis=1).astype(jnp.int32)

        b = jnp.where(is_err, b_err, jnp.where(is_bif, b_bif, b_uniq))
        out = out.at[ar, jc].set(jnp.where(active, b.astype(jnp.uint8), out[ar, jc]))
        perr = perr + is_err.astype(jnp.int32)
        pbif = pbif + is_bif.astype(jnp.int32)

        # mirror the encoder's error correction (FORMAT.md §6): at an error
        # position advance with the smallest solid base, not the emitted one
        b_min_solid = jnp.argmax(si, axis=1)
        b_adv = jnp.where(is_err & (scount >= 1), b_min_solid, b)
        bu = b_adv.astype(U32)
        if side == "right":
            fwd = shl2(fwd, bu, k)
            rc = shr2_ins(rc, U32(3) - bu, k)
        else:
            fwd = shr2_ins(fwd, bu, k)
            rc = shl2(rc, U32(3) - bu, k)
        return (fwd, rc, pbif, perr, out), None

    zero_i = jnp.zeros(B, jnp.int32)
    carry = (fwd0, rc0, zero_i, zero_i, codes)
    carry, _ = lax.scan(step, carry, jnp.arange(ME, dtype=jnp.int32))
    return carry[4]


@partial(jax.jit, static_argnames=("k", "H", "log2_m", "seed", "L"))
def decode_batch(apos, anchored, lengths, afwd, bitset,
                 nbif_r, bif_r, nerr_r, errpos_r, errnt_r,
                 nbif_l, bif_l, nerr_l, errpos_l, errnt_l,
                 k: int, H: int, log2_m: int, seed: int, L: int):
    """Reconstruct anchored reads by re-walking the graph (FORMAT.md §6).

    afwd: (B, W) forward-orientation anchor k-mer words (host resolves the
    dictionary + orientation bit). Event arrays are (B, ME)-padded, err
    positions absolute. Returns (B, L) uint8 codes (anchored lanes only).
    """
    B = apos.shape[0]
    ME = max(1, L - k)
    ar = jnp.arange(B)
    lengths = lengths.astype(jnp.int32)

    anchor_codes = _unpack_kmer(afwd, k)  # (B, k)
    posm = jnp.arange(L, dtype=jnp.int32)[None, :]
    rel = posm - apos[:, None]
    in_anchor = (rel >= 0) & (rel < k) & anchored[:, None]
    gathered = jnp.take_along_axis(anchor_codes, jnp.clip(rel, 0, k - 1), axis=1)
    codes0 = jnp.where(in_anchor, gathered, jnp.uint8(0))

    # reverse complement of the anchor k-mer, built on device
    rc0 = jnp.zeros_like(afwd)
    for i in range(k - 1, -1, -1):
        rc0 = shl2(rc0, U32(3) - anchor_codes[:, i].astype(U32), k)

    out = _walk_decode_side(codes0, lengths, apos, anchored, afwd, rc0, bitset,
                            nbif_r, bif_r, nerr_r, errpos_r, errnt_r,
                            k, H, log2_m, seed, "right", ME)
    out = _walk_decode_side(out, lengths, apos, anchored, afwd, rc0, bitset,
                            nbif_l, bif_l, nerr_l, errpos_l, errnt_l,
                            k, H, log2_m, seed, "left", ME)
    return out
