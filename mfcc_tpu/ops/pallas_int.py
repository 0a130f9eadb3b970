"""Fused bit-exact fixed-point MFCC kernel (Pallas / Mosaic).

The XLA INT pipeline (int_ops) is HBM-bound: each of the 9 radix-2 stages
round-trips the (frames, 512) re/im arrays through HBM.  This kernel holds a
block of BF=128 frames in VMEM across the ENTIRE integer pipeline:

  window'd frames, TRANSPOSED to (512 positions x 128 frame-lanes) int32
  -> 9-stage bit-exact DIT ladder, natural-order formulation (see below)
  -> power |.|^2 (mod-2^32, logical >>2)                       VPU
  -> integer mel filterbank: 8-bit limb f32 matmuls             MXU
  -> Turner log2, unrolled                                      VPU
  -> DCT-II via a 128-pt bit-exact INT FFT (same formulation)   VPU
  -> (32 cepstra x 128 frames) out

Natural-order ladder: the RTL loads bit-reversed (fft.py:413-418) and runs
the standard DIT schedule.  Mapping every w-index j to the row bitrev(j)
turns stage s into pairs at sublane stride d = 2^(L-1-s) with a per-row
twiddle column tw[r] = T[bitrev_s(r >> (L-s)) << (L-1-s)] -- so every stage
is two pltpu.rolls + elementwise selects, NO gathers, NO reshapes, NO
transposes in-kernel.  The FFT output lands with bin k at row bitrev(k);
instead of unpermuting, the mel weight matrix rows are pre-permuted (and
zeroed for the conjugate bins), so the permutation costs nothing.

Bit-exactness relies on the same int32-wraparound argument as int_ops
(mod-2^32 drift is invisible after each stage's >>14, >>1, wrap16) and on
the exact-f32-limb filterbank (int_ops.filterbank_int32); asserted
element-exact vs the unbounded-int oracle in tests/test_pallas_int.py.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import MFCCConfig
from .. import tables
from . import framing, int_ops

BF = 128  # frames per block (lane count)

# Filterbank limb-matmul form: True = one row-stacked (n_w*ntap, nbins) dot
# per power limb (n_w-fold less MXU RHS streaming); False = one small dot
# per (weight limb, power limb) pair.  Module-level so experiments can
# toggle it; see _post_fft_stages.
FB_STACKED = True

# Filterbank limb radix: 7 = int8 limbs (int32 MXU accumulation), 8 = bf16
# limbs (f32 MXU accumulation, exact below 2^24 -- asserted).  8-bit limbs
# need one fewer weight AND power limb for the reference 30/31-bit widths
# (fewer dots, fewer RHS extract+cast passes) and skip the int32->int8
# 4x sublane repack of every (nbins, lanes) RHS.
FB_LIMB_BITS = 8

# Hold the 8-bit limbs in FULL f32 (weights AND the power-limb RHS) instead
# of bf16: no sub-word packed layout anywhere in the filterbank stage.
# Exactness is unchanged -- limb values are integers in [0, 255], exactly
# representable in bf16, so every MXU pass multiplies exact operands and
# accumulates in f32 below 2^24 (same argument as the bf16 path).  Round-4
# experiment: the INT ablation attributes 4.9 ms (41%) to the fb stage
# while its FLOPs are ~trivial, and the two formulations A/B'd in round 3e
# (int8, bf16) BOTH pay Mosaic sub-word relayouts on the (nbins, lanes)
# cast -- f32 is the arm that pays none.
FB_LIMB_F32 = False

# Ship the v3 super-block tiles UNTRANSPOSED (bf, hop) -- a free host
# reshape -- and transpose each packed-i16 tile in VMEM on the hardware
# transpose path (the INT twin of pallas_mfcc.R2_KERNEL_T: the host XLA
# 16-bit swapaxes it replaces measured ~3.3 ms/run at the headline shape,
# docs/BENCH.md round 3h).  Bit-exactness untouched: the transpose is a
# pure relayout before any arithmetic.
# Round-4 chip A/B (3 interleaved rounds): False 32.18 vs True 31.42
# Mf/s -- as with R2_KERNEL_T the host transpose now wins on the current
# runtime, so the flag reverts; both paths stay bit-exact-tested.
INT_KERNEL_T = False

# Pack adjacent sample pairs into int32 (bitcast) BEFORE the host-side
# positions-major transpose: the relayout becomes a half-height 32-bit
# transpose (XLA's 16-bit transposes are the measured pathology, round 3h)
# and the kernel's unpack shifts deliver the even/odd position split that
# the sigma fill wants for free.  Bit-identical either way.  Measured a
# LOSS on chip (31.2 vs 38.3 Mf/s, round 5c): the unpack shifts + split
# pre-emphasis cost more than the i16 transpose saves.  Default off.
INT_PACK32 = False

# Slice-form butterflies: stages whose stride is >= this many sublanes
# compute each butterfly pair ONCE from aligned half-slices (sub operands
# only at the x1 rows -- half the multiplies, no rolls, no selects; output
# reassembled by a sublane concat) instead of the roll+select distribution
# that evaluates subs at every row.  Bit-identical: the slice form IS the
# roll form's selected lanes, computed directly.  None = rolls everywhere.
# Chip A/B (round 5c, interleaved, max-of-3): 16 -> 38.1-38.4 Mf/s vs
# None 36.6-37.7; 8/32/64 within noise of 16.  Small, consistent win.
SLICE_MIN_STRIDE: int | None = 16

# Block-form ladder (round 5g): for the evenodd8 layout every stage's
# stride is a multiple of 8, so the whole ladder can run on a LIST of
# (8, lanes) sublane blocks -- butterflies become pure elementwise ops on
# aligned block pairs, with NO rolls, NO selects and NO per-stage
# concatenations (the slice form re-materializes the full array after
# every stage; the roll form pays 2-4 rolls + selects per stage).  The
# only materializations left are the mid-ladder regroup (group-local 8x8
# sublane transposes) and the final output concat.  Per-block trace-time
# twiddle classification (the numpy constants are known) additionally
# skips every multiply on unit / -j twiddle blocks -- exact, since
# (x*unit + bias) >> (width-2) == x and (bias - x*unit) >> (width-2) ==
# -x for wrap16-bounded x -- and exact-zero imaginary blocks propagate as
# None instead of arrays (subsumes the zero_imag_stages shortcut
# per-block).  Bit-identical to the roll/slice forms by construction:
# identical integer arithmetic, different data placement.
LADDER_BLOCKS = True

# DCT ladder layout: True = sigma (even/odd) rows.  The 4N interleave fill
# (dct_stream.py:29-34) writes only ODD natural rows -- in sigma layout the
# buffer is [zeros | odd-half] (two concats, no 2*ntap single-row stores),
# the odd half is [logmel | reversed logmel] (reversal = log2(ntap) XOR-bit
# roll+select rounds), and the final ladder stage runs half-only.
DCT_SIGMA = True


# ---------------------------------------------------------------------------
# Constant builders
# ---------------------------------------------------------------------------

def _bitrev(x: int, bits: int) -> int:
    r = 0
    for b in range(bits):
        r |= ((x >> b) & 1) << (bits - 1 - b)
    return r


def _sigma(r: int, L: int) -> int:
    """The even/odd ladder row permutation: bit 0 of the natural row index
    becomes the MSB (rotate-right-1 of the index bits).  XOR-partner pairs
    survive any bit permutation, so the DIT ladder runs identically with
    re-indexed strides; even natural rows -- exactly the non-conjugate
    output bins, since bit 0 of the row is the MSB of bitrev(row) -- land
    CONTIGUOUSLY in rows [0, size/2), making the power/filterbank input a
    free slice instead of a relayout."""
    return ((r & 1) << (L - 1)) | (r >> 1)


def _ladder_strides(size: int, layout: str):
    L = int(np.log2(size))
    if layout == "evenodd8":
        # sigma strides for the pre-regroup stages; the three sub-vreg
        # stages (sigma strides 4, 2, 1) run AFTER the mid-ladder regroup
        # at vreg-aligned strides size/4, size/8, size/16 (_regroup_perm)
        return ([1 << (L - 2 - s) for s in range(L - 4)]
                + [size // 4, size // 8, size // 16, size // 2])
    if layout == "evenodd":
        return [1 << (L - 2 - s) if s < L - 1 else 1 << (L - 1)
                for s in range(L)]
    return [1 << (L - 1 - s) for s in range(L)]


def _ladder_layout(size: int) -> str:
    """The shipped ladder row layout for a given FFT size: sigma (even/odd)
    plus, for sizes with >= 6 within-half index bits, the mid-ladder
    regroup that keeps every roll stride vreg-aligned (>= 8 sublanes).
    Chip A/B (tools/ab_int_r5.py): the sigma layout's three sub-vreg-stride
    stages cost ~2.4 ms/run at the bench shape -- most of the ladder's
    wall time; the regroup recovers it for two reshape-transposes."""
    return "evenodd8" if size >= 128 else "evenodd"


def _regroup_perm(size: int) -> np.ndarray:
    """Row permutation of the mid-ladder regroup: within each half, the
    bottom 3 index bits swap with the top 3 (middle bits fixed), so the
    natural-index bits that the last three general stages pair on (sigma
    positions 2, 1, 0) move to vreg-aligned positions.  Matches the
    in-kernel value op  v.reshape(2, 8, size//128, 8, L).swapaxes(1, 3).
    Returns R with R[r] = new row of old row r."""
    assert size >= 128
    r = np.arange(size)
    half = size // 2
    b, w = r // half, r % half
    x = w >> (int(np.log2(half)) - 3)          # top 3 within-half bits
    y = (w >> 3) & (size // 128 - 1)           # middle bits (may be none)
    z = w & 7                                  # bottom 3 bits
    return b * half + z * (size // 16) + y * 8 + x


@functools.lru_cache(maxsize=None)
def _ladder_constants(size: int, width: int = 16, layout: str = "natural"):
    """Per-stage twiddle COLUMNS in natural-row space: (size, nstages) int32
    arrays (re, im): tw[r, s] = T[bitrev_s(r >> (L-s)) << (L-1-s)].
    layout="evenodd": rows permuted by _sigma; "evenodd8": additionally,
    stage columns >= L-4 (the post-regroup stages) permuted by
    _regroup_perm, matching the mid-ladder row move in _ladder."""
    L = int(np.log2(size))
    twr, twi = tables.twiddle_table(size, width)
    cr = np.zeros((size, L), dtype=np.int32)
    ci = np.zeros((size, L), dtype=np.int32)
    for s in range(L):
        for r in range(size):
            g = r >> (L - s) if s > 0 else 0
            j = _bitrev(g, s) if s > 0 else 0
            idx = j << (L - 1 - s)
            cr[r, s] = twr[idx]
            ci[r, s] = twi[idx]
    if layout in ("evenodd", "evenodd8"):
        cr2, ci2 = np.zeros_like(cr), np.zeros_like(ci)
        for r in range(size):
            cr2[_sigma(r, L)] = cr[r]
            ci2[_sigma(r, L)] = ci[r]
        cr, ci = cr2, ci2
    if layout == "evenodd8":
        R = _regroup_perm(size)
        for s in range(L - 4, L):
            cr[R, s] = cr[:, s].copy()
            ci[R, s] = ci[:, s].copy()
    return cr, ci


@functools.lru_cache(maxsize=None)
def _ladder_packed_constants(size: int, width: int = 16,
                             layout: str = "natural"):
    """Kernel-operand twiddle columns [twr | twr+twi | twr-twi]: the 3-mult
    butterfly's per-stage multiplicands (fft.py:152-180), precomputed so the
    kernel never forms the sum/difference at runtime.  (size, 3*L) int32."""
    cr, ci = _ladder_constants(size, width, layout)
    return np.concatenate([cr, cr + ci, cr - ci], axis=1).astype(np.int32)


@functools.lru_cache(maxsize=None)
def _fb_limb_matrix(cfg: MFCCConfig):
    """Filterbank limb matrices with bin->row permutation folded in,
    row-stacked 2-D: (n_w*ntap, nbins), limb i = rows [i*ntap, (i+1)*ntap),
    where column r holds the weight of FFT output row r (= bin bitrev(r)
    if that bin < nbins, else 0).  Limb radix/dtype follow FB_LIMB_BITS
    (see the flag comment)."""
    size = cfg.nfft
    L = int(np.log2(size))
    Wnp, shift = int_ops._fb_constants(cfg.samplerate, cfg.nfft,
                                       cfg.nfilters, cfg.filter_wsize,
                                       cfg.filter_gain, 16, cfg.power_width)
    nbins = cfg.nfft // 2
    # a conjugate bin's weight row is zero, and bitrev(r) < nbins iff r is
    # EVEN (bit 0 of r becomes the MSB of bitrev(r)) -- so the matrices
    # keep only the EVEN ladder rows and the kernel extracts them with one
    # (nbins, 2, lanes) value reshape: K is halved in every limb matmul
    # (the stage cost is streaming the (K, lanes) RHS through the MXU).
    perm = np.zeros((nbins, cfg.nfilters), dtype=np.int64)
    R = (_regroup_perm(size) if _ladder_layout(size) == "evenodd8"
         else np.arange(size))
    for r in range(0, size, 2):
        # sigma row of even natural r is r//2; the evenodd8 regroup then
        # moves it to R[r//2] (R preserves halves, so it stays a power row)
        perm[R[r // 2]] = Wnp[_bitrev(r, L)]
    # Weights are non-negative integers, so base-2^b digits need no offset
    # trick.  Exactness: 7-bit limbs in int8 accumulate exactly in int32
    # (products < 127*127*nbins ~ 2^22); 8-bit limbs in bf16 are exact in
    # the MXU's f32 accumulation (255*255*nbins = 16.65M < 2^24, asserted).
    bits = FB_LIMB_BITS
    mask = (1 << bits) - 1
    wbits = max(1, int(perm.max()).bit_length())
    n_w = -(-wbits // bits)
    # ROW-STACKED 2-D (n_w*ntap, nbins): the kernel consumes limb i as
    # rows [i*ntap, (i+1)*ntap) -- shipping it stacked means the stacked
    # dot (FB_STACKED) uses the ref directly, with no in-kernel
    # (n_w, ntap, nbins) -> (n_w*ntap, nbins) sublane-merging relayout.
    # Chip-neutral (docs/BENCH.md round 4e) but strictly less kernel work.
    limbs = np.concatenate([((perm >> (bits * i)) & mask).T
                            for i in range(n_w)])  # (n_w*ntap, nbins)
    if bits == 7:
        return limbs.astype(np.int8), shift
    assert (1 << bits) - 1 <= 255 and ((1 << bits) - 1) ** 2 * nbins < 1 << 24, \
        "bf16-limb filterbank partial sums would exceed exact f32 range"
    if FB_LIMB_F32:
        return limbs.astype(np.float32), shift
    import ml_dtypes
    return limbs.astype(ml_dtypes.bfloat16), shift


def _dct_packed_constants(nfilters: int):
    """Host-side twiddle operand for the in-kernel DCT ladder, in whichever
    layout DCT_SIGMA selects (must match the kernel trace)."""
    return _ladder_packed_constants(
        4 * nfilters,
        layout=_ladder_layout(4 * nfilters) if DCT_SIGMA else "natural")


@functools.lru_cache(maxsize=None)
def _dct_constants(nfilters: int):
    """Output row extraction for the 4N DCT FFT: cepstrum k = real row
    bitrev(k) of the 4*nfilters ladder; also the scatter rows for the
    interleaved fill (dct_stream.py:29-34)."""
    n4 = 4 * nfilters
    L = int(np.log2(n4))
    out_rows = [_bitrev(k, L) for k in range(nfilters)]
    fill_a = [2 * k + 1 for k in range(nfilters)]
    fill_b = [n4 - 1 - 2 * k for k in range(nfilters)]
    return out_rows, fill_a, fill_b


# ---------------------------------------------------------------------------
# In-kernel ladder
# ---------------------------------------------------------------------------

def _wrap16(v):
    # sign-extend the low 16 bits (== ((v & 0xFFFF) ^ 0x8000) - 0x8000, one
    # op cheaper); int32 << overflow is mod-2^32, invisible after the >>
    return (v << 16) >> 16


def _ladder_blocks(wr, wi, tw_ref, size: int, width: int,
                   zero_imag_stages: int, final_half_only: bool):
    """Block-form bit-exact DIT ladder for the evenodd8 layout (see the
    LADDER_BLOCKS comment): the arrays live as size//8 (8, lanes) sublane
    blocks through every stage; stage strides are all multiples of 8, so
    butterfly partners are whole blocks and each butterfly is elementwise
    on aligned operands.  Imag blocks that are exactly zero ride as None.
    Returns the same (wr, wi) -- or (half, lanes) under final_half_only --
    as the roll/slice form, bit-identically."""
    L = int(np.log2(size))
    lanes = wr.shape[1]
    bias = (1 << (width - 3)) - 1
    unit = 1 << (width - 2)
    w2 = width - 2
    np_cr, np_ci = _ladder_constants(size, width, "evenodd8")
    strides = _ladder_strides(size, "evenodd8")
    nb = size // 8
    br = [wr[8 * i: 8 * i + 8] for i in range(nb)]
    bi = ([None] * nb if zero_imag_stages > 0
          else [wi[8 * i: 8 * i + 8] for i in range(nb)])

    def hs(v):                       # the stage's wrap16(>>1); None stays 0
        return None if v is None else _wrap16(v >> 1)

    def add(a, b):
        return b if a is None else (a if b is None else a + b)

    def sub(a, b):
        return (a if b is None else (-b if a is None else a - b))

    def subs(i1, s):
        """(sb1, sb2) of the x1 block i1 at stage s -- the 3-mult
        butterfly's rounded cross terms (fft.py:152-180), with per-block
        multiplier-free shortcuts where the twiddle block is unit / -j /
        pure-real (trace-time facts of the numpy constants)."""
        x1r, x1i = br[i1], bi[i1]
        r1 = 8 * i1
        crb, cib = np_cr[r1: r1 + 8, s], np_ci[r1: r1 + 8, s]
        if (crb == unit).all() and (cib == 0).all():
            return x1r, x1i                        # tw == 1 exactly
        if (crb == 0).all() and (cib == -unit).all():
            return x1i, (None if x1r is None else -x1r)   # tw == -j exactly
        tw1 = tw_ref[r1: r1 + 8, s: s + 1]
        if (cib == 0).all():
            # pure-real block: sb1 = (x1r*cr + bias) >> w2 and
            # sb2 = (x1i*cr + bias) >> w2 -- the same integers the 3-mult
            # form produces (its x1i*cr / x1r*ci terms cancel exactly)
            sb1 = (x1r * tw1 + bias) >> w2
            sb2 = None if x1i is None else (x1i * tw1 + bias) >> w2
            return sb1, sb2
        tc2 = tw_ref[r1: r1 + 8, 2 * L + s: 2 * L + s + 1]
        if x1i is None:
            u = x1r * tw1 + bias
            return u >> w2, (u - x1r * tc2) >> w2
        tc1 = tw_ref[r1: r1 + 8, L + s: L + s + 1]
        u = (x1r + x1i) * tw1 + bias
        return (u - x1i * tc1) >> w2, (u - x1r * tc2) >> w2

    for s in range(L):
        d = strides[s]
        if s == L - 4:
            # mid-ladder regroup (_regroup_perm) in group-local form:
            # within each (half, y) 64-row group the bottom/top 3
            # within-half index bits swap -- an 8x8 sublane-block
            # transpose per group; all-None groups stay None
            m = size // 128

            def _rg(blocks):
                out = list(blocks)
                for b2 in (0, 1):
                    off = b2 * (nb // 2)
                    for y in range(m):
                        grp = [blocks[off + x * m + y] for x in range(8)]
                        if all(g is None for g in grp):
                            continue
                        v = jnp.concatenate(
                            [jnp.zeros((8, lanes), jnp.int32)
                             if g is None else g for g in grp], axis=0)
                        v = (v.reshape(8, 8, lanes).swapaxes(0, 1)
                              .reshape(8 * 8, lanes))
                        for z in range(8):
                            out[off + z * m + y] = v[8 * z: 8 * z + 8]
                return out

            br, bi = _rg(br), _rg(bi)
        nbk = d // 8
        pairs = [(g * 2 * nbk + t, g * 2 * nbk + nbk + t)
                 for g in range(size // (2 * d)) for t in range(nbk)]
        if final_half_only and s == L - 1:
            # only the even-output half (the non-conjugate bins) is
            # consumed downstream: compute just the x0 outputs
            outr, outi = [], []
            for i0, i1 in pairs:
                sb1, sb2 = subs(i1, s)
                outr.append(hs(add(br[i0], sb1)))
                outi.append(hs(add(bi[i0], sb2)))
            zero = jnp.zeros((8, lanes), jnp.int32)
            return (jnp.concatenate([zero if b is None else b
                                     for b in outr], axis=0),
                    jnp.concatenate([zero if b is None else b
                                     for b in outi], axis=0))
        nr, ni = [None] * nb, [None] * nb
        for i0, i1 in pairs:
            sb1, sb2 = subs(i1, s)
            x0r, x0i = br[i0], bi[i0]
            nr[i0], nr[i1] = hs(add(x0r, sb1)), hs(sub(x0r, sb1))
            ni[i0], ni[i1] = hs(add(x0i, sb2)), hs(sub(x0i, sb2))
        br, bi = nr, ni
    zero = jnp.zeros((8, lanes), jnp.int32)
    return (jnp.concatenate([zero if b is None else b for b in br], axis=0),
            jnp.concatenate([zero if b is None else b for b in bi], axis=0))


def _ladder(wr, wi, tw_ref, size: int, width: int = 16,
            zero_imag_stages: int = 0, layout: str = "natural",
            final_half_only: bool = False):
    """Bit-exact natural-order DIT ladder on (size, lanes) int32 arrays.
    tw_ref: (size, 3*nstages) constant ref, columns [twr | twr+twi | twr-twi]
    (_ladder_packed_constants).

    Butterfly subs are computed from each row's OWN values: the per-row
    twiddle is pair-constant (tw[r] == tw[r^d] -- bit L-1-s is shifted out
    of the stage's group index), so sub(x1) evaluated at the x1 row equals
    what the x0 row needs; one roll distributes it.  This replaces the
    4-select x1/x0 assembly + sgn multiplies of the direct form with
    2 selects and pure adds/subs -- 3 int32 multiplies per stage instead
    of 5, same rolls, bit-identical results.

    ``zero_imag_stages``: number of leading stages for which the CALLER
    guarantees the imaginary input is identically zero AND the stage's
    twiddle imag column is all-zero (checked by the caller against the numpy
    constants) -- those stages skip every imaginary-side op, and a real-only
    value is threaded (the real-input FFT's first stages, where wi stays 0
    exactly: sub2 = (0 + bias - 0) >> (width-2) = 0 and x0i = 0)."""
    if LADDER_BLOCKS and layout == "evenodd8":
        # block form (round 5g): every evenodd8 stride is a multiple of 8
        return _ladder_blocks(wr, wi, tw_ref, size, width,
                              zero_imag_stages, final_half_only)
    L = int(np.log2(size))
    bias = (1 << (width - 3)) - 1
    unit = 1 << (width - 2)                # the table's exact-one twiddle
    np_cr, np_ci = _ladder_constants(size, width, layout)  # trace-time consts
    strides = _ladder_strides(size, layout)
    rows = jax.lax.broadcasted_iota(jnp.int32, (size, wr.shape[1]), 0)
    for s in range(L):
        d = strides[s]
        if layout == "evenodd8" and s == L - 4:
            # mid-ladder regroup (_regroup_perm): a pure row permutation
            # BETWEEN stages -- both arrays move once, the three remaining
            # general stages then roll at vreg-aligned strides instead of
            # 4/2/1 (chip A/B: the sub-vreg rolls cost ~2.4 ms/run; this
            # value-op costs ~0.55 ms).  Bit-exactness untouched: butterfly
            # partners are XOR pairs, preserved under any index-bit
            # permutation, and the stage constants ship pre-permuted.
            m = size // 128

            def _rg(v):
                g = v.reshape(2, 8, m, 8, v.shape[1])
                return g.swapaxes(1, 3).reshape(size, v.shape[1])

            wr = _rg(wr)
            wi = _rg(wi)
        if final_half_only and layout in ("evenodd", "evenodd8") \
                and s == L - 1:
            # sigma layout: the last stage's stride IS size/2, so partners
            # are the two array halves, and only the even-output half (the
            # non-conjugate bins) is consumed downstream -- compute it with
            # plain half-slices: no rolls, no selects, half the ops
            half = size // 2
            twr_h = tw_ref[half:, s: s + 1]
            twc1_h = tw_ref[half:, L + s: L + s + 1]
            twc2_h = tw_ref[half:, 2 * L + s: 2 * L + s + 1]
            wrh, wih = wr[half:], wi[half:]
            u = (wrh + wih) * twr_h + bias
            sb1 = (u - wih * twc1_h) >> (width - 2)
            sb2 = (u - wrh * twc2_h) >> (width - 2)
            return (_wrap16((wr[:half] + sb1) >> 1),
                    _wrap16((wi[:half] + sb2) >> 1))
        twr = tw_ref[:, s: s + 1]
        is_x0 = (rows & d) == 0
        # trace-time twiddle-pattern facts for multiplier-free shortcuts:
        # (x*unit + bias) >> (width-2) == x exactly (bias < unit, x<<14 has
        # zero low bits), so unit twiddles need no multiply at all
        all_unit_re = bool((np_cr[:, s] == unit).all()
                           and (np_ci[:, s] == 0).all())
        unit_pair = bool(np.logical_or(
            (np_cr[:, s] == unit) & (np_ci[:, s] == 0),
            (np_cr[:, s] == 0) & (np_ci[:, s] == -unit)).all())
        if SLICE_MIN_STRIDE and d >= SLICE_MIN_STRIDE and s != L - 1:
            # slice form (see the SLICE_MIN_STRIDE comment): pairs are
            # aligned (d, lanes) blocks; subs from the x1 block only
            w2 = width - 2
            pr, pim = [], []
            for b in range(size // (2 * d)):
                o = 2 * d * b
                x0r, x1r = wr[o: o + d], wr[o + d: o + 2 * d]
                tw1 = tw_ref[o + d: o + 2 * d, s: s + 1]
                if s < zero_imag_stages:
                    sb1 = x1r if all_unit_re \
                        else (x1r * tw1 + bias) >> w2
                    pr += [_wrap16((x0r + sb1) >> 1),
                           _wrap16((x0r - sb1) >> 1)]
                    continue
                if s == zero_imag_stages and zero_imag_stages > 0:
                    # wi == 0 entering: imag side comes only from sb2
                    if unit_pair:
                        re_row = tw1 != 0
                        sb1 = jnp.where(re_row, x1r, 0)
                        sb2 = jnp.where(re_row, 0, -x1r)
                    else:
                        m0 = x1r * tw1 + bias
                        sb1 = m0 >> w2
                        sb2 = (m0 - x1r *
                               tw_ref[o + d: o + 2 * d,
                                      2 * L + s: 2 * L + s + 1]) >> w2
                    pr += [_wrap16((x0r + sb1) >> 1),
                           _wrap16((x0r - sb1) >> 1)]
                    pim += [_wrap16(sb2 >> 1), _wrap16((-sb2) >> 1)]
                    continue
                x0i, x1i = wi[o: o + d], wi[o + d: o + 2 * d]
                tc1 = tw_ref[o + d: o + 2 * d, L + s: L + s + 1]
                tc2 = tw_ref[o + d: o + 2 * d, 2 * L + s: 2 * L + s + 1]
                u = (x1r + x1i) * tw1 + bias
                sb1 = (u - x1i * tc1) >> w2
                sb2 = (u - x1r * tc2) >> w2
                pr += [_wrap16((x0r + sb1) >> 1),
                       _wrap16((x0r - sb1) >> 1)]
                pim += [_wrap16((x0i + sb2) >> 1),
                        _wrap16((x0i - sb2) >> 1)]
            wr = jnp.concatenate(pr, axis=0)
            if pim:
                wi = jnp.concatenate(pim, axis=0)
            continue
        if s < zero_imag_stages:
            # wi == 0 and tw imag == 0: m1 = 0, m0 - m2 = x1r*twi = 0 ->
            # sub2 = bias >> (width-2) = 0, yi = (0 +- 0) >> 1 = 0
            if all_unit_re:
                sb1 = wr
            else:
                sb1 = (wr * twr + bias) >> (width - 2)
            a1 = wr + pltpu.roll(sb1, size - d, 0)      # x0 rows: own + sub@r+d
            b1 = pltpu.roll(wr, d, 0) - sb1             # x1 rows: x0@r-d - own sub
            wr = _wrap16(jnp.where(is_x0, a1, b1) >> 1)
            continue
        if s == zero_imag_stages and zero_imag_stages > 0:
            # wi still == 0, but tw imag may be nonzero: the imaginary side
            # reduces to sub2 = (x1r*twr + bias - x1r*(twr-twi)) >> (w-2)
            # and yi = (0 +- sub2) >> 1
            if unit_pair:
                # tw in {(u,0), (0,-u)}: sub1 = own / 0, sub2 = 0 / -own
                re_row = twr != 0
                sb1 = jnp.where(re_row, wr, 0)
                sb2 = jnp.where(re_row, 0, -wr)
            else:
                m0 = wr * twr + bias
                sb1 = m0 >> (width - 2)
                sb2 = (m0 - wr * tw_ref[:, 2 * L + s: 2 * L + s + 1]) \
                    >> (width - 2)
            a1 = wr + pltpu.roll(sb1, size - d, 0)
            b1 = pltpu.roll(wr, d, 0) - sb1
            wr_new = _wrap16(jnp.where(is_x0, a1, b1) >> 1)
            # imag side: x0i == 0 on both rows -> y = (0 +- sub2) >> 1
            wi = _wrap16(jnp.where(is_x0,
                                   pltpu.roll(sb2, size - d, 0), -sb2) >> 1)
            wr = wr_new
            continue
        twc1 = tw_ref[:, L + s: L + s + 1]           # twr + twi
        twc2 = tw_ref[:, 2 * L + s: 2 * L + s + 1]   # twr - twi
        # subs from OWN values (3-mult factorization, fft.py:152-180)
        u = (wr + wi) * twr + bias
        sb1 = (u - wi * twc1) >> (width - 2)
        sb2 = (u - wr * twc2) >> (width - 2)
        # distribute: x0 rows add the partner's sub, x1 rows subtract their
        # own sub from the partner's x0 value (rolls wrap circularly, but
        # every wrapped row falls on the other half of the select)
        a1 = wr + pltpu.roll(sb1, size - d, 0)
        b1 = pltpu.roll(wr, d, 0) - sb1
        a2 = wi + pltpu.roll(sb2, size - d, 0)
        b2 = pltpu.roll(wi, d, 0) - sb2
        wr = _wrap16(jnp.where(is_x0, a1, b1) >> 1)
        wi = _wrap16(jnp.where(is_x0, a2, b2) >> 1)
    return wr, wi


def _zero_imag_stage_count(size: int, width: int = 16) -> int:
    """How many leading ladder stages have an all-zero twiddle imag column
    (-> a real input stays real through them).  1 for the standard table
    (stage 0 uses T[0] = (c, 0) everywhere)."""
    _, ci = _ladder_constants(size, width)
    n = 0
    while n < ci.shape[1] and not ci[:, n].any():
        n += 1
    return n


# ---------------------------------------------------------------------------
# Kernel
# ---------------------------------------------------------------------------

def _post_fft_stages(wr, wi, fb_ref, dtw_ref, out_ref, dbuf_r,
                     *, cfg: MFCCConfig, fb_shift: int, lanes: int,
                     stop_after: str | None = None):
    """Stages 2-5 (power, filterbank, log2, DCT) shared by the kernel
    variants; wr/wi: (nfft, lanes) ladder outputs.

    ``stop_after`` ("mel" | "logmel"): profiling hook -- write that
    stage's leading rows to out_ref and return, so Mosaic DCEs the tail
    and timing deltas attribute per-stage cost (never set in production;
    see the stage-ablation notes in docs/BENCH.md)."""
    nbins = cfg.nfft // 2

    # 2. power spectrum.  The 512-pt ladder runs in the sigma (even/odd)
    # row layout, so the non-conjugate bins ARE rows [0, nbins) -- the
    # extraction is a free aligned slice (r*r + i*i as a 32-bit field, >>2)
    wr_e = wr[:nbins]
    wi_e = wi[:nbins]
    s = wr_e * wr_e + wi_e * wi_e
    power = jax.lax.shift_right_logical(s, jnp.int32(2 * 16 - cfg.power_width))
    if stop_after == "power":
        out_ref[0] = power[: cfg.nceptrums]
        return
    _post_power_stages(power, fb_ref, dtw_ref, out_ref, dbuf_r, cfg=cfg,
                       fb_shift=fb_shift, lanes=lanes,
                       stop_after=stop_after)


def _post_power_stages(power, fb_ref, dtw_ref, out_ref, dbuf_r,
                       *, cfg: MFCCConfig, fb_shift: int, lanes: int,
                       stop_after: str | None = None):
    """Stages 3-5 (filterbank, log2, DCT) on a (nbins, lanes) int32 power
    block -- split from _post_fft_stages so a two-kernel pipeline (ladder
    front / epilogue back) shares the exact shipped arithmetic."""
    ntap = cfg.nfilters

    # 3. integer filterbank: limb MXU matmuls (rows pre-permuted,
    # conjugate-zero columns dropped -- _fb_limb_matrix).  Radix follows
    # FB_LIMB_BITS: 7-bit int8 limbs (exact int32 MXU accumulation) or
    # 8-bit bf16 limbs (exact f32 accumulation below 2^24, asserted at
    # table build) -- 8-bit needs one fewer limb on each side for the
    # reference 30/31-bit widths and skips the int32->int8 4x sublane
    # repack of every (nbins, lanes) RHS.
    bits = 7 if fb_ref.dtype == jnp.int8 else 8
    mask = (1 << bits) - 1
    acc_t = jnp.int32 if bits == 7 else jnp.float32
    # power limbs ride in the SAME dtype as the weight operand (int8 /
    # bf16 / f32 under FB_LIMB_F32 -- the no-sub-word-packing arm)
    limb_t = jnp.int8 if bits == 7 else fb_ref.dtype
    n_w = fb_ref.shape[0] // ntap          # rows come limb-stacked (2-D)
    n_p = -(-cfg.power_width // bits)
    # the TOP power limb needs no mask: power < 2^power_width, so the
    # shifted-down remainder is already < 2^bits
    p_limbs = [(power >> (bits * j) if bits * (j + 1) >= cfg.power_width
                else (power >> (bits * j)) & mask).astype(limb_t)
               for j in range(n_p)]
    D = [None, None, None, None]       # base-2^23 digits of S
    need_bits = fb_shift + 16

    def accum(P, sh):
        t = sh % 23
        dd = sh // 23
        lo = (P & ((1 << (23 - t)) - 1)) << t
        D[dd] = lo if D[dd] is None else D[dd] + lo
        if dd + 1 < 4:
            hi = P >> (23 - t)
            D[dd + 1] = hi if D[dd + 1] is None else D[dd + 1] + hi

    # Group partial products by TOTAL shift class s = i + j before the
    # digit split: every (i, j) pair with the same s lands at the same
    # bit offset, so one plain int32 add replaces the pair's whole
    # mask/shift/add digit-accumulate (15 pairs -> 6 classes for the
    # reference widths).  Exact: each class sums <= n_w partials of
    # < 2^24 (bf16/f32 arms) -> < 2^26, no int32 overflow; the digit
    # sums stay < 2^28 before the final carry propagation.
    smax = (need_bits - 1) // bits
    T = [None] * (smax + 1)

    def class_add(P, s):
        T[s] = P if T[s] is None else T[s] + P

    if FB_STACKED:
        # Row-stack the weight limb matrices into ONE (n_w*ntap, nbins) LHS
        # and issue a single dot per POWER limb: the MXU cost is streaming
        # the (nbins, lanes) RHS, so this cuts RHS streaming n_w-fold and
        # fills the 128-row MXU tile that a lone (ntap=32, nbins) LHS left
        # 3/4 empty.  Contributions whose shift lands entirely above the
        # consumed 16-bit window [fb_shift, fb_shift+16) are discarded
        # post-dot (digit carries only propagate upward, so computing them
        # cannot alias into the consumed bits).
        fbs = fb_ref[:]                    # already (n_w*ntap, nbins)
        for j in range(n_p):
            if bits * j >= need_bits:
                continue
            Pall = jnp.dot(fbs, p_limbs[j], preferred_element_type=acc_t)
            if acc_t is jnp.float32:
                Pall = Pall.astype(jnp.int32)
            for i in range(n_w):
                if i + j > smax:
                    continue
                class_add(Pall[i * ntap:(i + 1) * ntap], i + j)
    else:
        for j in range(n_p):
            for i in range(n_w):
                if i + j > smax:
                    continue
                P = jnp.dot(fb_ref[i * ntap:(i + 1) * ntap], p_limbs[j],
                            preferred_element_type=acc_t)
                if acc_t is jnp.float32:
                    P = P.astype(jnp.int32)
                class_add(P, i + j)
    for s in range(smax + 1):
        if T[s] is not None:
            accum(T[s], bits * s)
    zero = jnp.zeros((ntap, lanes), jnp.int32)
    D = [zero if v is None else v for v in D]
    for dd in range(3):
        D[dd + 1] = D[dd + 1] + (D[dd] >> 23)
        D[dd] = D[dd] & ((1 << 23) - 1)
    q, r = divmod(fb_shift, 23)
    mel = D[q] >> r
    if r:
        mel = mel | (D[q + 1] << (23 - r))
    mel = mel & 0xFFFF                               # (ntap, lanes)
    if stop_after == "mel":
        out_ref[0] = mel[: cfg.nceptrums]
        return

    # 4. Turner log2 (log.py), unrolled; precision = 11 for Log2Fix(16, 15)
    precision = cfg.log_precision
    d = jnp.where(mel == 0, 1, mel)
    shifts = jnp.zeros_like(d)
    for jbit in range(1, 16):
        shifts = shifts + (d >= (1 << jbit)).astype(jnp.int32)
    z = (d << precision) >> shifts
    res = shifts << precision
    b = 1 << (precision - 1)
    for _ in range(precision - 1):
        c = z * z
        hi = (c >> (2 * precision + 1)) & 1
        res = res + jnp.where(hi == 1, b, 0)
        z = jnp.where(hi == 1, c >> (precision + 1), c >> precision)
        b >>= 1
    logmel = res & ((1 << cfg.log_width_output) - 1)  # (ntap, lanes)
    if stop_after == "logmel":
        out_ref[0] = logmel[: cfg.nceptrums]
        return

    # 5. DCT-II via 4N INT FFT: interleaved scatter fill, ladder, row extract
    n4 = 4 * ntap
    if DCT_SIGMA:
        # The interleave fill (dct_stream.py:29-34) touches only ODD natural
        # rows: 2k+1 <- logmel[k] and n4-1-2k <- logmel[k].  Odd row 2m+1
        # holds logmel[m] for m < 2*ntap/2... precisely logmel[m] (m < ntap)
        # and logmel[2*ntap-1-m] (m >= ntap): [logmel | reversed logmel].
        # sigma maps odd naturals to the upper half, even (all-zero)
        # naturals to the lower -- the fill is two concats, no row stores.
        nrev = 2 * ntap
        rows_m = jax.lax.broadcasted_iota(jnp.int32, (ntap, lanes), 0)
        rev = logmel
        for b in range(int(np.log2(ntap))):   # rev[m] = logmel[ntap-1-m]
            sh = 1 << b
            down = pltpu.roll(rev, sh, 0)            # row m <- row m-sh
            upr = pltpu.roll(rev, ntap - sh, 0)      # row m <- row m+sh
            rev = jnp.where((rows_m & sh) != 0, down, upr)
        odd_half = jnp.concatenate([logmel, rev], axis=0)     # (2*ntap, L)
        dbuf = jnp.concatenate([jnp.zeros_like(odd_half), odd_half], axis=0)
        cr, _ = _ladder(dbuf, jnp.zeros((n4, lanes), jnp.int32),
                        dtw_ref, n4, layout=_ladder_layout(n4),
                        final_half_only=True,
                        zero_imag_stages=_zero_imag_stage_count(n4))
        # cepstrum k = bin k = natural row bitrev(k, log2(n4)); sigma halves
        # that even row's index (bitrev(k) >> 1) and the evenodd8 regroup
        # (when active) then moves it by R (half-preserving)
        L4 = int(np.log2(n4))
        R4 = (_regroup_perm(n4) if _ladder_layout(n4) == "evenodd8"
              else np.arange(n4))
        for k in range(cfg.nceptrums):
            out_ref[0, k, :] = cr[R4[_bitrev(k, L4) >> 1], :]
    else:
        out_rows, fill_a, fill_b = _dct_constants(ntap)
        dbuf_r[:] = jnp.zeros_like(dbuf_r)
        for k in range(ntap):
            dbuf_r[fill_a[k], :] = logmel[k, :]
            dbuf_r[fill_b[k], :] = logmel[k, :]
        cr, ci = _ladder(dbuf_r[:], jnp.zeros((n4, lanes), jnp.int32),
                         dtw_ref, n4,
                         zero_imag_stages=_zero_imag_stage_count(n4))
        for k in range(cfg.nceptrums):
            out_ref[0, k, :] = cr[out_rows[k], :]


def _int_kernel(win_ref, tw_ref, fb_ref, dtw_ref,
                out_ref, dbuf_r, *, cfg: MFCCConfig, fb_shift: int):
    # 1. bit-exact 512-pt FFT ladder (real input, imag = 0; the leading
    # zero-twiddle-imag stages skip the imaginary datapath entirely).
    # sigma row layout: the HOST feeds positions in [evens | odds] order.
    wr, wi = _ladder(win_ref[0], jnp.zeros_like(win_ref[0]),
                     tw_ref, cfg.nfft, layout=_ladder_layout(cfg.nfft),
                     final_half_only=True,
                     zero_imag_stages=_zero_imag_stage_count(cfg.nfft))
    _post_fft_stages(wr, wi, fb_ref, dtw_ref, out_ref, dbuf_r,
                     cfg=cfg, fb_shift=fb_shift, lanes=BF)


def _int_kernel_v2(xa_ref, xb_ref, prev_ref, wincol_ref, tw_ref, fb_ref,
                   dtw_ref, out_ref, fbuf, dbuf_r, *,
                   cfg: MFCCConfig, fb_shift: int, bf: int, nseg: int):
    """Pre-emphasis + framing + windowing fused in (positions-major): the
    block reads two adjacent (hop, bf) lane-tiles of the TRANSPOSED RAW
    int16 signal (half the HBM traffic of an int32 emphasized signal) and
    rebuilds the (nfft, bf) frame matrix with ``nseg`` lane-shifted
    sub-matrix copies -- frame lane i, position q*hop+t is row t, lane i+q
    of the tile pair.  Pre-emphasis runs in transposed space: sample
    (l*hop + t)'s predecessor is row t-1 same lane for t > 0 and row hop-1,
    lane l-1 for t == 0 (lane 0 takes the block's SMEM prev scalar) --
    the same reference stage as preemph.py:20-27.  The ring-buffer overlap
    re-reads (mfcc/core/frame.py:86-114) become lane offsets; the window
    LUT product (window.py:22-43 datapath, already folded into wincol) is
    one broadcast multiply per position row."""
    nfft, hop = cfg.nfft, cfg.hop
    C = jnp.concatenate([xa_ref[0], xb_ref[0]],
                        axis=1).astype(jnp.int32)         # (hop, 2*bf)
    rows = jax.lax.broadcasted_iota(jnp.int32, C.shape, 0)
    lanecol = jax.lax.broadcasted_iota(jnp.int32, (1, C.shape[1]), 1)
    up = pltpu.roll(C, 1, 0)                        # row t <- row t-1
    wrapped = pltpu.roll(C[hop - 1: hop, :], 1, 1)  # lane l <- lane l-1
    prev_row0 = jnp.where(lanecol == 0, prev_ref[0, 0, 0], wrapped)
    prev = jnp.where(rows == 0, prev_row0, up)
    # y = wrap16(x + (prev >> 5) - prev)  (preemph.py:23)
    E = framing.wrap_signed(C + (prev >> 5) - prev, cfg.width)
    # sigma-layout rebuild: even positions -> rows [0, nfft/2), odd ->
    # [nfft/2, nfft) (one cheap (hop/2, 2, lanes) value reshape; hop even)
    half = nfft // 2
    Es = E.reshape(hop // 2, 2, C.shape[1])
    Eev, Eod = Es[:, 0], Es[:, 1]
    for q in range(nseg):
        p0 = q * hop
        w = min(hop, nfft - p0)
        he, ho = (w + 1) // 2, w // 2
        fbuf[p0 // 2: p0 // 2 + he, :] = Eev[:he, q: q + bf]
        fbuf[half + p0 // 2: half + p0 // 2 + ho, :] = Eod[:ho, q: q + bf]
    x = fbuf[:]                                           # (nfft, bf) int32
    # window_int, positions-major: (x * curve[p]) >> (precision+1), wrap16
    # (wincol comes sigma-permuted from the host)
    xw = framing.wrap_signed((x * wincol_ref[:]) >> (cfg.window_precision + 1),
                             cfg.width)
    wr, wi = _ladder(xw, jnp.zeros_like(xw), tw_ref, nfft,
                     layout=_ladder_layout(nfft),
                     final_half_only=True,
                     zero_imag_stages=_zero_imag_stage_count(nfft))
    _post_fft_stages(wr, wi, fb_ref, dtw_ref, out_ref, dbuf_r,
                     cfg=cfg, fb_shift=fb_shift, lanes=bf)


def mfcc_int_pallas_v2(audio: jnp.ndarray, cfg: MFCCConfig = MFCCConfig(),
                       *, bf: int = BF) -> jnp.ndarray:
    """Fused bit-exact INT pipeline, v2: pre-emphasis, framing, windowing
    and the positions-major transpose all happen IN the kernel.  The XLA
    prologue is ONE (T -> positions, rows) transpose of the RAW int16
    signal (half the bytes of an emphasized int32 signal) -- no emphasis
    pass, no 3x overlapped-frame gather, no windowing pass, no frame-matrix
    transpose.  (S, T) int16-range -> (S, F, nceptrums) int32.  Samples are
    taken mod 2^16 (the int16 wire contract, software/main.c:134-151)."""
    assert cfg.nfft == 512 and cfg.nfilters in (16, 32), \
        "kernel assumes the reference config family"
    assert cfg.width == 16 and cfg.window_precision == 8 \
        and cfg.power_width == 30, \
        "kernel hardcodes the 16-bit datapath; use int_ops for other widths"
    assert bf % 128 == 0
    lead = audio.shape[:-1]
    if audio.ndim == 1:
        audio = audio[None]
    elif audio.ndim > 2:
        audio = audio.reshape(-1, audio.shape[-1])
    nfft, hop = cfg.nfft, cfg.hop
    nseg = -(-nfft // hop)
    S, T = audio.shape
    F = cfg.n_frames(T)
    assert F >= 1, "signal shorter than one frame"
    nblocks = -(-F // bf)
    Fp = nblocks * bf
    N = S * nblocks

    raw = audio.astype(jnp.int16)                # the int16 wire contract
    # hop-rows, transposed; pad the lane (row-index) axis so block n can
    # always read lane-tiles n and n+1
    Lp = (nblocks + 1) * bf
    need = Lp * hop
    if need > T:
        raw = jnp.pad(raw, ((0, 0), (0, need - T)))
    rows = raw[:, : Lp * hop].reshape(S, Lp, hop)
    TT = rows.swapaxes(-1, -2)                                # (S, hop, Lp)
    # raw sample immediately before each block (0 for a stream's first
    # block) -- the pre-emphasis carry across block boundaries
    prev_idx = jnp.maximum(jnp.arange(nblocks) * bf * hop - 1, 0)
    prevs = (raw[:, prev_idx].astype(jnp.int32)
             * (jnp.arange(nblocks) > 0)).reshape(N, 1, 1)

    tw = _ladder_packed_constants(nfft, layout=_ladder_layout(nfft))
    fb_limbs, fb_shift = _fb_limb_matrix(cfg)
    dtw = _dct_packed_constants(cfg.nfilters)
    wc = np.asarray(tables.int_window_curve(nfft, cfg.window_precision),
                    np.int32)
    # sigma row layout: [even positions | odd positions]
    wincol = np.concatenate([wc[0::2], wc[1::2]]).reshape(nfft, 1)
    n4 = 4 * cfg.nfilters

    out = pl.pallas_call(
        functools.partial(_int_kernel_v2, cfg=cfg, fb_shift=fb_shift,
                          bf=bf, nseg=nseg),
        grid=(N,),
        in_specs=[
            pl.BlockSpec((1, hop, bf),
                         lambda n: (n // nblocks, 0, n % nblocks),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hop, bf),
                         lambda n: (n // nblocks, 0, n % nblocks + 1),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1), lambda n: (n, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((nfft, 1), lambda n: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nfft, tw.shape[1]), lambda n: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(fb_limbs.shape, lambda n: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n4, dtw.shape[1]), lambda n: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, cfg.nceptrums, bf), lambda n: (n, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, cfg.nceptrums, bf), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((nfft, bf), jnp.int32),
            pltpu.VMEM((n4, bf), jnp.int32),
        ],
    )(TT, TT, prevs, jnp.asarray(wincol), jnp.asarray(tw),
      jnp.asarray(fb_limbs), jnp.asarray(dtw))

    out = out.swapaxes(-1, -2).reshape(S, Fp, cfg.nceptrums)[:, :F]
    return out.reshape(lead + (F, cfg.nceptrums))


NBMAX_INT = 4  # lane-tiles per whole-stream super-block (VMEM cap)


def _int_kernel_v3(xm_ref, xx_ref, prev_ref, wincol_ref, tw_ref, fb_ref,
                   dtw_ref, out_ref, fbuf, dbuf_r, *,
                   cfg: MFCCConfig, fb_shift: int, bf: int, nseg: int,
                   nbk: int, kernel_t=False, pack32=False,
                   stop_after=None):
    """Whole-stream variant of _int_kernel_v2: one super-block reads nbk+1
    contiguous lane-tiles (no tile double-read), rebuilds nbk blocks of
    frames into one (nfft, nbk*bf) matrix, and runs the ladder and the
    epilogue stages once over all lanes -- the (ntap, lanes) filterbank /
    log2 / DCT matrices are nbk x wider, amortizing VPU instruction issue.
    Same reference stages as v2; bit-exactness is untouched (the arithmetic
    is per-lane)."""
    nfft, hop = cfg.nfft, cfg.hop
    L = nbk * bf
    ncep = cfg.nceptrums
    half = nfft // 2
    tiles = [xm_ref[0, i] for i in range(nbk)] + [xx_ref[0, 0]]
    if pack32:
        # tiles are (hop/2, bf) int32 holding ADJACENT SAMPLE PAIRS packed
        # by the host (even position in the low half-word): the host-side
        # relayout is then a 32-bit transpose of half-height -- the
        # pathological XLA i16 transpose leaves the pipeline entirely --
        # and the even/odd split the sigma fill wants falls out of the
        # unpack shifts for free
        Cp = jnp.concatenate(tiles, axis=1)          # (hop/2, Lt) packed
        Ce = (Cp << 16) >> 16                        # even positions
        Co = Cp >> 16                                # odd positions
        if stop_after == "raw":   # profiling cut: DMA + concat + unpack
            out_ref[0] = Ce[:ncep, :L] + Co[:ncep, :L]
            return
        h2 = hop // 2
        rows = jax.lax.broadcasted_iota(jnp.int32, Ce.shape, 0)
        lanecol = jax.lax.broadcasted_iota(jnp.int32, (1, Ce.shape[1]), 1)
        # odd position 2k+1's predecessor is even 2k: same row, same lane
        Eod = framing.wrap_signed(Co + (Ce >> 5) - Ce, cfg.width)
        # even position 2k's predecessor is odd 2k-1: row k-1 (lane l-1's
        # last row for k == 0; the block's SMEM prev scalar at lane 0)
        up = pltpu.roll(Co, 1, 0)
        wrapped = pltpu.roll(Co[h2 - 1: h2, :], 1, 1)
        prev_row0 = jnp.where(lanecol == 0, prev_ref[0, 0, 0], wrapped)
        pe = jnp.where(rows == 0, prev_row0, up)
        Eev = framing.wrap_signed(Ce + (pe >> 5) - pe, cfg.width)
        if stop_after == "emph":  # profiling cut: + pre-emphasis
            out_ref[0] = Eev[:ncep, :L] + Eod[:ncep, :L]
            return
    else:
        if kernel_t:                 # (bf, hop) tiles: HW transpose
            tiles = [t.T for t in tiles]
        C = jnp.concatenate(tiles, axis=1).astype(jnp.int32)  # (hop, Lt)
        if stop_after == "raw":   # profiling cut: DMA + concat + upcast
            out_ref[0] = C[:ncep, :L]
            return
        rows = jax.lax.broadcasted_iota(jnp.int32, C.shape, 0)
        lanecol = jax.lax.broadcasted_iota(jnp.int32, (1, C.shape[1]), 1)
        up = pltpu.roll(C, 1, 0)                        # row t <- row t-1
        wrapped = pltpu.roll(C[hop - 1: hop, :], 1, 1)  # lane l <- lane l-1
        prev_row0 = jnp.where(lanecol == 0, prev_ref[0, 0, 0], wrapped)
        prev = jnp.where(rows == 0, prev_row0, up)
        # y = wrap16(x + (prev >> 5) - prev)  (preemph.py:23)
        E = framing.wrap_signed(C + (prev >> 5) - prev, cfg.width)
        if stop_after == "emph":  # profiling cut: + pre-emphasis
            out_ref[0] = E[:ncep, :L]
            return
        # sigma-layout rebuild: even positions -> rows [0, nfft/2), odd ->
        # [nfft/2, nfft) (one cheap (hop/2, 2, lanes) reshape; hop even)
        Es = E.reshape(hop // 2, 2, C.shape[1])
        Eev, Eod = Es[:, 0], Es[:, 1]
    for b in range(nbk):
        for q in range(nseg):
            p0 = q * hop
            w = min(hop, nfft - p0)
            he, ho = (w + 1) // 2, w // 2
            lane = b * bf + q
            fbuf[p0 // 2: p0 // 2 + he, b * bf:(b + 1) * bf] = \
                Eev[:he, lane: lane + bf]
            fbuf[half + p0 // 2: half + p0 // 2 + ho,
                 b * bf:(b + 1) * bf] = Eod[:ho, lane: lane + bf]
    x = fbuf[:]                                           # (nfft, L) int32
    if stop_after == "frames":    # profiling cut: + frame rebuild
        out_ref[0] = x[:ncep, :L]
        return
    # (wincol comes sigma-permuted from the host)
    xw = framing.wrap_signed((x * wincol_ref[:]) >> (cfg.window_precision + 1),
                             cfg.width)
    if stop_after == "window":    # profiling cut: + window multiply
        out_ref[0] = xw[:ncep, :L]
        return
    wr, wi = _ladder(xw, jnp.zeros_like(xw), tw_ref, nfft,
                     layout=_ladder_layout(nfft),
                     final_half_only=True,
                     zero_imag_stages=_zero_imag_stage_count(nfft))
    if stop_after == "fft":       # profiling cut: + the 9-stage ladder
        out_ref[0] = wr[:ncep, :L] + wi[:ncep, :L]
        return
    _post_fft_stages(wr, wi, fb_ref, dtw_ref, out_ref, dbuf_r,
                     cfg=cfg, fb_shift=fb_shift, lanes=L,
                     stop_after=stop_after)


def mfcc_int_pallas_v3(audio: jnp.ndarray, cfg: MFCCConfig = MFCCConfig(),
                       *, bf: int = BF, interpret: bool = False,
                       stop_after: str | None = None,
                       kernel_t: bool | None = None,
                       pack32: bool | None = None) -> jnp.ndarray:
    """Fused bit-exact INT pipeline, v3: v2's in-kernel pre-emphasis /
    framing / windowing plus whole-stream super-blocks (the float radix-2
    kernel's blocking).  (S, T) int16-range -> (S, F, nceptrums) int32.

    ``kernel_t``: per-call override of the INT_KERNEL_T module default
    (in-VMEM vs host tile transpose; bit-identical either way).
    ``pack32``: per-call override of INT_PACK32 (adjacent-sample int32
    packing before the host transpose; bit-identical either way)."""
    if kernel_t is None:
        kernel_t = INT_KERNEL_T
    if pack32 is None:
        pack32 = INT_PACK32
    if pack32:
        kernel_t = False             # mutually exclusive input layouts
    assert cfg.nfft == 512 and cfg.nfilters in (16, 32), \
        "kernel assumes the reference config family"
    assert cfg.width == 16 and cfg.window_precision == 8 \
        and cfg.power_width == 30, \
        "kernel hardcodes the 16-bit datapath; use int_ops for other widths"
    assert bf % 128 == 0
    lead = audio.shape[:-1]
    if audio.ndim == 1:
        audio = audio[None]
    elif audio.ndim > 2:
        audio = audio.reshape(-1, audio.shape[-1])
    nfft, hop = cfg.nfft, cfg.hop
    nseg = -(-nfft // hop)
    S, T = audio.shape
    F = cfg.n_frames(T)
    assert F >= 1, "signal shorter than one frame"
    nb = -(-F // bf)
    nchunks = -(-nb // NBMAX_INT)
    nbk = -(-nb // nchunks)                    # balanced tiles per chunk
    Fp = nchunks * nbk * bf
    N = S * nchunks
    L = nbk * bf

    raw = audio.astype(jnp.int16)                # the int16 wire contract
    Lp = nchunks * nbk + 1
    need = Lp * bf * hop
    if need > T:
        raw = jnp.pad(raw, ((0, 0), (0, need - T)))
    if pack32:
        # adjacent sample pairs packed into int32 (bitcast: even position
        # in the low half-word), THEN transposed: the host relayout is a
        # half-height 32-bit transpose instead of the i16 one (flag note)
        T4 = jax.lax.bitcast_convert_type(
            raw[:, : need].reshape(S, Lp, bf, hop // 2, 2),
            jnp.int32).swapaxes(-1, -2)
        tile = (hop // 2, bf)
    elif kernel_t:
        # free reshape; (bf, hop) tiles transpose in VMEM (flag note)
        T4 = raw[:, : need].reshape(S, Lp, bf, hop)
        tile = (bf, hop)
    else:
        T4 = raw[:, : need].reshape(S, Lp, bf, hop).swapaxes(-1, -2)
        tile = (hop, bf)
    # raw sample immediately before each super-block (0 at stream start)
    prev_idx = jnp.maximum(jnp.arange(nchunks) * nbk * bf * hop - 1, 0)
    prevs = (raw[:, prev_idx].astype(jnp.int32)
             * (jnp.arange(nchunks) > 0)).reshape(N, 1, 1)

    tw = _ladder_packed_constants(nfft, layout=_ladder_layout(nfft))
    fb_limbs, fb_shift = _fb_limb_matrix(cfg)
    dtw = _dct_packed_constants(cfg.nfilters)
    wc = np.asarray(tables.int_window_curve(nfft, cfg.window_precision),
                    np.int32)
    # sigma row layout: [even positions | odd positions]
    wincol = np.concatenate([wc[0::2], wc[1::2]]).reshape(nfft, 1)
    n4 = 4 * cfg.nfilters

    out = pl.pallas_call(
        functools.partial(_int_kernel_v3, cfg=cfg, fb_shift=fb_shift,
                          bf=bf, nseg=nseg, nbk=nbk,
                          kernel_t=kernel_t, pack32=pack32,
                          stop_after=stop_after),
        grid=(N,),
        in_specs=[
            pl.BlockSpec((1, nbk) + tile,
                         lambda n, nc=nchunks: (n // nc, n % nc, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1) + tile,
                         lambda n, nc=nchunks, k=nbk:
                         (n // nc, (n % nc) * k + k, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1), lambda n: (n, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((nfft, 1), lambda n: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nfft, tw.shape[1]), lambda n: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(fb_limbs.shape, lambda n: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n4, dtw.shape[1]), lambda n: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, cfg.nceptrums, L), lambda n: (n, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, cfg.nceptrums, L), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((nfft, L), jnp.int32),
            pltpu.VMEM((n4, L), jnp.int32),
        ],
        interpret=interpret,
    )(T4, T4, prevs, jnp.asarray(wincol), jnp.asarray(tw),
      jnp.asarray(fb_limbs), jnp.asarray(dtw))

    out = (out.reshape(S, nchunks, cfg.nceptrums, L).swapaxes(-1, -2)
           .reshape(S, Fp, cfg.nceptrums)[:, :F])
    return out.reshape(lead + (F, cfg.nceptrums))


def pallas_int_config_ok(cfg: MFCCConfig) -> bool:
    """Config-only half of pallas_int_supported (also the gate for
    interpret-mode runs off-TPU): the fused kernels hardcode the reference
    16-bit config family."""
    return (cfg.nfft == 512 and cfg.hop % 2 == 0
            and cfg.nfilters in (16, 32) and cfg.width == 16
            and cfg.window_precision == 8 and cfg.power_width == 30
            and cfg.windowlen == cfg.nfft
            and int_ops._fb_int32_layout_ok(cfg))


def pallas_int_supported(cfg: MFCCConfig) -> bool:
    """Gate for compiled (Mosaic) use: TPU backend + supported config."""
    import jax as _jax
    return _jax.default_backend() == "tpu" and pallas_int_config_ok(cfg)


def mfcc_int_pallas_frames(frames: jnp.ndarray,
                           cfg: MFCCConfig = MFCCConfig(), *,
                           interpret: bool = False) -> jnp.ndarray:
    """Fused bit-exact INT pipeline on pre-emphasized FRAMES:
    (..., F, nfft) int32 -> (..., F, nceptrums) int32.

    The streaming/serving entry point (the chunked step produces emphasized
    frames): all leading axes flatten into the kernel's frame-lane axis, so
    a batch of many streams' few-frame chunks fills 128-lane blocks
    together instead of running the HBM-round-tripping XLA stage chain
    (ROADMAP item 5)."""
    assert cfg.nfft == 512 and cfg.nfilters in (16, 32)
    assert cfg.width == 16 and cfg.window_precision == 8 \
        and cfg.power_width == 30
    lead = frames.shape[:-2]
    F_in = frames.shape[-2]
    nfft = cfg.nfft
    win = int_ops.window_int(frames.reshape(-1, nfft).astype(jnp.int32),
                             nfft, cfg.window_precision, cfg.width)
    M = win.shape[0]
    nblocks = max(1, -(-M // BF))
    Mp = nblocks * BF
    if Mp > M:
        win = jnp.pad(win, ((0, Mp - M), (0, 0)))
    # sigma row layout: position axis reordered to [evens | odds]
    win = jnp.concatenate([win[:, 0::2], win[:, 1::2]], axis=1)
    winT = win.reshape(nblocks, BF, nfft).swapaxes(-1, -2)  # (nb, nfft, BF)

    tw = _ladder_packed_constants(nfft, layout=_ladder_layout(nfft))
    fb_limbs, fb_shift = _fb_limb_matrix(cfg)
    dtw = _dct_packed_constants(cfg.nfilters)
    n4 = 4 * cfg.nfilters

    out = pl.pallas_call(
        functools.partial(_int_kernel, cfg=cfg, fb_shift=fb_shift),
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec((1, nfft, BF), lambda n: (n, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nfft, tw.shape[1]), lambda n: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(fb_limbs.shape, lambda n: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n4, dtw.shape[1]), lambda n: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, cfg.nceptrums, BF), lambda n: (n, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nblocks, cfg.nceptrums, BF),
                                       jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((n4, BF), jnp.int32),
        ],
        interpret=interpret,
    )(winT, jnp.asarray(tw), jnp.asarray(fb_limbs),
      jnp.asarray(dtw))

    out = out.swapaxes(-1, -2).reshape(Mp, cfg.nceptrums)[:M]
    return out.reshape(lead + (F_in, cfg.nceptrums))


def mfcc_int_pallas(audio: jnp.ndarray, cfg: MFCCConfig = MFCCConfig()
                    ) -> jnp.ndarray:
    """Fused bit-exact INT pipeline: (S, T) int32 -> (S, F, nceptrums) int32.

    Pre-emphasis, framing, windowing and the (frames -> positions-major)
    transpose run in XLA (cheap, one pass); the nine-stage ladder and all
    later stages stay in VMEM.
    """
    assert cfg.nfft == 512 and cfg.nfilters in (16, 32), \
        "kernel assumes the reference config family"
    # the kernel's datapath is hardwired to the 16-bit sample format
    # (_wrap16 butterflies, the 2*width-power_width power shift, the
    # width-pass log normalize); other widths must use int_ops
    assert cfg.width == 16 and cfg.window_precision == 8 \
        and cfg.power_width == 30, \
        "kernel hardcodes the 16-bit datapath; use int_ops for other widths"
    lead = audio.shape[:-1]
    if audio.ndim == 1:
        audio = audio[None]
    elif audio.ndim > 2:
        audio = audio.reshape(-1, audio.shape[-1])
    emph = framing.preemphasis_int(audio.astype(jnp.int32))
    frames = framing.extract_frames(emph, cfg.nfft, cfg.hop)
    win = int_ops.window_int(frames, cfg.nfft, cfg.window_precision,
                             cfg.width)                     # (S, F, nfft)
    S, F, nfft = win.shape
    nblocks = -(-F // BF)
    Fp = nblocks * BF
    if Fp > F:
        win = jnp.pad(win, ((0, 0), (0, Fp - F), (0, 0)))
    # sigma row layout: position axis reordered to [evens | odds]
    win = jnp.concatenate([win[..., 0::2], win[..., 1::2]], axis=-1)
    # (S, nblocks, BF, nfft) -> (N, nfft, BF): positions-major blocks
    winT = win.reshape(S * nblocks, BF, nfft).swapaxes(-1, -2)

    tw = _ladder_packed_constants(nfft, layout=_ladder_layout(nfft))
    fb_limbs, fb_shift = _fb_limb_matrix(cfg)
    dtw = _dct_packed_constants(cfg.nfilters)
    N = S * nblocks
    n4 = 4 * cfg.nfilters

    out = pl.pallas_call(
        functools.partial(_int_kernel, cfg=cfg, fb_shift=fb_shift),
        grid=(N,),
        in_specs=[
            pl.BlockSpec((1, nfft, BF), lambda n: (n, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nfft, tw.shape[1]), lambda n: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(fb_limbs.shape, lambda n: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n4, dtw.shape[1]), lambda n: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, cfg.nceptrums, BF), lambda n: (n, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, cfg.nceptrums, BF), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((n4, BF), jnp.int32),
        ],
    )(winT, jnp.asarray(tw), jnp.asarray(fb_limbs),
      jnp.asarray(dtw))

    # (N, ncep, BF) -> (S, Fp, ncep) -> trim padding, restore leading dims
    out = out.swapaxes(-1, -2).reshape(S, Fp, cfg.nceptrums)[:, :F]
    return out.reshape(lead + (F, cfg.nceptrums))
