"""Fused compensated double-f32 ("f64ish") MFCC kernel (Pallas / Mosaic).

The staged-XLA f64ish pipeline (ops/df32.py) meets the <=1e-5 accuracy
north star (BASELINE.md; the MFCC.ipynb cell-45 validation role) but at
~0.9 Mf/s -- 55x below the f32 contract path -- because its ~45 matmuls
and compensation stages each round-trip HBM (round-4 VERDICT weak #3).
This kernel runs the SAME arithmetic plan with every intermediate in
VMEM, one block of BF frame-lanes per grid step:

  positions-major emphasized frames (nfft, L) f32          [exact wire grid]
  -> xi = 32*x int32 (exact), 3 balanced signed 8-bit limbs -> bf16   VPU
  -> EXACT integer-limb windowed DFT: per x-limb ONE row-stacked
     (n_w*2nb, nfft) bf16 MXU dot against all n_w weight limbs of
     round(CS^T * 2^w_bits); every limb product is exact in the MXU's
     f32 accumulation (|partial| <= K*128^2 < 2^24), partials recombine
     through scale-sorted TwoSums into a df32 pair (df32._int_limb_matmul
     restated for the MXU-left layout)                         MXU+VPU
  -> power |.|^2 in df32 (Veltkamp split square, df32._square_df)   VPU
  -> mel: chunked-compensated exact-piece matmuls (df32._df_matmul,
     G=32)                                                     MXU+VPU
  -> log2: exact exponent/mantissa bit split + 65-entry df32 LUT +
     4-term residual series (df32._log2_df; the LUT gather becomes 65
     lane-broadcast selects -- Mosaic has no gather)               VPU
  -> DCT: chunked-compensated exact-piece matmuls (G=8)        MXU+VPU
  -> out_h + out_l (ncep, L)

Accuracy contract: the elementwise max(1e-5, 2 ulp) gate of
tests/test_float_parity.py / bench.py (f64ish_gate_err <= 1.0), same as
the XLA formulation; bit-identity with ops/df32.py is NOT promised (the
accumulation order differs -- both sides sit ~1e-6 from the f64 oracle).
The weight quantization (w_bits=50) bounds the DFT's only inexactness at
|x|_1 * 2^-(w_bits+1) ~ 3e-8, far inside the budget.
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
from . import framing

BF = 128          # frame lanes per block
W_BITS = 50       # DFT weight quantization (df32._int_limb_matmul default)
X_GRID = 5        # wire samples lie exactly on the 2^-5 grid
LIMB = 8          # balanced signed limb radix (bf16-exact, 2^24-safe sums)

# Two-level log2 LUT (round 5h): the 65-entry df32 LUT (130 broadcast
# selects -- the fused kernel's measured VPU bottleneck) factored as
# c = c1 * c2 with an exact product, cutting the lookup to 8 + 9 entries
# (34 selects) at an unchanged residual bound; see _log2_df.  False =
# the flat 65-entry grid (round-5b ship), kept for A/B.
LOG2_TWO_LEVEL = True


# ---------------------------------------------------------------------------
# Host-side constants
# ---------------------------------------------------------------------------

def _balanced_limbs_np(v: np.ndarray, bits: int = LIMB):
    """Balanced signed base-2^bits limbs: v == sum li * (2^bits)^i,
    li in [-2^(bits-1), 2^(bits-1) - 1] (df32._balanced_limbs_np, with the
    limb count derived until the remainder is exhausted)."""
    half, mask = 1 << (bits - 1), (1 << bits) - 1
    out = []
    r = v.astype(np.int64)
    while r.any():
        li = ((r + half) & mask) - half
        out.append(li.astype(np.float32))
        r = (r - li) >> bits
    return out or [np.zeros_like(v, np.float32)]


def _np_split12(W: np.ndarray):
    """Exact split of f32 W into (top-12-mantissa-bit, remainder) pieces
    (df32._np_split12): products of two 12-bit-mantissa pieces are exact
    in f32, so piece matmuls only round in ACCUMULATION."""
    a = (W.view(np.int32) & np.int32(~np.int32(0x7FF))).view(np.float32)
    return np.ascontiguousarray(a), np.ascontiguousarray(W - a)


@functools.lru_cache(maxsize=None)
def _df32_operators(cfg: MFCCConfig, two_level: bool = True):
    """Kernel operands:
      wst   (n_w * 2nb, nfft) bf16: row-stacked balanced 8-bit weight limbs
            of round(CS^T * 2^W_BITS) (CS = windowed rDFT, Nyquist bin
            dropped -- its mel row is zero, tables.float_mel_matrix)
      mel pieces (ntap, nb) f32 x4: Wa, Wb (12-bit split of f32(mel)),
            Wl (mel64 - f32(mel)), Wh (f32(mel))   [df32._df_matmul plan]
      dct pieces (ncep, ntap) f32 x4: same split of the DCT-II operator
      lut   (2, 65) f32: df32 log2 LUT (hi, lo rows)
    """
    import ml_dtypes
    nfft = cfg.nfft
    nb = nfft // 2
    C, S = tables.windowed_rdft_matrix(nfft)                       # f64
    CST = np.concatenate([C[:, :nb].T, S[:, :nb].T])               # (2nb, K)
    Wq = np.round(CST * float(1 << W_BITS)).astype(np.int64)
    wl = _balanced_limbs_np(Wq)
    n_w = len(wl)
    wst = np.concatenate(wl).astype(ml_dtypes.bfloat16)    # (n_w*2nb, nfft)

    mel64 = tables.float_mel_matrix(cfg.samplerate, nfft,
                                    cfg.nfilters)[:nb].T           # (ntap, nb)
    mh = mel64.astype(np.float32)
    mwa, mwb = _np_split12(mh)
    mwl = np.ascontiguousarray((mel64 - mh.astype(np.float64))
                               .astype(np.float32))
    dct64 = tables.dct2_ortho_matrix(cfg.nfilters)[:, : cfg.nceptrums].T
    dh = dct64.astype(np.float32)
    dwa, dwb = _np_split12(dh)
    dwl = np.ascontiguousarray((dct64 - dh.astype(np.float64))
                               .astype(np.float32))

    if two_level:
        # two-level factored LUT (round 5h): c = c1*c2 with c1 = 1 + a/8
        # (a = top 3 mantissa bits) and c2 = 1 + b/64 (b in [0, 8]) --
        # log2(c) = log2(c1) + log2(c2), so the kernel selects over
        # 8 + 9 df32 entries instead of 65 (columns [0:8] = level 1,
        # [8:17] = level 2)
        l1 = np.log2(1.0 + np.arange(8) / 8.0)
        l2 = np.log2(1.0 + np.arange(9) / 64.0)
        l64 = np.concatenate([l1, l2])
    else:
        lut_n = 64
        l64 = np.log2(1.0 + np.arange(lut_n + 1) / lut_n)
    lhi = l64.astype(np.float32)
    lut = np.stack([lhi, (l64 - lhi.astype(np.float64)).astype(np.float32)])

    return (wst, n_w, (mwa, mwb, mwl, mh), (dwa, dwb, dwl, dh),
            np.ascontiguousarray(lut))


# ---------------------------------------------------------------------------
# In-kernel df32 primitives (df32.py restated on VMEM values)
# ---------------------------------------------------------------------------

def _two_sum(a, b):
    s = a + b
    bb = s - a
    err = (a - (s - bb)) + (b - bb)
    return s, err


def _acc(s, e, p):
    s, err = _two_sum(s, p)
    return s, e + err


def _split_hi(x):
    xi = jax.lax.bitcast_convert_type(x, jnp.int32)
    hi = jax.lax.bitcast_convert_type(
        xi & jnp.int32(~np.int32(0x7FF)), jnp.float32)
    return hi, x - hi


def _square_df(s, e):
    sh, sl = _split_hi(s)
    p = s * s
    perr = ((sh * sh - p) + 2.0 * sh * sl) + sl * sl
    corr = 2.0 * s * e + perr
    return _two_sum(p, corr)


def _df_matmul_left(wa_ref, wb_ref, wl_ref, wh_ref, Xh, Xl, G):
    """df32 W @ (Xh + Xl) with the operator on the LEFT (positions-major
    lanes): the exact-piece chunked-compensated contraction of
    df32._df_matmul, transposed.  W* are (M, K) piece refs; Xh/Xl (K, L)."""
    hi = jax.lax.Precision.HIGHEST
    K = Xh.shape[0]
    xa, xb = _split_hi(Xh)
    s = e = None
    for g in range(0, K, G):
        ga = slice(g, g + G)
        for p in (jnp.dot(wa_ref[:, ga], xa[ga], precision=hi,
                          preferred_element_type=jnp.float32),
                  jnp.dot(wb_ref[:, ga], xa[ga], precision=hi,
                          preferred_element_type=jnp.float32),
                  jnp.dot(wa_ref[:, ga], xb[ga], precision=hi,
                          preferred_element_type=jnp.float32)):
            if s is None:
                s, e = p, jnp.zeros_like(p)
            else:
                s, e = _acc(s, e, p)
    for extra in (jnp.dot(wb_ref[:], xb, precision=hi,
                          preferred_element_type=jnp.float32),
                  jnp.dot(wl_ref[:], Xh, precision=hi,
                          preferred_element_type=jnp.float32)):
        s, e = _acc(s, e, extra)
    if Xl is not None:
        s, e = _acc(s, e, jnp.dot(wh_ref[:], Xl, precision=hi,
                                  preferred_element_type=jnp.float32))
    return s, e


def _log2_df(mh, ml, lut_ref, two_level: bool):
    """df32 log2 without transcendentals (df32._log2_df restated); Mosaic
    has no gather, so LUT lookups are lane-broadcast selects.

    Two-level form (LOG2_TWO_LEVEL, round 5h): reduce by c = c1 * c2 with
    c1 = 1 + a/8 read straight off the top 3 mantissa bits (a bit-mask,
    no selects) and c2 = 1 + b/64, b = round(64 * (u - c1) / c1) in
    [0, 8].  The product has <= 10 mantissa bits, so c is EXACT in f32,
    d = u - c is exact by Sterbenz (c in [u/2, 2u]), |v| = |d/c| <= 2^-7
    -- the same residual bound as the flat 65-entry grid -- and
    log2(c) = log2(c1) + log2(c2) exactly, so the lookup is 8 + 9 df32
    entries (34 selects) instead of 65 (130 selects)."""
    xi = jax.lax.bitcast_convert_type(mh, jnp.int32)
    k = (xi >> 23) - 127
    u = jax.lax.bitcast_convert_type(
        (xi & jnp.int32(0x7FFFFF)) | jnp.int32(127 << 23), jnp.float32)
    if two_level:
        a = (xi >> 20) & 7                 # top 3 mantissa bits
        c1 = jax.lax.bitcast_convert_type(
            (xi & jnp.int32(0x700000)) | jnp.int32(127 << 23), jnp.float32)
        w = u - c1                         # exact (Sterbenz, same binade)
        b = (w / c1 * 64.0 + 0.5).astype(jnp.int32)       # [0, 8]
        c = c1 * (1.0 + b.astype(jnp.float32) * np.float32(1.0 / 64.0))
        d = u - c                          # exact (Sterbenz; c exact f32)
    else:
        i = ((u - 1.0) * 64 + 0.5).astype(jnp.int32)   # round: u-1 in [0,1)
        c = 1.0 + i.astype(jnp.float32) * np.float32(1.0 / 64.0)
        d = u - c                                      # exact: same binade
    v = d / c
    v2 = v * v
    p = v * (1.0 - v * (0.5 - v * np.float32(1.0 / 3.0))) \
        - v2 * v2 * np.float32(0.25)
    if two_level:
        h1 = jnp.zeros_like(mh)
        l1 = jnp.zeros_like(mh)
        for t in range(8):
            sel = a == t
            h1 = jnp.where(sel, lut_ref[0, t], h1)
            l1 = jnp.where(sel, lut_ref[1, t], l1)
        h2 = jnp.zeros_like(mh)
        l2 = jnp.zeros_like(mh)
        for t in range(9):
            sel = b == t
            h2 = jnp.where(sel, lut_ref[0, 8 + t], h2)
            l2 = jnp.where(sel, lut_ref[1, 8 + t], l2)
        hi_i, e12 = _two_sum(h1, h2)
        lo_i = l1 + l2 + e12
    else:
        hi_i = jnp.zeros_like(mh)
        lo_i = jnp.zeros_like(mh)
        for t in range(65):
            sel = i == t
            hi_i = jnp.where(sel, lut_ref[0, t], hi_i)
            lo_i = jnp.where(sel, lut_ref[1, t], lo_i)
    s, e = _two_sum(k.astype(jnp.float32), hi_i)
    corr = lo_i + p * np.float32(1.4426950408889634) \
        + ml / (mh * np.float32(np.log(2.0)))
    return _two_sum(s, e + corr)


# ---------------------------------------------------------------------------
# Kernel
# ---------------------------------------------------------------------------

def _f64ish_kernel(x_ref, wst_ref, mwa_ref, mwb_ref, mwl_ref, mwh_ref,
                   dwa_ref, dwb_ref, dwl_ref, dwh_ref, lut_ref, out_ref,
                   *, nfft, n_w, L, two_level):
    nb = nfft // 2
    x = x_ref[0]                                   # (nfft, L) f32, exact grid
    # exact integer view on the 2^-X_GRID grid; |xi| < 2^21 -> 3 limbs
    xi = (x * np.float32(1 << X_GRID)).astype(jnp.int32)
    half, mask = 1 << (LIMB - 1), (1 << LIMB) - 1
    s = e = None
    r = xi
    terms = []                           # (scale_exponent, product) pairs
    for i in range(3):
        li = (((r + half) & mask) - half)
        r = (r - li) >> LIMB
        xl = li.astype(jnp.bfloat16)
        # ONE row-stacked MXU dot covers all n_w weight limbs of x-limb i;
        # every product is exact (8-bit balanced limbs, f32 accumulation
        # below 2^24: K * 128^2 = 2^23 at nfft=512)
        P = jnp.dot(wst_ref[:], xl, preferred_element_type=jnp.float32)
        for j in range(n_w):
            terms.append((LIMB * (i + j) - X_GRID - W_BITS,
                          P[j * 2 * nb: (j + 1) * 2 * nb]))
    # scale-sorted compensated accumulation: ascending magnitude keeps the
    # TwoSum error word small (same plan as df32._int_limb_matmul)
    terms.sort(key=lambda t: t[0])
    for sc, P in terms:
        v = P * np.float32(2.0 ** sc)
        if s is None:
            s, e = v, jnp.zeros_like(v)
        else:
            s, e = _acc(s, e, v)

    re_h, im_h = s[:nb], s[nb:]
    re_l, im_l = e[:nb], e[nb:]
    ph, plo = _square_df(re_h, re_l)
    qh, qlo = _square_df(im_h, im_l)
    pw_h, err = _two_sum(ph, qh)
    pw_l = plo + qlo + err

    mh, ml = _df_matmul_left(mwa_ref, mwb_ref, mwl_ref, mwh_ref,
                             pw_h, pw_l, 32)
    y_h, y_l = _log2_df(mh, ml, lut_ref, two_level)
    out_h, out_l = _df_matmul_left(dwa_ref, dwb_ref, dwl_ref, dwh_ref,
                                   y_h, y_l, 8)
    out_ref[0] = out_h + out_l


def pallas_f64ish_config_ok(cfg: MFCCConfig) -> bool:
    """Power-of-2 nfft with 128-aligned halves (lane-aligned operand
    blocks) and full-length frames; the exactness bound K * 128^2 < 2^24
    caps nfft at 1024."""
    return (cfg.nfft in (256, 512, 1024) and cfg.windowlen == cfg.nfft)


def pallas_f64ish_supported(cfg: MFCCConfig) -> bool:
    import jax as _jax
    return _jax.default_backend() == "tpu" and pallas_f64ish_config_ok(cfg)


def mfcc_f64ish_pallas_frames(frames: jnp.ndarray,
                              cfg: MFCCConfig = MFCCConfig(), *,
                              interpret: bool = False) -> jnp.ndarray:
    """Fused f64ish pipeline on pre-emphasized WIRE-GRID frames:
    (..., F, nfft) -> (..., F, nceptrums) f32, targeting the <=1e-5
    contract (elementwise max(1e-5, 2 ulp) gate) vs the float64 oracle.

    Samples must lie exactly on the 2^-5 grid (pre-emphasized integer wire
    samples -- the df32.mfcc_frames_f64ish(wire_grid=True) contract); the
    arbitrary-scale route stays XLA-only (df32.py)."""
    assert pallas_f64ish_config_ok(cfg), \
        "use ops.df32 for geometries outside the fused-kernel family"
    lead = frames.shape[:-2]
    F_in = frames.shape[-2]
    nfft, ncep = cfg.nfft, cfg.nceptrums
    x = frames.reshape(-1, nfft).astype(jnp.float32)
    M = x.shape[0]
    nblocks = max(1, -(-M // BF))
    Mp = nblocks * BF
    if Mp > M:
        x = jnp.pad(x, ((0, Mp - M), (0, 0)))
    xT = x.reshape(nblocks, BF, nfft).swapaxes(-1, -2)     # (nbk, nfft, BF)

    two_level = LOG2_TWO_LEVEL    # read once: table and kernel must agree
    wst, n_w, melp, dctp, lut = _df32_operators(cfg, two_level)
    consts = [jnp.asarray(a) for a in (wst, *melp, *dctp, lut)]
    out = pl.pallas_call(
        functools.partial(_f64ish_kernel, nfft=nfft, n_w=n_w, L=BF,
                          two_level=two_level),
        grid=(nblocks,),
        in_specs=[pl.BlockSpec((1, nfft, BF), lambda n: (n, 0, 0),
                               memory_space=pltpu.VMEM)] +
                 [pl.BlockSpec(c.shape, lambda n, nd=c.ndim: (0,) * nd,
                               memory_space=pltpu.VMEM) for c in consts],
        out_specs=pl.BlockSpec((1, ncep, BF), lambda n: (n, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nblocks, ncep, BF), jnp.float32),
        interpret=interpret,
    )(xT, *consts)
    out = out.swapaxes(-1, -2).reshape(Mp, ncep)[:M]
    return out.reshape(lead + (F_in, ncep))


def mfcc_f64ish_pallas(audio: jnp.ndarray, cfg: MFCCConfig = MFCCConfig(),
                       *, interpret: bool = False) -> jnp.ndarray:
    """Fused f64ish pipeline on raw int16-range signals: (..., T) ->
    (..., F, ncep).  Pre-emphasis is exact in f32 on the wire grid
    (df32.mfcc_batch_f64ish docstring); framing runs in XLA (cheap at
    this mode's throughput scale)."""
    emph = framing.preemphasis(audio.astype(jnp.float32))
    frames = framing.extract_frames(emph, cfg.nfft, cfg.hop,
                                    windowlen=cfg.windowlen)
    return mfcc_f64ish_pallas_frames(frames, cfg, interpret=interpret)
