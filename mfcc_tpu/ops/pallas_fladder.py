"""Float radix-2 block-ladder MFCC kernel (Pallas / Mosaic), round 5i.

The shipped float kernel (ops/pallas_mfcc, split-DFT) spends its FLOPs in
a 6-pass bf16-limb MXU dot whose 2-limb operand split is ALSO the
accuracy floor (~1.5e-4 vs the f64 oracle; every reduced-pass form caps
at ~1e-3 -- docs/BENCH.md round 4g).  This kernel replaces the DFT stage
with the INT kernel's block-form radix-2 ladder (pallas_int round 5g) in
plain f32:

  positions-major int16 tiles -> f32, EXACT pre-emphasis
    (y = x - (31/32) prev: 32x - 31 prev is an integer < 2^22, exactly
    representable -- the only rounding-free preemph formulation)      VPU
  -> in-kernel overlapped framing into a (nfft, L) sigma-layout buffer
  -> window multiply (1/nfft FFT scaling folded into the coefficients)
  -> f32 block-form DIT ladder: (8, lanes) sublane blocks, butterflies
     elementwise on aligned block pairs, no rolls/selects/per-stage
     concats; per-block unit / -j twiddle shortcuts; exact-zero
     imaginary blocks ride as None (real input: the whole first stage
     is add/sub only)                                                 VPU
  -> power |.|^2 on the non-conjugate half                            VPU
  -> mel matmul (columns pre-permuted to ladder rows), log2, DCT      MXU

Accuracy: no bf16 limbs anywhere -- the ladder rounds like an ordinary
f32 FFT (~1e-6 relative over 9 stages), an order of magnitude inside the
5e-4 contract gate (the split-DFT kernel's binding error term vanishes).

Same capability row as the reference FFT core + MFCC chain
(/root/reference/mfcc/misc/fft.py:349-484, mfcc/core/mfcc.py:19-117),
restated float-first for the TPU VPU.
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
from .pallas_int import (_bitrev, _sigma, _regroup_perm, _ladder_strides,
                         NBMAX_INT)

BF = 128
EMPH = np.float32(0.96875)     # 1 - 1/32 (float_ref.EMPHASIS_COEFF)


# ---------------------------------------------------------------------------
# Constants
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _fladder_constants(size: int):
    """Per-stage f32 twiddle columns in the evenodd8 row layout:
    (size, 2*L) [Re(W) | Im(W)] with W = e^(-2*pi*i*idx/size),
    idx = bitrev_s(r >> (L-s)) << (L-1-s) -- the same natural-order
    schedule as pallas_int._ladder_constants, in float.  Quadrature
    points are patched exact (cos 0 = 1, sin 0 = 0, cos pi/2 = 0,
    sin pi/2 = 1) so the kernel's per-block unit / -j classification
    sees exact values."""
    L = int(np.log2(size))
    cr = np.zeros((size, L))
    ci = np.zeros((size, L))
    for s in range(L):
        for r in range(size):
            g = r >> (L - s) if s > 0 else 0
            j = _bitrev(g, s) if s > 0 else 0
            idx = j << (L - 1 - s)
            if idx == 0:
                cr[r, s], ci[r, s] = 1.0, 0.0
            elif 4 * idx == size:
                cr[r, s], ci[r, s] = 0.0, -1.0
            else:
                th = 2.0 * np.pi * idx / size
                cr[r, s], ci[r, s] = np.cos(th), -np.sin(th)
    cr2, ci2 = np.zeros_like(cr), np.zeros_like(ci)
    for r in range(size):
        cr2[_sigma(r, L)] = cr[r]
        ci2[_sigma(r, L)] = ci[r]
    cr, ci = cr2, ci2
    R = _regroup_perm(size)
    for s in range(L - 4, L):
        cr[R, s] = cr[:, s].copy()
        ci[R, s] = ci[:, s].copy()
    return (np.concatenate([cr, ci], axis=1).astype(np.float32),
            cr.astype(np.float32), ci.astype(np.float32))


@functools.lru_cache(maxsize=None)
def _float_operators(cfg: MFCCConfig):
    """(wincol, mel_perm, dct): the sigma-permuted window column with the
    1/nfft FFT scaling folded in (rfft(w x)/nfft == rfft((w/nfft) x),
    float_ref.mfcc_float), the (ntap, nfft/2) mel matrix with columns
    permuted to ladder output rows (bin bitrev(r) of even natural row r
    lands at regrouped row R[r//2] -- pallas_int._fb_limb_matrix's map),
    and the (ncep, ntap) orthonormal DCT-II operator."""
    size = cfg.nfft
    L = int(np.log2(size))
    nbins = size // 2
    win = tables.float_window(size).astype(np.float64) / size
    wincol = np.concatenate([win[0::2], win[1::2]]).astype(np.float32) \
        .reshape(size, 1)
    mel64 = tables.float_mel_matrix(cfg.samplerate, size, cfg.nfilters)
    assert not mel64[nbins].any(), \
        "Nyquist mel row must be zero (dropped by the even-row extract)"
    M = mel64[:nbins].T.astype(np.float32)            # (ntap, nbins)
    R = _regroup_perm(size)
    P = np.zeros_like(M)
    for r in range(0, size, 2):
        P[:, R[r // 2]] = M[:, _bitrev(r, L)]
    dct = np.ascontiguousarray(
        tables.dct2_ortho_matrix(cfg.nfilters)[:, : cfg.nceptrums].T
        .astype(np.float32))                          # (ncep, ntap)
    return wincol, np.ascontiguousarray(P), dct


# ---------------------------------------------------------------------------
# Float block-form ladder
# ---------------------------------------------------------------------------

def _fladder_half(x, tw_ref, size: int):
    """f32 block-form DIT ladder on a (size, lanes) real input in the
    evenodd8 sigma layout; returns (re, im) of rows [0, size/2) -- the
    non-conjugate output bins.  Standard unscaled butterflies
    y0 = x0 + W x1, y1 = x0 - W x1 (the 1/N scaling lives in the window
    column).  Structure mirrors pallas_int._ladder_blocks: (8, lanes)
    sublane blocks, per-block trace-time twiddle classification,
    exact-zero imaginary blocks as None."""
    L = int(np.log2(size))
    lanes = x.shape[1]
    _, np_cr, np_ci = _fladder_constants(size)
    strides = _ladder_strides(size, "evenodd8")
    nb = size // 8
    br = [x[8 * i: 8 * i + 8] for i in range(nb)]
    bi = [None] * nb                                  # real input

    def add(a, b):
        return b if a is None else (a if b is None else a + b)

    def sub(a, b):
        return (a if b is None else (-b if a is None else a - b))

    def subs(i1, s):
        """W * x1 of block i1 at stage s (sb_r, sb_i), with per-block
        unit / -j shortcuts (classification is exact: the quadrature
        table entries are patched to 1.0 / 0.0 / -1.0)."""
        x1r, x1i = br[i1], bi[i1]
        r1 = 8 * i1
        crb, cib = np_cr[r1: r1 + 8, s], np_ci[r1: r1 + 8, s]
        if (crb == 1.0).all() and (cib == 0.0).all():
            return x1r, x1i                            # W == 1
        if (crb == 0.0).all() and (cib == -1.0).all():
            return x1i, (None if x1r is None else -x1r)   # W == -j
        c = tw_ref[r1: r1 + 8, s: s + 1]
        s_ = tw_ref[r1: r1 + 8, L + s: L + s + 1]
        if x1i is None:
            return x1r * c, x1r * s_
        return x1r * c - x1i * s_, x1i * c + x1r * s_

    for s in range(L):
        d = strides[s]
        if s == L - 4:
            m = size // 128

            def _rg(blocks):
                out = list(blocks)
                for b2 in (0, 1):
                    off = b2 * (nb // 2)
                    for y in range(m):
                        grp = [blocks[off + xx * m + y] for xx in range(8)]
                        if all(g is None for g in grp):
                            continue
                        v = jnp.concatenate(
                            [jnp.zeros((8, lanes), jnp.float32)
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
        if s == L - 1:
            # final stage: only the even-output half is consumed
            outr, outi = [], []
            for i0, i1 in pairs:
                sb1, sb2 = subs(i1, s)
                outr.append(add(br[i0], sb1))
                outi.append(add(bi[i0], sb2))
            zero = jnp.zeros((8, lanes), jnp.float32)
            return (jnp.concatenate([zero if b is None else b
                                     for b in outr], axis=0),
                    jnp.concatenate([zero if b is None else b
                                     for b in outi], axis=0))
        nr, ni = [None] * nb, [None] * nb
        for i0, i1 in pairs:
            sb1, sb2 = subs(i1, s)
            x0r, x0i = br[i0], bi[i0]
            nr[i0], nr[i1] = add(x0r, sb1), sub(x0r, sb1)
            ni[i0], ni[i1] = add(x0i, sb2), sub(x0i, sb2)
        br, bi = nr, ni
    raise AssertionError("unreachable: the final stage returns")


# ---------------------------------------------------------------------------
# Kernel + entry
# ---------------------------------------------------------------------------

def _fblk_kernel(xm_ref, xx_ref, prev_ref, wincol_ref, tw_ref, mel_ref,
                 dct_ref, out_ref, fbuf, *, cfg: MFCCConfig, bf: int,
                 nseg: int, nbk: int, mel_floor: float):
    nfft, hop = cfg.nfft, cfg.hop
    L = nbk * bf
    half = nfft // 2
    tiles = [xm_ref[0, i] for i in range(nbk)] + [xx_ref[0, 0]]
    C = jnp.concatenate(tiles, axis=1).astype(jnp.float32)   # (hop, Lt)
    rows = jax.lax.broadcasted_iota(jnp.int32, C.shape, 0)
    lanecol = jax.lax.broadcasted_iota(jnp.int32, (1, C.shape[1]), 1)
    up = pltpu.roll(C, 1, 0)
    wrapped = pltpu.roll(C[hop - 1: hop, :], 1, 1)
    prev_row0 = jnp.where(lanecol == 0, prev_ref[0, 0, 0], wrapped)
    prev = jnp.where(rows == 0, prev_row0, up)
    E = C - EMPH * prev          # EXACT: 32x - 31 prev is an integer < 2^22
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
    out_ref[0] = _fladder_tail(fbuf[:], wincol_ref, tw_ref, mel_ref,
                               dct_ref, nfft, mel_floor)


def _fladder_tail(x, wincol_ref, tw_ref, mel_ref, dct_ref, nfft: int,
                  mel_floor: float):
    """window -> ladder -> power -> mel -> log2 -> DCT on a sigma-layout
    (nfft, L) f32 buffer; shared by the batch and streaming kernels."""
    xw = x * wincol_ref[:]                             # window * (1/nfft)
    re, im = _fladder_half(xw, tw_ref, nfft)
    power = re * re + im * im                          # (nfft/2, L)
    melspec = jnp.dot(mel_ref[:], power,
                      preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)
    if mel_floor:
        melspec = jnp.maximum(melspec, jnp.float32(mel_floor))
    logmel = jnp.log2(melspec)
    return jnp.dot(dct_ref[:], logmel,
                   preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)


def pallas_fladder_config_ok(cfg: MFCCConfig) -> bool:
    """Power-of-2 nfft with >= 6 within-half index bits (the evenodd8
    ladder family), even hop, full-length windows, zero Nyquist mel row."""
    if not (cfg.nfft in (256, 512, 1024) and cfg.hop % 2 == 0
            and cfg.windowlen == cfg.nfft):
        return False
    nbins = cfg.nfft // 2
    mel64 = tables.float_mel_matrix(cfg.samplerate, cfg.nfft, cfg.nfilters)
    return not mel64[nbins].any()


def pallas_fladder_supported(cfg: MFCCConfig) -> bool:
    import jax as _jax
    return _jax.default_backend() == "tpu" and pallas_fladder_config_ok(cfg)


def mfcc_float_ladder_pallas(audio: jnp.ndarray,
                             cfg: MFCCConfig = MFCCConfig(), *,
                             bf: int = BF, interpret: bool = False,
                             mel_floor: float = 0.0) -> jnp.ndarray:
    """Fused float MFCC via the f32 block-ladder FFT: (S, T) ->
    (S, F, nceptrums) f32.  Ingest/blocking mirrors
    pallas_int.mfcc_int_pallas_v3 (positions-major tiles, whole-stream
    super-blocks).  int16 input streams to the kernel AS int16 (the
    16-bit wire contract, software/main.c:134-151) and upcasts in VMEM;
    any other dtype is kept as f32 on the host (same policy as
    mfcc_pallas_radix2) so float-valued audio -- e.g. normalized
    [-1, 1] samples -- computes exactly, never truncated to int16."""
    assert pallas_fladder_config_ok(cfg)
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
    nbk = -(-nb // nchunks)
    Fp = nchunks * nbk * bf
    N = S * nchunks
    L = nbk * bf

    raw = (audio if audio.dtype == jnp.int16
           else audio.astype(jnp.float32))
    Lp = nchunks * nbk + 1
    need = Lp * bf * hop
    if need > T:
        raw = jnp.pad(raw, ((0, 0), (0, need - T)))
    T4 = raw[:, : need].reshape(S, Lp, bf, hop).swapaxes(-1, -2)
    tile = (hop, bf)
    prev_idx = jnp.maximum(jnp.arange(nchunks) * nbk * bf * hop - 1, 0)
    prevs = (raw[:, prev_idx].astype(jnp.float32)
             * (jnp.arange(nchunks) > 0)).reshape(N, 1, 1)

    tw, _, _ = _fladder_constants(nfft)
    wincol, melP, dct = _float_operators(cfg)
    ncep = cfg.nceptrums

    out = pl.pallas_call(
        functools.partial(_fblk_kernel, cfg=cfg, bf=bf, nseg=nseg,
                          nbk=nbk, mel_floor=mel_floor),
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
            pl.BlockSpec(tw.shape, lambda n: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(melP.shape, lambda n: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(dct.shape, lambda n: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, ncep, L), lambda n: (n, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, ncep, L), jnp.float32),
        scratch_shapes=[pltpu.VMEM((nfft, L), jnp.float32)],
        interpret=interpret,
    )(T4, T4, prevs, jnp.asarray(wincol), jnp.asarray(tw),
      jnp.asarray(melP), jnp.asarray(dct))

    out = (out.reshape(S, nchunks, ncep, L).swapaxes(-1, -2)
           .reshape(S, Fp, ncep)[:, :F])
    return out.reshape(lead + (F, ncep))
