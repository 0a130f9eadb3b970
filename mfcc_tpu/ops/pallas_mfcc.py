"""Fused single-kernel float MFCC (Pallas / Mosaic).

The jnp pipeline (float_ops) materializes the overlapped frames in HBM --
a 3x read amplification (hop=170 vs nfft=512) plus stage round-trips.  This
kernel keeps everything in VMEM:

  HBM:  emphasized audio, viewed as non-overlapping (S, nblocks, BF*hop)
        chunks + a small (S, nblocks, OVERLAP) tail array (the next chunk's
        head), both streamed in by the Pallas pipeline (auto double-buffered)
  VMEM: build BF=128 overlapped frames (static slices of chunk|tail)
        frames (128,512) @ CS (512,512)   -> re|im   (MXU)
        re*re + im*im                     -> power   (VPU)
        power (128,256) @ mel (256,32)    -> mel     (MXU)
        log2                              -> logmel  (VPU)
        logmel (128,32) @ dct (32,ncep)   -> cepstra (MXU)
  HBM:  cepstra (S, F, ncep) out

Bin count: the float spec keeps nfft/2+1 = 257 bins, but the mel matrix row
for bin 256 is identically zero (the last mel point IS bin 256 and the
triangle endpoint is exclusive -- tables.float_mel_matrix), so the kernel
computes 256 bins and the 512x512 DFT operator is perfectly lane-aligned.
Equality with the 257-bin jnp path is exact by construction and asserted in
tests/test_pallas.py.

This replaces the reference's entire stage chain -- window LUT datapath
(mfcc/core/window.py), radix-2 FFT core + 3-bank scheduler (mfcc/misc/fft.py),
power/filterbank/log/DCT stages and their inter-stage FIFOs
(mfcc/core/mfcc.py:56-104) -- with one kernel whose stage coupling is VMEM
registers instead of valid/ready handshakes.
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

BF = 128  # frames per block (MXU-aligned row count)


def pallas_float_config_ok(cfg: MFCCConfig) -> bool:
    """Config-only half of pallas_float_supported (also the gate for
    interpret-mode runs off-TPU): power-of-2 nfft in {256, 512, 1024} with
    full-length frames -- the whole reference-parameterized family
    (/root/reference/mfcc/core/mfcc.py:20-21, misc/fft.py:349-380 accept
    any power-of-2 size; round-4 VERDICT #5 asked for perf generality
    beyond 512).  The split-DFT packing needs nfft/4 to be a multiple of 8
    (sublane-aligned cos/sin halves) and the Nyquist-bin mel row to be
    identically zero (it is, for every mel geometry whose last mel point
    is the Nyquist bin -- checked numerically); other geometries use the
    XLA formulations (which honor arbitrary nfft/hop)."""
    if cfg.windowlen != cfg.nfft or cfg.nfft not in (256, 512, 1024):
        return False
    return _nyquist_mel_row_zero(cfg)


@functools.lru_cache(maxsize=None)
def _nyquist_mel_row_zero(cfg: MFCCConfig) -> bool:
    """The fused kernels compute nfft/2 bins; bin nfft/2 must carry zero
    mel weight for equality with the (nfft/2+1)-bin XLA path."""
    mel = tables.float_mel_matrix(cfg.samplerate, cfg.nfft, cfg.nfilters)
    return not mel[cfg.nfft // 2].any()


def pallas_float_supported(cfg: MFCCConfig) -> bool:
    """Gate for compiled (Mosaic) use: TPU backend + supported geometry
    (round-2 ADVICE, medium)."""
    import jax as _jax
    return _jax.default_backend() == "tpu" and pallas_float_config_ok(cfg)


@functools.lru_cache(maxsize=None)
def _kernel_operators(cfg: MFCCConfig):
    """(CS, mel, dct) numpy f32 operators with 256 bins (no Nyquist)."""
    C, S = tables.windowed_rdft_matrix(cfg.nfft)
    nb = cfg.nfft // 2
    CS = np.concatenate([C[:, :nb], S[:, :nb]], axis=1).astype(np.float32)
    mel = tables.float_mel_matrix(cfg.samplerate, cfg.nfft,
                                  cfg.nfilters)[:nb].astype(np.float32)
    dct = tables.dct2_ortho_matrix(cfg.nfilters)[:, : cfg.nceptrums]
    return CS, mel, dct.astype(np.float32)


def _mfcc_kernel(chunk_ref, tail_ref, cs_ref, mel_ref, dct_ref, out_ref,
                 frames_ref, *, nfft, hop, nbins, ncep, split, bf=BF):
    chunk_len = bf * hop

    # Overlapped frames from chunk (+ tail for the straddling last frames).
    # All slice offsets/sizes are static: this unrolls to plain VMEM copies.
    for i in range(bf):
        start = i * hop
        end = start + nfft
        if end <= chunk_len:
            frames_ref[i, :] = chunk_ref[0, 0, pl.ds(start, nfft)]
        else:
            head = chunk_len - start
            frames_ref[i, :head] = chunk_ref[0, 0, pl.ds(start, head)]
            frames_ref[i, head:] = tail_ref[0, 0, : nfft - head]

    frames = frames_ref[:]                                   # (bf, nfft)
    if split:
        # error-compensated bf16: 4 MXU passes ~ f32 accuracy (float_ops.
        # split_matmul); cs_ref holds [CS_hi | CS_lo] stacked on axis 0.
        b16 = jnp.bfloat16
        x_hi = frames.astype(b16)
        x_lo = (frames - x_hi.astype(jnp.float32)).astype(b16)
        cs_hi = cs_ref[0]
        cs_lo = cs_ref[1]
        reim = jnp.dot(x_hi, cs_hi, preferred_element_type=jnp.float32)
        reim = reim + jnp.dot(x_hi, cs_lo,
                              preferred_element_type=jnp.float32)
        reim = reim + jnp.dot(x_lo, cs_hi,
                              preferred_element_type=jnp.float32)
        reim = reim + jnp.dot(x_lo, cs_lo,
                              preferred_element_type=jnp.float32)
    else:
        reim = jnp.dot(frames, cs_ref[:],
                       preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)  # (BF, 2*nbins)
    re = reim[:, :nbins]
    im = reim[:, nbins:]
    power = re * re + im * im                                # (BF, nbins)
    melspec = jnp.dot(power, mel_ref[:],
                      preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)   # (BF, nfilters)
    logmel = jnp.log2(melspec)
    out_ref[0] = jnp.dot(logmel, dct_ref[:],
                         preferred_element_type=jnp.float32,
                         precision=jax.lax.Precision.HIGHEST)  # (BF, ncep)


def _overlap(cfg: MFCCConfig) -> int:
    """Tail samples a block needs beyond its own chunk: the last frame starts
    at (BF-1)*hop and ends at (BF-1)*hop + nfft = BF*hop + (nfft - hop)."""
    return cfg.nfft - cfg.hop


def mfcc_pallas_emphasized(emph: jnp.ndarray, cfg: MFCCConfig = MFCCConfig(),
                           *, split: bool = False, bf: int = BF) -> jnp.ndarray:
    """(S, T) already-emphasized f32 audio -> (S, F, nceptrums).

    ``bf`` = frames per block; larger blocks amortize per-block overhead at
    the cost of VMEM (bf=512 -> ~3 MB of frame scratch)."""
    S, T = emph.shape
    nfft, hop, ncep = cfg.nfft, cfg.hop, cfg.nceptrums
    nbins = nfft // 2
    F = cfg.n_frames(T)
    assert F >= 1, "signal shorter than one frame"
    nblocks = -(-F // bf)
    Fp = nblocks * bf
    chunk_len = bf * hop
    ov = _overlap(cfg)

    T_need = nblocks * chunk_len + ov
    if T_need > T:
        emph = jnp.pad(emph, ((0, 0), (0, T_need - T)))

    N = S * nblocks
    chunks = emph[:, : nblocks * chunk_len].reshape(N, 1, chunk_len)
    tail_idx = ((jnp.arange(nblocks) + 1) * chunk_len)[:, None] + jnp.arange(ov)
    tails = emph[:, tail_idx].reshape(N, 1, ov)    # tiny (N, 1, ov)

    CS, mel, dct = _kernel_operators(cfg)
    if split:
        cs_hi = CS.astype(np.float32).astype(jnp.bfloat16)
        cs_lo = (CS - np.asarray(cs_hi, np.float32)).astype(jnp.bfloat16)
        cs_arg = jnp.stack([jnp.asarray(cs_hi), jnp.asarray(cs_lo)])
        cs_spec = pl.BlockSpec((2, nfft, 2 * nbins), lambda n: (0, 0, 0),
                               memory_space=pltpu.VMEM)
    else:
        cs_arg = jnp.asarray(CS)
        cs_spec = pl.BlockSpec((nfft, 2 * nbins), lambda n: (0, 0),
                               memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_mfcc_kernel, nfft=nfft, hop=hop, nbins=nbins,
                          ncep=ncep, split=split, bf=bf),
        grid=(N,),
        in_specs=[
            pl.BlockSpec((1, 1, chunk_len), lambda n: (n, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, ov), lambda n: (n, 0, 0),
                         memory_space=pltpu.VMEM),
            cs_spec,
            pl.BlockSpec((nbins, cfg.nfilters), lambda n: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cfg.nfilters, ncep), lambda n: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bf, ncep), lambda n: (n, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, bf, ncep), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((bf, nfft), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * Fp * S * (nfft * 2 * nbins + nbins * cfg.nfilters
                                + cfg.nfilters * ncep),
            bytes_accessed=4 * S * (T_need + Fp * ncep),
            transcendentals=Fp * S * cfg.nfilters,
        ),
    )(chunks, tails, cs_arg, jnp.asarray(mel), jnp.asarray(dct))
    return out.reshape(S, Fp, ncep)[:, :F]


def mfcc_batch_pallas(audio: jnp.ndarray, cfg: MFCCConfig = MFCCConfig(),
                      *, split: bool = False, bf: int = BF) -> jnp.ndarray:
    """Full float pipeline, fused kernel: (S, T) raw -> (S, F, nceptrums)."""
    emph = framing.preemphasis(audio.astype(jnp.float32))
    return mfcc_pallas_emphasized(emph, cfg, split=split, bf=bf)


# ---------------------------------------------------------------------------
# Pre-emphasis folded into the DFT operator (raw-audio kernel)
# ---------------------------------------------------------------------------
#
# Pre-emphasis is linear, so it composes into the windowed-DFT operator:
# with the 513-sample extended frame x[j] = raw[start-1+j],
#   emph_frame @ CS == x @ CS2,  CS2[j] = CS[j-1] - c*CS[j]
# (boundary rows handled once in numpy).  The kernel then consumes RAW
# audio -- the XLA-side pre-emphasis passes disappear.  The very first
# frame of a stream uses prev-sample 0, matching y[0] = x[0]
# (mfcc/core/preemph.py: the previous-sample register resets to 0).

@functools.lru_cache(maxsize=None)
def _kernel_operators_folded(cfg: MFCCConfig):
    CS, mel, dct = _kernel_operators(cfg)
    c = framing.EMPHASIS_COEFF
    CS2 = np.zeros((cfg.nfft + 1, CS.shape[1]), np.float32)
    CS2[1:] += CS
    CS2[:-1] -= np.float32(c) * CS
    return CS2, mel, dct


def _mfcc_raw_kernel(chunk_ref, tail_ref, prev_ref, cs_ref, mel_ref, dct_ref,
                     out_ref, frames_ref, *, nfft, hop, nbins, ncep, bf):
    chunk_len = bf * hop
    ext = nfft + 1

    # extended frames: raw[start-1 : start+nfft].  Scalar VMEM stores are
    # unsupported; splice the prev sample in via an 8-wide vector store.
    head8 = jnp.concatenate([
        jnp.full((1,), prev_ref[0, 0, 0], jnp.float32),
        chunk_ref[0, 0, pl.ds(0, 7)]])
    frames_ref[0, :8] = head8
    frames_ref[0, 8:] = chunk_ref[0, 0, pl.ds(7, nfft - 7)]
    for i in range(1, bf):
        start = i * hop - 1
        end = start + ext
        if end <= chunk_len:
            frames_ref[i, :] = chunk_ref[0, 0, pl.ds(start, ext)]
        else:
            head = chunk_len - start
            frames_ref[i, :head] = chunk_ref[0, 0, pl.ds(start, head)]
            frames_ref[i, head:] = tail_ref[0, 0, : ext - head]

    frames = frames_ref[:]
    b16 = jnp.bfloat16
    x_hi = frames.astype(b16)
    x_lo = (frames - x_hi.astype(jnp.float32)).astype(b16)
    reim = jnp.dot(x_hi, cs_ref[0], preferred_element_type=jnp.float32)
    reim = reim + jnp.dot(x_hi, cs_ref[1], preferred_element_type=jnp.float32)
    reim = reim + jnp.dot(x_lo, cs_ref[0], preferred_element_type=jnp.float32)
    reim = reim + jnp.dot(x_lo, cs_ref[1], preferred_element_type=jnp.float32)
    re = reim[:, :nbins]
    im = reim[:, nbins:]
    power = re * re + im * im
    melspec = jnp.dot(power, mel_ref[:], preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)
    logmel = jnp.log2(melspec)
    out_ref[0] = jnp.dot(logmel, dct_ref[:],
                         preferred_element_type=jnp.float32,
                         precision=jax.lax.Precision.HIGHEST)


def mfcc_pallas_raw(audio: jnp.ndarray, cfg: MFCCConfig = MFCCConfig(),
                    *, bf: int = BF) -> jnp.ndarray:
    """Fused float kernel on RAW audio (pre-emphasis folded into the DFT
    operator, bf16-split): (S, T) -> (S, F, nceptrums).  The fastest path."""
    audio = audio.astype(jnp.float32)
    S, T = audio.shape
    nfft, hop, ncep = cfg.nfft, cfg.hop, cfg.nceptrums
    nbins = nfft // 2
    F = cfg.n_frames(T)
    assert F >= 1, "signal shorter than one frame"
    nblocks = -(-F // bf)
    Fp = nblocks * bf
    chunk_len = bf * hop
    ov = _overlap(cfg)

    T_need = nblocks * chunk_len + ov
    if T_need > T:
        audio = jnp.pad(audio, ((0, 0), (0, T_need - T)))

    N = S * nblocks
    chunks = audio[:, : nblocks * chunk_len].reshape(N, 1, chunk_len)
    tail_idx = ((jnp.arange(nblocks) + 1) * chunk_len)[:, None] + jnp.arange(ov)
    tails = audio[:, tail_idx].reshape(N, 1, ov)
    # last raw sample before each block (0 for a stream's first block)
    prev_idx = jnp.maximum(jnp.arange(nblocks) * chunk_len - 1, 0)
    prevs = audio[:, prev_idx] * (jnp.arange(nblocks) > 0)
    prevs = prevs.reshape(N, 1, 1)

    CS2, mel, dct = _kernel_operators_folded(cfg)
    cs_hi = CS2.astype(jnp.bfloat16)
    cs_lo = (CS2 - np.asarray(cs_hi, np.float32)).astype(jnp.bfloat16)
    cs_arg = jnp.stack([jnp.asarray(cs_hi), jnp.asarray(cs_lo)])

    out = pl.pallas_call(
        functools.partial(_mfcc_raw_kernel, nfft=nfft, hop=hop, nbins=nbins,
                          ncep=ncep, bf=bf),
        grid=(N,),
        in_specs=[
            pl.BlockSpec((1, 1, chunk_len), lambda n: (n, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, ov), lambda n: (n, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1), lambda n: (n, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((2, nfft + 1, 2 * nbins), lambda n: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nbins, cfg.nfilters), lambda n: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cfg.nfilters, ncep), lambda n: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bf, ncep), lambda n: (n, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, bf, ncep), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((bf, nfft + 1), jnp.float32),
        ],
    )(chunks, tails, prevs, cs_arg, jnp.asarray(mel), jnp.asarray(dct))
    return out.reshape(S, Fp, ncep)[:, :F]


# ---------------------------------------------------------------------------
# Tile-aligned chunk layout: bf=512 -> (8, 10880) blocks
# ---------------------------------------------------------------------------
#
# The (N, 1, chunk_len) layout above pads its single sublane to 8: 8x HBM
# blowup for materialization AND kernel reads.  With bf=512 frames/block the
# chunk is 512*170 = 87040 = 8 * 10880 samples, and (8, 10880) satisfies the
# Mosaic (8,128) tile constraint exactly -- zero padding waste.  Frames may
# straddle a sublane-row boundary, costing at most two static copies each.

BFA = 512          # frames per aligned block
_ROWS, _ROWLEN = 8, (BFA * 170) // 8


def _mfcc_aligned_kernel(chunk_ref, tail_ref, cs_ref, mel_ref, dct_ref,
                         out_ref, frames_ref, *, nfft, hop, nbins, ncep,
                         split):
    chunk_len = BFA * hop

    def src(pos, ln):
        """static (row, col) view of flat chunk position"""
        return chunk_ref[0, pos // _ROWLEN,
                         pl.ds(pos % _ROWLEN, ln)]

    for i in range(BFA):
        start = i * hop
        end = start + nfft
        if end <= chunk_len:
            r0, c0 = divmod(start, _ROWLEN)
            if c0 + nfft <= _ROWLEN:
                frames_ref[i, :] = chunk_ref[0, r0, pl.ds(c0, nfft)]
            else:
                head = _ROWLEN - c0
                frames_ref[i, :head] = chunk_ref[0, r0, pl.ds(c0, head)]
                frames_ref[i, head:] = chunk_ref[0, r0 + 1,
                                                 pl.ds(0, nfft - head)]
        else:
            head = chunk_len - start          # from the last chunk row
            r0, c0 = divmod(start, _ROWLEN)
            frames_ref[i, :head] = chunk_ref[0, r0, pl.ds(c0, head)]
            frames_ref[i, head:] = tail_ref[0, 0, : nfft - head]

    frames = frames_ref[:]
    if split:
        b16 = jnp.bfloat16
        x_hi = frames.astype(b16)
        x_lo = (frames - x_hi.astype(jnp.float32)).astype(b16)
        reim = jnp.dot(x_hi, cs_ref[0], preferred_element_type=jnp.float32)
        reim = reim + jnp.dot(x_hi, cs_ref[1],
                              preferred_element_type=jnp.float32)
        reim = reim + jnp.dot(x_lo, cs_ref[0],
                              preferred_element_type=jnp.float32)
        reim = reim + jnp.dot(x_lo, cs_ref[1],
                              preferred_element_type=jnp.float32)
    else:
        reim = jnp.dot(frames, cs_ref[:], preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)
    re = reim[:, :nbins]
    im = reim[:, nbins:]
    power = re * re + im * im
    melspec = jnp.dot(power, mel_ref[:], preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)
    logmel = jnp.log2(melspec)
    out_ref[0] = jnp.dot(logmel, dct_ref[:],
                         preferred_element_type=jnp.float32,
                         precision=jax.lax.Precision.HIGHEST)


def mfcc_pallas_aligned(audio: jnp.ndarray, cfg: MFCCConfig = MFCCConfig(),
                        *, split: bool = True) -> jnp.ndarray:
    """Fused float kernel with the tile-aligned (8, 10880) chunk layout:
    (S, T) raw -> (S, F, nceptrums)."""
    assert cfg.nfft == 512 and cfg.hop == 170
    emph = framing.preemphasis(audio.astype(jnp.float32))
    S, T = emph.shape
    nfft, hop, ncep = cfg.nfft, cfg.hop, cfg.nceptrums
    nbins = nfft // 2
    F = cfg.n_frames(T)
    assert F >= 1, "signal shorter than one frame"
    nblocks = -(-F // BFA)
    Fp = nblocks * BFA
    chunk_len = BFA * hop
    ov = _overlap(cfg)

    T_need = nblocks * chunk_len + ov
    if T_need > T:
        emph = jnp.pad(emph, ((0, 0), (0, T_need - T)))

    N = S * nblocks
    chunks = emph[:, : nblocks * chunk_len].reshape(N, _ROWS, _ROWLEN)
    tail_idx = ((jnp.arange(nblocks) + 1) * chunk_len)[:, None] + jnp.arange(ov)
    tails = emph[:, tail_idx].reshape(N, 1, ov)

    CS, mel, dct = _kernel_operators(cfg)
    if split:
        cs_hi = CS.astype(jnp.bfloat16)
        cs_lo = (CS - np.asarray(cs_hi, np.float32)).astype(jnp.bfloat16)
        cs_arg = jnp.stack([jnp.asarray(cs_hi), jnp.asarray(cs_lo)])
        cs_spec = pl.BlockSpec((2, nfft, 2 * nbins), lambda n: (0, 0, 0),
                               memory_space=pltpu.VMEM)
    else:
        cs_arg = jnp.asarray(CS)
        cs_spec = pl.BlockSpec((nfft, 2 * nbins), lambda n: (0, 0),
                               memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_mfcc_aligned_kernel, nfft=nfft, hop=hop,
                          nbins=nbins, ncep=ncep, split=split),
        grid=(N,),
        in_specs=[
            pl.BlockSpec((1, _ROWS, _ROWLEN), lambda n: (n, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, ov), lambda n: (n, 0, 0),
                         memory_space=pltpu.VMEM),
            cs_spec,
            pl.BlockSpec((nbins, cfg.nfilters), lambda n: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cfg.nfilters, ncep), lambda n: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, BFA, ncep), lambda n: (n, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, BFA, ncep), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((BFA, nfft), jnp.float32),
        ],
    )(chunks, tails, cs_arg, jnp.asarray(mel), jnp.asarray(dct))
    return out.reshape(S, Fp, ncep)[:, :F]


# ---------------------------------------------------------------------------
# Recomposition kernel: hop-row input, 4 sub-matrix copies, K=512 matmul
# ---------------------------------------------------------------------------
#
# The direct kernel's cost is split ~half/half between the BF=128 per-frame
# VMEM row copies and the matmul passes (docs/BENCH.md decomposition).  The
# segment kernel removes the copies but pays ~2x matmul flops (hop 170 padded
# to 256 lanes, 4 shifted operators).  This kernel takes the best of both:
#
#   host:   raw audio reshaped to hop-sized rows (a single layout pass; no
#           pre-emphasis, no overlap materialization)
#   kernel: pre-emphasis as two shifted vector ops on the row matrix (the
#           cross-row sample comes from a sublane shift + one SMEM scalar),
#           then frames rebuilt with FOUR (BF, hop) sub-matrix copies --
#           frames[:, q*hop:(q+1)*hop] = E[q:q+BF] -- instead of BF row
#           copies, then the same minimal-flop (BF,512)@(512,512) passes.
#
# Replaces the same reference stages as the direct kernel; the recomposition
# is the TPU-native form of the ring buffer's overlap re-reads
# (mfcc/core/frame.py:86-114): re-reading == re-slicing rows shifted by one.

def _mfcc_recomp_kernel(x_ref, xtail_ref, prev_ref, cs_ref, mel_ref, dct_ref,
                        out_ref, frames_ref, *, nfft, hop, nbins, ncep,
                        split, bf, nseg):
    X = jnp.concatenate([x_ref[0], xtail_ref[0]], axis=0)   # (bf+nseg-1, hop)
    # in-kernel pre-emphasis: row r's sample 0 subtracts row r-1's last
    # sample (the block's very first subtracts the SMEM prev scalar)
    c = jnp.float32(framing.EMPHASIS_COEFF)
    rows = bf + nseg - 1
    lastcol = X[:, hop - 1: hop]                             # (rows, 1)
    rolled = pltpu.roll(lastcol, 1, 0)                       # row r <- r-1
    rowidx = jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0)
    prevlast = jnp.where(rowidx == 0, prev_ref[0, 0, 0], rolled)
    E = jnp.concatenate(
        [X[:, :1] - c * prevlast, X[:, 1:] - c * X[:, :-1]], axis=1)

    for q in range(nseg):
        c0 = q * hop
        w = min(hop, nfft - c0)
        frames_ref[:, c0: c0 + w] = E[q: q + bf, :w]

    frames = frames_ref[:]
    if split:
        b16 = jnp.bfloat16
        x_hi = frames.astype(b16)
        x_lo = (frames - x_hi.astype(jnp.float32)).astype(b16)
        reim = jnp.dot(x_hi, cs_ref[0], preferred_element_type=jnp.float32)
        reim = reim + jnp.dot(x_hi, cs_ref[1],
                              preferred_element_type=jnp.float32)
        reim = reim + jnp.dot(x_lo, cs_ref[0],
                              preferred_element_type=jnp.float32)
        reim = reim + jnp.dot(x_lo, cs_ref[1],
                              preferred_element_type=jnp.float32)
    else:
        reim = jnp.dot(frames, cs_ref[:], preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)
    re = reim[:, :nbins]
    im = reim[:, nbins:]
    power = re * re + im * im
    melspec = jnp.dot(power, mel_ref[:], preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)
    logmel = jnp.log2(melspec)
    out_ref[0] = jnp.dot(logmel, dct_ref[:],
                         preferred_element_type=jnp.float32,
                         precision=jax.lax.Precision.HIGHEST)


def mfcc_pallas_recomp(audio: jnp.ndarray, cfg: MFCCConfig = MFCCConfig(),
                       *, split: bool = True, bf: int = BF) -> jnp.ndarray:
    """Fused recomposition kernel on RAW audio: (S, T) -> (S, F, nceptrums).

    Host side is a single pad+reshape to (rows, hop); pre-emphasis, framing
    and all pipeline stages run in the kernel."""
    audio = audio.astype(jnp.float32)
    S, T = audio.shape
    nfft, hop, ncep = cfg.nfft, cfg.hop, cfg.nceptrums
    nbins = nfft // 2
    nseg = -(-nfft // hop)
    F = cfg.n_frames(T)
    assert F >= 1, "signal shorter than one frame"
    nblocks = -(-F // bf)
    Fp = nblocks * bf
    N = S * nblocks
    L = nblocks * bf + nseg - 1                 # hop-rows incl. overlap tail

    need = L * hop
    if need > T:
        audio = jnp.pad(audio, ((0, 0), (0, need - T)))
    Xrows = audio[:, : L * hop].reshape(S, L, hop)
    Xmain = Xrows[:, : nblocks * bf].reshape(N, bf, hop)
    tail_idx = np.arange(nblocks)[:, None] * bf + bf \
        + np.arange(nseg - 1)[None, :]
    Xtail = Xrows[:, tail_idx].reshape(N, nseg - 1, hop)
    # raw sample immediately before each block (0 for a stream's first block)
    prev_idx = jnp.maximum(jnp.arange(nblocks) * bf * hop - 1, 0)
    prevs = (audio[:, prev_idx] * (jnp.arange(nblocks) > 0)).reshape(N, 1, 1)

    CS, mel, dct = _kernel_operators(cfg)
    if split:
        cs_hi = CS.astype(jnp.bfloat16)
        cs_lo = (CS - np.asarray(cs_hi, np.float32)).astype(jnp.bfloat16)
        cs_arg = jnp.stack([jnp.asarray(cs_hi), jnp.asarray(cs_lo)])
        cs_spec = pl.BlockSpec((2, nfft, 2 * nbins), lambda n: (0, 0, 0),
                               memory_space=pltpu.VMEM)
    else:
        cs_arg = jnp.asarray(CS)
        cs_spec = pl.BlockSpec((nfft, 2 * nbins), lambda n: (0, 0),
                               memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_mfcc_recomp_kernel, nfft=nfft, hop=hop,
                          nbins=nbins, ncep=ncep, split=split, bf=bf,
                          nseg=nseg),
        grid=(N,),
        in_specs=[
            pl.BlockSpec((1, bf, hop), lambda n: (n, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nseg - 1, hop), lambda n: (n, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1), lambda n: (n, 0, 0),
                         memory_space=pltpu.SMEM),
            cs_spec,
            pl.BlockSpec((nbins, cfg.nfilters), lambda n: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cfg.nfilters, ncep), lambda n: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bf, ncep), lambda n: (n, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, bf, ncep), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((bf, nfft), jnp.float32),
        ],
    )(Xmain, Xtail, prevs, cs_arg, jnp.asarray(mel), jnp.asarray(dct))
    return out.reshape(S, Fp, ncep)[:, :F]


# ---------------------------------------------------------------------------
# Segment-layout kernel: zero per-frame copies
# ---------------------------------------------------------------------------
#
# Profiling the kernel above shows the BF unaligned VMEM frame copies dominate
# (~2/3 of runtime).  This variant never builds frames: the host reshapes the
# emphasized signal into hop-sized segment rows padded to the 256-lane
# boundary, and the windowed DFT becomes FOUR shifted matmuls
#
#   reim = sum_q X[q : q+BF] @ D_q ,   q = 0..3
#
# where D_q[r] = CS[q*hop + r] (D_3 holds only the nfft-3*hop=2 remainder
# rows).  The (BF, 256) row slices of the segment matrix are contiguous --
# no gather, no copies; everything else is identical to the first kernel.

@functools.lru_cache(maxsize=None)
def _segment_kernel_operators(cfg: MFCCConfig, seg_pad: int):
    CS, mel, dct = _kernel_operators(cfg)
    hop, nfft = cfg.hop, cfg.nfft
    nseg = -(-nfft // hop)                     # 4 for 512/170 (last partial)
    Ds = []
    for q in range(nseg):
        D = np.zeros((seg_pad, CS.shape[1]), np.float32)
        lo = q * hop
        hi = min(lo + hop, nfft)
        D[: hi - lo] = CS[lo:hi]
        Ds.append(D)
    return np.stack(Ds), mel, dct              # (nseg, seg_pad, 2*nbins)


def _mfcc_seg_kernel(x_ref, xtail_ref, d_ref, mel_ref, dct_ref, out_ref, *,
                     nbins, ncep, nseg, split):
    X = jnp.concatenate([x_ref[0], xtail_ref[0]], axis=0)  # (BF+nseg-1, P)
    if split:
        bf = jnp.bfloat16
        x_hi = X.astype(bf)
        x_lo = (X - x_hi.astype(jnp.float32)).astype(bf)
        reim = None
        for q in range(nseg):
            d_hi = d_ref[0, q]
            d_lo = d_ref[1, q]
            t = jnp.dot(x_hi[q: q + BF], d_hi,
                        preferred_element_type=jnp.float32)
            t = t + jnp.dot(x_hi[q: q + BF], d_lo,
                            preferred_element_type=jnp.float32)
            t = t + jnp.dot(x_lo[q: q + BF], d_hi,
                            preferred_element_type=jnp.float32)
            t = t + jnp.dot(x_lo[q: q + BF], d_lo,
                            preferred_element_type=jnp.float32)
            reim = t if reim is None else reim + t
    else:
        reim = None
        for q in range(nseg):
            t = jnp.dot(X[q: q + BF], d_ref[q],
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST)
            reim = t if reim is None else reim + t

    re = reim[:, :nbins]
    im = reim[:, nbins:]
    power = re * re + im * im
    melspec = jnp.dot(power, mel_ref[:], preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)
    logmel = jnp.log2(melspec)
    out_ref[0] = jnp.dot(logmel, dct_ref[:],
                         preferred_element_type=jnp.float32,
                         precision=jax.lax.Precision.HIGHEST)


def mfcc_pallas_seg(audio: jnp.ndarray, cfg: MFCCConfig = MFCCConfig(), *,
                    split: bool = True) -> jnp.ndarray:
    """Fused segment-layout kernel: (S, T) raw -> (S, F, nceptrums)."""
    emph = framing.preemphasis(audio.astype(jnp.float32))
    S, T = emph.shape
    nfft, hop, ncep = cfg.nfft, cfg.hop, cfg.nceptrums
    nbins = nfft // 2
    F = cfg.n_frames(T)
    assert F >= 1, "signal shorter than one frame"
    nblocks = -(-F // BF)
    nseg = -(-nfft // hop)
    seg_pad = -(-hop // 128) * 128             # 256 for hop=170

    # segment rows: block n needs rows [n*BF, n*BF + BF + nseg - 1)
    L = nblocks * BF + nseg - 1
    need = L * hop
    if need > T:
        emph = jnp.pad(emph, ((0, 0), (0, need - T)))
    Xrows = emph[:, : L * hop].reshape(S, L, hop)
    Xrows = jnp.pad(Xrows, ((0, 0), (0, 0), (0, seg_pad - hop)))

    N = S * nblocks
    # block n's main rows are contiguous: a pure reshape, no gather
    Xmain = Xrows[:, : nblocks * BF].reshape(N, BF, seg_pad)
    # the nseg-1 overlap rows per block are a tiny gather
    tail_idx = (np.arange(nblocks)[:, None] * BF + BF
                + np.arange(nseg - 1)[None, :])               # (nb, nseg-1)
    Xtail = Xrows[:, tail_idx].reshape(N, nseg - 1, seg_pad)

    Ds, mel, dct = _segment_kernel_operators(cfg, seg_pad)
    if split:
        d_hi = Ds.astype(jnp.bfloat16)
        d_lo = (Ds - np.asarray(d_hi, np.float32)).astype(jnp.bfloat16)
        d_arg = jnp.stack([jnp.asarray(d_hi), jnp.asarray(d_lo)])
        d_spec = pl.BlockSpec((2, nseg, seg_pad, 2 * nbins),
                              lambda n: (0, 0, 0, 0), memory_space=pltpu.VMEM)
    else:
        d_arg = jnp.asarray(Ds)
        d_spec = pl.BlockSpec((nseg, seg_pad, 2 * nbins),
                              lambda n: (0, 0, 0), memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        functools.partial(_mfcc_seg_kernel, nbins=nbins, ncep=ncep,
                          nseg=nseg, split=split),
        grid=(N,),
        in_specs=[
            pl.BlockSpec((1, BF, seg_pad), lambda n: (n, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nseg - 1, seg_pad), lambda n: (n, 0, 0),
                         memory_space=pltpu.VMEM),
            d_spec,
            pl.BlockSpec((nbins, cfg.nfilters), lambda n: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cfg.nfilters, ncep), lambda n: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, BF, ncep), lambda n: (n, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, BF, ncep), jnp.float32),
    )(Xmain, Xtail, d_arg, jnp.asarray(mel), jnp.asarray(dct))
    return out.reshape(S, nblocks * BF, ncep)[:, :F]


# ---------------------------------------------------------------------------
# Transposed recomposition kernel: positions-major frames, sublane copies
# ---------------------------------------------------------------------------
#
# The recomp kernel's remaining non-matmul cost is the four (BF, hop)
# sub-matrix copies whose DESTINATION lane offsets (q*hop = 0,170,340,510)
# force a lane rotation per copy.  This variant adopts the INT v2 layout
# (pallas_int._int_kernel_v2): the host supplies the RAW signal transposed
# to (hop, rows) tiles, the kernel rebuilds the frame matrix POSITIONS-MAJOR
# -- copy q lands at sublane offset q*hop with a small lane shift of q --
# and the whole pipeline runs in the (positions/bins, frame-lanes)
# orientation, ending with a (ncep, BF) output the host un-transposes.
# Pre-emphasis happens in transposed space: sample (l*hop + t)'s predecessor
# is row t-1 same lane for t>0 and row hop-1, lane l-1 for t == 0 (lane 0
# takes the block's SMEM prev scalar), replacing the same reference stage
# (mfcc/core/preemph.py:20-27).

@functools.lru_cache(maxsize=None)
def _kernel_operators_t(cfg: MFCCConfig):
    CS, mel, dct = _kernel_operators(cfg)
    return (np.ascontiguousarray(CS.T), np.ascontiguousarray(mel.T),
            np.ascontiguousarray(dct.T))


def _mfcc_recomp_t_kernel(xa_ref, xb_ref, prev_ref, cs_ref, mel_ref, dct_ref,
                          out_ref, fbuf, *, nfft, hop, nbins, ncep, bf, nseg):
    C = jnp.concatenate([xa_ref[0], xb_ref[0]], axis=1)      # (hop, 2*bf)
    if C.dtype != jnp.float32:
        C = C.astype(jnp.float32)      # int16 wire input: upcast in VMEM
    rows = jax.lax.broadcasted_iota(jnp.int32, C.shape, 0)
    lanecol = jax.lax.broadcasted_iota(jnp.int32, (1, C.shape[1]), 1)
    up = pltpu.roll(C, 1, 0)                     # row t <- row t-1
    wrapped = pltpu.roll(C[hop - 1: hop, :], 1, 1)  # lane l <- lane l-1
    prev_row0 = jnp.where(lanecol == 0, prev_ref[0, 0, 0], wrapped)
    prev = jnp.where(rows == 0, prev_row0, up)
    E = C - jnp.float32(framing.EMPHASIS_COEFF) * prev

    for q in range(nseg):
        p0 = q * hop
        w = min(hop, nfft - p0)
        fbuf[p0: p0 + w, :] = E[:w, q: q + bf]

    reim = jnp.dot(cs_ref[:], fbuf[:],
                   preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)      # (2*nbins, bf)
    re = reim[:nbins]
    im = reim[nbins:]
    power = re * re + im * im                                # (nbins, bf)
    melspec = jnp.dot(mel_ref[:], power,
                      preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)   # (ntap, bf)
    logmel = jnp.log2(melspec)
    out_ref[0] = jnp.dot(dct_ref[:], logmel,
                         preferred_element_type=jnp.float32,
                         precision=jax.lax.Precision.HIGHEST)  # (ncep, bf)


def mfcc_pallas_recomp_t(audio: jnp.ndarray, cfg: MFCCConfig = MFCCConfig(),
                         *, bf: int = BF,
                         interpret: bool = False) -> jnp.ndarray:
    """Fused transposed-recomposition kernel on RAW audio:
    (..., T) -> (..., F, nceptrums).  f32-HIGHEST throughout.

    int16 input is streamed to the kernel AS int16 (half the HBM traffic --
    the wire format is 16-bit samples, software/main.c:134-151) and upcast
    in VMEM; any other dtype is cast to f32 on the host."""
    if audio.dtype != jnp.int16:
        audio = audio.astype(jnp.float32)
    lead = audio.shape[:-1]
    if audio.ndim == 1:
        audio = audio[None]
    elif audio.ndim > 2:
        audio = audio.reshape(-1, audio.shape[-1])
    S, T = audio.shape
    nfft, hop, ncep = cfg.nfft, cfg.hop, cfg.nceptrums
    nbins = nfft // 2
    nseg = -(-nfft // hop)
    F = cfg.n_frames(T)
    assert F >= 1, "signal shorter than one frame"
    nblocks = -(-F // bf)
    Fp = nblocks * bf
    N = S * nblocks

    # transposed hop-row layout; pad the lane axis so block n can always
    # read lane-tiles n and n+1 (same trick as pallas_int.mfcc_int_pallas_v2)
    Lp = (nblocks + 1) * bf
    need = Lp * hop
    if need > T:
        audio = jnp.pad(audio, ((0, 0), (0, need - T)))
    rows = audio[:, : Lp * hop].reshape(S, Lp, hop)
    TT = rows.swapaxes(-1, -2)                               # (S, hop, Lp)
    # raw sample immediately before each block (0 for a stream's first
    # block); always f32 so the SMEM scalar matches the upcast kernel values
    prev_idx = jnp.maximum(jnp.arange(nblocks) * bf * hop - 1, 0)
    prevs = (audio[:, prev_idx].astype(jnp.float32)
             * (jnp.arange(nblocks) > 0)).reshape(N, 1, 1)

    cs_t, mel_t, dct_t = _kernel_operators_t(cfg)

    out = pl.pallas_call(
        functools.partial(_mfcc_recomp_t_kernel, nfft=nfft, hop=hop,
                          nbins=nbins, ncep=ncep, bf=bf, nseg=nseg),
        grid=(N,),
        in_specs=[
            pl.BlockSpec((1, hop, bf),
                         lambda n, nb=nblocks: (n // nb, 0, n % nb),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hop, bf),
                         lambda n, nb=nblocks: (n // nb, 0, n % nb + 1),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1), lambda n: (n, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((2 * nbins, nfft), lambda n: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cfg.nfilters, nbins), lambda n: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ncep, cfg.nfilters), lambda n: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, ncep, bf), lambda n: (n, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, ncep, bf), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((nfft, bf), jnp.float32),
        ],
        interpret=interpret,
    )(TT, TT, prevs, jnp.asarray(cs_t), jnp.asarray(mel_t),
      jnp.asarray(dct_t))
    out = out.swapaxes(-1, -2).reshape(S, Fp, ncep)[:, :F]
    return out.reshape(lead + (F, ncep))


# ---------------------------------------------------------------------------
# Radix-2 whole-stream kernel: split real DFT, half the MXU work
# ---------------------------------------------------------------------------
#
# The recomp-T kernel's time is dominated by the (512, 512) HIGHEST DFT
# matmul.  This kernel halves that work with one radix-2 DIT level computed
# as matmuls: E/O = DFT-256 of the even/odd windowed frame positions (one
# (272, 256) @ (256, 2L) matmul -- conjugate symmetry means only bins
# 0..128 of each half are ever computed), then A_j = E_j + W^j O_j covers
# spectrum bins 0..128 and B_j = E_j - W^j O_j covers bins 256-j.  The
# conjugation and the descending bin order of the B rows die in the power
# spectrum (|conj z|^2 == |z|^2), so the reconstruction permutation is
# absorbed into the HOST-side column order of the mel matrix and no
# in-kernel reversal exists (Mosaic has no sublane-reverse primitive).
# The even/odd position split costs one value reshape (hop, L) ->
# (hop/2, 2, L); frame-rebuild copies land at contiguous destination rows
# because hop is even.
#
# Blocks are whole-stream super-blocks: grid=(S * nchunks,), each step
# reading NBK+1 contiguous lane-tiles (no tile double-read, one big DMA),
# with the pre-emphasis carry entering as one SMEM scalar per super-block.
# This replaces the same reference stages as the recomp-T kernel; the
# radix-2 split itself is the matmul analogue of one level of the RTL's
# DIT ladder (mfcc/misc/fft.py:197-346), with the bank scheduling replaced
# by operand layout.

NBMAX = 4  # lane-tiles per super-block (VMEM cap: ~3.5 MB at 4)

# Split-DFT operator packing.  The natural layout needs 129 cos + 129 sin
# rows = 258, which the original 272-row operator (two 136-row 8-aligned
# halves) tiles onto THREE 128-row MXU M-tiles -- 384 row-slots for 256
# useful rows (sin bins 0 and 128 are identically zero).  True: pack into
# EXACTLY 256 rows = two M-tiles, cutting the dominant matmul's MXU work by
# a third: rows [0,128) = cos bins 0..127, rows [128,255) = sin bins
# 1..127, row 255 = cos bin 128.  The Im block realigns with one circular
# sublane roll (the roll wraps the cos-128 row into slot 0, which is
# masked), and bin 128's power rides the already-aligned last 8-row tile
# through a tiny (nfilters, 8) mel matmul.  Same products, same K, not bit
# identical only in the ~1e-16 cos(pi/2) twiddle of the old bin-128 path.
R2_PACK256 = True

# Where the hop-tile transpose happens for the radix-2 batch kernel.  The
# kernel wants positions-major (hop, bf) tiles; audio arrives time-major.
# True: ship UNTRANSPOSED (bf, hop) tiles (a free reshape on the host) and
# transpose each tile in VMEM after the f32 upcast -- Mosaic lowers the
# (128, 170) value transpose onto the hardware transpose path.  "t16":
# transpose in the packed i16 domain BEFORE the upcast (half the bytes
# through the transpose path).  False: the original host-side XLA
# swapaxes, measured at ~3.3 ms/run on the i16 input (35% of the whole
# pipeline; docs/BENCH.md round 3h) -- XLA's 16-bit sub-word transpose is
# ~10x off HBM speed-of-light.  (A fourth variant -- host-padding the
# tile lanes hop->256 so the VMEM transposes are clean 128-lane blocks --
# measured WORSE: the bulk pad copy costs more than the masked 42-lane
# remainder it removes; docs/BENCH.md round 3h.)
# Round-4 chip A/B (3 interleaved rounds, repeatable to +-0.05 Mf/s):
# False 49.69 vs True 47.94 Mf/s -- the runtime's i16 host transpose no
# longer shows the round-3h pathology (the False arm gained +16% across
# the runtime refresh while True gained +4%), so the host swapaxes ships
# again; the in-kernel path stays selectable and interpret-tested.
R2_KERNEL_T = False

# MXU pass count for the radix-2 core's split-DFT dot.  6 = one
# HIGHEST-precision f32 dot (Mosaic lowers it as 6 bf16 passes) --
# the shipped default, required by the float path's 5e-4 contract.
# 4 / 3 = decompose both operands into two bf16 limbs in-kernel and
# issue the limb dots at DEFAULT precision (Mosaic rejects
# lax.Precision.HIGH outright, so reduced-pass forms must be spelled
# manually); 3 also drops lo*lo.  Round-4g chip A/B (docs/BENCH.md;
# S=1024, errs = speech/synthetic vs the f64 oracle):
#   6-pass  50.5 Mf/s   1.3e-4 / 1.4e-4   (contract default)
#   4-pass  57.7 Mf/s   3.8e-4 / 1.07e-3
#   3-pass  63.3 Mf/s   3.6e-4 / 1.01e-3  (the fast mode: +26%)
# 4-pass == 3-pass accuracy because the binding error is the 2-limb
# operand split itself (~2^-17 residual per operand), not the dropped
# cross term; and no pass count below 6 can clear 5e-4, because the
# pre-emphasized frame needs 22 mantissa bits (3 limbs) and covering
# the 2^-16 cross-term class then takes all 6 combos.  So 3-pass is
# the only interesting reduced point: an OPT-IN speed/accuracy dial
# (~1e-3 worst-case; still far tighter than the reference RTL's
# fixed-point error) mirroring f64ish on the other end.  Tested at a
# 2e-3 gate; never the default.  The mel/DCT dots stay HIGHEST
# (tiny K).
#
# All three R2_* module values are DEFAULTS, resolved once per call at
# trace time; the supported surface is the per-call parameters
# (mfcc_pallas_radix2(dft_passes=), MFCC(precision="fast"),
# StreamingMFCC(precision="fast")) -- mutating the globals after a
# function has been jit-traced has no effect on the traced function
# (round-4 ADVICE) and is no longer done by bench/tools/tests.
R2_DFT_PASSES = 6


def _resolve_passes(dft_passes):
    return R2_DFT_PASSES if dft_passes is None else int(dft_passes)


def _resolve_kernel_t(kernel_t):
    return R2_KERNEL_T if kernel_t is None else kernel_t


def _resolve_pack256(pack256):
    return R2_PACK256 if pack256 is None else bool(pack256)


@functools.lru_cache(maxsize=None)
def _radix2_operators(cfg: MFCCConfig, pack256: bool = True):
    """Constants for the radix-2 split kernel, any power-of-2 nfft with
    nh = nfft/2 (the half-DFT size) and nh2 = nfft/4 a multiple of 8.

    Returns (csp, we, wo, twc, tws, mela, melb, melc, dct_t); two layouts,
    selected by R2_PACK256 and distinguished downstream by csp.shape[0]
    (== nh for packed; see the flag comment).  Shapes quote nfft=512:

    packed (default):
      csp  (nh, nh):   rows [0,nh2) cos bins 0..nh2-1 /nfft, rows
                       [nh2,nh-1) -sin bins 1..nh2-1 /nfft, row nh-1 cos
                       bin nh2 /nfft    (512: 256x256, split at 128)
      twc/tws (nh2,1): recombination twiddles, j = 0..nh2-1
      mela (32, nh2):  mel columns for bins 0..nh2-1 (the A rows)
      melb (32, nh2):  mel columns for bins nh-j (col 0 zeroed)
      melc (32, 8):    col 7 = mel column of bin nh2 (the last 8-row tile
                       of the DFT output; the other 7 columns are zero)
    original (2*nqp-row, nqp = nq rounded up to 8, nq = nfft/4+1):
      csp  (2*nqp, nh): rows [0,nq) cos/nfft, rows [nqp, nqp+nq) -sin/nfft
                       (8-row aligned halves; 512: 272x256, halves at 136)
      twc/tws (nqp,1); mela/melb (32, nqp) with bins 0..nq-1 in mela;
      melc (32, 8) all-zero (unused)
    shared:
      we/wo (nh, 1):   Hamming window at even/odd frame positions
      dct_t (ncep, 32)
    """
    nfft = cfg.nfft
    nh = nfft // 2
    nh2 = nh // 2
    nq = nfft // 4 + 1
    nqp = -(-nq // 8) * 8
    assert nfft & (nfft - 1) == 0 and nh2 % 8 == 0, \
        "radix-2 split operators need power-of-2 nfft with 8-aligned " \
        "quarter (gate with pallas_float_supported)"
    assert _nyquist_mel_row_zero(cfg), \
        "fused kernels drop the Nyquist bin; its mel row must be zero"
    scale = 1.0 / nfft
    m = np.arange(nh)[None, :]
    w = tables.float_window(nfft)
    we = w[0::2].astype(np.float32)[:, None]
    wo = w[1::2].astype(np.float32)[:, None]
    mel_t = tables.float_mel_matrix(cfg.samplerate, cfg.nfft,
                                    cfg.nfilters)[:nh].T   # (32, nh)
    dct = tables.dct2_ortho_matrix(cfg.nfilters)[:, : cfg.nceptrums]
    dct_t = np.ascontiguousarray(dct.T.astype(np.float32))
    if pack256:
        j = np.arange(nh2)[:, None]
        csp = np.zeros((nh, nh), np.float32)
        csp[:nh2] = np.cos(2 * np.pi * j * m / nh) * scale
        csp[nh2: nh - 1] = -np.sin(2 * np.pi * j[1:] * m / nh) * scale
        csp[nh - 1] = np.cos(2 * np.pi * nh2 * m[0] / nh) * scale
        twc = np.cos(2 * np.pi * np.arange(nh2) / nfft) \
            .astype(np.float32)[:, None]
        tws = np.sin(2 * np.pi * np.arange(nh2) / nfft) \
            .astype(np.float32)[:, None]
        mela = np.ascontiguousarray(mel_t[:, :nh2])
        melb = np.zeros((cfg.nfilters, nh2), np.float32)
        for jj in range(1, nh2):
            melb[:, jj] = mel_t[:, nh - jj]
        melc = np.zeros((cfg.nfilters, 8), np.float32)
        melc[:, 7] = mel_t[:, nh2]
        return csp, we, wo, twc, tws, mela, melb, melc, dct_t
    j = np.arange(nq)[:, None]
    csp = np.zeros((2 * nqp, nh), np.float32)
    csp[:nq] = np.cos(2 * np.pi * j * m / nh) * scale
    csp[nqp: nqp + nq] = -np.sin(2 * np.pi * j * m / nh) * scale
    twc = np.zeros((nqp, 1), np.float32)
    tws = np.zeros((nqp, 1), np.float32)
    twc[:nq, 0] = np.cos(2 * np.pi * np.arange(nq) / nfft)
    tws[:nq, 0] = np.sin(2 * np.pi * np.arange(nq) / nfft)
    mela = np.zeros((cfg.nfilters, nqp), np.float32)
    mela[:, :nq] = mel_t[:, :nq]
    melb = np.zeros((cfg.nfilters, nqp), np.float32)
    for jj in range(1, nh2):
        melb[:, jj] = mel_t[:, nh - jj]
    melc = np.zeros((cfg.nfilters, 8), np.float32)
    return csp, we, wo, twc, tws, mela, melb, melc, dct_t


def _mfcc_radix2_kernel(xm_ref, xx_ref, prev_ref, csp_ref, we_ref, wo_ref,
                        twc_ref, tws_ref, mela_ref, melb_ref, melc_ref,
                        dct_ref, out_ref, fbuf2, *, nfft, hop, ncep, bf,
                        nseg, nbk, kernel_t=False, stop_after=None,
                        dft_passes=6):
    L = nbk * bf
    tiles = [xm_ref[0, i] for i in range(nbk)] + [xx_ref[0, 0]]
    if kernel_t == "t16":            # transpose packed, then upcast
        tiles = [t.T.astype(jnp.float32) for t in tiles]
    elif kernel_t:                   # upcast, then HW transpose
        tiles = [t.astype(jnp.float32).T for t in tiles]
    C = jnp.concatenate(tiles, axis=1)               # (hop, (nbk+1)*bf)
    if C.dtype != jnp.float32:
        C = C.astype(jnp.float32)    # int16 wire input: upcast in VMEM
    if stop_after == "raw":       # profiling cut: DMA + concat + upcast
        out_ref[0] = C[:ncep, :L]
        return
    rows = jax.lax.broadcasted_iota(jnp.int32, C.shape, 0)
    lanecol = jax.lax.broadcasted_iota(jnp.int32, (1, C.shape[1]), 1)
    up = pltpu.roll(C, 1, 0)                        # row t <- row t-1
    wrapped = pltpu.roll(C[hop - 1: hop, :], 1, 1)  # lane l <- lane l-1
    prev_row0 = jnp.where(lanecol == 0, prev_ref[0, 0, 0], wrapped)
    prev = jnp.where(rows == 0, prev_row0, up)
    E = C - jnp.float32(framing.EMPHASIS_COEFF) * prev
    if stop_after == "pre":       # profiling cut: + pre-emphasis
        out_ref[0] = E[:ncep, :L]
        return
    # even/odd position split: one value reshape (hop even)
    Es = E.reshape(hop // 2, 2, C.shape[1])
    Eev, Eod = Es[:, 0], Es[:, 1]                    # (hop/2, Ltot)
    if stop_after == "emph":      # profiling cut: DMA + concat + preemph
        out_ref[0] = Eev[:ncep, :L] + Eod[:ncep, :L]
        return
    for b in range(nbk):
        for q in range(nseg):
            p0 = q * hop                             # even for even hop
            w = min(hop, nfft - p0)
            he, ho = (w + 1) // 2, w // 2
            lane = b * bf + q
            fbuf2[p0 // 2: p0 // 2 + he, b * bf:(b + 1) * bf] = \
                Eev[:he, lane: lane + bf]
            fbuf2[p0 // 2: p0 // 2 + ho, L + b * bf: L + (b + 1) * bf] = \
                Eod[:ho, lane: lane + bf]
    if stop_after == "frames":    # profiling cut: DMA + preemph + rebuild
        out_ref[0] = fbuf2[:ncep, :L]
        return
    out_ref[0] = _radix2_core(fbuf2, we_ref, wo_ref, csp_ref, twc_ref,
                              tws_ref, mela_ref, melb_ref, melc_ref,
                              dct_ref, L, stop_after=stop_after,
                              dft_passes=dft_passes)


def _radix2_core(fbuf2, we_ref, wo_ref, csp_ref, twc_ref, tws_ref,
                 mela_ref, melb_ref, melc_ref, dct_ref, L,
                 stop_after: str | None = None, mel_floor: float = 0.0,
                 dft_passes: int = 6):
    """Shared radix-2 pipeline tail on a [evens | odds] frame scratch
    (nfft/2, 2L): window -> one split-DFT matmul -> twiddle recombination
    -> power -> permuted-mel -> log2 -> DCT.  Returns (ncep, L).
    Handles both operator layouts (see R2_PACK256), keyed on csp rows.

    ``stop_after`` ("dft" | "power" | "mel"): profiling hook -- return
    that stage's leading ncep rows so Mosaic DCEs the tail and fused
    timing deltas attribute per-stage cost (the float twin of
    pallas_int._post_fft_stages(stop_after=); never set in production)."""
    hi = jax.lax.Precision.HIGHEST
    ncep = dct_ref.shape[0]
    nh = fbuf2.shape[0]              # half-DFT size = nfft/2
    nh2 = nh // 2
    packed = csp_ref.shape[0] == nh  # the two-M-tile layout (R2_PACK256)
    fbuf2[:, :L] = fbuf2[:, :L] * we_ref[:]
    fbuf2[:, L:] = fbuf2[:, L:] * wo_ref[:]
    if dft_passes < 6:
        # manual reduced-pass form: two bf16 limbs per operand (see the
        # flag comment; gate-enforced accuracy)
        C = csp_ref[:]
        X = fbuf2[:]
        c_hi = C.astype(jnp.bfloat16)
        c_lo = (C - c_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        x_hi = X.astype(jnp.bfloat16)
        x_lo = (X - x_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        eo = (jnp.dot(c_hi, x_hi, preferred_element_type=jnp.float32)
              + jnp.dot(c_hi, x_lo, preferred_element_type=jnp.float32)
              + jnp.dot(c_lo, x_hi,
                        preferred_element_type=jnp.float32))
        if dft_passes >= 4:
            eo = eo + jnp.dot(c_lo, x_lo,
                              preferred_element_type=jnp.float32)
    else:
        eo = jnp.dot(csp_ref[:], fbuf2[:],
                     preferred_element_type=jnp.float32,
                     precision=hi)                  # (256 or 272, 2L)
    if stop_after == "dft":
        return eo[:ncep, :L]
    if packed:                                      # packed two-M-tile layout
        Re = eo[:nh2]                               # cos bins 0..nh2-1
        # Im: sin bins 1..nh2-1 live one row early; the circular roll wraps
        # the cos-nh2 row (nh-1) into slot 0, where Im(0) == 0 -- mask it
        Sroll = pltpu.roll(eo[nh2:nh], 1, 0)
        rows = jax.lax.broadcasted_iota(jnp.int32, Sroll.shape, 0)
        Im = jnp.where(rows == 0, jnp.float32(0), Sroll)
        Ere, Ore = Re[:, :L], Re[:, L:]
        Eim, Oim = Im[:, :L], Im[:, L:]
    else:
        nqp = csp_ref.shape[0] // 2                 # 8-aligned quarter rows
        Ere, Eim = eo[:nqp, :L], eo[nqp:, :L]
        Ore, Oim = eo[:nqp, L:], eo[nqp:, L:]
    twc, tws = twc_ref[:], tws_ref[:]
    Tre = twc * Ore + tws * Oim                     # W^j = cos - i sin
    Tim = twc * Oim - tws * Ore
    Are, Aim = Ere + Tre, Eim + Tim                 # bins 0..127 (0..128)
    Bre, Bim = Ere - Tre, Eim - Tim                 # bins 256-j (conj)
    pa = Are * Are + Aim * Aim
    pb = Bre * Bre + Bim * Bim
    if stop_after == "power":
        return pa[:ncep] + pb[:ncep]
    melspec = (jnp.dot(mela_ref[:], pa,
                       preferred_element_type=jnp.float32, precision=hi)
               + jnp.dot(melb_ref[:], pb,
                         preferred_element_type=jnp.float32, precision=hi))
    if packed:
        # bin nh2: A = E - i O with Im == 0 -> |A|^2 = Ere^2 + Ore^2; its
        # cos row sits in the (aligned) last 8-row tile, whose squares ride
        # a tiny matmul through melc (only column 7 is nonzero)
        tail = eo[nh - 8: nh]
        sq = tail[:, :L] * tail[:, :L] + tail[:, L:] * tail[:, L:]
        melspec = melspec + jnp.dot(
            melc_ref[:], sq, preferred_element_type=jnp.float32,
            precision=hi)
    if stop_after == "mel":
        return melspec
    if mel_floor:
        # silence clamp (the float analogue of the RTL's 0 -> 1 before log2,
        # /root/reference/mfcc/core/log.py:123-126): keeps digital silence
        # finite; 0.0 = notebook-spec fidelity (log2(0) = -inf)
        melspec = jnp.maximum(melspec, jnp.float32(mel_floor))
    logmel = jnp.log2(melspec)
    return jnp.dot(dct_ref[:], logmel,
                   preferred_element_type=jnp.float32, precision=hi)


def _mfcc_frames_float_kernel(x_ref, csp_ref, we_ref, wo_ref, twc_ref,
                              tws_ref, mela_ref, melb_ref, melc_ref,
                              dct_ref, out_ref, fbuf2, *, nfft, bf,
                              kernel_t=False, dft_passes=6):
    """(1, nfft, bf) pre-emphasized positions-major frames -- or
    (1, bf, nfft) frame-major when ``kernel_t`` (R2_KERNEL_T), transposed
    in VMEM -- -> (ncep, bf): the radix-2 pipeline tail without framing
    (the streaming/serving entry, mirroring
    pallas_int.mfcc_int_pallas_frames)."""
    x = x_ref[0]
    if x.dtype != jnp.float32:
        x = x.astype(jnp.float32)
    if kernel_t:
        x = x.T
    xs = x.reshape(nfft // 2, 2, bf)
    fbuf2[:, :bf] = xs[:, 0]
    fbuf2[:, bf:] = xs[:, 1]
    out_ref[0] = _radix2_core(fbuf2, we_ref, wo_ref, csp_ref, twc_ref,
                              tws_ref, mela_ref, melb_ref, melc_ref,
                              dct_ref, bf, dft_passes=dft_passes)


def mfcc_pallas_frames_float(frames: jnp.ndarray,
                             cfg: MFCCConfig = MFCCConfig(), *,
                             interpret: bool = False,
                             dft_passes: int | None = None,
                             kernel_t: bool | None = None) -> jnp.ndarray:
    """Fused float pipeline on pre-emphasized FRAMES:
    (..., F, nfft) -> (..., F, nceptrums), f32-HIGHEST.

    The streaming/serving entry point: all leading axes flatten into the
    kernel's frame-lane axis so many streams' few-frame chunks fill
    128-lane blocks together (the XLA mfcc_frames chain measured ~25x
    slower per frame than the fused batch kernel).

    ``dft_passes``: MXU pass count for the split-DFT dot (None = the
    module default, 6 = 5e-4 contract, 3 = the opt-in ~1e-3 fast mode --
    see the R2_DFT_PASSES comment)."""
    assert cfg.windowlen == cfg.nfft, \
        "frames kernel expects full-length frames"
    dft_passes = _resolve_passes(dft_passes)
    kernel_t = _resolve_kernel_t(kernel_t)
    lead = frames.shape[:-2]
    F_in = frames.shape[-2]
    nfft, ncep = cfg.nfft, cfg.nceptrums
    x = frames.reshape(-1, nfft)
    M = x.shape[0]
    nblocks = max(1, -(-M // BF))
    Mp = nblocks * BF
    if Mp > M:
        x = jnp.pad(x, ((0, Mp - M), (0, 0)))
    if kernel_t:
        xT = x.reshape(nblocks, BF, nfft)       # free; transposed in VMEM
    else:
        xT = x.reshape(nblocks, BF, nfft).swapaxes(-1, -2)  # (nb, nfft, BF)

    consts = [jnp.asarray(a)
              for a in _radix2_operators(cfg, _resolve_pack256(None))]
    out = pl.pallas_call(
        functools.partial(_mfcc_frames_float_kernel, nfft=nfft, bf=BF,
                          kernel_t=bool(kernel_t),
                          dft_passes=dft_passes),
        grid=(nblocks,),
        in_specs=[pl.BlockSpec((1,) + xT.shape[1:], lambda n: (n, 0, 0),
                               memory_space=pltpu.VMEM)] +
                 [pl.BlockSpec(a.shape, lambda n, nd=a.ndim: (0,) * nd,
                               memory_space=pltpu.VMEM) for a in consts],
        out_specs=pl.BlockSpec((1, ncep, BF), lambda n: (n, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nblocks, ncep, BF), jnp.float32),
        scratch_shapes=[pltpu.VMEM((nfft // 2, 2 * BF), jnp.float32)],
        interpret=interpret,
    )(xT, *consts)
    out = out.swapaxes(-1, -2).reshape(Mp, ncep)[:M]
    return out.reshape(lead + (F_in, ncep))


def mfcc_pallas_radix2(audio: jnp.ndarray, cfg: MFCCConfig = MFCCConfig(),
                       *, bf: int = BF, interpret: bool = False,
                       stop_after: str | None = None,
                       dft_passes: int | None = None,
                       kernel_t: bool | str | None = None,
                       pack256: bool | None = None) -> jnp.ndarray:
    """Fused radix-2 split-DFT kernel on RAW audio:
    (..., T) -> (..., F, nceptrums).  f32-HIGHEST throughout.

    int16 input is streamed to the kernel AS int16 (the 16-bit wire
    contract, software/main.c:134-151) and upcast in VMEM; other dtypes
    are cast to f32 on the host.

    ``dft_passes`` / ``kernel_t`` / ``pack256``: per-call overrides of the
    module-default perf dials (R2_DFT_PASSES / R2_KERNEL_T / R2_PACK256;
    see the flag comments).  ``dft_passes=3`` is the supported fast mode
    (~+26%, ~1e-3 worst-case error vs the 6-pass 5e-4 contract)."""
    assert cfg.hop % 2 == 0, "radix-2 split kernel needs an even hop"
    dft_passes = _resolve_passes(dft_passes)
    kernel_t = _resolve_kernel_t(kernel_t)
    pack256 = _resolve_pack256(pack256)
    if audio.dtype != jnp.int16:
        audio = audio.astype(jnp.float32)
    lead = audio.shape[:-1]
    if audio.ndim == 1:
        audio = audio[None]
    elif audio.ndim > 2:
        audio = audio.reshape(-1, audio.shape[-1])
    S, T = audio.shape
    nfft, hop, ncep = cfg.nfft, cfg.hop, cfg.nceptrums
    nseg = -(-nfft // hop)
    F = cfg.n_frames(T)
    assert F >= 1, "signal shorter than one frame"
    nb = -(-F // bf)
    nchunks = -(-nb // NBMAX)
    nbk = -(-nb // nchunks)                    # balanced tiles per chunk
    Fp = nchunks * nbk * bf
    N = S * nchunks
    L = nbk * bf

    # contiguous lane-tile layout: tile l rows are samples l*bf*hop ...
    Lp = nchunks * nbk + 1
    need = Lp * bf * hop
    if need > T:
        audio = jnp.pad(audio, ((0, 0), (0, need - T)))
    if kernel_t:
        # free reshape; each (bf, hop) tile transposes in VMEM (flag note)
        T4 = audio[:, : need].reshape(S, Lp, bf, hop)
    else:
        T4 = audio[:, : need].reshape(S, Lp, bf, hop).swapaxes(-1, -2)
    # raw sample immediately before each super-block (0 at stream start)
    prev_idx = jnp.maximum(jnp.arange(nchunks) * nbk * bf * hop - 1, 0)
    prevs = (audio[:, prev_idx].astype(jnp.float32)
             * (jnp.arange(nchunks) > 0)).reshape(N, 1, 1)

    consts = [jnp.asarray(a) for a in _radix2_operators(cfg, pack256)]

    tile = (bf, hop) if kernel_t else (hop, bf)
    out = pl.pallas_call(
        functools.partial(_mfcc_radix2_kernel, nfft=nfft, hop=hop,
                          ncep=ncep, bf=bf, nseg=nseg, nbk=nbk,
                          kernel_t=kernel_t, stop_after=stop_after,
                          dft_passes=dft_passes),
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
        ] + [pl.BlockSpec(a.shape, lambda n, nd=a.ndim: (0,) * nd,
                          memory_space=pltpu.VMEM) for a in consts],
        out_specs=pl.BlockSpec((1, ncep, L), lambda n: (n, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, ncep, L), jnp.float32),
        scratch_shapes=[pltpu.VMEM((nfft // 2, 2 * L), jnp.float32)],
        interpret=interpret,
    )(T4, T4, prevs, *consts)
    out = (out.reshape(S, nchunks, ncep, L).swapaxes(-1, -2)
           .reshape(S, Fp, ncep)[:, :F])
    return out.reshape(lead + (F, ncep))


# ---------------------------------------------------------------------------
# Frame-major whole-stream kernel: zero relayouts end to end
# ---------------------------------------------------------------------------
#
# The radix-2 kernel's measured bottleneck is the input relayout: audio
# arrives time-major, the kernel computes positions-major, and moving
# between them costs either a host XLA i16 transpose (~3.3 ms/run) or
# in-kernel hardware transposes (~2 ms/run) -- docs/BENCH.md round 3h.
# This kernel is the round-3 VERDICT's "operator-side transpose": keep
# FRAMES on the sublane axis and POSITIONS on the lane axis everywhere, so
# that
#   * the host prologue is ONE free reshape (S, T) -> (S, Lp, hop) --
#     no swapaxes, no pad copies beyond the tail;
#   * frame assembly is nseg sublane-sliced lane-offset stores
#     (frame j = hop-rows j..j+nseg-1 laid at lane offsets q*hop) --
#     no transposes, no barrel rolls;
#   * the DFT contracts frames @ CS with the UNtransposed (nfft, 2*nbins)
#     operator (window folded in), M=bf K=nfft N=2*nbins -- MXU-native;
#   * power/mel/log2/DCT all stay frame-major, ending at (bf, ncep) --
#     the OUTPUT layout, so the epilogue reshape is free too.
# The trade: the full real DFT costs 2x the split-DFT's MXU work (no
# even/odd split -- a lane-parity deinterleave would reintroduce the
# relayout this kernel exists to remove).  Whether the saved relayout
# beats the extra MXU passes is a chip measurement (bench candidate
# "pallas-fmaj-i16"); accuracy is the recomp/dft family's (full f32
# HIGHEST, same operators).
# Replaces the same reference stages as the other whole-stream kernels
# (preemph.py:20-27, frame.py:86-114, window.py:84, fft.py:197-346,
# pow2.py:22-64, filterbank.py:90-115, log/dct via the float spec).


def _mfcc_fmaj_kernel(xa_ref, xb_ref, prev_ref, cs_ref, mel_ref, dct_ref,
                      out_ref, fbuf, *, nfft, hop, nbins, ncep, bf, nseg,
                      mel_floor=0.0):
    C = jnp.concatenate([xa_ref[0], xb_ref[0]], axis=0)      # (2bf, hop)
    if C.dtype != jnp.float32:
        C = C.astype(jnp.float32)      # int16 wire input: upcast in VMEM
    rows = jax.lax.broadcasted_iota(jnp.int32, C.shape, 0)
    lanecol = jax.lax.broadcasted_iota(jnp.int32, C.shape, 1)
    left = pltpu.roll(C, 1, 1)                   # lane p <- p-1 (wraps p=0)
    up_last = pltpu.roll(left, 1, 0)             # row r lane 0 <- C[r-1, -1]
    prev = jnp.where(lanecol == 0, up_last, left)
    prev = jnp.where((rows == 0) & (lanecol == 0), prev_ref[0, 0, 0], prev)
    E = C - jnp.float32(framing.EMPHASIS_COEFF) * prev

    # frame j (sublane j) = hop-segments j..j+nseg-1 at lane offsets q*hop
    for q in range(nseg):
        p0 = q * hop
        w = min(hop, nfft - p0)
        fbuf[:, p0: p0 + w] = E[q: q + bf, :w]

    hi = jax.lax.Precision.HIGHEST
    reim = jnp.dot(fbuf[:], cs_ref[:],
                   preferred_element_type=jnp.float32,
                   precision=hi)                             # (bf, 2*nbins)
    re = reim[:, :nbins]
    im = reim[:, nbins:]
    power = re * re + im * im                                # (bf, nbins)
    melspec = jnp.dot(power, mel_ref[:],
                      preferred_element_type=jnp.float32,
                      precision=hi)                          # (bf, ntap)
    if mel_floor:
        melspec = jnp.maximum(melspec, jnp.float32(mel_floor))
    logmel = jnp.log2(melspec)
    out_ref[0] = jnp.dot(logmel, dct_ref[:],
                         preferred_element_type=jnp.float32,
                         precision=hi)                       # (bf, ncep)


def mfcc_pallas_fmaj(audio: jnp.ndarray, cfg: MFCCConfig = MFCCConfig(),
                     *, bf: int = BF, interpret: bool = False,
                     mel_floor: float = 0.0) -> jnp.ndarray:
    """Fused frame-major kernel on RAW audio: (..., T) -> (..., F, ncep).
    f32-HIGHEST throughout; int16 input streams as int16 and upcasts in
    VMEM.  See the layout rationale above."""
    if audio.dtype != jnp.int16:
        audio = audio.astype(jnp.float32)
    lead = audio.shape[:-1]
    if audio.ndim == 1:
        audio = audio[None]
    elif audio.ndim > 2:
        audio = audio.reshape(-1, audio.shape[-1])
    S, T = audio.shape
    nfft, hop, ncep = cfg.nfft, cfg.hop, cfg.nceptrums
    nbins = nfft // 2
    nseg = -(-nfft // hop)
    assert bf >= nseg, "frame assembly reads rows q..q+bf-1, q < nseg"
    F = cfg.n_frames(T)
    assert F >= 1, "signal shorter than one frame"
    nblocks = -(-F // bf)
    Fp = nblocks * bf
    N = S * nblocks

    # hop-row layout, sublane tiles: block n reads row-tiles n and n+1
    Lp = (nblocks + 1) * bf
    need = Lp * hop
    if need > T:
        audio = jnp.pad(audio, ((0, 0), (0, need - T)))
    rows = audio[:, : Lp * hop].reshape(S, Lp, hop)          # FREE reshape
    prev_idx = jnp.maximum(jnp.arange(nblocks) * bf * hop - 1, 0)
    prevs = (audio[:, prev_idx].astype(jnp.float32)
             * (jnp.arange(nblocks) > 0)).reshape(N, 1, 1)

    CS, mel, dct = _kernel_operators(cfg)

    out = pl.pallas_call(
        functools.partial(_mfcc_fmaj_kernel, nfft=nfft, hop=hop,
                          nbins=nbins, ncep=ncep, bf=bf, nseg=nseg,
                          mel_floor=mel_floor),
        grid=(N,),
        in_specs=[
            pl.BlockSpec((1, bf, hop),
                         lambda n, nb=nblocks: (n // nb, n % nb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bf, hop),
                         lambda n, nb=nblocks: (n // nb, n % nb + 1, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1), lambda n: (n, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((nfft, 2 * nbins), lambda n: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nbins, cfg.nfilters), lambda n: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cfg.nfilters, ncep), lambda n: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bf, ncep), lambda n: (n, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, bf, ncep), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((bf, nfft), jnp.float32),
        ],
        interpret=interpret,
    )(rows, rows, prevs, jnp.asarray(CS), jnp.asarray(mel),
      jnp.asarray(dct))
    out = out.reshape(S, Fp, ncep)[:, :F]                    # FREE reshape
    return out.reshape(lead + (F, ncep))
