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
                 frames_ref, *, nfft, hop, nbins, ncep):
    chunk_len = BF * hop

    # Overlapped frames from chunk (+ tail for the straddling last frames).
    # All slice offsets/sizes are static: this unrolls to plain VMEM copies.
    for i in range(BF):
        start = i * hop
        end = start + nfft
        if end <= chunk_len:
            frames_ref[i, :] = chunk_ref[0, 0, pl.ds(start, nfft)]
        else:
            head = chunk_len - start
            frames_ref[i, :head] = chunk_ref[0, 0, pl.ds(start, head)]
            frames_ref[i, head:] = tail_ref[0, 0, : nfft - head]

    frames = frames_ref[:]                                   # (BF, nfft)
    reim = jnp.dot(frames, cs_ref[:], preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)      # (BF, 2*nbins)
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


def mfcc_pallas_emphasized(emph: jnp.ndarray, cfg: MFCCConfig = MFCCConfig()
                           ) -> jnp.ndarray:
    """(S, T) already-emphasized f32 audio -> (S, F, nceptrums)."""
    S, T = emph.shape
    nfft, hop, ncep = cfg.nfft, cfg.hop, cfg.nceptrums
    nbins = nfft // 2
    F = cfg.n_frames(T)
    assert F >= 1, "signal shorter than one frame"
    nblocks = -(-F // BF)
    Fp = nblocks * BF
    chunk_len = BF * hop
    ov = _overlap(cfg)

    T_need = nblocks * chunk_len + ov
    if T_need > T:
        emph = jnp.pad(emph, ((0, 0), (0, T_need - T)))

    N = S * nblocks
    chunks = emph[:, : nblocks * chunk_len].reshape(N, 1, chunk_len)
    tail_idx = ((jnp.arange(nblocks) + 1) * chunk_len)[:, None] + jnp.arange(ov)
    tails = emph[:, tail_idx].reshape(N, 1, ov)    # tiny (N, 1, ov)

    CS, mel, dct = _kernel_operators(cfg)
    out = pl.pallas_call(
        functools.partial(_mfcc_kernel, nfft=nfft, hop=hop, nbins=nbins,
                          ncep=ncep),
        grid=(N,),
        in_specs=[
            pl.BlockSpec((1, 1, chunk_len), lambda n: (n, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, ov), lambda n: (n, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nfft, 2 * nbins), lambda n: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nbins, cfg.nfilters), lambda n: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cfg.nfilters, ncep), lambda n: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, BF, ncep), lambda n: (n, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, BF, ncep), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((BF, nfft), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * Fp * S * (nfft * 2 * nbins + nbins * cfg.nfilters
                                + cfg.nfilters * ncep),
            bytes_accessed=4 * S * (T_need + Fp * ncep),
            transcendentals=Fp * S * cfg.nfilters,
        ),
    )(chunks, tails, jnp.asarray(CS), jnp.asarray(mel), jnp.asarray(dct))
    return out.reshape(S, Fp, ncep)[:, :F]


def mfcc_batch_pallas(audio: jnp.ndarray, cfg: MFCCConfig = MFCCConfig()
                      ) -> jnp.ndarray:
    """Full float pipeline, fused kernel: (S, T) raw -> (S, F, nceptrums)."""
    emph = framing.preemphasis(audio.astype(jnp.float32))
    return mfcc_pallas_emphasized(emph, cfg)
