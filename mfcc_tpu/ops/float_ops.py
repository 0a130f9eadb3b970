"""Float MFCC pipeline as TPU-shaped JAX ops.

Design (SURVEY.md section 7): the FLOPs live in three matmuls that run on the
MXU and fuse under one jit --

  1. frames @ [window-weighted DFT]     (512 x 514: re|im concatenated)
  2. power  @ mel                       (257 x 32)
  3. logmel @ dct                       (32 x 32)

The Hamming window multiply is precomposed into the DFT operator
(tables.windowed_rdft_matrix), so the radix-2 RTL core (mfcc/misc/fft.py),
the window LUT datapath (mfcc/core/window.py) and the serial filterbank
accumulator (mfcc/core/filterbank.py) all collapse into MXU work.  Everything
between matmuls is VPU elementwise that XLA fuses.

An rfft-based variant is kept both as a numerics cross-check and because at
much larger nfft the O(N log N) path wins.
"""

from __future__ import annotations

import functools
from typing import Literal

import numpy as np
import jax
import jax.numpy as jnp

from ..config import MFCCConfig
from .. import tables
from . import framing

Precision = Literal["highest", "default", "bf16"]


def _matmul_precision(precision: Precision):
    if precision == "highest":
        return jax.lax.Precision.HIGHEST
    if precision == "high":
        return jax.lax.Precision.HIGH
    if precision == "default":
        return jax.lax.Precision.DEFAULT
    return jax.lax.Precision.DEFAULT  # bf16 handled by dtype


@functools.lru_cache(maxsize=None)
def _operators_np(cfg: MFCCConfig):
    """Constant operator matrices (numpy, cached per config)."""
    C, S = tables.windowed_rdft_matrix(cfg.nfft)
    CS = np.concatenate([C, S], axis=1)              # (nfft, 2*nbins)
    mel = tables.float_mel_matrix(cfg.samplerate, cfg.nfft, cfg.nfilters)
    dct = tables.dct2_ortho_matrix(cfg.nfilters)[:, : cfg.nceptrums]
    return CS, mel, dct


def _operators(cfg: MFCCConfig, dtype_name: str):
    dtype = jnp.dtype(dtype_name)
    CS, mel, dct = _operators_np(cfg)
    return (jnp.asarray(CS, dtype), jnp.asarray(mel, dtype),
            jnp.asarray(dct, dtype))


def mfcc_frames(frames: jnp.ndarray, cfg: MFCCConfig = MFCCConfig(), *,
                method: str = "dft", precision: Precision = "highest",
                dtype=jnp.float32, mel_floor: float = 0.0) -> jnp.ndarray:
    """MFCC of pre-emphasized frames: (..., F, nfft) -> (..., F, nceptrums).

    method='dft'  -- windowed-DFT matmul on the MXU (TPU-native default).
    method='rfft' -- jnp.fft.rfft reference path (identical numerics spec).
    """
    frames = frames.astype(dtype)
    nbins = cfg.nbins_float
    prec = _matmul_precision(precision)
    CS, mel, dct = _operators(cfg, jnp.dtype(dtype).name)

    if method == "dft":
        reim = jnp.matmul(frames, CS, precision=prec)
        re, im = reim[..., :nbins], reim[..., nbins:]
        power = re * re + im * im
    elif method == "rfft":
        win = jnp.asarray(tables.float_window(cfg.nfft), dtype)
        spec = jnp.fft.rfft(frames * win, axis=-1) / cfg.nfft
        power = jnp.abs(spec).astype(dtype) ** 2
    else:
        raise ValueError(f"unknown method {method!r}")

    melspec = jnp.matmul(power, mel, precision=prec)
    if mel_floor:
        melspec = jnp.maximum(melspec, mel_floor)
    logmel = jnp.log2(melspec)
    return jnp.matmul(logmel, dct, precision=prec)


def mfcc_batch(audio: jnp.ndarray, cfg: MFCCConfig = MFCCConfig(), *,
               method: str = "dft", precision: Precision = "highest",
               dtype=jnp.float32, mel_floor: float = 0.0) -> jnp.ndarray:
    """Full float pipeline on raw signals: (..., T) -> (..., F, nceptrums)."""
    x = audio.astype(dtype)
    emph = framing.preemphasis(x)
    frames = framing.extract_frames(emph, cfg.nfft, cfg.hop)
    return mfcc_frames(frames, cfg, method=method, precision=precision,
                       dtype=dtype, mel_floor=mel_floor)


# -- Partial feature extractors (the model-family surface) -------------------

def power_spectrum_frames(frames: jnp.ndarray, cfg: MFCCConfig = MFCCConfig(),
                          *, precision: Precision = "highest",
                          dtype=jnp.float32) -> jnp.ndarray:
    """(..., F, nfft) -> (..., F, nbins_float) |fft(w*x)/nfft|^2."""
    frames = frames.astype(dtype)
    nbins = cfg.nbins_float
    CS, _, _ = _operators(cfg, jnp.dtype(dtype).name)
    reim = jnp.matmul(frames, CS, precision=_matmul_precision(precision))
    re, im = reim[..., :nbins], reim[..., nbins:]
    return re * re + im * im


def log_mel_frames(frames: jnp.ndarray, cfg: MFCCConfig = MFCCConfig(), *,
                   precision: Precision = "highest", dtype=jnp.float32,
                   mel_floor: float = 0.0) -> jnp.ndarray:
    """(..., F, nfft) -> (..., F, nfilters) log2 mel energies."""
    power = power_spectrum_frames(frames, cfg, precision=precision, dtype=dtype)
    _, mel, _ = _operators(cfg, jnp.dtype(dtype).name)
    melspec = jnp.matmul(power, mel, precision=_matmul_precision(precision))
    if mel_floor:
        melspec = jnp.maximum(melspec, mel_floor)
    return jnp.log2(melspec)
