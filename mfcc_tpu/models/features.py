"""The feature-extractor model family.

The reference ships one model (the 8-stage MFCC core) with two deployed
configurations -- wav2mfcc (USB3, 32 cepstra, wav2mfcc.py:19) and mic2mfcc
(UART, 16 cepstra, mic2mfcc.py:19).  This framework generalizes the family:
every truncation of the pipeline is a usable feature extractor, each a thin
jit-compiled model object sharing the same config/tables, plus the
librosa-recipe variant used for goldens.

All float models are differentiable end-to-end (jax.grad flows through the
matmul/log formulation), so they double as trainable front-ends.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..config import MFCCConfig, DEFAULT_CONFIG, MIC_CONFIG
from ..ops import float_ops, int_ops, framing
from .. import tables


class _FloatModel:
    """Shared scaffolding: raw (..., T) audio -> features, jit'd."""

    def __init__(self, cfg: MFCCConfig = DEFAULT_CONFIG, *,
                 precision: str = "highest", dtype=jnp.float32,
                 mel_floor: float = 0.0):
        self.cfg = cfg
        self.precision = precision
        self.dtype = dtype
        self.mel_floor = mel_floor
        self._jit = jax.jit(self._fn)

    def _frames(self, audio):
        emph = framing.preemphasis(audio.astype(self.dtype))
        return framing.extract_frames(emph, self.cfg.nfft, self.cfg.hop,
                                      windowlen=self.cfg.windowlen)

    def __call__(self, audio):
        return self._jit(jnp.asarray(audio))


class Spectrogram(_FloatModel):
    """(..., T) -> (..., F, nfft/2+1) power spectrogram |fft(w*x)/nfft|^2."""

    def _fn(self, audio):
        return float_ops.power_spectrum_frames(
            self._frames(audio), self.cfg, precision=self.precision,
            dtype=self.dtype)


class MelSpectrogram(_FloatModel):
    """(..., T) -> (..., F, nfilters) triangular-mel energies (no log)."""

    def _fn(self, audio):
        power = float_ops.power_spectrum_frames(
            self._frames(audio), self.cfg, precision=self.precision,
            dtype=self.dtype)
        _, mel, _ = float_ops._operators(self.cfg, jnp.dtype(self.dtype).name)
        return jnp.matmul(power, mel,
                          precision=float_ops._matmul_precision(self.precision))


class LogMelSpectrogram(_FloatModel):
    """(..., T) -> (..., F, nfilters) log2 mel energies."""

    def _fn(self, audio):
        return float_ops.log_mel_frames(
            self._frames(audio), self.cfg, precision=self.precision,
            dtype=self.dtype, mel_floor=self.mel_floor)


class MFCCFeatures(_FloatModel):
    """(..., T) -> (..., F, nceptrums), the flagship float model."""

    def _fn(self, audio):
        return float_ops.mfcc_batch(audio, self.cfg, precision=self.precision,
                                    dtype=self.dtype,
                                    mel_floor=self.mel_floor)


class IntMFCCFeatures:
    """Bit-exact fixed-point MFCC (the RTL's numerics), (..., T) int ->
    (..., F, nceptrums) int32."""

    def __init__(self, cfg: MFCCConfig = DEFAULT_CONFIG):
        import contextlib
        self.cfg = cfg
        self._ctx = (jax.enable_x64 if not int_ops._fb_int32_layout_ok(cfg)
                     else contextlib.nullcontext)
        with self._ctx():
            self._jit = jax.jit(functools.partial(int_ops.mfcc_int_batch,
                                                  cfg=cfg))

    def __call__(self, audio):
        import numpy as np
        with self._ctx():
            return self._jit(jnp.asarray(np.asarray(audio), jnp.int32))


class LibrosaMFCC:
    """JAX port of the golden recipe (compat.librosa_mfcc): n_fft=2048,
    center reflect pad, hann, slaney mel(128), power_to_db, DCT ortho.
    (..., T) float/int16 -> (..., n_mfcc, F) to match librosa's layout."""

    def __init__(self, sr: int = 16000, n_mfcc: int = 32, hop: int = 170,
                 n_fft: int = 2048, n_mels: int = 128, dtype=jnp.float32):
        from ..compat import librosa_mfcc as lr
        import numpy as np
        self.sr, self.n_mfcc, self.hop, self.n_fft = sr, n_mfcc, hop, n_fft
        # constants come from the compat recipe (the single golden source)
        self._win = lr.hann_window(n_fft).astype(np.float32)
        self._mel = lr.mel_filterbank(sr, n_fft, n_mels).T.astype(np.float32)
        self._dct = tables.dct2_ortho_matrix(n_mels)[:, :n_mfcc].astype(
            np.float32)
        self.dtype = dtype
        self._jit = jax.jit(self._fn)

    def _fn(self, y):
        y = y.astype(self.dtype)
        n_fft, hop = self.n_fft, self.hop
        pad = [(0, 0)] * (y.ndim - 1) + [(n_fft // 2, n_fft // 2)]
        y = jnp.pad(y, pad, mode="reflect")
        import numpy as np
        idx = (np.arange(n_fft)[None, :]
               + hop * np.arange(1 + (y.shape[-1] - n_fft) // hop)[:, None])
        frames = y[..., idx] * jnp.asarray(self._win, self.dtype)
        spec = jnp.fft.rfft(frames, axis=-1)
        S = (spec.real ** 2 + spec.imag ** 2).astype(self.dtype)
        melspec = jnp.matmul(S, jnp.asarray(self._mel, self.dtype),
                             precision=jax.lax.Precision.HIGHEST)
        db = 10.0 * jnp.log10(jnp.maximum(1e-10, melspec))
        db = jnp.maximum(db, jnp.max(db, axis=(-2, -1), keepdims=True) - 80.0)
        out = jnp.matmul(db, jnp.asarray(self._dct, self.dtype),
                         precision=jax.lax.Precision.HIGHEST)
        return jnp.swapaxes(out, -1, -2)

    def __call__(self, y):
        import numpy as np
        y = np.asarray(y)
        if np.issubdtype(y.dtype, np.integer):
            y = y.astype(np.float32) / 32768.0
        return self._jit(jnp.asarray(y))


# Deployed configurations of the reference targets:
def wav2mfcc_model() -> MFCCFeatures:
    """The USB3 batch target config (wav2mfcc.py:19): 32 cepstra."""
    return MFCCFeatures(DEFAULT_CONFIG)


def mic2mfcc_model() -> MFCCFeatures:
    """The live mic/UART target config (mic2mfcc.py:19): 16 cepstra."""
    return MFCCFeatures(MIC_CONFIG)
