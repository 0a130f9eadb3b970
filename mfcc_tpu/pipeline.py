"""Public batch API: the flagship MFCC feature extractor.

Replaces the reference's top-level ``MFCC`` Elaboratable + host protocol
(mfcc/core/mfcc.py:19-117, software/main.c) with two jit-compiled batch
transforms over (streams, samples) arrays:

  * ``MFCC.float_path``  -- the float spec (notebook MFCC-INT.ipynb),
    MXU-matmul formulation, bf16/f32 selectable.
  * ``MFCC.int_path``    -- bit-exact RTL fixed-point parity (int32/int64).

Both paths vmap/shard trivially over streams and frames; see
mfcc_tpu.parallel for multi-chip sharding and mfcc_tpu.streaming for the
stateful chunked API.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .config import MFCCConfig
from .ops import float_ops, int_ops, framing


class MFCC:
    """Batched MFCC front-end.

    >>> fe = MFCC()                       # defaults = wav2mfcc target config
    >>> cep = fe(audio_batch)             # float path, (S, T) -> (S, F, 32)
    >>> cep_int = fe.int(audio_batch)     # bit-exact INT path
    """

    def __init__(self, cfg: MFCCConfig = MFCCConfig(), *,
                 method: str = "dft", precision: str = "highest",
                 dtype=jnp.float32, mel_floor: float = 0.0):
        """``precision`` is the three-point accuracy/speed dial (plus the
        raw matmul-precision names float_ops accepts):

          * ``"highest"`` (default) -- the 5e-4 float contract; on TPU the
            fused radix-2 kernel (6-pass split-DFT, ~50 Mf/s).
          * ``"fast"`` -- the opt-in 3-pass split-DFT (~+26%, ~1e-3
            worst-case vs the f64 oracle; still far tighter than the
            reference RTL's fixed-point error).  Falls back to the
            "highest" XLA chain where the fused kernel is unsupported
            (non-TPU, exotic geometry) -- never LESS accurate than asked.
          * ``"f64ish"`` -- compensated-f32 double-word arithmetic,
            ~1e-5-class accuracy (ops/df32.py).

        The dial mirrors the reference's injectable ``multiplier_cls``
        configurability (mfcc/core/mfcc.py:62-82)."""
        self.cfg = cfg
        self.method = method
        self.precision = precision
        self.dtype = dtype
        self.mel_floor = mel_floor

        # on TPU the fused float kernel (radix-2 split-DFT whole-stream,
        # f32-HIGHEST -- the bench winner, gate-clean on real speech) is the
        # default whenever the caller asked for the default spec; any
        # explicit method/precision/dtype/mel_floor choice is honored via
        # the XLA formulations, as are non-default frame geometries
        from .ops import pallas_mfcc, pallas_fladder
        fused_ok = (method == "dft" and dtype == jnp.float32
                    and mel_floor == 0.0
                    and pallas_mfcc.pallas_float_supported(cfg))
        fast = precision == "fast"
        if (method == "dft" and dtype == jnp.float32
                and precision == "highest"
                and pallas_fladder.pallas_fladder_supported(cfg)):
            # the f32 block-ladder kernel (round 5i): +10% over the
            # split-DFT form AND an order of magnitude tighter FFT
            # rounding (the bf16-limb DFT error term vanishes); handles
            # mel_floor natively
            float_batch = functools.partial(
                pallas_fladder.mfcc_float_ladder_pallas, cfg=cfg,
                mel_floor=mel_floor)
        elif fused_ok and (precision == "highest"
                           or (fast and cfg.hop % 2 == 0)):
            kern = (pallas_mfcc.mfcc_pallas_radix2 if cfg.hop % 2 == 0
                    else pallas_mfcc.mfcc_pallas_recomp_t)
            if cfg.hop % 2 == 0:
                kern = functools.partial(kern,
                                         dft_passes=3 if fast else None)
            float_batch = functools.partial(kern, cfg=cfg)
        else:
            float_batch = functools.partial(
                float_ops.mfcc_batch, cfg=cfg, method=method,
                precision="highest" if fast else precision,
                dtype=dtype, mel_floor=mel_floor)
        self._float_jit = jax.jit(float_batch)
        if fast and fused_ok and cfg.windowlen == cfg.nfft:
            frames_fn = functools.partial(
                pallas_mfcc.mfcc_pallas_frames_float, cfg=cfg,
                dft_passes=3)
        else:
            frames_fn = functools.partial(
                float_ops.mfcc_frames, cfg=cfg, method=method,
                precision="highest" if fast else precision,
                dtype=dtype, mel_floor=mel_floor)
        self._float_frames_jit = jax.jit(frames_fn)
        # the INT path is x64-free for the reference config family; exotic
        # filterbank layouts fall back to the int64 (x64) filterbank
        self._int_needs_x64 = not int_ops._fb_int32_layout_ok(cfg)
        # on TPU the fused Mosaic kernels (2x faster, bit-identical) are the
        # default for the reference config family.  The kernels hardcode the
        # 16-bit datapath (_wrap16, the 2*16-power_width shift, the 16-pass
        # log normalize), so any width change must fall back to int_ops,
        # which honors cfg.width (round-1 ADVICE, low).
        from .ops import pallas_int
        if pallas_int.pallas_int_supported(cfg):
            int_batch = functools.partial(pallas_int.mfcc_int_pallas_v3,
                                          cfg=cfg)
            int_frames = functools.partial(pallas_int.mfcc_int_pallas_frames,
                                           cfg=cfg)
        else:
            int_batch = functools.partial(int_ops.mfcc_int_batch, cfg=cfg)
            int_frames = functools.partial(int_ops.mfcc_int_frames, cfg=cfg)
        with self._x64_ctx():
            self._int_jit = jax.jit(int_batch)
            self._int_frames_jit = jax.jit(int_frames)

    def _x64_ctx(self):
        import contextlib
        return (jax.enable_x64() if self._int_needs_x64
                else contextlib.nullcontext())

    # -- float path ----------------------------------------------------------

    def __call__(self, audio: jnp.ndarray) -> jnp.ndarray:
        """(..., T) raw samples -> (..., F, nceptrums) float cepstra."""
        return self._float_jit(jnp.asarray(audio))

    def frames(self, frames: jnp.ndarray) -> jnp.ndarray:
        """(..., F, nfft) pre-emphasized frames -> (..., F, nceptrums)."""
        return self._float_frames_jit(jnp.asarray(frames))

    # -- INT path (bit-exact RTL parity) --------------------------------------

    def int(self, audio) -> jnp.ndarray:
        """(..., T) int16-range samples -> (..., F, nceptrums) int32 cepstra,
        element-exact vs the RTL fixed-point pipeline."""
        with self._x64_ctx():
            x = jnp.asarray(np.asarray(audio), dtype=jnp.int32)
            return self._int_jit(x)

    def int_frames(self, frames) -> jnp.ndarray:
        with self._x64_ctx():
            x = jnp.asarray(np.asarray(frames), dtype=jnp.int32)
            return self._int_frames_jit(x)

    # -- debug / observability -------------------------------------------------

    def intermediates(self, audio) -> dict:
        """All 8 stage outputs of the float path (the ``gen_collector`` debug
        pattern, mfcc/core/mfcc.py:128-141, as a returned pytree)."""
        from .utils.debug import float_intermediates
        return float_intermediates(jnp.asarray(audio), self.cfg,
                                   dtype=self.dtype)


def n_frames(cfg: MFCCConfig, n_samples: int) -> int:
    return cfg.n_frames(n_samples)
