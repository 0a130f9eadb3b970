"""Fused Pallas kernel vs the jnp float path (same spec, f32 agreement)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mfcc_tpu import MFCCConfig
from mfcc_tpu.ref import float_ref

CFG = MFCCConfig()


def _backend():
    return jax.devices()[0].platform


@pytest.mark.skipif(_backend() not in ("tpu",),
                    reason="Mosaic kernel requires a TPU backend")
def test_pallas_matches_jnp(audio_int16):
    from mfcc_tpu.ops import pallas_mfcc, float_ops
    sig = np.stack([audio_int16, audio_int16[::-1]]).astype(np.float32)
    p = np.asarray(jax.jit(lambda a: pallas_mfcc.mfcc_batch_pallas(a, CFG))(
        jnp.asarray(sig)))
    j = np.asarray(jax.jit(lambda a: float_ops.mfcc_batch(a, CFG))(
        jnp.asarray(sig)))
    assert p.shape == j.shape == (2, 5, 32)
    assert np.abs(p - j).max() < 5e-4


@pytest.mark.skipif(_backend() not in ("tpu",),
                    reason="Mosaic kernel requires a TPU backend")
def test_pallas_vs_oracle(audio_int16):
    from mfcc_tpu.ops import pallas_mfcc
    want = float_ref.mfcc_float(audio_int16, CFG)
    got = np.asarray(jax.jit(
        lambda a: pallas_mfcc.mfcc_batch_pallas(a, CFG))(
        jnp.asarray(audio_int16[None].astype(np.float32))))[0]
    assert np.abs(want - got).max() < 5e-4


def test_segmented_matches_oracle(audio_int16):
    """The segmented (no-gather) formulation vs float64 oracle -- works on
    any backend."""
    from mfcc_tpu.ops import float_ops
    import functools
    want = float_ref.mfcc_float(audio_int16, CFG)
    fn = jax.jit(functools.partial(float_ops.mfcc_batch, cfg=CFG,
                                   method="segmented"))
    got = np.asarray(fn(jnp.asarray(audio_int16, jnp.float32)))
    assert np.abs(want - got).max() < 5e-4
