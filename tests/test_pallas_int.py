"""Fused INT Mosaic kernel: element-exact vs the unbounded-int oracle."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mfcc_tpu import MFCCConfig
from mfcc_tpu.ref import int_ref

CFG = MFCCConfig()


def _backend():
    return jax.devices()[0].platform


@pytest.mark.skipif(_backend() not in ("tpu",),
                    reason="Mosaic kernel requires a TPU backend")
def test_pallas_int_bit_exact(audio_int16):
    from mfcc_tpu.ops import pallas_int
    sig = np.stack([audio_int16, audio_int16[::-1]]).astype(np.int64)
    want = np.stack([int_ref.mfcc_int(sig[i], CFG) for i in range(2)])
    got = np.asarray(jax.jit(
        lambda a: pallas_int.mfcc_int_pallas(a, CFG))(
            jnp.asarray(sig, jnp.int32)))
    assert want.shape == got.shape == (2, 5, 32)
    assert np.array_equal(want, got)


@pytest.mark.skipif(_backend() not in ("tpu",),
                    reason="Mosaic kernel requires a TPU backend")
def test_pallas_int_adversarial(audio_int16):
    """Full int16 range random data (wraparound paths exercised)."""
    from mfcc_tpu.ops import pallas_int
    rng = np.random.default_rng(17)
    sig = rng.integers(-32768, 32768, (1, 512 + 4 * 170))
    want = int_ref.mfcc_int(sig[0], CFG)
    got = np.asarray(jax.jit(
        lambda a: pallas_int.mfcc_int_pallas(a, CFG))(
            jnp.asarray(sig, jnp.int32)))[0]
    assert np.array_equal(want, got)


def test_natural_order_ladder_constants():
    """The natural-order twiddle columns agree with the w-space plan."""
    from mfcc_tpu.ops.pallas_int import _ladder_constants, _bitrev
    from mfcc_tpu import tables
    size = 64
    L = 6
    cr, ci = _ladder_constants(size)
    twr, twi = tables.twiddle_table(size, 16)
    for s in range(L):
        for r in range(size):
            g = r >> (L - s) if s else 0
            idx = (_bitrev(g, s) << (L - 1 - s)) if s else 0
            assert cr[r, s] == twr[idx] and ci[r, s] == twi[idx]
