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


@pytest.mark.skipif(_backend() not in ("tpu",),
                    reason="Mosaic kernel requires a TPU backend")
def test_pallas_int_v2_exact(audio_int16):
    """v2 (framing + windowing fused in, positions-major lane shifts) is
    element-exact vs the RTL oracle, including multi-block and ragged-tail
    frame counts."""
    from mfcc_tpu.ops import pallas_int
    rng = np.random.default_rng(23)
    for T in (512 + 4 * 170, 512 + 140 * 170):   # 1 block / 2 blocks
        sig = rng.integers(-32768, 32768, (2, T))
        want = np.stack([int_ref.mfcc_int(sig[i], CFG) for i in range(2)])
        got = np.asarray(jax.jit(
            lambda a: pallas_int.mfcc_int_pallas_v2(a, CFG))(
                jnp.asarray(sig, jnp.int32)))
        assert np.array_equal(want, got), T


@pytest.mark.skipif(_backend() not in ("tpu",),
                    reason="Mosaic kernel requires a TPU backend")
def test_pallas_int_v3_exact(reference_wav):
    """v3 (whole-stream super-blocks) is element-exact vs the RTL oracle on
    full-range random data (1 super-block) and on the full reference wav
    (nb=9 -> nchunks=3, exercising the cross-chunk SMEM pre-emphasis
    carry)."""
    from mfcc_tpu.ops import pallas_int
    rng = np.random.default_rng(31)
    sig = rng.integers(-32768, 32768, (2, 512 + 9 * 170))
    want = np.stack([int_ref.mfcc_int(sig[i], CFG) for i in range(2)])
    got = np.asarray(jax.jit(
        lambda a: pallas_int.mfcc_int_pallas_v3(a, CFG))(
            jnp.asarray(sig, jnp.int32)))
    assert np.array_equal(want, got)
    wav = reference_wav.astype(np.int64)
    want_l = int_ref.mfcc_int(wav, CFG)
    got_l = np.asarray(jax.jit(
        lambda a: pallas_int.mfcc_int_pallas_v3(a, CFG))(
            jnp.asarray(wav[None], jnp.int32)))[0]
    assert np.array_equal(want_l, got_l)


@pytest.mark.skipif(_backend() not in ("tpu",),
                    reason="Mosaic kernel requires a TPU backend")
def test_pallas_int_frames_exact(audio_int16):
    """The frames-input kernel (the streaming/serving entry) equals the XLA
    frames path exactly -- leading axes share lane blocks."""
    from mfcc_tpu.ops import pallas_int, int_ops, framing
    sig = audio_int16.astype(np.int64)
    emph = framing.preemphasis_int(jnp.asarray(sig[None], jnp.int32))
    frames = framing.extract_frames(emph, CFG.nfft, CFG.hop)   # (1, 5, 512)
    frames = jnp.concatenate([frames, frames * 0 + 7, frames[:, ::-1]], 0)
    want = np.asarray(int_ops.mfcc_int_frames(frames, CFG))
    got = np.asarray(jax.jit(
        lambda f: pallas_int.mfcc_int_pallas_frames(f, CFG))(frames))
    assert np.array_equal(want, got)


@pytest.mark.skipif(_backend() not in ("tpu",),
                    reason="Mosaic kernel requires a TPU backend")
def test_pallas_int_v3_unbalanced_chunks(reference_wav):
    """nb=5 -> nchunks=2, nbk=3: the padded-final-chunk remainder path of
    the whole-stream blocking, element-exact vs the RTL oracle."""
    from mfcc_tpu.ops import pallas_int
    T = 512 + (5 * 128 - 1) * 170
    sig = reference_wav[:T].astype(np.int64)
    want = int_ref.mfcc_int(sig, CFG)
    got = np.asarray(jax.jit(
        lambda a: pallas_int.mfcc_int_pallas_v3(a, CFG))(
        jnp.asarray(sig[None], jnp.int32)))[0]
    assert np.array_equal(want, got)
