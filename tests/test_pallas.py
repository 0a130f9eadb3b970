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


@pytest.mark.skipif(_backend() not in ("tpu",),
                    reason="Mosaic kernel requires a TPU backend")
def test_pallas_split_and_seg_variants(audio_int16):
    """bf16-split (4-pass compensated) and segment-layout kernels stay within
    the accuracy gate."""
    from mfcc_tpu.ops import pallas_mfcc
    want = float_ref.mfcc_float(audio_int16, CFG)
    x = jnp.asarray(audio_int16[None].astype(np.float32))
    got_split = np.asarray(jax.jit(
        lambda a: pallas_mfcc.mfcc_batch_pallas(a, CFG, split=True))(x))[0]
    assert np.abs(want - got_split).max() < 5e-4
    got_seg = np.asarray(jax.jit(
        lambda a: pallas_mfcc.mfcc_pallas_seg(a, CFG, split=True))(x))[0]
    assert np.abs(want - got_seg).max() < 5e-4
    got_al = np.asarray(jax.jit(
        lambda a: pallas_mfcc.mfcc_pallas_aligned(a, CFG, split=True))(x))[0]
    assert np.abs(want - got_al).max() < 5e-4
    got_raw = np.asarray(jax.jit(
        lambda a: pallas_mfcc.mfcc_pallas_raw(a, CFG))(x))[0]
    assert np.abs(want - got_raw).max() < 5e-4
    # recomposition kernel (in-kernel pre-emphasis + 4 sub-matrix frame
    # copies): bit-identical to the split kernel, both within the gate
    got_rc = np.asarray(jax.jit(
        lambda a: pallas_mfcc.mfcc_pallas_recomp(a, CFG, split=True))(x))[0]
    assert np.array_equal(got_rc, got_split)
    assert np.abs(want - got_rc).max() < 5e-4


@pytest.mark.skipif(_backend() not in ("tpu",),
                    reason="Mosaic kernel requires a TPU backend")
def test_shipped_kernel_accuracy_on_real_speech(reference_wav):
    """The bench's shipped winner (recomp, f32-HIGHEST) holds the 5e-4 gate
    on REAL speech -- where quiet mel bins exposed the 4-pass-bf16 variants
    at ~2.3e-3 (round-2 finding; those remain available but gated out).
    (Interpret-mode CPU parity for the shipped kernels lives in
    test_pallas_interpret.py; this one needs the real Mosaic lowering.)"""
    from mfcc_tpu.ops import pallas_mfcc
    sig = reference_wav[: 512 + 186 * 170]
    want = float_ref.mfcc_float(sig, CFG)
    x = jnp.asarray(sig[None], jnp.float32)
    got = np.asarray(jax.jit(
        lambda a: pallas_mfcc.mfcc_pallas_recomp(a, CFG, split=False))(x))[0]
    assert np.abs(want - got).max() < 5e-4
    got_bf16 = np.asarray(jax.jit(
        lambda a: pallas_mfcc.mfcc_pallas_recomp(a, CFG, split=True))(x))[0]
    assert np.abs(want - got_bf16).max() > 5e-4   # documents the rejection


def test_split_matmul_accuracy():
    """The XLA-level double-word matmul survives excess-precision flags
    (mantissa masking, not casts)."""
    from mfcc_tpu.ops.float_ops import split_matmul
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.standard_normal((64, 512)).astype(np.float32) * 1e4)
    b = jnp.asarray(rng.standard_normal((512, 128)).astype(np.float32))
    want = np.asarray(a, np.float64) @ np.asarray(b, np.float64)
    got = np.asarray(jax.jit(split_matmul)(a, b))
    rel = np.abs(got - want) / np.abs(want).max()
    # 2x-bf16 double-word keeps ~16 mantissa bits: ~1e-5 relative.
    # Raw bf16 would be ~3e-3; Precision.HIGHEST is ~1e-7.
    assert rel.max() < 2e-5


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


@pytest.mark.skipif(_backend() not in ("tpu",),
                    reason="Mosaic kernel requires a TPU backend")
def test_pallas_recomp_t(audio_int16, reference_wav):
    """Transposed recomposition kernel (positions-major frames, in-kernel
    pre-emphasis in transposed space) holds the gate on synthetic + real
    speech, including multi-block signals exercising the SMEM prev scalar."""
    from mfcc_tpu.ops import pallas_mfcc
    fn = jax.jit(lambda a: pallas_mfcc.mfcc_pallas_recomp_t(a, CFG))
    # short 2-stream signal
    sig = np.stack([audio_int16, audio_int16[::-1]]).astype(np.float32)
    got = np.asarray(fn(jnp.asarray(sig)))
    want = np.stack([float_ref.mfcc_float(sig[i], CFG) for i in range(2)])
    assert got.shape == want.shape == (2, 5, 32)
    assert np.abs(want - got).max() < 5e-4
    # real speech spanning >1 block of 128 frames (prev-scalar path)
    long = reference_wav[: 512 + 186 * 170]
    want_l = float_ref.mfcc_float(long, CFG)
    got_l = np.asarray(jax.jit(
        lambda a: pallas_mfcc.mfcc_pallas_recomp_t(a, CFG))(
        jnp.asarray(long[None], jnp.float32)))[0]
    assert np.abs(want_l - got_l).max() < 5e-4


@pytest.mark.skipif(_backend() not in ("tpu",),
                    reason="Mosaic kernel requires a TPU backend")
def test_pallas_recomp_t_int16_input(audio_int16, reference_wav):
    """int16 wire input (software/main.c:134-151) streamed to the kernel AS
    int16 and upcast in VMEM must be bit-identical to the f32 route on the
    same integer-valued samples -- including across the block-boundary SMEM
    prev scalar."""
    from mfcc_tpu.ops import pallas_mfcc
    long = reference_wav[: 512 + 186 * 170]
    for sig in (np.stack([audio_int16, audio_int16[::-1]]), long[None]):
        f32 = np.asarray(jax.jit(
            lambda a: pallas_mfcc.mfcc_pallas_recomp_t(a, CFG))(
            jnp.asarray(sig, jnp.float32)))
        i16 = np.asarray(jax.jit(
            lambda a: pallas_mfcc.mfcc_pallas_recomp_t(a, CFG))(
            jnp.asarray(sig, jnp.int16)))
        assert np.array_equal(f32, i16)


@pytest.mark.skipif(_backend() not in ("tpu",),
                    reason="Mosaic kernel requires a TPU backend")
def test_pallas_radix2(audio_int16, reference_wav):
    """Radix-2 split-DFT kernel: parity on synthetic + real speech, int16
    route bit-identical to f32, and the multi-super-block path (full
    reference wav spans nchunks > 1) including the SMEM pre-emphasis
    carry."""
    from mfcc_tpu.ops import pallas_mfcc
    # short 2-stream signal
    sig = np.stack([audio_int16, audio_int16[::-1]]).astype(np.float32)
    got = np.asarray(jax.jit(
        lambda a: pallas_mfcc.mfcc_pallas_radix2(a, CFG))(jnp.asarray(sig)))
    want = np.stack([float_ref.mfcc_float(sig[i], CFG) for i in range(2)])
    assert got.shape == want.shape == (2, 5, 32)
    assert np.abs(want - got).max() < 5e-4
    # real speech, full wav: F=1044 frames -> nb=9 -> nchunks=3, nbk=3
    long = reference_wav
    want_l = float_ref.mfcc_float(long, CFG)
    f32 = np.asarray(jax.jit(
        lambda a: pallas_mfcc.mfcc_pallas_radix2(a, CFG))(
        jnp.asarray(long[None], jnp.float32)))[0]
    assert want_l.shape == f32.shape
    assert np.abs(want_l - f32).max() < 5e-4
    i16 = np.asarray(jax.jit(
        lambda a: pallas_mfcc.mfcc_pallas_radix2(a, CFG))(
        jnp.asarray(long[None], jnp.int16)))[0]
    assert np.array_equal(f32, i16)


@pytest.mark.skipif(_backend() not in ("tpu",),
                    reason="Mosaic kernel requires a TPU backend")
def test_pallas_radix2_unbalanced_chunks(reference_wav):
    """nb=5 blocks -> nchunks=2, nbk=3 (balanced, padded final chunk):
    exercises the super-block chunking remainder path end-to-end."""
    from mfcc_tpu.ops import pallas_mfcc
    T = 512 + (5 * 128 - 1) * 170          # F = 640 frames -> nb = 5
    sig = reference_wav[:T]
    assert CFG.n_frames(T) == 640
    want = float_ref.mfcc_float(sig, CFG)
    got = np.asarray(jax.jit(
        lambda a: pallas_mfcc.mfcc_pallas_radix2(a, CFG))(
        jnp.asarray(sig[None], jnp.float32)))[0]
    assert want.shape == got.shape
    assert np.abs(want - got).max() < 5e-4


@pytest.mark.skipif(_backend() not in ("tpu",),
                    reason="Mosaic kernel requires a TPU backend")
def test_pallas_frames_float(audio_int16, reference_wav):
    """The float frames kernel (streaming/serving entry) matches the XLA
    mfcc_frames chain within the f32 gate on real speech, including a
    ragged (non-multiple-of-128) frame count."""
    from mfcc_tpu.ops import pallas_mfcc, float_ops, framing
    sig = reference_wav[: 512 + 186 * 170].astype(np.float32)
    emph = framing.preemphasis(jnp.asarray(sig)[None])
    frames = framing.extract_frames(emph, CFG.nfft, CFG.hop)   # (1, 187, 512)
    want = np.asarray(jax.jit(
        lambda f: float_ops.mfcc_frames(f, CFG))(frames))
    got = np.asarray(jax.jit(
        lambda f: pallas_mfcc.mfcc_pallas_frames_float(f, CFG))(frames))
    assert want.shape == got.shape
    assert np.abs(want - got).max() < 5e-4


@pytest.mark.skipif(_backend() not in ("tpu",),
                    reason="Mosaic kernel requires a TPU backend")
def test_pallas_fmaj(audio_int16, reference_wav):
    """Frame-major zero-relayout kernel compiled on hardware: the
    lane-offset frame-assembly stores (offsets q*hop = 0/170/340/510) are
    the Mosaic-lowering risk this test pins; gates + i16 parity as for the
    other kernels."""
    from mfcc_tpu.ops import pallas_mfcc
    sig = np.stack([audio_int16, audio_int16[::-1]]).astype(np.float32)
    got = np.asarray(jax.jit(
        lambda a: pallas_mfcc.mfcc_pallas_fmaj(a, CFG))(jnp.asarray(sig)))
    want = np.stack([float_ref.mfcc_float(sig[i], CFG) for i in range(2)])
    assert got.shape == want.shape == (2, 5, 32)
    assert np.abs(want - got).max() < 5e-4
    long = reference_wav
    want_l = float_ref.mfcc_float(long, CFG)
    f32 = np.asarray(jax.jit(
        lambda a: pallas_mfcc.mfcc_pallas_fmaj(a, CFG))(
        jnp.asarray(long[None], jnp.float32)))[0]
    assert want_l.shape == f32.shape
    assert np.abs(want_l - f32).max() < 5e-4
    i16 = np.asarray(jax.jit(
        lambda a: pallas_mfcc.mfcc_pallas_fmaj(a, CFG))(
        jnp.asarray(long[None], jnp.int16)))[0]
    assert np.array_equal(f32, i16)
