"""Interpret-mode Pallas kernel parity on CPU.

The shipped Mosaic kernels are the default batch/serving paths on TPU, but
the CPU-mesh CI cannot execute Mosaic -- so every kernel also runs here via
``pallas_call(..., interpret=True)`` (pure-JAX emulation) on small shapes,
asserting the SAME gates as the TPU suite: bit-exact for INT, 5e-4 vs the
float64 oracle for float.  This is the run-anywhere simulator-testing role
of the reference (its nMigen simulator is the fake hardware, SURVEY.md
section 4.8); closes round-2 VERDICT missing item 5 / weak item 5.
"""

import numpy as np
import pytest
import jax

from mfcc_tpu.config import MFCCConfig
from mfcc_tpu.ref import float_ref, int_ref
from mfcc_tpu.ops import pallas_mfcc, pallas_int

CFG = MFCCConfig()


@pytest.fixture(scope="module")
def cpu():
    return jax.devices("cpu")[0]


@pytest.fixture(scope="module")
def sig2(audio_int16):
    """Two streams, ~7 frames each: the bundled rich signal + a shifted copy
    (covers the nchunks=1 whole-stream super-block path on small shapes)."""
    a = audio_int16.astype(np.float32)
    b = np.roll(a, 250) * 0.7
    return np.stack([a, np.round(b)])


def _float_want(sig):
    return np.stack([float_ref.mfcc_float(sig[i], CFG)
                     for i in range(sig.shape[0])])


def _int_want(sig):
    return np.stack([int_ref.mfcc_int(sig[i].astype(np.int64), CFG)
                     for i in range(sig.shape[0])])


def test_interpret_float_radix2(cpu, sig2):
    with jax.default_device(cpu):
        got = np.asarray(pallas_mfcc.mfcc_pallas_radix2(
            sig2, CFG, interpret=True))
    assert np.abs(got - _float_want(sig2)).max() < 5e-4
    # int16 wire input is bit-identical to the f32 route on integer samples
    with jax.default_device(cpu):
        got16 = np.asarray(pallas_mfcc.mfcc_pallas_radix2(
            sig2.astype(np.int16), CFG, interpret=True))
    assert np.array_equal(got, got16)


@pytest.mark.parametrize("passes", [3, 4])
def test_interpret_float_radix2_fast_mode(cpu, sig2, passes):
    """dft_passes=3 (the opt-in +26% fast mode, docs/BENCH.md round 4g)
    and the 4-pass limb form (the extra lo*lo dot -- same accuracy class,
    round-4 ADVICE coverage gap): both reduced-pass split-DFT branches
    must hold a 2e-3 gate -- looser than the 5e-4 contract (which is why
    they are never the default), far tighter than the reference RTL's
    fixed-point error.  Exercised through the supported per-call
    parameter, not the module default."""
    with jax.default_device(cpu):
        got = np.asarray(pallas_mfcc.mfcc_pallas_radix2(
            sig2, CFG, interpret=True, dft_passes=passes))
    assert np.abs(got - _float_want(sig2)).max() < 2e-3


def test_interpret_float_recomp_t(cpu, sig2):
    with jax.default_device(cpu):
        got = np.asarray(pallas_mfcc.mfcc_pallas_recomp_t(
            sig2, CFG, interpret=True))
    assert np.abs(got - _float_want(sig2)).max() < 5e-4


def test_interpret_float_ladder(cpu, sig2):
    """The f32 block-ladder kernel (ops/pallas_fladder, round 5i -- the
    shipped precision="highest" batch default on TPU): the ladder rounds
    like a plain f32 FFT, so the interpret (pure-f32) error is ~1e-5,
    an order of magnitude inside the 5e-4 contract (the split-DFT
    kernel's bf16-limb error term does not exist here)."""
    from mfcc_tpu.ops import pallas_fladder
    with jax.default_device(cpu):
        got = np.asarray(pallas_fladder.mfcc_float_ladder_pallas(
            sig2, CFG, interpret=True))
    assert np.abs(got - _float_want(sig2)).max() < 5e-5   # 10x headroom


def test_interpret_float_ladder_nfft256(cpu):
    """The ladder kernel generalizes over the evenodd8 nfft family; check
    the 256-point geometry (L=8, different regroup m) against the
    oracle."""
    from mfcc_tpu.config import MFCCConfig
    from mfcc_tpu.ops import pallas_fladder
    cfg = MFCCConfig(nfft=256, step=86)
    assert pallas_fladder.pallas_fladder_config_ok(cfg)
    # rich tonal fixture (the bench's make_audio shape): flat white noise
    # at nfft=256 leaves near-zero mel bins whose log2 is ill-conditioned
    # for EVERY float formulation (the XLA chain shows 1e-3 there too)
    rng = np.random.default_rng(5)
    T = 256 + 9 * 86
    t = np.arange(T) / 16000.0
    base = (9000 * np.sin(2 * np.pi * (200 + 3000 * t) * t)
            + 4000 * np.sin(2 * np.pi * 900 * t))
    sig = np.round(np.clip(base[None] + rng.integers(-1500, 1500, (2, T)),
                           -32768, 32767)).astype(np.float32)
    want = np.stack([float_ref.mfcc_float(sig[i], cfg) for i in range(2)])
    with jax.default_device(cpu):
        got = np.asarray(pallas_fladder.mfcc_float_ladder_pallas(
            sig, cfg, interpret=True))
    assert np.abs(got - want).max() < 5e-5


def test_interpret_float_frames(cpu, sig2):
    from mfcc_tpu.ops import framing
    emph = framing.preemphasis(np.asarray(sig2, np.float32))
    frames = framing.extract_frames(emph, CFG.nfft, CFG.hop)
    with jax.default_device(cpu):
        got = np.asarray(pallas_mfcc.mfcc_pallas_frames_float(
            frames, CFG, interpret=True))
    assert np.abs(got - _float_want(sig2)).max() < 5e-4


def test_interpret_int_v3(cpu, sig2):
    with jax.default_device(cpu):
        got = np.asarray(pallas_int.mfcc_int_pallas_v3(
            sig2.astype(np.int32), CFG, interpret=True))
    assert np.array_equal(got, _int_want(sig2))


def test_interpret_int_v3_alt_limb_radix(cpu, sig2):
    """The non-default filterbank limb radix (7-bit int8 vs the shipped
    8-bit bf16, pallas_int.FB_LIMB_BITS) must stay bit-exact too -- both
    are measured equal on TPU (docs/BENCH.md round 3e) and the flag flips
    the limb tables AND the in-kernel power-limb extraction together."""
    alt = 7 if pallas_int.FB_LIMB_BITS == 8 else 8
    saved = pallas_int.FB_LIMB_BITS
    pallas_int._fb_limb_matrix.cache_clear()
    try:
        pallas_int.FB_LIMB_BITS = alt
        with jax.default_device(cpu):
            got = np.asarray(pallas_int.mfcc_int_pallas_v3(
                sig2.astype(np.int32), CFG, interpret=True))
        assert np.array_equal(got, _int_want(sig2))
    finally:
        pallas_int.FB_LIMB_BITS = saved
        pallas_int._fb_limb_matrix.cache_clear()


@pytest.mark.parametrize("thr", [None, 8])
def test_interpret_int_v3_slice_thresholds(cpu, sig2, thr):
    """Non-default slice-form thresholds stay bit-exact: None = the pure
    roll+select ladder, 8 = slice-form down to the sub-vreg boundary (the
    shipped default is 16; chip A/B round 5c measured all within ~2%).
    LADDER_BLOCKS is forced off so the roll/slice stage loop actually
    executes (the shipped block form dispatches before it)."""
    saved = pallas_int.SLICE_MIN_STRIDE
    saved_b = pallas_int.LADDER_BLOCKS
    try:
        pallas_int.SLICE_MIN_STRIDE = thr
        pallas_int.LADDER_BLOCKS = False
        with jax.default_device(cpu):
            got = np.asarray(pallas_int.mfcc_int_pallas_v3(
                sig2.astype(np.int32), CFG, interpret=True))
        assert np.array_equal(got, _int_want(sig2))
    finally:
        pallas_int.SLICE_MIN_STRIDE = saved
        pallas_int.LADDER_BLOCKS = saved_b


@pytest.mark.parametrize("blocks", [True, False])
def test_interpret_int_v3_ladder_blocks(cpu, sig2, blocks):
    """The block-form ladder (LADDER_BLOCKS, the shipped default -- chip
    A/B round 5g: 40.3 vs 37.4 Mf/s) and the roll/slice fallback are both
    bit-exact vs the oracle; both forms must stay green since non-evenodd8
    sizes (the 64-pt DCT half) always take the fallback."""
    saved = pallas_int.LADDER_BLOCKS
    try:
        pallas_int.LADDER_BLOCKS = blocks
        with jax.default_device(cpu):
            got = np.asarray(pallas_int.mfcc_int_pallas_v3(
                sig2.astype(np.int32), CFG, interpret=True))
        assert np.array_equal(got, _int_want(sig2))
    finally:
        pallas_int.LADDER_BLOCKS = saved


def test_interpret_int_v3_pack32(cpu, sig2):
    """The packed-int32 ingest (host transposes sample PAIRS; the kernel
    unpacks with shifts and runs a split even/odd pre-emphasis) is
    bit-identical to the default i16 ingest.  Default off: measured a
    chip loss (docs/BENCH.md round 5c)."""
    with jax.default_device(cpu):
        got = np.asarray(pallas_int.mfcc_int_pallas_v3(
            sig2.astype(np.int32), CFG, interpret=True, pack32=True))
    assert np.array_equal(got, _int_want(sig2))


def test_interpret_int_frames(cpu, sig2):
    from mfcc_tpu.ops import framing
    emph = framing.preemphasis_int(sig2.astype(np.int32))
    frames = framing.extract_frames(emph, CFG.nfft, CFG.hop)
    with jax.default_device(cpu):
        got = np.asarray(pallas_int.mfcc_int_pallas_frames(
            frames, CFG, interpret=True))
    assert np.array_equal(got, _int_want(sig2))


def test_interpret_float_radix2_operator_layouts_agree(cpu, sig2):
    """Both split-DFT operator layouts (R2_PACK256: packed 256-row
    two-M-tile vs original 272-row) compute the same products -- outputs
    agree to f32 noise (the only math difference is the old bin-128 path's
    ~1e-16 cos(pi/2) twiddle) and both hold the oracle gate."""
    from mfcc_tpu.ref import float_ref
    want = float_ref.mfcc_float(np.asarray(sig2[0], np.float64), CFG)
    outs = {}
    for packed in (True, False):
        with jax.default_device(cpu):
            outs[packed] = np.asarray(pallas_mfcc.mfcc_pallas_radix2(
                sig2.astype(np.float32), CFG, interpret=True,
                pack256=packed))
        assert np.abs(outs[packed][0] - want).max() < 5e-4
    assert np.abs(outs[True] - outs[False]).max() < 1e-5


def test_interpret_float_fmaj(cpu, sig2):
    """The zero-relayout frame-major kernel: oracle gate, i16-ingest
    bit-parity with the f32 route, multi-block path, and the mel_floor
    silence clamp."""
    with jax.default_device(cpu):
        got = np.asarray(pallas_mfcc.mfcc_pallas_fmaj(
            sig2, CFG, interpret=True))
        want = _float_want(sig2)
        assert got.shape == want.shape
        assert np.abs(got - want).max() < 5e-4
        i16 = np.asarray(pallas_mfcc.mfcc_pallas_fmaj(
            sig2.astype(np.int16), CFG, interpret=True))
        assert np.array_equal(got, i16)
        # multi-block: small bf so nblocks > 1 on the short fixture
        mb = np.asarray(pallas_mfcc.mfcc_pallas_fmaj(
            sig2, CFG, bf=4, interpret=True))
        # block size changes matmul tiling, not values beyond f32 noise
        assert np.abs(got - mb[:, : got.shape[1]]).max() < 1e-4
        # silence clamp: an all-zero stream yields exactly-zero cepstra
        silent = np.zeros((1, sig2.shape[1]), np.float32)
        fl = np.asarray(pallas_mfcc.mfcc_pallas_fmaj(
            silent, CFG, interpret=True, mel_floor=1.0))
        assert np.isfinite(fl).all() and np.abs(fl).max() == 0.0


def test_interpret_f64ish_fused(cpu, sig2):
    """The fused compensated double-f32 kernel (ops/pallas_df32, round-4
    VERDICT weak #3 / next #6): the elementwise max(1e-5, 2 ulp) gate vs
    the float64 oracle -- the same contract as the staged-XLA formulation
    (ops/df32.py), which it replaces on TPU at ~8x the throughput.  Also:
    frames-entry parity with the batch wrapper and a non-128-multiple
    frame count (padding path)."""
    from mfcc_tpu.ops import pallas_df32

    want = _float_want(sig2)
    with jax.default_device(cpu):
        got = np.asarray(pallas_df32.mfcc_f64ish_pallas(
            sig2, CFG, interpret=True))
    tol = np.maximum(1e-5, 2 * np.abs(want) * np.finfo(np.float32).eps)
    assert (np.abs(want - got) / tol).max() <= 1.0

    # frames entry == batch wrapper on the same frames (shared tail)
    from mfcc_tpu.ops import framing
    emph = np.asarray(framing.preemphasis(sig2.astype(np.float32)))
    frames = np.asarray(framing.extract_frames(emph, CFG.nfft, CFG.hop))
    with jax.default_device(cpu):
        got_f = np.asarray(pallas_df32.mfcc_f64ish_pallas_frames(
            frames, CFG, interpret=True))
    assert np.array_equal(got, got_f)
