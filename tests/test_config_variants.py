"""Non-default configurations: the mic target (16 cepstra), the core default
(16 mel filters), other FFT sizes -- oracle-level (fast) plus one jax parity
run at the mic config."""

import numpy as np
import pytest

from mfcc_tpu import MFCC, MFCCConfig, MIC_CONFIG
from mfcc_tpu.ref import int_ref, float_ref
from mfcc_tpu import tables


def test_mic_config_jax_parity(audio_int16):
    sig = audio_int16.astype(np.int64)
    want = int_ref.mfcc_int(sig, MIC_CONFIG)
    got = np.asarray(MFCC(MIC_CONFIG).int(sig))
    assert want.shape[1] == 16
    assert np.array_equal(want, got)


def test_core_default_16_filters_oracle(audio_int16):
    """MFCC core defaults: nfilters=16, nceptrums=16 (mfcc.py:20-21)."""
    cfg = MFCCConfig(nfilters=16, nceptrums=16)
    out = int_ref.mfcc_int(audio_int16.astype(np.int64), cfg)
    assert out.shape == (5, 16)
    outf = float_ref.mfcc_float(audio_int16, cfg)
    assert outf.shape == (5, 16)
    # filterbank tables are consistent at ntap=16
    seq = int_ref.filterbank_int_sequential(
        np.abs(audio_int16[:256]).astype(np.int64) << 10, ntap=16)
    mat = int_ref.filterbank_int(
        np.abs(audio_int16[:256]).astype(np.int64) << 10, ntap=16)
    assert np.array_equal(seq, mat) and len(seq) == 16


def test_nfft_256_oracle():
    """Alternate FFT size exercises every table generator's parametricity."""
    cfg = MFCCConfig(nfft=256, nfilters=16, nceptrums=8)
    rng = np.random.default_rng(3)
    sig = rng.integers(-20000, 20000, 256 + 3 * cfg.hop)
    out = int_ref.mfcc_int(sig, cfg)
    assert out.shape == (4, 8)
    outf = float_ref.mfcc_float(sig, cfg)
    assert outf.shape == (4, 8)
    # window curve reconstructs the 256-pt hamming
    curve = tables.int_window_curve(256, 8)
    ideal = tables.float_window(256) * 511
    assert np.abs(curve - ideal).max() < 3


def test_streaming_state_checkpoint_file(tmp_path, audio_int16):
    from mfcc_tpu.streaming import StreamingMFCC, save_state, load_state
    sm = StreamingMFCC(MFCCConfig())
    state = sm.init(2)
    f, m, state = sm.step(np.stack([audio_int16[:298]] * 2), state)
    p = str(tmp_path / "ckpt")
    save_state(p, state)
    state2 = load_state(p)
    for a, b in zip(state, state2):
        assert np.array_equal(np.asarray(a), np.asarray(b))


def test_windowlen_zero_pad_mode(audio_int16):
    """Frame's windowlen < nfft zero-pad mode (frame.py:77,120), exposed via
    window_samples: batch AND streaming match the oracle element-exactly
    (closes the round-1 coverage caveat on the Frame component)."""
    cfg = MFCCConfig(window_samples=340)          # < nfft=512
    sig = audio_int16.astype(np.int64)            # 1192 samples
    want = int_ref.mfcc_int(sig, cfg)
    assert want.shape[0] == (len(sig) - 340) // cfg.hop + 1   # 6 frames
    got = np.asarray(MFCC(cfg).int(sig))
    assert np.array_equal(want, got)

    from mfcc_tpu.streaming import StreamingMFCC
    sm = StreamingMFCC(cfg, int_path=True)
    outs, state = sm.process(sig[None], chunk_size=299)
    assert np.array_equal(outs[0], want)
    assert int(np.asarray(state.count)[0]) == len(sig) - want.shape[0] * cfg.hop

    # float path: frames beyond windowlen enter the window/DFT as zeros
    outf = np.asarray(MFCC(cfg)(sig.astype(np.float32)))
    assert outf.shape == want.shape
    assert np.isfinite(outf).all()


def test_mic_config_float_kernel_parity(audio_int16):
    """Float path at the mic config (16 cepstra) -- on TPU this routes
    through the radix-2 kernel with a non-default output height."""
    sig = audio_int16.astype(np.float32)
    want = float_ref.mfcc_float(sig, MIC_CONFIG)
    got = np.asarray(MFCC(MIC_CONFIG)(sig))
    assert want.shape == got.shape == (5, 16)
    assert np.abs(want - got).max() < 5e-4
