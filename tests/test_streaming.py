"""Streaming == batch, for adversarial chunkings, resets, and both paths.

The TPU restatement of the reference's randomized-backpressure Frame benches
(mfcc/core/frame.py:157-255): any chunk boundary placement must be invisible
in the output."""

import numpy as np
import jax.numpy as jnp
import pytest

from mfcc_tpu import MFCC, MFCCConfig
from mfcc_tpu.streaming import StreamingMFCC
from mfcc_tpu.ref import int_ref

CFG = MFCCConfig()


def _batch_float(sig):
    return np.asarray(MFCC(CFG)(jnp.asarray(sig)))


def test_streaming_equals_batch_float(audio_int16):
    sig = audio_int16            # 1192 samples -> 5 frames
    want = _batch_float(sig)
    sm = StreamingMFCC(CFG)
    outs, state = sm.process(sig[None, :].repeat(2, 0), chunk_size=149)
    # 1192//149 = 8 chunks = 1192 samples exactly? 8*149=1192 yes
    for s in range(2):
        got = outs[s]
        assert got.shape == want.shape
        assert np.abs(got - want).max() < 1e-3


def test_streaming_equals_batch_int(audio_int16):
    sig = audio_int16.astype(np.int64)
    want = int_ref.mfcc_int(sig, CFG)
    sm = StreamingMFCC(CFG, int_path=True)
    outs, _ = sm.process(sig[None, :], chunk_size=298)  # 4 chunks of 298
    got = outs[0]
    n = got.shape[0]
    assert n >= want.shape[0] - 1  # tail samples may not fill the last frame
    assert np.array_equal(got, want[:n])


def test_reset_protocol(audio_int16):
    """A reset flag mid-stream restarts framing exactly as a fresh stream
    (the 0x80000000 soft-reset, software/main.c:21-34)."""
    sig = audio_int16
    sm = StreamingMFCC(CFG)
    S, C = 1, 298
    state = sm.init(S)
    nchunks = len(sig) // C
    collected = []
    for ci in range(nchunks):
        chunk = sig[None, ci * C:(ci + 1) * C]
        reset = np.array([ci == 2])   # reset before chunk 2
        feats, mask, state = sm.step(chunk, state, reset)
        collected.append(np.asarray(feats)[0][np.asarray(mask)[0]])
    got_after = np.concatenate(collected[2:])
    # expected: a fresh stream consisting of the post-reset samples
    fresh = sig[2 * C: nchunks * C]
    want = _batch_float(fresh)
    assert got_after.shape == want.shape
    assert np.abs(got_after - want).max() < 1e-3


def test_streaming_chunkings_agree(audio_int16):
    """Two different chunk sizes produce identical frame streams."""
    sig = audio_int16.astype(np.int64)
    sm = StreamingMFCC(CFG, int_path=True)
    a, _ = sm.process(sig[None, :1100], chunk_size=100)   # 11 chunks
    b, _ = sm.process(sig[None, :1100], chunk_size=550)   # 2 chunks
    assert np.array_equal(a[0], b[0])


def test_state_is_checkpointable(audio_int16):
    """Stop mid-stream, round-trip the state through numpy, resume."""
    sig = audio_int16
    sm = StreamingMFCC(CFG)
    C = 298
    state = sm.init(1)
    feats = []
    for ci in range(2):
        f, m, state = sm.step(sig[None, ci * C:(ci + 1) * C], state)
        feats.append(np.asarray(f)[0][np.asarray(m)[0]])
    # checkpoint = plain arrays
    ckpt = tuple(np.asarray(x) for x in state)
    state2 = type(state)(*(jnp.asarray(x) for x in ckpt))
    for ci in range(2, 4):
        f, m, state2 = sm.step(sig[None, ci * C:(ci + 1) * C], state2)
        feats.append(np.asarray(f)[0][np.asarray(m)[0]])
    got = np.concatenate(feats)
    want = _batch_float(sig[: 4 * C])
    assert got.shape == want.shape
    assert np.abs(got - want).max() < 1e-3
