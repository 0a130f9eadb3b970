"""Fused streaming-step kernel parity (interpret mode on CPU + TPU-gated).

The fused kernels must reproduce the multi-stage XLA streaming step
(streaming._chunk_step_batch + features) over a multi-step run with
per-stream phase drift and mid-stream resets:

  * the carry buffer, counts and masks: BIT-IDENTICAL (both paths)
  * INT features on valid slots: element-exact
  * float features on valid slots: within the cross-factorization gate
    (radix-2 split vs full f32-HIGHEST DFT, both 1.5e-4 clean vs the
    float64 oracle)
"""

import functools

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mfcc_tpu.config import MFCCConfig
from mfcc_tpu import streaming
from mfcc_tpu.ops import framing, float_ops, int_ops, pallas_stream

CFG = MFCCConfig()
P = CFG.nfft - 1


def _xla_step(chunks, state, reset, *, int_path):
    if int_path:
        emphasize = functools.partial(framing.preemphasis_int, width=CFG.width)
        frames, mask, ns = streaming._chunk_step_batch(
            chunks, state, reset, CFG, emphasize, jnp.int32)
        return int_ops.mfcc_int_frames(frames, CFG), mask, ns
    frames, mask, ns = streaming._chunk_step_batch(
        chunks, state, reset, CFG, framing.preemphasis, jnp.float32)
    return float_ops.mfcc_frames(frames, CFG), mask, ns


def _fused_step(chunks, state, reset, *, int_path, interpret):
    kern = (pallas_stream.stream_step_int if int_path
            else pallas_stream.stream_step_float)
    count = jnp.where(reset, 0, state.count)
    prev = jnp.where(reset, jnp.zeros_like(state.prev), state.prev)
    feats, newbuf = kern(state.buffer, chunks, P - count, prev, CFG,
                         interpret=interpret)
    C = chunks.shape[1]
    total = count + C
    n_valid = jnp.maximum((total - CFG.windowlen) // CFG.hop + 1, 0)
    mask = (jnp.arange(feats.shape[1], dtype=jnp.int32)[None, :]
            < n_valid[:, None])
    new_count = (total - n_valid * CFG.hop).astype(jnp.int32)
    new_prev = chunks[:, -1].astype(state.prev.dtype)
    return feats, mask, streaming.StreamState(newbuf, new_count, new_prev)


def _run_parity(int_path, interpret, n_streams=3, C=600, steps=4):
    """Multi-step run; stream phases diverge via a mid-run reset subset."""
    rng = np.random.default_rng(42)
    dtype = np.int64 if int_path else np.float32
    sdtype = jnp.int32 if int_path else jnp.float32
    state_x = streaming.init_state(n_streams, CFG, sdtype)
    state_f = streaming.init_state(n_streams, CFG, sdtype)
    for step in range(steps):
        chunks = jnp.asarray(
            rng.integers(-25000, 25000, (n_streams, C)).astype(dtype), sdtype)
        reset = np.zeros(n_streams, bool)
        if step == 2:
            reset[::2] = True          # desynchronize the carry phases
        reset = jnp.asarray(reset)
        fx, mx, state_x = _xla_step(chunks, state_x, reset, int_path=int_path)
        ff, mf, state_f = _fused_step(chunks, state_f, reset,
                                      int_path=int_path, interpret=interpret)
        mx, mf = np.asarray(mx), np.asarray(mf)
        assert np.array_equal(mx, mf), f"mask mismatch at step {step}"
        # carry state: bit-identical in both paths
        assert np.array_equal(np.asarray(state_x.buffer),
                              np.asarray(state_f.buffer)), f"step {step}"
        assert np.array_equal(np.asarray(state_x.count),
                              np.asarray(state_f.count))
        assert np.array_equal(np.asarray(state_x.prev),
                              np.asarray(state_f.prev))
        fx, ff = np.asarray(fx), np.asarray(ff)
        if int_path:
            assert np.array_equal(fx[mx], ff[mf]), f"step {step}"
        elif mx.any():                 # step 0 may complete zero frames
            assert np.abs(fx[mx] - ff[mf]).max() < 1e-3, f"step {step}"


def test_stream_transposed_state_int16_interpret():
    """The production serving shape -- carry stored (P, S), int16 wire
    chunks -- is numerically IDENTICAL to the plain (S, P)/f32-int32 path
    (same kernel, only layout/ingest dtype differ)."""
    cpu = jax.devices("cpu")[0]
    rng = np.random.default_rng(7)
    S, C = 3, 700
    chunks = rng.integers(-25000, 25000, (S, C))
    for int_path in (True, False):
        kern = (pallas_stream.stream_step_int if int_path
                else pallas_stream.stream_step_float)
        sdt = jnp.int32 if int_path else jnp.float32
        buf = jnp.asarray(rng.integers(-100, 100, (S, P)), sdt)
        start = jnp.asarray([0, 170, 511], jnp.int32)
        prev = jnp.asarray([0, 5, -7], sdt)
        with jax.default_device(cpu):
            f0, b0 = kern(buf, jnp.asarray(chunks, sdt), start, prev, CFG,
                          interpret=True)
            f1, b1 = kern(buf.T, jnp.asarray(chunks, jnp.int16), start,
                          prev, CFG, interpret=True, transposed_state=True)
        # streams 0/1 have in-range starts; stream 2 tests the max offset
        assert np.array_equal(np.asarray(f0), np.asarray(f1))
        assert np.array_equal(np.asarray(b0), np.asarray(b1).T)


def test_stream_kernel_narrow_lane_interpret():
    """Long chunks auto-halve the stream-block lane count (C=2048 at
    bs=128 blew the 16 MB scoped-VMEM budget); the narrow-lane path
    reshapes the stream axis into the grid and must stay exact."""
    assert pallas_stream._block_streams(CFG, 2048) < pallas_stream.BS
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        _run_parity(int_path=True, interpret=True, C=2048, steps=2)


def test_stream_kernel_float_interpret():
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        _run_parity(int_path=False, interpret=True)


def test_stream_kernel_int_interpret():
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        _run_parity(int_path=True, interpret=True)


@pytest.mark.skipif(jax.default_backend() != "tpu", reason="needs TPU")
def test_stream_kernel_compiled_tpu():
    """Compiled Mosaic run, bigger stream block (exercises stream padding
    and the multi-block grid), both dtypes."""
    _run_parity(int_path=True, interpret=False, n_streams=130, C=400,
                steps=3)
    _run_parity(int_path=False, interpret=False, n_streams=130, C=400,
                steps=3)


@pytest.mark.skipif(jax.default_backend() != "tpu", reason="needs TPU")
def test_stream_kernel_narrow_lane_compiled_tpu():
    """C=2048 (the round-3 Mosaic scoped-VMEM OOM shape) must compile and
    stay exact on the chip via the bs=64 narrow-lane path."""
    _run_parity(int_path=True, interpret=False, n_streams=70, C=2048,
                steps=2)


@pytest.mark.skipif(jax.default_backend() != "tpu", reason="needs TPU")
def test_streaming_class_routes_fused_tpu(audio_int16):
    """StreamingMFCC's full-chunk step must route through the fused kernel
    on TPU (and stay exact vs the batch INT pipeline)."""
    from mfcc_tpu.streaming import StreamingMFCC
    from mfcc_tpu.ref import int_ref
    sm = StreamingMFCC(CFG, int_path=True)
    assert sm._fused_jit is not None
    sig = audio_int16.astype(np.int64)
    want = int_ref.mfcc_int(sig, CFG)
    outs, _ = sm.process(sig[None], chunk_size=298)
    assert np.array_equal(outs[0], want[: outs[0].shape[0]])


def test_stream_kernel_chunk_layouts_agree():
    """Both chunk ingestion layouts (STREAM_CHUNK_T: stream-major blocks
    transposed in VMEM vs the original host-side XLA transpose) stay
    bit-identical on the INT path and pass the float parity gates --
    the flag only moves WHERE the relayout happens."""
    cpu = jax.devices("cpu")[0]
    saved = pallas_stream.STREAM_CHUNK_T
    try:
        pallas_stream.STREAM_CHUNK_T = not saved
        with jax.default_device(cpu):
            _run_parity(int_path=True, interpret=True)
            _run_parity(int_path=False, interpret=True)
    finally:
        pallas_stream.STREAM_CHUNK_T = saved


def test_stream_float_kernel_mel_floor_interpret():
    """The fused float kernel honors mel_floor: a silent stream produces
    finite (all-zero) features instead of -inf (the serving silence
    contract), and a loud stream is unaffected by the clamp."""
    cpu = jax.devices("cpu")[0]
    rng = np.random.default_rng(11)
    S, C = 2, 852                       # 512 + 2*170: 3 frames when primed
    chunks = np.zeros((S, C), np.float32)
    chunks[1] = rng.integers(-8000, 8000, C)
    buf = np.zeros((S, P), np.float32)
    buf[1] = rng.integers(-8000, 8000, P)   # loud carry: no near-silent frame
    buf = jnp.asarray(buf)
    start = jnp.zeros((S,), jnp.int32)  # buffer fully primed (count = P)
    prev = jnp.zeros((S,), jnp.float32)
    with jax.default_device(cpu):
        f0, _ = pallas_stream.stream_step_float(
            buf, jnp.asarray(chunks), start, prev, CFG, interpret=True)
        f1, _ = pallas_stream.stream_step_float(
            buf, jnp.asarray(chunks), start, prev, CFG, interpret=True,
            mel_floor=1.0)
    f0, f1 = np.asarray(f0), np.asarray(f1)
    assert not np.isfinite(f0[0]).all()          # spec: log2(0) = -inf
    assert np.isfinite(f1).all()
    assert np.abs(f1[0]).max() == 0.0            # log2(max(0,1)) = 0
    assert np.abs(f0[1] - f1[1]).max() == 0.0    # loud stream untouched


def test_stream_kernel_positions_layout_agrees():
    """The relayout-free "positions" chunk ingest (caller supplies (C, S))
    is bit-identical (INT) / gate-identical (float) to the stream-major
    default: the layout only moves WHO builds the time-major buffer."""
    cpu = jax.devices("cpu")[0]
    rng = np.random.default_rng(21)
    S, C = 3, 700
    chunks = rng.integers(-25000, 25000, (S, C))
    for int_path in (True, False):
        kern = (pallas_stream.stream_step_int if int_path
                else pallas_stream.stream_step_float)
        sdt = jnp.int32 if int_path else jnp.float32
        buf = jnp.asarray(rng.integers(-100, 100, (S, P)), sdt)
        start = jnp.asarray([0, 170, 511], jnp.int32)
        prev = jnp.asarray([0, 5, -7], sdt)
        with jax.default_device(cpu):
            f0, b0 = kern(buf, jnp.asarray(chunks, sdt), start, prev, CFG,
                          interpret=True)
            f1, b1 = kern(buf.T, jnp.asarray(chunks.T, jnp.int16), start,
                          prev, CFG, interpret=True, transposed_state=True,
                          chunk_layout="positions")
        assert np.array_equal(np.asarray(f0), np.asarray(f1))
        assert np.array_equal(np.asarray(b0), np.asarray(b1).T)


def test_streaming_transposed_chunks_end_to_end():
    """StreamingMFCC(transposed_chunks=True) equals the plain orientation
    through process() on both paths (fused unavailable on CPU -> exercises
    the internal transpose fallback; the fused path parity is the kernel
    test above)."""
    from mfcc_tpu.streaming import StreamingMFCC
    rng = np.random.default_rng(5)
    sig = rng.integers(-20000, 20000, (2, 1192)).astype(np.int64)
    want, _ = StreamingMFCC(CFG, int_path=True).process(sig, chunk_size=298)
    got, _ = StreamingMFCC(CFG, int_path=True,
                           transposed_chunks=True).process(sig,
                                                           chunk_size=298)
    for w, g in zip(want, got):
        assert np.array_equal(w, g)
