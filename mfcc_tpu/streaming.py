"""Stateful multi-stream chunked streaming API.

The reference is a streaming device: samples trickle in over USB3/UART, the
Frame stage's ring buffer re-reads windowlen-stepsize overlap samples per
frame (mfcc/core/frame.py:86-114), Preemph carries one previous sample
(preemph.py:20-27), and the host can soft-reset the pipeline mid-stream by
sending 0x80000000 (software/main.c:21-34, targets/wav2mfcc.py:27-36).

TPU-native equivalent: the per-stream state is an explicit pytree the caller
owns (trivially checkpointable -- a capability the reference lacks), and a
chunk step is a jit-compiled function with static chunk size:

    state  = init_state(n_streams)
    feats, mask, state = stream.step(chunks, state, reset=flags)

Invariant: the carry buffer holds, right-aligned, exactly the emphasized
samples from the next unemitted frame's start onward (count <= nfft-1), so
chunked processing is sample-exact equal to whole-signal batch processing
for ANY chunking -- the property the reference exercises with its five
randomized-backpressure Frame benches (frame.py:157-255), asserted here as
tests/test_streaming.py.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from .config import MFCCConfig
from .ops import float_ops, int_ops, framing


class StreamState(NamedTuple):
    """Per-stream carry (a pytree; checkpoint/restore = save/load it)."""
    buffer: jnp.ndarray   # (S, nfft-1) right-aligned emphasized samples
    count: jnp.ndarray    # (S,) int32 valid samples in buffer (from the right)
    prev: jnp.ndarray     # (S,) previous raw sample (pre-emphasis carry)


def init_state(n_streams: int, cfg: MFCCConfig = MFCCConfig(),
               dtype=jnp.float32) -> StreamState:
    return StreamState(
        buffer=jnp.zeros((n_streams, cfg.nfft - 1), dtype),
        count=jnp.zeros((n_streams,), jnp.int32),
        prev=jnp.zeros((n_streams,), dtype),
    )


def max_frames_per_chunk(chunk_size: int, cfg: MFCCConfig) -> int:
    """Static bound on frames a chunk can complete: carry holds at most
    nfft-1 samples, so at most (nfft-1 + chunk - nfft)//hop + 1."""
    return (chunk_size - 1) // cfg.hop + 1


def _gather_frames(buf: jnp.ndarray, start0: jnp.ndarray, n_frames: int,
                   nfft: int, hop: int) -> jnp.ndarray:
    """n_frames dynamic slices of length nfft starting at start0 + k*hop.
    buf: (L,), start0: scalar -> (n_frames, nfft)."""
    starts = start0 + hop * jnp.arange(n_frames, dtype=jnp.int32)
    # clamp so padding frames read in-bounds (they are masked out)
    starts = jnp.minimum(starts, buf.shape[0] - nfft)
    return jax.vmap(
        lambda s: jax.lax.dynamic_slice_in_dim(buf, s, nfft))(starts)


def _chunk_step(chunk, state: StreamState, reset, cfg: MFCCConfig,
                emphasize, dtype):
    """One chunk for one stream: returns (frames, mask, new_state).

    chunk: (C,) raw samples; reset: scalar bool (the 0x80000000 protocol:
    reset is consumed BEFORE the chunk's samples, like the control word
    preceding the data words in software/main.c:107-151)."""
    C = chunk.shape[0]
    nfft, hop = cfg.nfft, cfg.hop
    P = nfft - 1
    F = max_frames_per_chunk(C, cfg)

    count = jnp.where(reset, 0, state.count)
    prev = jnp.where(reset, jnp.zeros_like(state.prev), state.prev)
    buffer = state.buffer  # stale contents are invalidated by count=0

    emph = emphasize(chunk[None, :], prev[None])[0].astype(dtype)
    buf = jnp.concatenate([buffer, emph])          # (P + C,)
    start0 = P - count                              # first unframed sample

    total = count + C
    n_valid = jnp.maximum((total - nfft) // hop + 1, 0)
    frames = _gather_frames(buf, start0, F, nfft, hop)
    mask = jnp.arange(F, dtype=jnp.int32) < n_valid

    new_count = total - n_valid * hop               # always <= nfft-1
    new_state = StreamState(buffer=buf[C:], count=new_count.astype(jnp.int32),
                            prev=chunk[-1].astype(state.prev.dtype))
    return frames, mask, new_state


class StreamingMFCC:
    """Multi-stream streaming front-end.

    float path by default; ``int_path=True`` gives the bit-exact fixed-point
    pipeline (int32 state and arithmetic; x64 only for exotic filterbank
    layouts outside the reference config family).
    """

    def __init__(self, cfg: MFCCConfig = MFCCConfig(), *, int_path: bool = False,
                 method: str = "dft", precision: str = "highest",
                 dtype=jnp.float32):
        self.cfg = cfg
        self.int_path = int_path
        self.dtype = jnp.int32 if int_path else dtype

        if int_path:
            emphasize = framing.preemphasis_int
            features = functools.partial(int_ops.mfcc_int_frames, cfg=cfg)
        else:
            emphasize = framing.preemphasis
            features = functools.partial(
                float_ops.mfcc_frames, cfg=cfg, method=method,
                precision=precision, dtype=dtype)

        step_dtype = self.dtype

        def step(chunks, state, reset):
            frames, mask, new_state = jax.vmap(
                lambda c, s_b, s_c, s_p, r: _chunk_step(
                    c, StreamState(s_b, s_c, s_p), r, cfg, emphasize,
                    step_dtype)
            )(chunks, state.buffer, state.count, state.prev, reset)
            feats = features(frames)
            return feats, mask, StreamState(*new_state)

        if int_path and not int_ops._fb_int32_layout_ok(cfg):
            _jit = jax.jit(step)

            def step_x64(chunks, state, reset):
                with jax.enable_x64():
                    return _jit(chunks, state, reset)
            self._step = step_x64
        else:
            self._step = jax.jit(step)

    def init(self, n_streams: int) -> StreamState:
        return init_state(n_streams, self.cfg, self.dtype)

    def step(self, chunks, state: StreamState, reset=None):
        """Process one chunk per stream.

        chunks: (S, C) raw samples (any C >= 1; each distinct C compiles once)
        reset:  (S,) bool -- soft-reset flags consumed before the chunk
        returns (features (S, F_max, ncep), mask (S, F_max), new_state);
        mask[s, k] marks which of the F_max frame slots are real frames.
        """
        chunks = jnp.asarray(chunks, self.dtype)
        if reset is None:
            reset = jnp.zeros((chunks.shape[0],), bool)
        return self._step(chunks, state, jnp.asarray(reset, bool))

    def process(self, audio, chunk_size: int, reset_at: dict | None = None):
        """Convenience: run a whole (S, T) signal through chunked steps and
        return the concatenated valid features per stream (numpy, lists).

        reset_at: {chunk_index: (S,) bool} optional reset schedule."""
        audio = np.asarray(audio)
        S, T = audio.shape
        state = self.init(S)
        outs = [[] for _ in range(S)]
        for ci in range(0, T // chunk_size):
            chunk = audio[:, ci * chunk_size:(ci + 1) * chunk_size]
            reset = (reset_at or {}).get(ci)
            feats, mask, state = self.step(chunk, state, reset)
            feats, mask = np.asarray(feats), np.asarray(mask)
            for s in range(S):
                outs[s].append(feats[s][mask[s]])
        return [np.concatenate(o) if o else np.zeros((0, self.cfg.nceptrums))
                for o in outs], state


# -- Checkpoint / resume --------------------------------------------------------
#
# The reference has no checkpointing: device state is <= 1 frame of audio and
# recovery is "reset and resend" (SURVEY.md section 5).  Here the carry IS the
# checkpoint; these helpers persist it (orbax when available, npz otherwise).

def save_state(path: str, state: StreamState) -> None:
    arrays = {f: np.asarray(getattr(state, f)) for f in state._fields}
    try:
        import orbax.checkpoint as ocp
        ckptr = ocp.PyTreeCheckpointer()
        ckptr.save(path, arrays, force=True)
    except Exception:
        np.savez(path if path.endswith(".npz") else path + ".npz", **arrays)


def load_state(path: str) -> StreamState:
    import os
    try:
        import orbax.checkpoint as ocp
        if os.path.isdir(path):
            ckptr = ocp.PyTreeCheckpointer()
            arrays = ckptr.restore(path)
            return StreamState(**{k: jnp.asarray(v)
                                  for k, v in arrays.items()})
    except Exception:
        pass
    npz = np.load(path if path.endswith(".npz") else path + ".npz")
    return StreamState(**{k: jnp.asarray(npz[k]) for k in npz.files})
