#!/usr/bin/env python3
"""Chip A/B: slice-form butterfly threshold (SLICE_MIN_STRIDE) for the
bit-exact INT ladder (round-5 continuation of the >=40 Mf/s hunt).

Arms are the threshold values; every arm is gated bit-exact against the
int_ref oracle in-process before timing.  Run in the driver env (real
TPU chip)."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ab_flags import make_audio, time_fused  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp
    from mfcc_tpu.config import MFCCConfig
    from mfcc_tpu.ops import pallas_int as pi
    from mfcc_tpu.ref import int_ref

    cfg = MFCCConfig()
    S, secs = 1024, 4.0
    T = cfg.nfft + int(round((secs * cfg.samplerate - cfg.nfft)
                             / cfg.hop)) * cfg.hop
    F = cfg.n_frames(T)
    print(f"devices: {jax.devices()}", file=sys.stderr)

    a = make_audio(S, T, seed=3)
    x = jax.device_put(jnp.asarray(a, jnp.int16))
    int(jnp.abs(x).max())

    gsig = make_audio(2, 512 + 6 * 170, seed=9)
    gwant = np.stack([int_ref.mfcc_int(gsig[i].astype(np.int64), cfg)
                      for i in range(2)])

    rows = []
    arms = [None, 8, 16, 32, 64]
    if len(sys.argv) > 1:
        arms = [None if s == "none" else int(s) for s in sys.argv[1:]]
    saved = pi.SLICE_MIN_STRIDE
    try:
        for thr in arms:
            pi.SLICE_MIN_STRIDE = thr

            def fn(audio):
                return pi.mfcc_int_pallas_v3(audio, cfg)

            got = np.asarray(jax.jit(fn)(jnp.asarray(gsig, jnp.int16)))
            assert np.array_equal(gwant, got), f"thr={thr}: bit-exact FAILED"
            res = []
            for rnd in range(3):
                fps = time_fused(fn, x, S * F, rounds=1)
                res.append(fps)
                print(f"# thr={thr} r{rnd}: {fps/1e6:.2f} Mf/s",
                      file=sys.stderr)
            rows.append((str(thr), max(res) / 1e6))
    finally:
        pi.SLICE_MIN_STRIDE = saved

    print("\n== slice-form threshold A/B (bit-exact, max of 3) ==")
    for name, v in rows:
        print(f"  thr={name:>5}: {v:7.2f} Mf/s")


if __name__ == "__main__":
    main()
