#!/usr/bin/env python3
"""Chip A/B: block-form ladder (LADDER_BLOCKS) vs the roll/slice form for
the bit-exact INT kernel (round-5g continuation of the >=40 Mf/s hunt).

Interleaved rounds (arm order alternates every round) to cancel tunnel
drift; every arm is gated bit-exact against the int_ref oracle in-process
before timing.  Run in the driver env (real TPU chip)."""

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

    saved = pi.LADDER_BLOCKS
    arms = {}
    try:
        for blocks in (True, False):
            pi.LADDER_BLOCKS = blocks

            def fn(audio):
                return pi.mfcc_int_pallas_v3(audio, cfg)

            got = np.asarray(jax.jit(fn)(jnp.asarray(gsig, jnp.int16)))
            assert np.array_equal(gwant, got), \
                f"blocks={blocks}: bit-exact FAILED"
            arms[blocks] = (fn, [])
        rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3
        for rnd in range(rounds):
            order = (True, False) if rnd % 2 == 0 else (False, True)
            for blocks in order:
                pi.LADDER_BLOCKS = blocks
                fn, res = arms[blocks]
                fps = time_fused(fn, x, S * F, rounds=1)
                res.append(fps)
                print(f"# blocks={blocks} r{rnd}: {fps/1e6:.2f} Mf/s",
                      file=sys.stderr)
    finally:
        pi.LADDER_BLOCKS = saved

    print("\n== block-form ladder A/B (bit-exact, interleaved) ==")
    for blocks, (_, res) in arms.items():
        runs = " / ".join(f"{v/1e6:.2f}" for v in res)
        print(f"  blocks={blocks!s:>5}: max {max(res)/1e6:7.2f} Mf/s "
              f"({runs})")


if __name__ == "__main__":
    main()
