#!/usr/bin/env python3
"""Chip A/B: two-level factored log2 LUT (LOG2_TWO_LEVEL) vs the flat
65-entry grid for the fused f64ish kernel (round 5h; the round-5 ROADMAP
names the 130 broadcast selects as the kernel's VPU bottleneck).

Interleaved rounds; every arm is gated at the elementwise
max(1e-5, 2 ulp) contract vs the float64 oracle in-process before
timing.  Run in the driver env (real TPU chip)."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ab_flags import make_audio, time_fused  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp
    import bench
    from mfcc_tpu.config import MFCCConfig
    from mfcc_tpu.ops import pallas_df32 as pd

    cfg = MFCCConfig()
    S = 512
    T = cfg.nfft + 93 * cfg.hop          # ~1 s/stream (the bench shape)
    F = cfg.n_frames(T)
    print(f"devices: {jax.devices()}", file=sys.stderr)

    x = jax.device_put(jnp.asarray(make_audio(S, T, seed=5)))
    float(jnp.abs(x).max())

    saved = pd.LOG2_TWO_LEVEL
    arms = {}
    try:
        for two in (True, False):
            pd.LOG2_TWO_LEVEL = two
            err = bench.f64ish_gate_err(cfg)
            assert err <= 1.0, f"two_level={two}: gate err {err:.3f} > 1"
            print(f"# two_level={two}: {err:.4f} gate-units OK",
                  file=sys.stderr)

            def fn(audio):
                return pd.mfcc_f64ish_pallas(audio, cfg)

            arms[two] = (fn, [], err)
        rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3
        for rnd in range(rounds):
            order = (True, False) if rnd % 2 == 0 else (False, True)
            for two in order:
                pd.LOG2_TWO_LEVEL = two
                fn, res, _ = arms[two]
                fps = time_fused(fn, x, S * F, reps=4, rounds=1)
                res.append(fps)
                print(f"# two_level={two} r{rnd}: {fps/1e6:.2f} Mf/s",
                      file=sys.stderr)
    finally:
        pd.LOG2_TWO_LEVEL = saved

    print("\n== two-level log2 LUT A/B (gate-checked, interleaved) ==")
    for two, (_, res, err) in arms.items():
        runs = " / ".join(f"{v/1e6:.2f}" for v in res)
        print(f"  two_level={two!s:>5}: max {max(res)/1e6:7.2f} Mf/s "
              f"@ {err:.4f} gate-units ({runs})")


if __name__ == "__main__":
    main()
