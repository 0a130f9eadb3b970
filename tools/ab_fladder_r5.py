#!/usr/bin/env python3
"""Chip A/B: f32 block-ladder float kernel (ops/pallas_fladder, round 5i)
vs the shipped split-DFT radix-2 kernel (ops/pallas_mfcc).

Interleaved rounds; both arms are gated at 5e-4 vs the float64 oracle
in-process before timing (the ladder arm's expected error is ~1e-5).
Run in the driver env (real TPU chip)."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ab_flags import make_audio, time_fused  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp
    from mfcc_tpu.config import MFCCConfig
    from mfcc_tpu.ops import pallas_mfcc, pallas_fladder
    from mfcc_tpu.ref import float_ref

    cfg = MFCCConfig()
    S, secs = 1024, 4.0
    T = cfg.nfft + int(round((secs * cfg.samplerate - cfg.nfft)
                             / cfg.hop)) * cfg.hop
    F = cfg.n_frames(T)
    print(f"devices: {jax.devices()}", file=sys.stderr)

    x = jax.device_put(jnp.asarray(make_audio(S, T, seed=3), jnp.int16))
    int(jnp.abs(x).max())

    gsig = make_audio(2, 512 + 6 * 170, seed=9)
    gwant = np.stack([float_ref.mfcc_float(gsig[i], cfg) for i in range(2)])

    arms = {
        "fladder": lambda a: pallas_fladder.mfcc_float_ladder_pallas(a, cfg),
        "radix2-i16": lambda a: pallas_mfcc.mfcc_pallas_radix2(a, cfg),
    }
    res = {k: [] for k in arms}
    errs = {}
    for name, fn in arms.items():
        got = np.asarray(jax.jit(fn)(jnp.asarray(gsig, jnp.int16)))
        err = float(np.abs(gwant - got).max())
        assert np.isfinite(err) and err < 5e-4, f"{name}: err {err:.2e}"
        errs[name] = err
        print(f"# {name}: gate err {err:.2e} OK", file=sys.stderr)
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    names = list(arms)
    for rnd in range(rounds):
        order = names if rnd % 2 == 0 else names[::-1]
        for name in order:
            fps = time_fused(arms[name], x, S * F, rounds=1)
            res[name].append(fps)
            print(f"# {name} r{rnd}: {fps/1e6:.2f} Mf/s", file=sys.stderr)

    print("\n== float ladder vs split-DFT A/B (5e-4-gated, interleaved) ==")
    for name in names:
        runs = " / ".join(f"{v/1e6:.2f}" for v in res[name])
        print(f"  {name:>11}: max {max(res[name])/1e6:7.2f} Mf/s "
              f"@ err {errs[name]:.2e} ({runs})")


if __name__ == "__main__":
    main()
