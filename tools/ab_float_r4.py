#!/usr/bin/env python3
"""Round-4 float kernel chip A/B: shipped radix-2 (i16 ingest) vs the
frame-major zero-relayout kernel (mfcc_pallas_fmaj) -- the two answers to
the round-3h input-path finding.  Both arms accuracy-gated on real speech
(5e-4 vs the float oracle).  Run in the driver env."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ab_flags import make_audio, time_fused  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp
    from mfcc_tpu.config import MFCCConfig
    from mfcc_tpu.ops import pallas_mfcc
    from mfcc_tpu.ref import float_ref
    from scipy.io import wavfile

    cfg = MFCCConfig()
    S, secs = 1024, 4.0
    T = cfg.nfft + int(round((secs * cfg.samplerate - cfg.nfft)
                             / cfg.hop)) * cfg.hop
    F = cfg.n_frames(T)
    print(f"devices: {jax.devices()}", file=sys.stderr)

    xf = jax.device_put(jnp.asarray(make_audio(S, T), jnp.int16))
    int(jnp.abs(xf).max())

    _, wav = wavfile.read("/root/reference/f2bjrop1.0.wav")
    gsig = wav[: 512 + 18 * 170].astype(np.float32)[None].repeat(2, 0)
    gwant = np.stack([float_ref.mfcc_float(gsig[i]) for i in range(2)])

    arms = [
        ("radix2-i16 (shipped)",
         lambda a: pallas_mfcc.mfcc_pallas_radix2(a, cfg)),
        ("fmaj-i16 (zero-relayout)",
         lambda a: pallas_mfcc.mfcc_pallas_fmaj(a, cfg)),
    ]
    res = {name: [] for name, _ in arms}
    for name, fn in arms:
        got = np.asarray(jax.jit(fn)(jnp.asarray(gsig)))
        err = np.abs(gwant - got).max()
        assert err < 5e-4, f"{name} gate FAILED: {err}"
        print(f"# {name} gate err {err:.2e}", file=sys.stderr)
    for rnd in range(3):
        for name, fn in arms:
            fps = time_fused(fn, xf, S * F)
            res[name].append(fps)
            print(f"# {name} r{rnd}: {fps/1e6:.2f} Mf/s", file=sys.stderr)

    print("\n| arm | best Mf/s |")
    print("|---|---|")
    for name in res:
        print(f"| {name} | {max(res[name])/1e6:.2f} |")


if __name__ == "__main__":
    main()
