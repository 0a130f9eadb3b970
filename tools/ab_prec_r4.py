#!/usr/bin/env python3
"""Round-4g chip A/B: MXU pass count for the radix-2 float core's
split-DFT dot.

Shipped = one HIGHEST dot (6 bf16 passes per f32 matmul).  3PASS =
manual bf16-limb spelling of lax.Precision.HIGH (hi*hi + hi*lo + lo*hi
at DEFAULT precision -- Mosaic rejects HIGH itself), halving the MXU
cycles of the dominant matmul.  Each arm's error is measured against
the float oracle on BOTH real speech and synthetic audio; the 5e-4
contract decides shippability, the timing decides whether it matters.
Run in the driver env.
"""

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
    gspeech = wav[: 512 + 18 * 170].astype(np.float32)[None].repeat(2, 0)
    gsynth = make_audio(2, 512 + 18 * 170, seed=7).astype(np.float32)
    wants = {"speech": np.stack([float_ref.mfcc_float(g) for g in gspeech]),
             "synth": np.stack([float_ref.mfcc_float(g) for g in gsynth])}
    gates = {"speech": jnp.asarray(gspeech), "synth": jnp.asarray(gsynth)}

    arms = [("HIGHEST 6-pass (shipped)", 6),
            ("4-pass bf16 limbs", 4),
            ("3-pass bf16 limbs", 3)]
    res = {name: [] for name, _ in arms}
    errtab = {}
    for name, flag in arms:
        fn = jax.jit(lambda a, f=flag: pallas_mfcc.mfcc_pallas_radix2(
            a, cfg, dft_passes=f))
        errs = {k: float(np.abs(wants[k] - np.asarray(fn(gates[k]))).max())
                for k in wants}
        errtab[name] = errs
        ok = max(errs.values()) < 5e-4
        print(f"# {name}: err speech {errs['speech']:.2e} "
              f"synth {errs['synth']:.2e} gate={'OK' if ok else 'FAIL'}",
              file=sys.stderr)
    stable = {name: (lambda a, f=flag:
                     pallas_mfcc.mfcc_pallas_radix2(a, cfg, dft_passes=f))
              for name, flag in arms}
    for rnd in range(3):
        for name, fn in stable.items():
            fps = time_fused(fn, xf, S * F)
            res[name].append(fps)
            print(f"# {name} r{rnd}: {fps/1e6:.2f} Mf/s", file=sys.stderr)

    print("\n| arm | err speech | err synth | best Mf/s |")
    print("|---|---|---|---|")
    for name, _ in arms:
        e = errtab[name]
        print(f"| {name} | {e['speech']:.2e} | {e['synth']:.2e} | "
              f"{max(res[name])/1e6:.2f} |")


if __name__ == "__main__":
    main()
