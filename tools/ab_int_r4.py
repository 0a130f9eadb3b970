#!/usr/bin/env python3
"""Round-4 INT kernel experiments, on-chip (ablation follow-up).

The INT v3 stage ablation (docs/BENCH.md round 4e) attributes 42% of the
step to the filterbank limb matmuls and 28% to the raw input path.  Arms:

  * input dtype: int32 (bench legacy) vs int16 (the wire contract --
    drops the host cast pass and halves ingest HBM traffic)
  * FB limb radix/dtype: bf16 8-bit (shipped) vs f32 8-bit (FB_LIMB_F32,
    no sub-word packing) vs int8 7-bit (FB_LIMB_BITS=7)

Every arm is bit-exactness-gated in-process.  Run in the driver env.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ab_flags import make_audio, time_fused  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp
    from mfcc_tpu.config import MFCCConfig
    from mfcc_tpu.ops import pallas_int
    from mfcc_tpu.ref import int_ref

    cfg = MFCCConfig()
    S, secs = 1024, 4.0
    T = cfg.nfft + int(round((secs * cfg.samplerate - cfg.nfft)
                             / cfg.hop)) * cfg.hop
    F = cfg.n_frames(T)
    print(f"devices: {jax.devices()}", file=sys.stderr)

    a32 = make_audio(S, T, seed=3)
    xi32 = jax.device_put(jnp.asarray(a32, jnp.int32))
    xi16 = jax.device_put(jnp.asarray(a32, jnp.int16))
    int(jnp.abs(xi32).max()); int(jnp.abs(xi16).max())

    gsig = make_audio(2, 512 + 6 * 170, seed=9)
    gwant = np.stack([int_ref.mfcc_int(gsig[i].astype(np.int64), cfg)
                      for i in range(2)])

    def gate():
        got = np.asarray(jax.jit(
            lambda a: pallas_int.mfcc_int_pallas_v3(a, cfg))(
                jnp.asarray(gsig, jnp.int32)))
        assert np.array_equal(gwant, got), "bit-exact gate FAILED"

    arms = [
        ("bf16-limb / int32 in", dict(bits=8, f32=False), xi32),
        ("bf16-limb / int16 in", dict(bits=8, f32=False), xi16),
        ("f32-limb  / int16 in", dict(bits=8, f32=True), xi16),
        ("int8-limb / int16 in", dict(bits=7, f32=False), xi16),
    ]
    res = {name: [] for name, _, _ in arms}
    for rnd in range(2):                      # interleave to cancel drift
        for name, knobs, x in arms:
            pallas_int.FB_LIMB_BITS = knobs["bits"]
            pallas_int.FB_LIMB_F32 = knobs["f32"]
            pallas_int._fb_limb_matrix.cache_clear()
            if rnd == 0:
                gate()
            fps = time_fused(lambda a: pallas_int.mfcc_int_pallas_v3(a, cfg),
                             x, S * F)
            res[name].append(fps)
            print(f"# {name} r{rnd}: {fps/1e6:.2f} Mf/s", file=sys.stderr)
    pallas_int.FB_LIMB_BITS = 8
    pallas_int.FB_LIMB_F32 = False
    pallas_int._fb_limb_matrix.cache_clear()

    print("\n| arm | best Mf/s |")
    print("|---|---|")
    for name in res:
        print(f"| {name} | {max(res[name])/1e6:.2f} |")


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    main()
