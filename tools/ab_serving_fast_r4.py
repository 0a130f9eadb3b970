#!/usr/bin/env python3
"""Round-4h chip A/B: the split-DFT fast mode (precision="fast") on the
SERVING float step.

The serving stream kernel routes through the same `_radix2_core`, so
the pass dial moves its capacity too; the fast mode's arithmetic is
gated in round 4g (batch, 2e-3) -- this measures only what the dial is
worth at the serving shape (S=4096, C=1024, fused 16-step dispatch).
Run in the driver env.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ab_flags import make_audio  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp
    from mfcc_tpu.config import MFCCConfig
    from mfcc_tpu import streaming

    cfg = MFCCConfig()
    Ss, C, reps, iters = 4096, 1024, 16, 3
    audio = make_audio(Ss, C, seed=11)
    print(f"devices: {jax.devices()}", file=sys.stderr)

    rows = []
    for name, prec in (("6-pass (shipped)", "highest"),
                       ("3-pass fast", "fast")):
        sm = streaming.StreamingMFCC(cfg, int_path=False, precision=prec,
                                     transposed_state=True)
        assert sm._fused_jit is not None, "no fused serving kernel"
        x = jax.device_put(jnp.asarray(audio, jnp.int16))
        reset0 = jnp.zeros((Ss,), bool)
        st0 = sm.init(Ss)
        step = sm._fused_jit

        def repfn(chunks, state, salt):
            acc = jnp.zeros((), jnp.float32)
            for r in range(reps):
                f, m, state = step(
                    chunks + (salt + r).astype(chunks.dtype), state, reset0)
                acc = acc + f[0, 0, 0].astype(jnp.float32)
            return acc, state

        fn = jax.jit(repfn)
        mk = lambda v: jnp.asarray(v, jnp.int16)
        a, st = fn(x, st0, mk(0))
        float(a); jax.block_until_ready(st)
        best = float("inf")
        for rep in range(3):
            t0 = time.perf_counter()
            accs, st = [], st0
            for i in range(iters):
                a, st = fn(x, st, mk(1 + 10 * rep + i))
                accs.append(a)
            float(jnp.stack(accs).sum())
            int(jnp.asarray(st.count).max())
            best = min(best, (time.perf_counter() - t0) / (iters * reps))
        streams = Ss * (C / cfg.samplerate) / best
        rows.append((name, best * 1e3, streams / 1e3))
        print(f"# serving float/{name}: {best*1e3:.2f} ms/step -> "
              f"{streams/1e3:.1f}k streams", file=sys.stderr)

    print("\n| serving float arm | ms/step | k streams |")
    print("|---|---|---|")
    for name, ms, k in rows:
        print(f"| {name} | {ms:.2f} | {k:.1f} |")


if __name__ == "__main__":
    main()
