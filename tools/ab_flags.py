#!/usr/bin/env python3
"""TPU A/B harness for the kernel-layout flag flips (round-3 VERDICT next #2).

Measures each shipped layout default against its alternative ON THE CHIP,
interleaved best-of-N fused-dispatch timing (the bench.py methodology --
salted inputs, scalar readbacks, dispatch-amortized), and prints a markdown
table for docs/BENCH.md.  Flags covered:

  * pallas_mfcc.R2_KERNEL_T   -- float/i16 batch in-kernel tile transpose
  * pallas_int.INT_KERNEL_T   -- INT v3 batch in-kernel packed-i16 transpose
  * pallas_stream.STREAM_CHUNK_T + the "positions" chunk layout -- serving
    chunk ingest (3-way: time | stream | positions)

Every timed configuration is also correctness-gated in-process (bit-exact
INT / 5e-4 float) so a flag can never win on garbage output.

Run in the DRIVER env (ambient TPU):  python tools/ab_flags.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_audio(S, T, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(T) / 16000.0
    base = (9000 * np.sin(2 * np.pi * (200 + 3000 * t) * t)
            + 4000 * np.sin(2 * np.pi * 900 * t))
    noise = rng.integers(-1500, 1500, (S, T))
    return np.round(np.clip(base[None, :] + noise,
                            -32768, 32767)).astype(np.float32)


def time_fused(base, x, nframes, reps=8, iters=3, rounds=3):
    import jax
    import jax.numpy as jnp
    dt = x.dtype

    def repfn(a, s):
        return jnp.stack([base(a + (s + r))[0, 0, 0] for r in range(reps)])

    fn = jax.jit(repfn)
    float(jnp.asarray(fn(x, jnp.asarray(0, dt))).sum())
    best = float("inf")
    for rep in range(rounds):
        t0 = time.perf_counter()
        acc = [fn(x, jnp.asarray(1 + 10 * rep + i, dt)) for i in range(iters)]
        float(jnp.stack(acc).sum())
        best = min(best, (time.perf_counter() - t0) / (iters * reps))
    return nframes / best


def main():
    import jax
    import jax.numpy as jnp
    from mfcc_tpu.config import MFCCConfig
    from mfcc_tpu.ops import pallas_mfcc, pallas_int
    from mfcc_tpu import streaming
    from mfcc_tpu.ref import int_ref

    cfg = MFCCConfig()
    S, secs = 1024, 4.0
    T = cfg.nfft + int(round((secs * cfg.samplerate - cfg.nfft)
                             / cfg.hop)) * cfg.hop
    F = cfg.n_frames(T)
    print(f"devices: {jax.devices()}", file=sys.stderr)

    xf = jax.device_put(jnp.asarray(make_audio(S, T), jnp.int16))
    int(jnp.abs(xf).max())
    xi = jax.device_put(jnp.asarray(make_audio(S, T, seed=3), jnp.int32))
    int(jnp.abs(xi).max())

    # correctness fixtures (2 streams, short)
    gsig = make_audio(2, 512 + 6 * 170, seed=9)
    gwant_int = np.stack([int_ref.mfcc_int(gsig[i].astype(np.int64), cfg)
                          for i in range(2)])

    def gate_int(fn):
        got = np.asarray(jax.jit(fn)(jnp.asarray(gsig, jnp.int32)))
        return bool(np.array_equal(gwant_int, got))

    rows = []

    # -- R2_KERNEL_T (float batch, i16 ingest) -----------------------------
    # interleave A/B/A/B to cancel tunnel drift
    results = {True: [], False: []}
    for _ in range(2):
        for flag in (True, False):
            fps = time_fused(lambda a, f=flag: pallas_mfcc.mfcc_pallas_radix2(
                a, cfg, kernel_t=f), xf, S * F)
            results[flag].append(fps)
    rows.append(("R2_KERNEL_T (float/i16 batch)",
                 max(results[False]) / 1e6, max(results[True]) / 1e6))

    # -- INT_KERNEL_T (INT v3 batch) ----------------------------------------
    results = {True: [], False: []}
    gates = {}
    for _ in range(2):
        for flag in (True, False):
            pallas_int.INT_KERNEL_T = flag
            if flag not in gates:
                gates[flag] = gate_int(
                    lambda a: pallas_int.mfcc_int_pallas_v3(a, cfg))
            fps = time_fused(lambda a: pallas_int.mfcc_int_pallas_v3(a, cfg),
                             xi, S * F)
            results[flag].append(fps)
    pallas_int.INT_KERNEL_T = True
    assert gates[True] and gates[False], f"INT gate failed: {gates}"
    rows.append(("INT_KERNEL_T (INT v3 batch, bit-exact both)",
                 max(results[False]) / 1e6, max(results[True]) / 1e6))

    # -- serving chunk ingest: time | stream | positions ---------------------
    Ss, C, reps, iters = 4096, 1024, 16, 3
    audio = make_audio(Ss, C, seed=11)
    for int_path in (False, True):
        name = "int" if int_path else "float"
        res = {}
        for layout in ("time", "stream", "positions"):
            from mfcc_tpu.ops import pallas_stream
            pallas_stream.STREAM_CHUNK_T = layout == "stream"
            sm = streaming.StreamingMFCC(
                cfg, int_path=int_path, transposed_state=True,
                transposed_chunks=(layout == "positions"))
            if sm._fused_jit is None:
                print(f"# serving {name}/{layout}: no fused kernel, skip",
                      file=sys.stderr)
                continue
            x = jax.device_put(jnp.asarray(
                audio.T if layout == "positions" else audio, jnp.int16))
            reset0 = jnp.zeros((Ss,), bool)
            st0 = sm.init(Ss)
            step = sm._fused_jit

            def repfn(chunks, state, salt):
                acc = jnp.zeros((), jnp.float32)
                for r in range(reps):
                    f, m, state = step(
                        chunks + (salt + r).astype(chunks.dtype),
                        state, reset0)
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
            res[layout] = Ss * (C / cfg.samplerate) / best
            print(f"# serving {name}/{layout}: {best*1e3:.2f} ms/step -> "
                  f"{res[layout]/1e3:.1f}k streams", file=sys.stderr)
        from mfcc_tpu.ops import pallas_stream
        pallas_stream.STREAM_CHUNK_T = True
        if res:
            rows.append((f"serving {name} chunk ingest (k streams)",
                         *(res.get(k, 0) / 1e3
                           for k in ("time", "stream", "positions"))))

    print("\n| flag | alt | shipped | (positions) |")
    print("|---|---|---|---|")
    for r in rows:
        cells = " | ".join(f"{v:.2f}" if isinstance(v, float) else str(v)
                           for v in r)
        print(f"| {cells} |")


if __name__ == "__main__":
    main()
