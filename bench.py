#!/usr/bin/env python3
"""Benchmark: MFCC frames/second on one chip (the BASELINE metric).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

vs_baseline is against the reference's derived whole-core throughput of
~50k frames/s on its FPGA (BASELINE.md: per-frame cost ~ max(512-cycle
ingest, 2304-cycle FFT) at 125 MHz).

Methodology notes (the axon TPU tunnel makes naive timing lie):
  * repeated identical (fn, args) calls can be served from a result cache ->
    every timed iteration perturbs the input with a distinct scalar salt;
  * block_until_ready through the tunnel is unreliable -> completion is
    forced by a host readback of a scalar depending on every iteration;
  * per-call dispatch overhead is ~10 ms -> iterations are enqueued
    back-to-back (async) so dispatch overlaps device compute, and the batch
    is large enough that compute dominates.

The bench autotunes over pipeline formulations, keeping only those whose
accuracy vs the float64 oracle stays within the gate, and reports the
fastest qualifying configuration.
"""

import argparse
import json
import sys
import time

import numpy as np


ACCURACY_GATE = 5e-4          # max-abs-err vs float64 oracle, real-scale audio
BASELINE_FRAMES_PER_S = 50e3  # reference FPGA derived throughput (BASELINE.md)


def make_audio(S, T, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(T) / 16000.0
    base = (9000 * np.sin(2 * np.pi * (200 + 3000 * t) * t)
            + 4000 * np.sin(2 * np.pi * 900 * t))
    noise = rng.integers(-1500, 1500, (S, T))
    return np.clip(base[None, :] + noise, -32768, 32767).astype(np.float32)


def build_fn(cfg, kind):
    import jax
    import functools
    from mfcc_tpu.ops import float_ops, pallas_mfcc

    if kind == "pallas":
        base = lambda a: pallas_mfcc.mfcc_batch_pallas(a, cfg)
    elif kind == "pallas-split":
        base = lambda a: pallas_mfcc.mfcc_batch_pallas(a, cfg, split=True)
    elif kind.endswith("-split"):
        base = functools.partial(float_ops.mfcc_batch, cfg=cfg,
                                 method=kind[:-6], precision="split")
    else:
        base = functools.partial(float_ops.mfcc_batch, cfg=cfg, method=kind)
    # salt defeats any result caching; costs one elementwise pass
    return jax.jit(lambda a, salt: base(a + salt))


def time_fn(fn, x, iters):
    import jax.numpy as jnp
    float(fn(x, jnp.float32(0.0)).sum())               # warm / compile
    probe = [fn(x, jnp.float32(100.0 + i))[0, 0, 0] for i in range(2)]
    float(jnp.stack(probe).sum())                      # settle eager helper ops
    best = float("inf")
    for rep in range(2):                               # best-of-2 kills order effects
        t0 = time.perf_counter()
        acc = [fn(x, jnp.float32(1.0 + 100 * rep + i))[0, 0, 0]
               for i in range(iters)]
        float(jnp.stack(acc).sum())                    # force everything
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def time_fused(cfg, kind, x, nframes, reps=4, iters=4):
    """Time `reps` device-side pipeline runs fused into one dispatch."""
    import jax
    import jax.numpy as jnp
    import functools
    from mfcc_tpu.ops import float_ops, pallas_mfcc

    if kind == "pallas":
        base = lambda a: pallas_mfcc.mfcc_batch_pallas(a, cfg)
    elif kind == "pallas-split":
        base = lambda a: pallas_mfcc.mfcc_batch_pallas(a, cfg, split=True)
    elif kind.endswith("-split"):
        base = functools.partial(float_ops.mfcc_batch, cfg=cfg,
                                 method=kind[:-6], precision="split")
    else:
        base = functools.partial(float_ops.mfcc_batch, cfg=cfg, method=kind)

    def repfn(a, s):
        return jnp.stack([base(a + (s + r))[0, 0, 0] for r in range(reps)])

    fn = jax.jit(repfn)
    float(fn(x, jnp.float32(0.0)).sum())
    best = float("inf")
    for rep in range(2):
        t0 = time.perf_counter()
        acc = [fn(x, jnp.float32(1 + 10 * rep + i)) for i in range(iters)]
        float(jnp.stack(acc).sum())
        best = min(best, (time.perf_counter() - t0) / (iters * reps))
    return nframes / best


def accuracy_of(cfg, kind):
    import jax.numpy as jnp
    from mfcc_tpu.ref import float_ref
    sig = make_audio(2, 512 + 4 * 170, seed=7)
    want = np.stack([float_ref.mfcc_float(sig[i], cfg) for i in range(2)])
    fn = build_fn(cfg, kind)
    got = np.asarray(fn(jnp.asarray(sig), jnp.float32(0.0)))
    return float(np.abs(want - got).max())


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="small shapes / few iters (CI smoke)")
    ap.add_argument("--streams", type=int, default=None)
    ap.add_argument("--seconds", type=float, default=None)
    ap.add_argument("--iters", type=int, default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from mfcc_tpu.config import MFCCConfig
    cfg = MFCCConfig()

    if args.quick:
        S, T, iters = 64, 512 + 93 * 170, 6
        candidates = ["segmented"]
    else:
        S = args.streams or 1024
        secs = args.seconds or 4.0
        T = cfg.nfft + int(round((secs * cfg.samplerate - cfg.nfft)
                                 / cfg.hop)) * cfg.hop
        iters = args.iters or 12
        candidates = ["pallas-split", "pallas", "dft"]

    F = cfg.n_frames(T)
    x = jax.device_put(jnp.asarray(make_audio(S, T)))
    float(x.sum())  # force residency

    if not args.quick:
        # side metric: bit-exact INT mode throughput (stderr only)
        try:
            from mfcc_tpu.ops import int_ops
            if jax.default_backend() == "tpu":
                from mfcc_tpu.ops import pallas_int
                int_base = lambda a: pallas_int.mfcc_int_pallas(a, cfg)
            else:
                int_base = lambda a: int_ops.mfcc_int_batch(a, cfg)
            Si = min(S, 256)
            xi = jax.device_put(jnp.asarray(
                make_audio(Si, T).astype(np.int64), jnp.int32))
            int(jnp.abs(xi).max())
            fi = jax.jit(lambda a, s: int_base(a + s))
            int(fi(xi, jnp.int32(0)).sum())
            best_i = float("inf")
            for rep in range(2):
                t0 = time.perf_counter()
                acc = [fi(xi, jnp.int32(1 + 10 * rep + i))[0, 0, 0]
                       for i in range(6)]
                int(jnp.stack(acc).sum())
                best_i = min(best_i, (time.perf_counter() - t0) / 6)
            print(f"# int (bit-exact): {Si * F / best_i / 1e6:.3f} Mframes/s "
                  f"({best_i*1e3:.2f} ms/iter, S={Si})", file=sys.stderr)
        except Exception as e:  # side metric must never sink the bench
            print(f"# int metric failed: {e!r}", file=sys.stderr)

    best = None
    for kind in candidates:
        try:
            err = accuracy_of(cfg, kind)
            fn = build_fn(cfg, kind)
            dt = time_fn(fn, x, iters)
        except Exception as e:
            print(f"# {kind}: FAILED ({e!r})", file=sys.stderr)
            continue
        fps = S * F / dt
        ok = err <= ACCURACY_GATE
        print(f"# {kind}: {fps/1e6:.3f} Mframes/s ({dt*1e3:.2f} ms/iter), "
              f"err={err:.2e} {'OK' if ok else 'REJECT'}", file=sys.stderr)
        if ok and (best is None or fps > best[0]):
            best = (fps, kind)

    if best is None:
        print(json.dumps({"metric": "mfcc_frames_per_second", "value": 0,
                          "unit": "frames/s", "vs_baseline": 0.0}))
        return 1

    fps = best[0]
    if not args.quick:
        # refine the winner with device-side repetition so per-call dispatch
        # overhead (~2-4 ms through remote tunnels) doesn't pollute the
        # steady-state number
        try:
            fused = time_fused(cfg, best[1], x, S * F, reps=4, iters=4)
            print(f"# winner {best[1]} fused-dispatch: "
                  f"{fused/1e6:.3f} Mframes/s", file=sys.stderr)
            fps = max(fused, fps)
        except Exception as e:
            print(f"# fused refinement failed: {e!r}", file=sys.stderr)

    print(json.dumps({
        "metric": "mfcc_frames_per_second",
        "value": round(fps, 1),
        "unit": "frames/s",
        "vs_baseline": round(fps / BASELINE_FRAMES_PER_S, 2),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
