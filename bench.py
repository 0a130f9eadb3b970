#!/usr/bin/env python3
"""Benchmark: MFCC frames/second on one chip (the BASELINE metric).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline",
"int_frames_per_second", "int_bit_exact", "serving_streams_float",
"serving_streams_int"}.  The serving_* keys are the SERVING-path capacity
(concurrent real-time 16 kHz streams through the stateful streaming step,
S=4096 x 1024-sample chunks, dispatch-amortized) -- the product-shaped
number the 100k-stream target (BASELINE.md) is judged on.

vs_baseline is against the reference's derived whole-core throughput of
~50k frames/s on its FPGA (BASELINE.md: per-frame cost ~ max(512-cycle
ingest, 2304-cycle FFT) at 125 MHz).

Two first-class numbers (round-1 VERDICT item 3: the bit-exact INT
throughput is a headline, not a stderr side note):
  * mfcc_frames_per_second  -- float path, accuracy-gated at 5e-4 vs the
    float64 oracle; the fastest qualifying formulation wins.
  * int_frames_per_second   -- fixed-point path, gated on BIT-EXACT equality
    with the RTL oracle (mfcc_tpu.ref.int_ref); reported as 0 if the gate
    or the run fails, so regressions are machine-visible.

Methodology notes (the axon TPU tunnel makes naive timing lie):
  * repeated identical (fn, args) calls can be served from a result cache ->
    every timed iteration perturbs the input with a distinct scalar salt;
  * block_until_ready through the tunnel is unreliable -> completion is
    forced by a host readback of a scalar depending on every iteration;
  * per-call dispatch overhead is ~10 ms -> iterations are enqueued
    back-to-back (async) so dispatch overlaps device compute, and the
    winner is refined with several pipeline runs fused into ONE dispatch
    (time_fused) so steady-state throughput isn't dispatch-bound.
"""

import argparse
import json
import os
import subprocess
import sys
import time

import numpy as np


ACCURACY_GATE = 5e-4          # max-abs-err vs float64 oracle, real-scale audio
FAST_GATE = 2e-3              # the opt-in 3-pass fast mode's looser contract
                              # (docs/BENCH.md round 4g; never the default)
F64ISH_GATE = 1e-5            # the compensated double-f32 accuracy north star
BASELINE_FRAMES_PER_S = 50e3  # reference FPGA derived throughput (BASELINE.md)
INT_TARGET_FRAMES_PER_S = 9.4e6  # 100k concurrent 16 kHz streams (BASELINE.md)

# ---------------------------------------------------------------------------
# Outage-proof supervisor (round-3 VERDICT weak #1): bench.py must emit ONE
# parseable JSON line even when the TPU backend raises at init (r03 failure
# mode A), hangs forever (failure mode B), or dies mid-run (mode C).  main()
# therefore runs as a SUPERVISOR: a time-bounded subprocess probes backend
# health first; the real bench runs in a deadline-bounded child that
# checkpoints partial results to a file after every section, and the
# supervisor merges those into the fallback JSON line if the child dies.
# ---------------------------------------------------------------------------

_PROBE_CODE = ("import jax, jax.numpy as jnp; "
               "assert float(jnp.arange(8.0).sum()) == 28.0; "
               "print('BACKEND_OK')")


def _json_keys():
    return {"metric": "mfcc_frames_per_second", "value": 0,
            "unit": "frames/s", "vs_baseline": 0.0,
            "int_frames_per_second": 0.0, "int_bit_exact": False,
            "serving_streams_float": 0.0, "serving_streams_int": 0.0,
            "serving_streams_float_scan": 0.0,
            "serving_streams_int_scan": 0.0,
            "f64ish_frames_per_second": 0.0}


def _fallback_record(error, partial=None):
    rec = _json_keys()
    if partial:
        rec.update(partial)
    rec["error"] = error
    return rec


def _save_partial(**kv):
    """Checkpoint measured keys so a mid-run tunnel death still yields data."""
    path = os.environ.get("MFCC_BENCH_PARTIAL")
    if not path:
        return
    try:
        cur = {}
        if os.path.exists(path):
            with open(path) as f:
                cur = json.load(f)
        cur.update(kv)
        with open(path + ".tmp", "w") as f:
            json.dump(cur, f)
        os.replace(path + ".tmp", path)
    except Exception:
        pass


def _probe_backend_once(timeout):
    """Run a trivial jax op in a bounded subprocess; None if healthy, else
    a one-line error string.  Catches both outage modes: immediate
    'Unable to initialize backend' raise and the indefinite init hang."""
    code = os.environ.get("MFCC_BENCH_PROBE_CMD", _PROBE_CODE)
    try:
        proc = subprocess.run([sys.executable, "-c", code],
                              capture_output=True, text=True, timeout=timeout)
    except subprocess.TimeoutExpired:
        return f"backend probe timed out after {timeout:.0f}s (tunnel hang)"
    if proc.returncode != 0 or "BACKEND_OK" not in proc.stdout:
        lines = (proc.stderr.strip() or proc.stdout.strip()).splitlines()
        tail = lines[-1][:300] if lines else ""
        return f"backend probe failed (rc={proc.returncode}): {tail}"
    return None


def _probe_backend(timeout, attempts=4, backoff=10.0):
    """Retrying wrapper (round-4 VERDICT weak #1: two rounds of real work
    were recorded as 0 because ONE transient 150 s tunnel hang zeroed the
    round's evidence).  Makes up to ``attempts`` probes with a short pause
    between them; returns (error_or_None, attempts_used).  A transient
    hang now costs a retry, not the round."""
    err = None
    for i in range(attempts):
        if i:
            print(f"# backend probe attempt {i} failed ({err}); retrying "
                  f"in {backoff:.0f}s", file=sys.stderr)
            time.sleep(backoff)
        err = _probe_backend_once(timeout)
        if err is None:
            return None, i + 1
    return err, attempts


def _run_child(argv, env, deadline):
    """One deadline-bounded bench-child run; returns (stdout, timed_out, rc)."""
    proc = subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), *argv],
        env=env, stdout=subprocess.PIPE, text=True)  # stderr passes through
    try:
        out, _ = proc.communicate(timeout=deadline)
        return out, False, proc.returncode
    except subprocess.TimeoutExpired:
        proc.kill()
        out, _ = proc.communicate()
        return out, True, proc.returncode


def _parse_json_line(out):
    parsed = None
    for line in (out or "").splitlines():
        if line.startswith("{"):
            try:
                parsed = json.loads(line)
            except ValueError:
                continue
    return parsed


def _supervise(argv):
    """Probe backend health (with retries -- a transient tunnel hang must
    not zero the round's evidence), then run the real bench in a
    deadline-bounded child, re-running it once if it dies while the backend
    still answers; guarantee exactly one JSON line on stdout no matter
    what."""
    import tempfile

    t_start = time.monotonic()
    budget = float(os.environ.get("MFCC_BENCH_DEADLINE", "2400"))
    probe_timeout = float(os.environ.get("MFCC_BENCH_PROBE_TIMEOUT", "150"))
    err, probe_attempts = _probe_backend(probe_timeout)
    if err is not None:
        print(f"# {err} ({probe_attempts} attempts)", file=sys.stderr)
        rec = _fallback_record(err)
        rec["probe_attempts"] = probe_attempts
        print(json.dumps(rec))
        return 1

    fd, partial_path = tempfile.mkstemp(prefix="mfcc_bench_", suffix=".json")
    os.close(fd)
    os.unlink(partial_path)
    env = dict(os.environ)
    env["MFCC_BENCH_CHILD"] = "1"
    env["MFCC_BENCH_PARTIAL"] = partial_path
    # persist compiles across bench runs (post-outage re-verification cost)
    env.setdefault("JAX_COMPILATION_CACHE_DIR",
                   os.path.expanduser("~/.cache/mfcc_tpu_jax"))
    diagnostic = ("--ablate" in argv or "--ablate-int" in argv
                  or "--latency" in argv)

    def partial():
        try:
            with open(partial_path) as f:
                return json.load(f)
        except Exception:
            return {}

    try:
        why = None
        for child_run in (1, 2):
            remaining = budget - (time.monotonic() - t_start)
            if child_run > 1 and remaining < 120:
                break            # not enough time left for a useful re-run
            remaining = max(remaining, 1.0)
            out, timed_out, rc = _run_child(argv, env, remaining)
            if diagnostic:   # --ablate/--latency: no JSON-line contract
                sys.stdout.write(out or "")
                return 124 if timed_out else rc
            parsed = _parse_json_line(out)
            if parsed is not None:
                parsed["probe_attempts"] = probe_attempts
                parsed["child_runs"] = child_run
                print(json.dumps(parsed))
                return rc
            why = (f"bench child exceeded {remaining:.0f}s deadline"
                   if timed_out
                   else f"bench child rc={rc} with no JSON line")
            print(f"# {why} (run {child_run})", file=sys.stderr)
            # distinguish tunnel death from code failure, then retry the
            # child once if the backend still answers and time remains --
            # already-measured keys survive in the partial file and compiles
            # in the on-disk cache, so the re-run is much cheaper
            if child_run == 1:
                reprobe, n = _probe_backend(min(90.0, probe_timeout),
                                            attempts=2, backoff=10.0)
                if reprobe is not None:
                    why += f"; post-mortem re-probe also failed: {reprobe}"
                    print(f"# backend re-probe failed ({n} attempts) -- "
                          "tunnel outage, not a bench bug", file=sys.stderr)
                    break
                print("# backend re-probe OK -- re-running the bench child",
                      file=sys.stderr)
        rec = _fallback_record(why or "no time left for a bench child run",
                               partial())
        rec["probe_attempts"] = probe_attempts
        print(json.dumps(rec))
        return 1
    finally:
        try:
            os.unlink(partial_path)
        except OSError:
            pass


def make_audio(S, T, seed=0):
    """Integer-valued samples (the 16-bit wire contract), as float32 --
    so the f32 and int16 input routes see IDENTICAL values and one
    accuracy gate covers both."""
    rng = np.random.default_rng(seed)
    t = np.arange(T) / 16000.0
    base = (9000 * np.sin(2 * np.pi * (200 + 3000 * t) * t)
            + 4000 * np.sin(2 * np.pi * 900 * t))
    noise = rng.integers(-1500, 1500, (S, T))
    return np.round(np.clip(base[None, :] + noise,
                            -32768, 32767)).astype(np.float32)


def resolve_base(cfg, kind):
    """kind -> (S, T) -> (S, F, ncep) pipeline callable."""
    import functools
    from mfcc_tpu.ops import float_ops, pallas_mfcc

    if kind == "pallas":
        return lambda a: pallas_mfcc.mfcc_batch_pallas(a, cfg)
    if kind == "pallas-split":
        return lambda a: pallas_mfcc.mfcc_batch_pallas(a, cfg, split=True)
    if kind == "pallas-recomp":
        return lambda a: pallas_mfcc.mfcc_pallas_recomp(a, cfg, split=False)
    if kind in ("pallas-recomp-t", "pallas-recomp-t-i16"):
        # -i16 differs only in the INPUT dtype the bench feeds (the kernel
        # streams int16 at half the HBM traffic and upcasts in VMEM)
        return lambda a: pallas_mfcc.mfcc_pallas_recomp_t(a, cfg)
    if kind in ("pallas-radix2", "pallas-radix2-i16"):
        return lambda a: pallas_mfcc.mfcc_pallas_radix2(a, cfg)
    if kind == "pallas-fladder-i16":
        # the f32 block-ladder kernel (round 5i): the FFT as VPU block
        # butterflies instead of the 6-pass bf16-limb MXU split-DFT
        from mfcc_tpu.ops import pallas_fladder
        return lambda a: pallas_fladder.mfcc_float_ladder_pallas(a, cfg)
    if kind == "pallas-radix2-fast-i16":
        # the opt-in 3-pass fast mode, now a per-call parameter
        # (MFCC(precision="fast") routes here)
        return lambda a: pallas_mfcc.mfcc_pallas_radix2(a, cfg,
                                                        dft_passes=3)
    if kind in ("pallas-fmaj", "pallas-fmaj-i16"):
        return lambda a: pallas_mfcc.mfcc_pallas_fmaj(a, cfg)
    if kind == "pallas-recomp-bf16":
        return lambda a: pallas_mfcc.mfcc_pallas_recomp(a, cfg, split=True)
    if kind == "int":
        from mfcc_tpu.ops import pallas_int
        if pallas_int.pallas_int_supported(cfg):
            return lambda a: pallas_int.mfcc_int_pallas_v3(a, cfg)
        from mfcc_tpu.ops import int_ops
        return lambda a: int_ops.mfcc_int_batch(a, cfg)
    if kind == "f64ish":
        from mfcc_tpu.ops import pallas_df32
        if pallas_df32.pallas_f64ish_supported(cfg):
            # the fused compensated kernel (round-4 VERDICT weak #3): same
            # max(1e-5, 2 ulp) gate, ~8x the staged-XLA throughput
            return lambda a: pallas_df32.mfcc_f64ish_pallas(a, cfg)
        return functools.partial(float_ops.mfcc_batch, cfg=cfg,
                                 precision="f64ish")
    if kind.endswith("-split"):
        return functools.partial(float_ops.mfcc_batch, cfg=cfg,
                                 method=kind[:-6], precision="split")
    return functools.partial(float_ops.mfcc_batch, cfg=cfg, method=kind)


def build_fn(cfg, kind):
    import jax
    base = resolve_base(cfg, kind)
    # salt defeats any result caching; costs one elementwise pass
    return jax.jit(lambda a, salt: base(a + salt))


def time_fn(fn, x, iters, salt_dtype=None):
    import jax.numpy as jnp
    salt_dtype = salt_dtype or x.dtype
    mk = lambda v: jnp.asarray(v, salt_dtype)
    red = int if jnp.issubdtype(salt_dtype, jnp.integer) else float
    red(fn(x, mk(0)).sum())                            # warm / compile
    probe = [fn(x, mk(100 + i))[0, 0, 0] for i in range(2)]
    red(jnp.stack(probe).sum())                        # settle eager helper ops
    best = float("inf")
    for rep in range(2):                               # best-of-2 kills order effects
        t0 = time.perf_counter()
        acc = [fn(x, mk(1 + 100 * rep + i))[0, 0, 0]
               for i in range(iters)]
        red(jnp.stack(acc).sum())                      # force everything
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def time_fused(cfg, kind, x, nframes, reps=4, iters=4,
               return_rounds=False):
    """Time `reps` device-side pipeline runs fused into one dispatch.

    ``return_rounds``: also return the per-round frames/s list (3 rounds),
    so callers can report min/median/max spread (round-4 VERDICT weak #6:
    single-number records make rehearsal-vs-driver drift uninterpretable).
    """
    import jax
    import jax.numpy as jnp

    base = resolve_base(cfg, kind)
    salt_dtype = x.dtype
    intlike = jnp.issubdtype(salt_dtype, jnp.integer)
    red = int if intlike else float

    def repfn(a, s):
        return jnp.stack([base(a + (s + r))[0, 0, 0] for r in range(reps)])

    fn = jax.jit(repfn)
    red(fn(x, jnp.asarray(0, salt_dtype)).sum())
    rounds = []
    for rep in range(3):        # best-of-3: tunnel jitter is 6-36 ms/dispatch
        t0 = time.perf_counter()
        acc = [fn(x, jnp.asarray(1 + 10 * rep + i, salt_dtype))
               for i in range(iters)]
        red(jnp.stack(acc).sum())
        rounds.append(nframes * iters * reps / (time.perf_counter() - t0))
    if return_rounds:
        return max(rounds), rounds
    return max(rounds)


def accuracy_of(cfg, kind):
    """Gate error = max over (a) the synthetic signal and (b) ~2 s of the
    reference's real speech wav when mounted.  Real speech has quiet mel
    bins that log2 amplifies -- a short loud synthetic alone under-gates
    (the round-1 4-pass-bf16 winner measured 3.5e-4 synthetic but 2.3e-3 on
    the wav; see docs/BENCH.md round-2 notes)."""
    import os
    import jax.numpy as jnp
    from mfcc_tpu.ref import float_ref
    fn = build_fn(cfg, kind)
    sig = make_audio(2, 512 + 4 * 170, seed=7)
    want = np.stack([float_ref.mfcc_float(sig[i], cfg) for i in range(2)])
    got = np.asarray(fn(jnp.asarray(sig), jnp.float32(0.0)))
    err = float(np.abs(want - got).max())
    wav = "/root/reference/f2bjrop1.0.wav"
    if os.path.exists(wav):
        from scipy.io import wavfile
        _, audio = wavfile.read(wav)
        real = audio[: 512 + 186 * 170].astype(np.float32)[None]
        want_r = float_ref.mfcc_float(real[0], cfg)
        got_r = np.asarray(fn(jnp.asarray(real), jnp.float32(0.0)))[0]
        err = max(err, float(np.abs(want_r - got_r).max()))
    return err


def int_exactness(cfg):
    """Gate: the timed INT formulation must be element-exact vs the RTL
    oracle on a real-scale signal."""
    import jax
    import jax.numpy as jnp
    from mfcc_tpu.ref import int_ref
    sig = make_audio(2, 512 + 6 * 170, seed=9).astype(np.int64)
    want = np.stack([int_ref.mfcc_int(sig[i], cfg) for i in range(2)])
    got = np.asarray(jax.jit(resolve_base(cfg, "int"))(
        jnp.asarray(sig, jnp.int32)))
    return bool(np.array_equal(want, got))


def bench_int(cfg, S, T, F, iters):
    """First-class INT benchmark: (frames/s, bit_exact).  Never raises."""
    import jax
    import jax.numpy as jnp
    try:
        exact = int_exactness(cfg)
        xi = jax.device_put(jnp.asarray(make_audio(S, T, seed=3), jnp.int32))
        int(jnp.abs(xi).max())                  # force residency
        fn = build_fn(cfg, "int")
        dt = time_fn(fn, xi, iters, salt_dtype=jnp.int32)
        fps = S * F / dt
        print(f"# int (bit-exact={exact}): {fps/1e6:.3f} Mframes/s "
              f"({dt*1e3:.2f} ms/iter, S={S})", file=sys.stderr)
        fused = time_fused(cfg, "int", xi, S * F, reps=12, iters=3)
        print(f"# int fused-dispatch: {fused/1e6:.3f} Mframes/s "
              f"(target {INT_TARGET_FRAMES_PER_S/1e6:.1f})", file=sys.stderr)
        fps = max(fps, fused)
        return (fps, exact) if exact else (0.0, False)
    except Exception as e:
        print(f"# int bench FAILED: {e!r}", file=sys.stderr)
        return 0.0, False


def f64ish_gate_err(cfg):
    """The f64ish accuracy metric in the mode's own gate units: max over
    elements of |got - want| / max(1e-5, 2 ulp(want)) -- <= 1.0 passes.
    (A flat max-abs-1e-5 would spuriously fail on large-|c0| elements
    whose 2-ulp f32 floor exceeds 1e-5; see docs/BENCH.md round 3f.)"""
    import os
    import jax.numpy as jnp
    from mfcc_tpu.ref import float_ref
    fn = build_fn(cfg, "f64ish")
    sigs = [make_audio(2, 512 + 4 * 170, seed=7)]
    wav = "/root/reference/f2bjrop1.0.wav"
    if os.path.exists(wav):
        from scipy.io import wavfile
        _, audio = wavfile.read(wav)
        sigs.append(audio[: 512 + 18 * 170].astype(np.float32)[None]
                    .repeat(2, 0))
    worst = 0.0
    for sig in sigs:
        want = np.stack([float_ref.mfcc_float(sig[i], cfg)
                         for i in range(sig.shape[0])])
        got = np.asarray(fn(jnp.asarray(sig), jnp.float32(0.0)))
        tol = np.maximum(F64ISH_GATE,
                         2 * np.abs(want) * np.finfo(np.float32).eps)
        err = float((np.abs(want - got) / tol).max())
        # NaN/Inf in the output must FAIL the gate -- Python's
        # max(0.0, nan) silently returns 0.0 (found by the round-5h A/B:
        # a stale-LUT bug produced NaNs that read as a 0.000 PASS)
        if not np.isfinite(err):
            return float("inf")
        worst = max(worst, err)
    return worst


def bench_f64ish(cfg, S=512, T=None, iters=3):
    """The compensated double-f32 accuracy mode's cost curve (round-3
    VERDICT weak #7): frames/s at the elementwise max(1e-5, 2 ulp) gate.
    Returns (fps, err-in-gate-units); (0, err) if the gate fails,
    (0, inf) if the run fails.  S=512 x ~1 s: the fused kernel
    (ops/pallas_df32) makes this a real throughput path, so the shape is
    bench-scale rather than the old slow-mode miniature."""
    import jax
    import jax.numpy as jnp
    try:
        T = T or cfg.nfft + 93 * cfg.hop   # ~1 s/stream
        F = cfg.n_frames(T)
        err = f64ish_gate_err(cfg)
        print(f"# f64ish accuracy: {err:.3f} gate-units "
              f"({'OK' if err <= 1.0 else 'REJECT'}; 1.0 = elementwise "
              "max(1e-5, 2 ulp))", file=sys.stderr)
        x = jax.device_put(jnp.asarray(make_audio(S, T, seed=5)))
        float(jnp.abs(x).max())
        fps = time_fused(cfg, "f64ish", x, S * F, reps=4, iters=iters)
        print(f"# f64ish: {fps/1e6:.3f} Mframes/s (S={S})", file=sys.stderr)
        return (fps if err <= 1.0 else 0.0), err
    except Exception as e:
        print(f"# f64ish bench FAILED: {e!r}", file=sys.stderr)
        return 0.0, float("inf")


def bench_serving(cfg, S=4096, C=1024, reps=16, iters=3,
                  fast_ok=True):
    """Serving-path capacity: dispatch-amortized streaming steps through
    StreamingMFCC (the fused stream kernel on TPU, transposed carry state,
    int16 wire chunks -- the production serving shape), S concurrent
    streams x C-sample chunks, state threaded rep-to-rep inside one
    dispatch (a real sequential serving loop, not independent batch runs).

    Returns {"serving_streams_float": N, "serving_streams_int": N, ...}:
    how many concurrent REAL-TIME 16 kHz streams one chip sustains --
    S * (C / samplerate) / step_seconds.  0 on failure so regressions are
    machine-visible."""
    import jax
    import jax.numpy as jnp
    from mfcc_tpu import streaming

    out = {}
    audio = make_audio(S, C, seed=11)
    # (key suffix, int_path, transposed_chunks, precision): the *_cht
    # rows A/B the relayout-free positions-major chunk ingest (stderr
    # only; the JSON keys stay the shipped default until a TPU
    # measurement flips it); the _fast row records the opt-in 3-pass
    # mode's serving capacity -- ``fast_ok`` carries the batch fast-mode
    # accuracy gate verdict (computed BEFORE serving runs, so a rejected
    # gate zeroes this key instead of shipping an ungated capacity)
    variants = (("float", False, False, "highest"),
                ("int", True, False, "highest"),
                ("float_cht", False, True, "highest"),
                ("int_cht", True, True, "highest"),
                ("float_fast", False, False, "fast"))
    for name, int_path, chunks_t, prec in variants:
        key = f"serving_streams_{name}"
        fast = prec == "fast"
        if fast and not fast_ok:
            print(f"# serving {name}: skipped (fast-mode accuracy gate "
                  "rejected)", file=sys.stderr)
            out[key] = 0.0
            continue
        try:
            sm = streaming.StreamingMFCC(cfg, int_path=int_path,
                                         precision=prec,
                                         transposed_state=True,
                                         transposed_chunks=chunks_t)
            if (chunks_t or fast) and sm._fused_jit is None:
                out[key] = 0.0
                continue                # fused-only variant; skip on CPU
            dt = jnp.int16 if sm._fused_jit is not None \
                else (jnp.int32 if int_path else jnp.float32)
            x = jax.device_put(jnp.asarray(audio.T if chunks_t else audio,
                                           dt))
            reset0 = jnp.zeros((S,), bool)
            state0 = sm.init(S)
            fused = sm._fused_jit is not None
            step = (sm._fused_jit if fused
                    else (lambda c, s, r: sm.step(c, s, r)))

            def repfn(chunks, state, salt):
                acc = jnp.zeros((), jnp.float32)
                for r in range(reps):
                    feats, mask, state = step(
                        chunks + (salt + r).astype(chunks.dtype),
                        state, reset0)
                    acc = acc + feats[0, 0, 0].astype(jnp.float32)
                return acc, state

            fn = jax.jit(repfn)
            mk = lambda v: jnp.asarray(v, dt)
            a, st = fn(x, state0, mk(0))                  # warm / compile
            float(a) ; jax.block_until_ready(st)
            # one untimed pipeline-warm round, using the IDENTICAL readback
            # expressions as the timed rounds: the first execution of the
            # tiny stack/sum and count-max readback ops pays a ~1.7 s
            # remote compile through the tunnel, which was polluting the
            # _minmax variance bound (measured min 7.0k vs max 184k
            # streams in the round-5 rehearsals; instrumented in
            # docs/BENCH.md round 5f)
            st, accs = state0, []
            for i in range(iters):
                a, st = fn(x, st, mk(101 + i))
                accs.append(a)
            float(jnp.stack(accs).sum())
            int(jnp.asarray(st.count).max())
            rounds = []
            for rep in range(3):
                t0 = time.perf_counter()
                accs = []
                st = state0
                for i in range(iters):
                    a, st = fn(x, st, mk(1 + 10 * rep + i))
                    accs.append(a)
                float(jnp.stack(accs).sum())              # force completion
                int(jnp.asarray(st.count).max())
                rounds.append((time.perf_counter() - t0) / (iters * reps))
            best = min(rounds)
            streams = S * (C / cfg.samplerate) / best
            print(f"# serving {name} ({'fused kernel' if fused else 'XLA'}): "
                  f"{best*1e3:.2f} ms/step (S={S}, C={C}) -> "
                  f"{streams/1e3:.1f}k real-time streams", file=sys.stderr)
            out[key] = round(streams, 1)
            if name in ("float", "int"):
                # run-to-run spread of the headline serving keys (weak #6):
                # [min, max] streams over the 3 timing rounds
                ss = sorted(S * (C / cfg.samplerate) / t for t in rounds)
                out[key + "_minmax"] = [round(ss[0], 1), round(ss[-1], 1)]
        except Exception as e:
            print(f"# serving {name} FAILED: {e!r}", file=sys.stderr)
            out[key] = 0.0
    return out


def bench_serving_scan(cfg, S=4096, C=1024, K=256):
    """Un-tunneled serving ceiling (round-4 VERDICT weak #5): K sequential
    serving steps chained through ONE lax.scan dispatch, so per-step time
    is pure device work (the ~1-1.5 ms/step of tunnel dispatch+readback
    amortized K-fold away).  This is the device's true capacity ceiling;
    the serving_streams_* keys are what a host-driven per-step loop
    (the lock-step protocol shape, software/main.c:128-165) achieves
    through this tunnel.  Records serving_streams_{float,int}_scan."""
    import jax
    import jax.numpy as jnp
    from mfcc_tpu import streaming

    out = {}
    audio = make_audio(S, C, seed=17)
    for name, int_path in (("float", False), ("int", True)):
        key = f"serving_streams_{name}_scan"
        try:
            sm = streaming.StreamingMFCC(cfg, int_path=int_path,
                                         transposed_state=True)
            if sm._fused_jit is None:
                out[key] = 0.0
                continue                # device-ceiling metric: TPU only
            step = sm._fused_jit
            dt = jnp.int16
            x = jax.device_put(jnp.asarray(audio, dt))
            reset0 = jnp.zeros((S,), bool)
            state0 = sm.init(S)

            def scanfn(chunks, state, salts):
                def body(st, s):
                    feats, _, st2 = step(chunks + s.astype(chunks.dtype),
                                         st, reset0)
                    return st2, feats[0, 0, 0].astype(jnp.float32)
                st, accs = jax.lax.scan(body, state, salts)
                return accs.sum(), st

            fn = jax.jit(scanfn)
            mk = lambda b: jnp.arange(b, b + K, dtype=jnp.int32)
            a, st = fn(x, state0, mk(0))                  # warm / compile
            float(a) ; jax.block_until_ready(st)
            best = float("inf")
            for rep in range(3):
                t0 = time.perf_counter()
                a, st = fn(x, state0, mk(1 + 1000 * rep))
                float(a)
                int(jnp.asarray(st.count).max())
                best = min(best, (time.perf_counter() - t0) / K)
            streams = S * (C / cfg.samplerate) / best
            print(f"# serving {name} scan-ceiling: {best*1e3:.3f} ms/step "
                  f"(K={K} steps/dispatch, S={S}, C={C}) -> "
                  f"{streams/1e3:.1f}k real-time streams (device ceiling)",
                  file=sys.stderr)
            out[key] = round(streams, 1)
        except Exception as e:
            print(f"# serving {name} scan-ceiling FAILED: {e!r}",
                  file=sys.stderr)
            out[key] = 0.0
    return out


def bench_latency(cfg, S=4096, iters=24):
    """Latency-mode serving curve (round-3 VERDICT missing #3): per-step
    wall time and real-time capacity at small chunk sizes, down to the
    reference's per-hop lock-step operating point (the host reads 32
    cepstra back every 170 samples = 10.6 ms, software/main.c:128-165).

    End-to-end latency for a feature ~= chunk fill time (C/16kHz, client
    pacing) + step time (this measurement) + delivery; capacity =
    S * (C/16k) / step.  Small C buys latency with throughput: the table
    quantifies the trade.  Diagnostic mode (--latency), not a JSON key."""
    import jax
    import jax.numpy as jnp
    from mfcc_tpu import streaming

    print(f"# latency mode: S={S} streams, fused serving step, int16 wire",
          file=sys.stderr)
    print("# path  C(smp)  chunk_ms  step_ms_p50  step_ms_p99  "
          "rt_streams  latency_floor_ms", file=sys.stderr)
    for int_path in (False, True):
        name = "int" if int_path else "float"
        for C in (170, 256, 512, 1024):
            try:
                sm = streaming.StreamingMFCC(cfg, int_path=int_path,
                                             transposed_state=True)
                step = sm._fused_jit or (lambda c, s, r: sm.step(c, s, r))
                dt = jnp.int16 if sm._fused_jit is not None \
                    else (jnp.int32 if int_path else jnp.float32)
                x = jax.device_put(
                    jnp.asarray(make_audio(S, C, seed=13), dt))
                reset0 = jnp.zeros((S,), bool)
                st = sm.init(S)
                f, m, st = step(x, st, reset0)
                float(jnp.asarray(f)[0, 0, 0])           # warm / compile
                times = []
                for i in range(iters):
                    xi = x + jnp.asarray(1 + i, dt)      # defeat result cache
                    t0 = time.perf_counter()
                    f, m, st = step(xi, st, reset0)
                    # host readback of a scalar forces completion (tunnel-
                    # safe); it IS part of a latency-bound serving loop
                    float(jnp.asarray(f)[0, 0, 0])
                    times.append(time.perf_counter() - t0)
                times.sort()
                p50 = times[len(times) // 2] * 1e3
                p99 = times[min(len(times) - 1,
                               int(len(times) * 0.99))] * 1e3
                chunk_ms = C / cfg.samplerate * 1e3
                streams = S * (C / cfg.samplerate) / (times[len(times) // 2])
                print(f"# {name:5s} {C:6d} {chunk_ms:9.1f} {p50:12.2f} "
                      f"{p99:12.2f} {streams/1e3:9.1f}k "
                      f"{chunk_ms + p50:10.1f}", file=sys.stderr)
            except Exception as e:
                print(f"# {name} C={C}: FAILED ({e!r})", file=sys.stderr)


def bench_ablate(cfg, S=1024, secs=4.0, int_path=False):
    """Per-stage cost attribution of the shipped radix-2 i16 kernel (or,
    with ``int_path``, the bit-exact INT v3 kernel) via the in-kernel
    truncation hooks (docs/BENCH.md round 3h methodology); prints a
    cumulative table to stderr.  Not part of the JSON line -- run
    explicitly with --ablate / --ablate-int (each cut is a fresh Mosaic
    compile).

    CAVEAT (measured, docs/BENCH.md round 4e): cumulative cuts measure
    how Mosaic re-plans the WHOLE kernel, not a stage's marginal op
    cost -- treat a stage's delta as a hypothesis and falsify it by
    halving that stage's work before optimizing (the INT filterbank's
    apparent 42% survived every targeted fix)."""
    import jax
    import jax.numpy as jnp
    from mfcc_tpu.ops import pallas_mfcc, pallas_int

    T = cfg.nfft + int(round((secs * cfg.samplerate - cfg.nfft)
                             / cfg.hop)) * cfg.hop
    F = cfg.n_frames(T)
    dt = jnp.int32 if int_path else jnp.int16
    x = jax.device_put(jnp.asarray(make_audio(S, T), dt))
    int(jnp.abs(x).max())
    reps, iters = 8, 3
    full = None
    cuts = ((None, "raw", "emph", "frames", "window", "fft", "power",
             "mel", "logmel") if int_path else
            (None, "raw", "pre", "emph", "frames", "dft", "power", "mel"))
    for stop in cuts:
        if int_path:
            base = lambda a, st=stop: pallas_int.mfcc_int_pallas_v3(
                a, cfg, stop_after=st)
        else:
            base = lambda a, st=stop: pallas_mfcc.mfcc_pallas_radix2(
                a, cfg, stop_after=st)

        def repfn(a, s, base=base):
            return jnp.stack([base(a + (s + r))[0, 0, 0]
                              for r in range(reps)])
        fn = jax.jit(repfn)
        float(fn(x, jnp.asarray(0, dt)).sum())
        best = float("inf")
        for rep in range(3):
            t0 = time.perf_counter()
            acc = [fn(x, jnp.asarray(1 + 10 * rep + i, dt))
                   for i in range(iters)]
            float(jnp.stack(acc).sum())
            best = min(best, (time.perf_counter() - t0) / (iters * reps))
        if stop is None:
            full = best
            print(f"# ablate full: {best*1e3:7.3f} ms/run "
                  f"({S*F/best/1e6:.2f} Mf/s)", file=sys.stderr)
        else:
            print(f"# ablate {stop:>6s}: {best*1e3:7.3f} ms/run "
                  f"(cum {100*best/full:.0f}%)", file=sys.stderr)


def main():
    if not os.environ.get("MFCC_BENCH_CHILD"):
        return _supervise(sys.argv[1:])

    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="small shapes / few iters (CI smoke)")
    ap.add_argument("--streams", type=int, default=None)
    ap.add_argument("--seconds", type=float, default=None)
    ap.add_argument("--iters", type=int, default=None)
    ap.add_argument("--ablate", action="store_true",
                    help="print the radix-2 per-stage cost table and exit")
    ap.add_argument("--ablate-int", action="store_true",
                    help="print the INT v3 per-stage cost table and exit")
    ap.add_argument("--latency", action="store_true",
                    help="print the small-chunk latency/capacity curve "
                         "and exit")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from mfcc_tpu.config import MFCCConfig
    cfg = MFCCConfig()

    if args.ablate or args.ablate_int:
        bench_ablate(cfg, S=args.streams or 1024,
                     secs=args.seconds or 4.0, int_path=args.ablate_int)
        return 0
    if args.latency:
        bench_latency(cfg, S=args.streams or 4096,
                      iters=args.iters or 24)
        return 0

    if args.quick:
        S, T, iters = 64, 512 + 93 * 170, 6
        candidates = ["segmented"]
    else:
        S = args.streams or 1024
        secs = args.seconds or 4.0
        T = cfg.nfft + int(round((secs * cfg.samplerate - cfg.nfft)
                                 / cfg.hop)) * cfg.hop
        iters = args.iters or 12
        # pallas-recomp-bf16 and pallas-split are expected to REJECT on the
        # real-wav gate (4-pass bf16 ~2.3e-3 there); kept as candidates so
        # the rejection is visible in the bench log
        # radix2 (the winner family), recomp-t-i16 (independent fallback
        # kernel), bf16 (the documented gate rejection), dft (XLA
        # baseline); superseded variants are dropped to keep the driver's
        # compile budget bounded
        # fmaj: the zero-relayout frame-major kernel (full-DFT cost traded
        # for no input transposes -- the round-3h input-path finding)
        candidates = ["pallas-fladder-i16", "pallas-radix2-i16",
                      "pallas-fmaj-i16", "pallas-radix2",
                      "pallas-recomp-t-i16", "pallas-recomp-bf16", "dft"]

    F = cfg.n_frames(T)
    x = jax.device_put(jnp.asarray(make_audio(S, T)))
    float(x.sum())  # force residency
    x_i16 = None  # lazily created for the int16-input candidates

    def timing_input(kind):
        nonlocal x_i16
        if not kind.endswith("-i16"):
            return x
        if x_i16 is None:
            x_i16 = jax.device_put(jnp.asarray(make_audio(S, T), jnp.int16))
            int(jnp.abs(x_i16).max())
        return x_i16

    int_fps, int_exact = (0.0, False)
    serving = {"serving_streams_float": 0.0, "serving_streams_int": 0.0}
    f64_fps, f64_err = 0.0, float("inf")
    fast_fps, fast_err = 0.0, float("inf")
    if not args.quick:
        # fast-mode accuracy gate FIRST, so the fast serving key below is
        # measured only when the arithmetic passes (round-4 ADVICE: the
        # serving capacity must not outlive a rejected gate)
        try:
            fast_err = accuracy_of(cfg, "pallas-radix2-fast-i16")
        except Exception as e:
            print(f"# fast-mode gate check FAILED: {e!r}", file=sys.stderr)
        _save_partial(float_fast_gate_err=(round(fast_err, 6)
                                           if np.isfinite(fast_err)
                                           else None))
        serving = bench_serving(cfg, fast_ok=fast_err <= FAST_GATE)
        _save_partial(**serving)
        serving.update(bench_serving_scan(cfg))
        _save_partial(**{k: serving[k] for k in serving
                         if k.endswith("_scan")})
        int_fps, int_exact = bench_int(cfg, S, T, F, max(6, iters // 2))
        _save_partial(int_frames_per_second=round(int_fps, 1),
                      int_bit_exact=int_exact)

    passing = []
    for kind in candidates:
        try:
            # accuracy is gated on the f32 route; make_audio is integer-
            # valued, so the -i16 route computes on IDENTICAL values
            err = accuracy_of(cfg, kind)
            fn = build_fn(cfg, kind)
            xt = timing_input(kind)
            dt = time_fn(fn, xt, iters, salt_dtype=xt.dtype)
        except Exception as e:
            print(f"# {kind}: FAILED ({e!r})", file=sys.stderr)
            continue
        fps = S * F / dt
        ok = err <= ACCURACY_GATE
        print(f"# {kind}: {fps/1e6:.3f} Mframes/s ({dt*1e3:.2f} ms/iter), "
              f"err={err:.2e} {'OK' if ok else 'REJECT'}", file=sys.stderr)
        if ok:
            passing.append((fps, kind))
            if fps > max((f for f, _ in passing[:-1]), default=0.0):
                _save_partial(value=round(fps, 1),
                              vs_baseline=round(fps / BASELINE_FRAMES_PER_S,
                                                2))
    passing.sort(reverse=True)
    best = passing[0] if passing else None

    if best is None:
        print(json.dumps({"metric": "mfcc_frames_per_second", "value": 0,
                          "unit": "frames/s", "vs_baseline": 0.0,
                          "int_frames_per_second": round(int_fps, 1),
                          "int_bit_exact": int_exact,
                          "f64ish_frames_per_second": 0.0, **serving}))
        return 1

    fps = best[0]
    if not args.quick:
        # refine the winner with device-side repetition so per-call dispatch
        # overhead (~2-4 ms through remote tunnels) doesn't pollute the
        # steady-state number
        # per-iter ordering is polluted by per-dispatch overhead, by the
        # salt-copy cost (dtype-dependent) and by tunnel jitter, so
        # fuse-time the top THREE candidates and keep the max
        value_minmax = None
        for n_kind, (_, kind) in enumerate(passing[:3]):
            try:
                fused, rounds = time_fused(cfg, kind, timing_input(kind),
                                           S * F, reps=8, iters=3,
                                           return_rounds=True)
                print(f"# {kind} fused-dispatch: "
                      f"{fused/1e6:.3f} Mframes/s", file=sys.stderr)
                if fused > fps or n_kind == 0:
                    # run-to-run spread of the (current) winner (weak #6)
                    value_minmax = [round(min(rounds), 1),
                                    round(max(rounds), 1)]
                fps = max(fused, fps)
            except Exception as e:
                print(f"# fused refinement ({kind}) failed: {e!r}",
                      file=sys.stderr)
        _save_partial(value=round(fps, 1),
                      vs_baseline=round(fps / BASELINE_FRAMES_PER_S, 2),
                      **({"value_minmax": value_minmax}
                         if value_minmax else {}))
        f64_fps, f64_err = bench_f64ish(cfg)
        _save_partial(f64ish_frames_per_second=round(f64_fps, 1),
                      f64ish_gate_err=f64_err)
        # the OPT-IN 3-pass fast mode (MFCC(precision="fast")): recorded
        # under its own 2e-3 gate so the speed/accuracy dial is a driver
        # artifact, not a session claim (docs/BENCH.md round 4g); the gate
        # itself ran before bench_serving above
        try:
            if fast_err <= FAST_GATE:
                fast_fps = time_fused(cfg, "pallas-radix2-fast-i16",
                                      timing_input("pallas-radix2-i16"),
                                      S * F, reps=8, iters=3)
            print(f"# float fast mode (3-pass): {fast_fps/1e6:.3f} "
                  f"Mframes/s, err={fast_err:.2e} "
                  f"{'OK' if fast_err <= FAST_GATE else 'REJECT'}",
                  file=sys.stderr)
        except Exception as e:
            print(f"# float fast mode FAILED: {e!r}", file=sys.stderr)
        _save_partial(float_fast_frames_per_second=round(fast_fps, 1),
                      float_fast_gate_err=(round(fast_err, 6)
                                           if np.isfinite(fast_err)
                                           else None))

    print(json.dumps({
        "metric": "mfcc_frames_per_second",
        "value": round(fps, 1),
        "unit": "frames/s",
        "vs_baseline": round(fps / BASELINE_FRAMES_PER_S, 2),
        "int_frames_per_second": round(int_fps, 1),
        "int_bit_exact": int_exact,
        "f64ish_frames_per_second": round(f64_fps, 1),
        "f64ish_gate_err": (round(f64_err, 6)
                               if np.isfinite(f64_err) else None),
        "float_fast_frames_per_second": round(fast_fps, 1),
        "float_fast_gate_err": (round(fast_err, 6)
                                if np.isfinite(fast_err) else None),
        **serving,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
