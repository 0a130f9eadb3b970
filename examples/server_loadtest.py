#!/usr/bin/env python3
"""Loopback load test: N synthetic REAL-TIME clients against FeatureServer.

Measures the server AS a server (round-2 VERDICT weak item 7): sustained
frames/s, per-chunk reply latency (p50/p99), and stepper-loop occupancy
(time in the per-slot Python gather vs the batched device step), with every
client pacing chunk-sized sends at the real-time rate (C/16000 s period).

    python examples/server_loadtest.py --streams 256 --seconds 8
    python examples/server_loadtest.py --streams 64 --cpu     # no TPU needed

One sender thread paces all sockets; one selector-driven reader drains
replies, so the harness itself scales to hundreds of connections.
"""

import argparse
import selectors
import socket
import threading
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--streams", type=int, default=256)
    ap.add_argument("--chunk", type=int, default=1024)
    ap.add_argument("--seconds", type=float, default=8.0)
    ap.add_argument("--ncep", type=int, default=16)
    ap.add_argument("--float", action="store_true")
    ap.add_argument("--cpu", action="store_true",
                    help="pin the server step to the host CPU")
    ap.add_argument("--tick", type=float, default=0.002)
    args = ap.parse_args()

    from mfcc_tpu.config import MFCCConfig
    from mfcc_tpu import server as srv
    from mfcc_tpu.io import transport

    cfg = MFCCConfig(nceptrums=args.ncep)
    device = None
    if args.cpu:
        import jax
        device = jax.devices("cpu")[0]
    N, C = args.streams, args.chunk
    print(f"# starting server: {N} slots, chunk={C}, "
          f"{'float' if args.float else 'int'} path, "
          f"device={'cpu' if args.cpu else 'ambient'} ... (first compile "
          f"may take minutes on a cold remote-compile cache)", flush=True)
    s = srv.FeatureServer(cfg, max_streams=N, chunk=C,
                          int_path=not args.float, tick_s=args.tick,
                          device=device).start()
    host, port = s.address

    # one chunk of wire words, reused by every stream (per-chunk send cost
    # is what matters; values only need to be feature-realistic)
    rng = np.random.default_rng(0)
    t = np.arange(C) / 16000.0
    sig = np.clip(8000 * np.sin(2 * np.pi * 700 * t)
                  + rng.integers(-3000, 3000, C), -32768, 32767)
    payload = transport.encode_stream(sig.astype(np.int16),
                                      reset_first=False).astype("<u4").tobytes()

    socks = []
    last_send = {}
    latencies = []
    frames_rx = [0]
    lat_lock = threading.Lock()
    for _ in range(N):
        c = socket.create_connection((host, port))
        c.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)
        c.setblocking(False)
        socks.append(c)
        last_send[c.fileno()] = None

    stop = threading.Event()
    period = C / cfg.samplerate
    missed = [0]

    def sender():
        nxt = time.perf_counter()
        while not stop.is_set():
            now = time.perf_counter()
            if now < nxt:
                time.sleep(min(nxt - now, 0.005))
                continue
            if now - nxt > period:          # fell behind a full period
                missed[0] += 1
            for c in socks:
                try:
                    c.sendall(payload)
                    last_send[c.fileno()] = now
                except (BlockingIOError, OSError):
                    pass
            nxt += period

    def reader():
        sel = selectors.DefaultSelector()
        bufs = {}
        for c in socks:
            sel.register(c, selectors.EVENT_READ)
            bufs[c.fileno()] = b""
        fsize = 2 + 2 * cfg.nceptrums       # magic + ncep int16
        while not stop.is_set():
            for key, _ in sel.select(timeout=0.05):
                c = key.fileobj
                try:
                    data = c.recv(65536)
                except (BlockingIOError, OSError):
                    continue
                if not data:
                    continue
                fd = c.fileno()
                buf = bufs[fd] + data
                nf = len(buf) // fsize
                bufs[fd] = buf[nf * fsize:]
                if nf:
                    now = time.perf_counter()
                    sent = last_send.get(fd)
                    with lat_lock:
                        frames_rx[0] += nf
                        if sent is not None:
                            latencies.append(now - sent)

    th_s = threading.Thread(target=sender, daemon=True)
    th_r = threading.Thread(target=reader, daemon=True)
    st0 = s.stats()                     # snapshot: occupancy over the load
    t0 = time.perf_counter()            # window only, not server lifetime
    th_s.start(); th_r.start()
    time.sleep(args.seconds)
    stop.set()
    th_s.join(timeout=2); th_r.join(timeout=2)
    elapsed = time.perf_counter() - t0
    for c in socks:
        try:
            c.close()
        except OSError:
            pass
    st = {k: v - st0[k] for k, v in s.stats().items()}
    s.stop()

    fps = frames_rx[0] / elapsed
    per_stream_rt = cfg.samplerate / cfg.hop        # ~94.1 frames/s
    lat = np.sort(np.array(latencies)) if latencies else np.array([0.0])
    busy = st["gather_s"] + st["compute_s"] + st["deliver_s"]
    print(f"streams={N} chunk={C} path={'float' if args.float else 'int'} "
          f"device={'cpu' if args.cpu else 'ambient'}")
    print(f"sustained: {fps:,.0f} frames/s "
          f"({fps / (N * per_stream_rt) * 100:.1f}% of the offered "
          f"real-time load; sender missed {missed[0]} periods)")
    print(f"latency: p50={np.percentile(lat, 50)*1e3:.1f} ms "
          f"p99={np.percentile(lat, 99)*1e3:.1f} ms (chunk period "
          f"{period*1e3:.0f} ms)")
    print(f"stepper: {st['steps']} steps, occupancy "
          f"{busy/elapsed*100:.1f}% (gather {st['gather_s']/elapsed*100:.1f}%"
          f" + dispatch {st['compute_s']/elapsed*100:.1f}%"
          f" + deliver {st['deliver_s']/elapsed*100:.1f}%), "
          f"{st['idle_ticks']} idle ticks")


if __name__ == "__main__":
    main()
