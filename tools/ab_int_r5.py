#!/usr/bin/env python3
"""Round-5 INT >=40 Mf/s hunt (round-4 VERDICT #2 / ROADMAP item 1).

Round 4e proved every filterbank FORMULATION chip-neutral (~32.3) and the
profile attributed the cost to work shared across the whole fused kernel
(ladder-output liveness, register pressure, serialized small-tile ops).
This round's arms attack the STRUCTURE instead:

  * split2    -- the pipeline as TWO Mosaic kernels: ladder+power writes
                 (nbins, L) int32 power blocks to HBM; a second kernel
                 runs filterbank/log2/DCT.  Bit-exact by construction
                 (same arithmetic, one HBM hop).  Tests the scheduler-
                 pressure hypothesis directly.
  * strides8  -- TIMING-ONLY ladder probe: the sub-vreg strides (4, 2, 1)
                 clamped to 8 (wrong numerics, same roll count) -- if this
                 is neutral, intra-vreg sublane rolls are not the ladder's
                 cost and a mid-ladder relayout would buy nothing.
  * ladder6   -- TIMING-ONLY: three general stages dropped -- the ladder's
                 marginal per-stage cost.

Bit-exact arms are gated in-process against the int_ref oracle; timing-only
arms are clearly marked and never shippable.  Run in the driver env.
"""

import os
import sys
import functools

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ab_flags import make_audio, time_fused  # noqa: E402


def split2_build(cfg):
    """Two-kernel INT pipeline: v3 front (preemph..power) -> HBM power
    blocks -> epilogue kernel (filterbank/log2/DCT)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from mfcc_tpu.ops import pallas_int as pi
    from mfcc_tpu.ops import int_ops

    nfft, hop = cfg.nfft, cfg.hop
    nbins = nfft // 2
    n4 = 4 * cfg.nfilters

    def front_kernel(xm_ref, xx_ref, prev_ref, wincol_ref, tw_ref,
                     pow_ref, fbuf, *, bf, nseg, nbk):
        import jax.numpy as jnp
        from mfcc_tpu.ops import framing
        L = nbk * bf
        tiles = [xm_ref[0, i] for i in range(nbk)] + [xx_ref[0, 0]]
        C = jnp.concatenate(tiles, axis=1).astype(jnp.int32)
        rows = jax.lax.broadcasted_iota(jnp.int32, C.shape, 0)
        lanecol = jax.lax.broadcasted_iota(jnp.int32, (1, C.shape[1]), 1)
        up = pltpu.roll(C, 1, 0)
        wrapped = pltpu.roll(C[hop - 1: hop, :], 1, 1)
        prev_row0 = jnp.where(lanecol == 0, prev_ref[0, 0, 0], wrapped)
        prev = jnp.where(rows == 0, prev_row0, up)
        E = framing.wrap_signed(C + (prev >> 5) - prev, cfg.width)
        half = nfft // 2
        Es = E.reshape(hop // 2, 2, C.shape[1])
        Eev, Eod = Es[:, 0], Es[:, 1]
        for b in range(nbk):
            for q in range(nseg):
                p0 = q * hop
                w = min(hop, nfft - p0)
                he, ho = (w + 1) // 2, w // 2
                lane = b * bf + q
                fbuf[p0 // 2: p0 // 2 + he, b * bf:(b + 1) * bf] = \
                    Eev[:he, lane: lane + bf]
                fbuf[half + p0 // 2: half + p0 // 2 + ho,
                     b * bf:(b + 1) * bf] = Eod[:ho, lane: lane + bf]
        x = fbuf[:]
        xw = framing.wrap_signed(
            (x * wincol_ref[:]) >> (cfg.window_precision + 1), cfg.width)
        wr, wi = pi._ladder(xw, jnp.zeros_like(xw), tw_ref, nfft,
                            layout="evenodd", final_half_only=True,
                            zero_imag_stages=pi._zero_imag_stage_count(nfft))
        s = wr * wr + wi * wi
        pow_ref[0] = jax.lax.shift_right_logical(
            s, jnp.int32(2 * 16 - cfg.power_width))

    def epi_kernel(pow_ref, fb_ref, dtw_ref, out_ref, dbuf_r, *, lanes,
                   fb_shift):
        import jax.numpy as jnp
        power = pow_ref[0]

        class _Shim:
            pass

        # reuse the shipped epilogue from the power onwards: feed wr/wi
        # such that wr*wr+wi*wi >> shift reproduces power is NOT possible
        # post-hoc; instead inline the shipped stages by calling
        # _post_fft_stages with a patched power -- simplest faithful route
        # is to re-run its body; to avoid drift we monkey-call the module
        # function with wr=power-sqrt shim... not expressible.  So: copy
        # the shipped implementation path by calling the internal helper
        # on a power override.
        pi._post_power_stages(power, fb_ref, dtw_ref, out_ref, dbuf_r,
                              cfg=cfg, fb_shift=fb_shift, lanes=lanes)

    tw = pi._ladder_packed_constants(nfft, layout="evenodd")
    fb_limbs, fb_shift = pi._fb_limb_matrix(cfg)
    dtw = pi._dct_packed_constants(cfg.nfilters)
    from mfcc_tpu import tables
    wc = np.asarray(tables.int_window_curve(nfft, cfg.window_precision),
                    np.int32)
    wincol = np.concatenate([wc[0::2], wc[1::2]]).reshape(nfft, 1)

    def run(audio):
        bf = pi.BF
        nseg = -(-nfft // hop)
        S, T = audio.shape
        F = cfg.n_frames(T)
        nb = -(-F // bf)
        nchunks = -(-nb // pi.NBMAX_INT)
        nbk = -(-nb // nchunks)
        Fp = nchunks * nbk * bf
        N = S * nchunks
        L = nbk * bf
        raw = audio.astype(jnp.int16)
        Lp = nchunks * nbk + 1
        need = Lp * bf * hop
        if need > T:
            raw = jnp.pad(raw, ((0, 0), (0, need - T)))
        T4 = raw[:, : need].reshape(S, Lp, bf, hop).swapaxes(-1, -2)
        tile = (hop, bf)
        prev_idx = jnp.maximum(jnp.arange(nchunks) * nbk * bf * hop - 1, 0)
        prevs = (raw[:, prev_idx].astype(jnp.int32)
                 * (jnp.arange(nchunks) > 0)).reshape(N, 1, 1)
        power = pl.pallas_call(
            functools.partial(front_kernel, bf=bf, nseg=nseg, nbk=nbk),
            grid=(N,),
            in_specs=[
                pl.BlockSpec((1, nbk) + tile,
                             lambda n, nc=nchunks: (n // nc, n % nc, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1) + tile,
                             lambda n, nc=nchunks, k=nbk:
                             (n // nc, (n % nc) * k + k, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, 1), lambda n: (n, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((nfft, 1), lambda n: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((nfft, tw.shape[1]), lambda n: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, nbins, L), lambda n: (n, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((N, nbins, L), jnp.int32),
            scratch_shapes=[pltpu.VMEM((nfft, L), jnp.int32)],
        )(T4, T4, prevs, jnp.asarray(wincol), jnp.asarray(tw))

        out = pl.pallas_call(
            functools.partial(epi_kernel, lanes=L, fb_shift=fb_shift),
            grid=(N,),
            in_specs=[
                pl.BlockSpec((1, nbins, L), lambda n: (n, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(fb_limbs.shape, lambda n: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((n4, dtw.shape[1]), lambda n: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, cfg.nceptrums, L),
                                   lambda n: (n, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((N, cfg.nceptrums, L), jnp.int32),
            scratch_shapes=[pltpu.VMEM((n4, L), jnp.int32)],
        )(power, jnp.asarray(fb_limbs), jnp.asarray(dtw))
        out = (out.reshape(S, nchunks, cfg.nceptrums, L).swapaxes(-1, -2)
               .reshape(S, Fp, cfg.nceptrums)[:, :F])
        return out

    return run


def main():
    import jax
    import jax.numpy as jnp
    from mfcc_tpu.config import MFCCConfig
    from mfcc_tpu.ops import pallas_int as pi
    from mfcc_tpu.ref import int_ref

    cfg = MFCCConfig()
    S, secs = 1024, 4.0
    T = cfg.nfft + int(round((secs * cfg.samplerate - cfg.nfft)
                             / cfg.hop)) * cfg.hop
    F = cfg.n_frames(T)
    print(f"devices: {jax.devices()}", file=sys.stderr)

    a = make_audio(S, T, seed=3)
    x = jax.device_put(jnp.asarray(a, jnp.int16))
    int(jnp.abs(x).max())

    gsig = make_audio(2, 512 + 6 * 170, seed=9)
    gwant = np.stack([int_ref.mfcc_int(gsig[i].astype(np.int64), cfg)
                      for i in range(2)])

    rows = []

    def arm(name, fn, gate=True, rounds=3):
        if gate:
            got = np.asarray(jax.jit(fn)(jnp.asarray(gsig, jnp.int16)))
            assert np.array_equal(gwant, got), f"{name}: bit-exact FAILED"
        res = []
        for rnd in range(rounds):
            fps = time_fused(fn, x, S * F, rounds=1)
            res.append(fps)
            print(f"# {name} r{rnd}: {fps/1e6:.2f} Mf/s", file=sys.stderr)
        rows.append((name, max(res) / 1e6))

    # baseline
    arm("v3 shipped", lambda audio: pi.mfcc_int_pallas_v3(audio, cfg))

    # two-kernel split (bit-exact)
    split_run = split2_build(cfg)
    arm("split2 (ladder+power | fb/log/dct)", split_run)

    # TIMING-ONLY ladder probes
    orig_strides = pi._ladder_strides

    def strides8(size, layout):
        return [max(d, 8) if d != 1 << (int(np.log2(size)) - 1) else d
                for d in orig_strides(size, layout)]

    pi._ladder_strides = strides8
    try:
        arm("strides>=8 [TIMING-ONLY]",
            lambda audio: pi.mfcc_int_pallas_v3(audio, cfg), gate=False)
    finally:
        pi._ladder_strides = orig_strides

    orig_ladder = pi._ladder

    # TIMING-ONLY: strides>=8 ladder PLUS the mid-ladder regroup op that a
    # bit-exact version would need (8-slice (64, 8, L) sublane extract +
    # half-split stores): measures aligned-stride stages + relayout cost
    def ladder_regroup(wr, wi, tw_ref, size, width=16, zero_imag_stages=0,
                       layout="natural", final_half_only=False):
        import jax.numpy as _jnp
        if size != cfg.nfft:
            return orig_ladder(wr, wi, tw_ref, size, width,
                               zero_imag_stages, layout, final_half_only)

        def regroup(v):
            g = v.reshape(size // 8, 8, v.shape[1])
            cols = [g[:, k, :] for k in range(8)]
            half = size // 16           # 32 source rows per half per k
            return _jnp.concatenate(
                [c[:half] for c in cols] + [c[half:] for c in cols], axis=0)

        pi._ladder_strides = strides8
        try:
            # run stages 0-4 via a truncated orig ladder is awkward; instead
            # run the full aligned-stride ladder and ADD one regroup of the
            # working pair mid-way (cost-accurate, numerics-only wrong)
            wr2, wi2 = orig_ladder(wr, wi, tw_ref, size, width,
                                   zero_imag_stages, layout, False)
        finally:
            pi._ladder_strides = orig_strides
        wr2 = regroup(wr2)
        wi2 = regroup(wi2)
        return wr2[: size // 2], wi2[: size // 2]

    pi._ladder = ladder_regroup
    try:
        arm("strides>=8 + regroup [TIMING-ONLY]",
            lambda audio: pi.mfcc_int_pallas_v3(audio, cfg), gate=False)
    finally:
        pi._ladder = orig_ladder

    def strides_drop3(size, layout):
        ds = orig_strides(size, layout)
        if size == cfg.nfft:
            ds = ds[:-4] + [ds[-1]]        # drop 3 general stages
        return ds

    # TIMING-ONLY regroup lowerings: swapaxes in one op / 3 rounds of
    # within-half pairwise deinterleave (the cheap (n, 2, L) reshape trick)
    def mk_ladder_regroup(kind):
        def ladder_rg(wr, wi, tw_ref, size, width=16, zero_imag_stages=0,
                      layout="natural", final_half_only=False):
            import jax.numpy as _jnp
            if size != cfg.nfft:
                return orig_ladder(wr, wi, tw_ref, size, width,
                                   zero_imag_stages, layout,
                                   final_half_only)

            if kind == "swap":
                def regroup(v):
                    g = v.reshape(2, size // 16, 8, v.shape[1])
                    return g.swapaxes(1, 2).reshape(size, v.shape[1])
            else:
                def regroup(v):
                    for _ in range(3):
                        g = v.reshape(2, size // 4, 2, v.shape[1])
                        v = _jnp.concatenate(
                            [g[:, :, 0], g[:, :, 1]],
                            axis=1).reshape(size, v.shape[1])
                    return v

            pi._ladder_strides = strides8
            try:
                wr2, wi2 = orig_ladder(wr, wi, tw_ref, size, width,
                                       zero_imag_stages, layout, False)
            finally:
                pi._ladder_strides = orig_strides
            wr2 = regroup(wr2)
            wi2 = regroup(wi2)
            return wr2[: size // 2], wi2[: size // 2]
        return ladder_rg

    for kind in ("swap", "deint3"):
        pi._ladder = mk_ladder_regroup(kind)
        try:
            arm(f"strides>=8 + regroup/{kind} [TIMING-ONLY]",
                lambda audio: pi.mfcc_int_pallas_v3(audio, cfg), gate=False)
        finally:
            pi._ladder = orig_ladder

    # TIMING-ONLY: small strides moved to the EARLY stages (stage 0 is
    # real-only = 2 rolls, stage 1 transition = 3 rolls, so the sub-vreg
    # premium lands on 9 rolls instead of 12)
    def strides_early(size, layout):
        ds = orig_strides(size, layout)
        if size == cfg.nfft:
            return [1, 2, 4, 128, 64, 32, 16, 8, ds[-1]]
        return ds

    pi._ladder_strides = strides_early
    try:
        arm("small strides on stages 0-2 [TIMING-ONLY]",
            lambda audio: pi.mfcc_int_pallas_v3(audio, cfg), gate=False)
    finally:
        pi._ladder_strides = orig_strides

    # _ladder iterates range(L) over strides; shortening the list needs a
    # matching stage-count -- patch the ladder length via strides lookup
    # is not enough (range(L) fixed); use a wrapped ladder instead
    def ladder6(wr, wi, tw_ref, size, width=16, zero_imag_stages=0,
                layout="natural", final_half_only=False):
        if size != cfg.nfft:
            return orig_ladder(wr, wi, tw_ref, size, width,
                               zero_imag_stages, layout, final_half_only)
        import jax as _j
        import jax.numpy as _jnp
        from jax.experimental.pallas import tpu as _pt
        L = int(np.log2(size))
        bias = (1 << (width - 3)) - 1
        strides = orig_strides(size, layout)
        rows = _j.lax.broadcasted_iota(_jnp.int32, (size, wr.shape[1]), 0)
        for s in [0, 1, 2, 3, 4, 8]:       # 6 of 9 stages, incl. final
            d = strides[s]
            if s == 8:
                half = size // 2
                twr_h = tw_ref[half:, s: s + 1]
                twc1_h = tw_ref[half:, L + s: L + s + 1]
                twc2_h = tw_ref[half:, 2 * L + s: 2 * L + s + 1]
                wrh, wih = wr[half:], wi[half:]
                u = (wrh + wih) * twr_h + bias
                sb1 = (u - wih * twc1_h) >> (width - 2)
                sb2 = (u - wrh * twc2_h) >> (width - 2)
                return (pi._wrap16((wr[:half] + sb1) >> 1),
                        pi._wrap16((wi[:half] + sb2) >> 1))
            twr = tw_ref[:, s: s + 1]
            twc1 = tw_ref[:, L + s: L + s + 1]
            twc2 = tw_ref[:, 2 * L + s: 2 * L + s + 1]
            is_x0 = (rows & d) == 0
            u = (wr + wi) * twr + bias
            sb1 = (u - wi * twc1) >> (width - 2)
            sb2 = (u - wr * twc2) >> (width - 2)
            a1 = wr + _pt.roll(sb1, size - d, 0)
            b1 = _pt.roll(wr, d, 0) - sb1
            a2 = wi + _pt.roll(sb2, size - d, 0)
            b2 = _pt.roll(wi, d, 0) - sb2
            wr = pi._wrap16(_jnp.where(is_x0, a1, b1) >> 1)
            wi = pi._wrap16(_jnp.where(is_x0, a2, b2) >> 1)

    pi._ladder = ladder6
    try:
        arm("6-stage ladder [TIMING-ONLY]",
            lambda audio: pi.mfcc_int_pallas_v3(audio, cfg), gate=False)
    finally:
        pi._ladder = orig_ladder

    print("\n| arm | best Mf/s |")
    print("|---|---|")
    for name, fps in rows:
        print(f"| {name} | {fps:.2f} |")
    return 0


if __name__ == "__main__":
    sys.exit(main())
