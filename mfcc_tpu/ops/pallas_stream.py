"""Fused streaming-step Pallas kernels: the serving path in ONE kernel.

The XLA streaming step (streaming._chunk_step_batch + the feature chain)
runs as separate stages -- pre-emphasis, carry concat, the barrel-shifter
alignment, the (S, F, nfft) frame materialization, then the feature matmuls
-- each round-tripping HBM.  At serving shapes (thousands of streams, ~64 ms
chunks) that HBM traffic dominates: round 2 measured 4.6 ms/step float /
5.8 ms INT at S=4096, C=1024 (docs/BENCH.md round 2f), ~57k/45k real-time
streams -- short of the 100k target.

These kernels run the WHOLE step in VMEM, per block of BS=128 streams:

  HBM in:  carry buffer (P, BS) transposed, raw chunk (C, BS) transposed
           (int16 wire dtype supported), per-stream start offsets and
           pre-emphasis carries as (1, BS) rows
  VMEM:    pre-emphasis (sublane roll + carry row)
           [carry | chunk] concat into an aligned scratch
           BARREL alignment: ceil(log2(P+1)) rounds of static sublane roll
           + per-lane bit select (the gather-free form of the ring buffer's
           read pointer, mfcc/core/frame.py:86-114; per-lane dynamic shifts
           have no other efficient TPU form)
           frame rebuild: F sublane-offset submatrix copies into the
           even/odd (radix-2) or sigma (INT ladder) layout
           the full feature chain of the batch kernels
           (pallas_mfcc._radix2_core / pallas_int._ladder + _post_fft_stages)
  HBM out: (ncep, F*BS) features + the NEW carry (P, BS) -- the state
           update is a kernel output (rows [C, C+P) of the concat scratch),
           not a separate XLA pass.

Invalid frame slots (beyond each stream's valid count) contain garbage from
the circular barrel wrap; the caller masks them exactly as the XLA step
masks its own garbage slots.  Valid frames and the carry are bit-identical
to the XLA step (same f32 / wrap16 arithmetic order; asserted in
tests/test_pallas_stream.py).

This replaces the reference's lock-step per-frame streaming protocol
(software/main.c:128-165 feeding mfcc/core/frame.py:86-114) at the
many-streams-per-chip scale the TPU serves.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import MFCCConfig
from . import framing
from .pallas_mfcc import _radix2_operators, _radix2_core
from .pallas_int import (_ladder, _ladder_layout, _post_fft_stages,
                         _ladder_packed_constants, _dct_packed_constants,
                         _fb_limb_matrix, _zero_imag_stage_count)
from . import int_ops

BS = 128  # streams per block (lane count)


def _block_streams(cfg: MFCCConfig, C: int) -> int:
    """Streams per kernel block: 128 lanes unless the chunk is long enough
    that the (nfft, F*bs) frame scratch plus the ladder's live temporaries
    blow the ~16 MB Mosaic scoped-VMEM budget (measured: C=2048 at bs=128
    needs 22.7 MB).  Halving bs keeps F*bs <= 1024 -- the C=1024/bs=128
    working set that is known to fit."""
    F = (C - 1) // cfg.hop + 1
    bs = BS
    while bs > 8 and F * bs > 1024:
        bs //= 2
    return bs


def pallas_stream_supported(cfg: MFCCConfig) -> bool:
    """Both fused streaming kernels need the radix-2/sigma frame layouts
    (even hop) and the 512-point operator geometry."""
    import jax as _jax
    return (_jax.default_backend() == "tpu" and cfg.nfft == 512
            and cfg.hop % 2 == 0 and cfg.windowlen == cfg.nfft)


def _geometry(cfg: MFCCConfig, C: int):
    """(P, F, Wp, nbits): carry length, frames per chunk, aligned scratch
    rows (16-row padded so the even/odd reshape stays tile-friendly), barrel
    rounds.  Valid window samples never wrap circularly: for a valid frame
    sample j, start + j <= P + C - 1 < Wp."""
    P = cfg.windowlen - 1
    F = (C - 1) // cfg.hop + 1
    need = max(P + C, (F - 1) * cfg.hop + cfg.nfft)
    Wp = -(-need // 16) * 16
    nbits = max(1, int(np.ceil(np.log2(P + 1))))
    return P, F, Wp, nbits


def _barrel_sublane(x, start_row, Wp: int, nbits: int):
    """aligned[j, s] = x[(start[s] + j) mod Wp, s] as nbits rounds of static
    circular sublane roll + per-lane select (start_row: (1, BS) int32)."""
    for b in range(nbits):
        sh = 1 << b
        rolled = pltpu.roll(x, Wp - sh, 0)          # row j <- row j+sh
        bit = ((start_row >> b) & 1) != 0
        x = jnp.where(bit, rolled, x)
    return x


# Default chunk ingest layout (overridable per call via ``chunk_layout``):
#   True  -> "stream":    raw chunk ships STREAM-MAJOR (S, C) -- no XLA
#            transpose on the hot serving path -- and each (bs, C) block is
#            transposed in VMEM on the hardware transpose path (the serving
#            twin of pallas_mfcc.R2_KERNEL_T; the XLA 16-bit transpose it
#            replaces was ~10-15% of the serving step).
#   False -> "time":      chunk ships (S, C) and pays a host XLA transpose
#            to (C, S) (the pre-round-3i layout, kept for A/B).
# A third layout, "positions", takes the chunk ALREADY (C, S) -- produced
# positions-major by the caller (e.g. the FeatureServer's host-side gather
# writing slot columns) -- and needs NO transpose anywhere, host or VMEM.
# The carry/start/prev operands keep the lane-sliced transposed layout in
# all cases (the carry never round-trips under transposed_state anyway).
# Round-4 chip A/B at S=4096/C=1024 (k real-time streams): time 191.1 /
# stream 188.8 / positions 192.1 (float), 147.9 / 146.8 / 146.0 (int) --
# ~1% spread, same direction as the batch flags, so the default reverts
# to the host-transpose "time" layout; all three stay selectable and
# bit-exact-tested (test_stream_kernel_chunk_layouts_agree).
STREAM_CHUNK_T = False

# Float streaming step tail: True = the f32 block-ladder FFT
# (ops/pallas_fladder, round 5i -- the batch kernel's +10% contract win),
# False = the radix-2 split-DFT core (round-3a ship).  Applies only to
# the contract path (dft_passes == 6) on the ladder's geometry family;
# the 3-pass fast mode always rides the split-DFT.
STREAM_FLADDER = True


def _resolve_chunk_layout(chunk_layout):
    if chunk_layout is None:
        return "stream" if STREAM_CHUNK_T else "time"
    assert chunk_layout in ("stream", "time", "positions"), chunk_layout
    return chunk_layout


def _pad_lanes(arr, Sp):
    S = arr.shape[1]
    if Sp > S:
        arr = jnp.pad(arr, ((0, 0), (0, Sp - S)))
    return arr


def _rref(ref):
    """Per-stream operand block: (X, bs) lane-sliced, or (1, X, bs) when the
    narrow-lane path reshapes the stream axis into the grid (bs < 128 lane
    blocks violate Mosaic's lane-divisibility rule unless the block's lane
    dim equals the full array's)."""
    return ref[0] if len(ref.shape) == 3 else ref[:]


def _stream_float_kernel(buf_ref, chk_ref, start_ref, prev_ref,
                         csp_ref, we_ref, wo_ref, twc_ref, tws_ref,
                         mela_ref, melb_ref, melc_ref, dct_ref,
                         out_ref, nbuf_ref, abuf, fbuf2, *,
                         nfft, hop, P, C, Wp, F, nbits, bs,
                         chunk_t=False, mel_floor=0.0, dft_passes=6):
    Ct = _rref(chk_ref)
    if Ct.dtype != jnp.float32:
        Ct = Ct.astype(jnp.float32)        # int16 wire input: upcast in VMEM
    if chunk_t:                            # (bs, C) block: HW transpose
        Ct = Ct.T
    rows = jax.lax.broadcasted_iota(jnp.int32, (C, bs), 0)
    up = pltpu.roll(Ct, 1, 0)                       # row t <- row t-1
    pr = jnp.where(rows == 0, _rref(prev_ref), up)
    E = Ct - jnp.float32(framing.EMPHASIS_COEFF) * pr
    abuf[0:P, :] = _rref(buf_ref)
    abuf[P: P + C, :] = E
    if Wp > P + C:
        abuf[P + C:, :] = jnp.zeros((Wp - P - C, bs), jnp.float32)
    # the new carry is rows [C, C+P) of the UNALIGNED concat -- the state
    # update rides the same kernel instead of a separate XLA pass
    if len(nbuf_ref.shape) == 3:
        nbuf_ref[0] = abuf[C: C + P, :]
    else:
        nbuf_ref[:] = abuf[C: C + P, :]
    x = _barrel_sublane(abuf[:], _rref(start_ref), Wp, nbits)
    xs = x.reshape(Wp // 2, 2, bs)                  # even/odd positions
    Eev, Eod = xs[:, 0], xs[:, 1]
    L = F * bs
    nh = nfft // 2
    for f in range(F):
        r0 = (f * hop) // 2                         # hop even
        fbuf2[:, f * bs:(f + 1) * bs] = Eev[r0: r0 + nh, :]
        fbuf2[:, L + f * bs: L + (f + 1) * bs] = Eod[r0: r0 + nh, :]
    out_ref[0] = _radix2_core(fbuf2, we_ref, wo_ref, csp_ref, twc_ref,
                              tws_ref, mela_ref, melb_ref, melc_ref,
                              dct_ref, L, mel_floor=mel_floor,
                              dft_passes=dft_passes)


def _stream_fladder_kernel(buf_ref, chk_ref, start_ref, prev_ref,
                           wincol_ref, tw_ref, mel_ref, dct_ref,
                           out_ref, nbuf_ref, abuf, fbuf, *,
                           nfft, hop, P, C, Wp, F, nbits, bs,
                           chunk_t=False, mel_floor=0.0):
    """Float streaming step with the f32 block-ladder tail (round 5i):
    the INT stream kernel's sigma-layout frame fill + pallas_fladder's
    window/ladder/power/mel/log2/DCT tail, replacing the split-DFT."""
    from .pallas_fladder import _fladder_tail, EMPH
    Ct = _rref(chk_ref)
    if Ct.dtype != jnp.float32:
        Ct = Ct.astype(jnp.float32)        # int16 wire input: upcast in VMEM
    if chunk_t:                            # (bs, C) block: HW transpose
        Ct = Ct.T
    rows = jax.lax.broadcasted_iota(jnp.int32, (C, bs), 0)
    up = pltpu.roll(Ct, 1, 0)
    pr = jnp.where(rows == 0, _rref(prev_ref), up)
    E = Ct - EMPH * pr
    abuf[0:P, :] = _rref(buf_ref)
    abuf[P: P + C, :] = E
    if Wp > P + C:
        abuf[P + C:, :] = jnp.zeros((Wp - P - C, bs), jnp.float32)
    if len(nbuf_ref.shape) == 3:
        nbuf_ref[0] = abuf[C: C + P, :]
    else:
        nbuf_ref[:] = abuf[C: C + P, :]
    x = _barrel_sublane(abuf[:], _rref(start_ref), Wp, nbits)
    xs = x.reshape(Wp // 2, 2, bs)
    Eev, Eod = xs[:, 0], xs[:, 1]
    L = F * bs
    half = nfft // 2
    for f in range(F):
        r0 = (f * hop) // 2
        # sigma row layout: [even positions | odd positions]
        fbuf[0:half, f * bs:(f + 1) * bs] = Eev[r0: r0 + half, :]
        fbuf[half:, f * bs:(f + 1) * bs] = Eod[r0: r0 + half, :]
    out_ref[0] = _fladder_tail(fbuf[:], wincol_ref, tw_ref, mel_ref,
                               dct_ref, nfft, mel_floor)


def _stream_int_kernel(buf_ref, chk_ref, start_ref, prev_ref,
                       wincol_ref, tw_ref, fb_ref, dtw_ref,
                       out_ref, nbuf_ref, abuf, fbuf, dbuf_r, *,
                       cfg: MFCCConfig, fb_shift, P, C, Wp, F, nbits, bs,
                       chunk_t=False):
    nfft, hop = cfg.nfft, cfg.hop
    Ct = _rref(chk_ref).astype(jnp.int32)
    if chunk_t:                            # (bs, C) block: HW transpose
        Ct = Ct.T
    rows = jax.lax.broadcasted_iota(jnp.int32, (C, bs), 0)
    up = pltpu.roll(Ct, 1, 0)
    pr = jnp.where(rows == 0, _rref(prev_ref), up)
    # y = wrap16(x + (prev >> 5) - prev)  (preemph.py:23)
    E = framing.wrap_signed(Ct + (pr >> 5) - pr, cfg.width)
    abuf[0:P, :] = _rref(buf_ref)
    abuf[P: P + C, :] = E
    if Wp > P + C:
        abuf[P + C:, :] = jnp.zeros((Wp - P - C, bs), jnp.int32)
    if len(nbuf_ref.shape) == 3:
        nbuf_ref[0] = abuf[C: C + P, :]
    else:
        nbuf_ref[:] = abuf[C: C + P, :]
    x = _barrel_sublane(abuf[:], _rref(start_ref), Wp, nbits)
    xs = x.reshape(Wp // 2, 2, bs)
    Eev, Eod = xs[:, 0], xs[:, 1]
    L = F * bs
    half = nfft // 2
    for f in range(F):
        r0 = (f * hop) // 2
        # sigma row layout: [even positions | odd positions]
        fbuf[0:half, f * bs:(f + 1) * bs] = Eev[r0: r0 + half, :]
        fbuf[half:, f * bs:(f + 1) * bs] = Eod[r0: r0 + half, :]
    xw = framing.wrap_signed(
        (fbuf[:] * wincol_ref[:]) >> (cfg.window_precision + 1), cfg.width)
    wr, wi = _ladder(xw, jnp.zeros_like(xw), tw_ref, nfft,
                     layout=_ladder_layout(nfft),
                     final_half_only=True,
                     zero_imag_stages=_zero_imag_stage_count(nfft))
    _post_fft_stages(wr, wi, fb_ref, dtw_ref, out_ref, dbuf_r,
                     cfg=cfg, fb_shift=fb_shift, lanes=L)


def _pad_streams(arr, Sp):
    S = arr.shape[0]
    if Sp > S:
        arr = jnp.pad(arr, ((0, Sp - S),) + ((0, 0),) * (arr.ndim - 1))
    return arr


def _stream_operand_layout(arrs, bs, nb, Sp, carry_dtype, chunk_t=False):
    """Kernel operands + specs for the per-stream arrays [buf (P, Sp),
    chunk (C, Sp) -- or STREAM-MAJOR (Sp, C) when ``chunk_t`` (see
    STREAM_CHUNK_T) -- start (1, Sp), prev (1, Sp)] and the new-carry
    output.

    bs == BS: lane-sliced 2D blocks over the (X, Sp) arrays (the chunk_t
    chunk is SUBLANE-sliced (bs, C) instead).  bs < BS (long chunks, see
    _block_streams): Mosaic rejects lane blocks narrower than 128 unless
    the block spans the whole lane dim, so the stream axis splits into the
    grid host-side ((X, Sp) -> (nb, X, bs), a reshape + transpose XLA pass
    on the narrow path only; the chunk_t chunk's (Sp, C) -> (nb, bs, C) is
    a FREE reshape) and each block covers its full (X, bs) tail."""
    P = arrs[0].shape[0]

    def spec_of(i, a):
        if chunk_t and i == 1:
            return pl.BlockSpec((bs, a.shape[1]), lambda n: (n, 0),
                                memory_space=pltpu.VMEM)
        return pl.BlockSpec((a.shape[0], bs), lambda n: (0, n),
                            memory_space=pltpu.VMEM)

    if bs == BS:
        specs = [spec_of(i, a) for i, a in enumerate(arrs)]
        nspec = pl.BlockSpec((P, bs), lambda n: (0, n),
                             memory_space=pltpu.VMEM)
        nshape = jax.ShapeDtypeStruct((P, Sp), carry_dtype)
        return list(arrs), specs, nspec, nshape
    ins, specs = [], []
    for i, a in enumerate(arrs):
        if chunk_t and i == 1:
            ins.append(a.reshape(nb, bs, a.shape[1]))
            specs.append(pl.BlockSpec((1, bs, a.shape[1]),
                                      lambda n: (n, 0, 0),
                                      memory_space=pltpu.VMEM))
        else:
            ins.append(a.reshape(a.shape[0], nb, bs).transpose(1, 0, 2))
            specs.append(pl.BlockSpec((1, a.shape[0], bs),
                                      lambda n: (n, 0, 0),
                                      memory_space=pltpu.VMEM))
    nspec = pl.BlockSpec((1, P, bs), lambda n: (n, 0, 0),
                         memory_space=pltpu.VMEM)
    nshape = jax.ShapeDtypeStruct((nb, P, bs), carry_dtype)
    return ins, specs, nspec, nshape


def _restore_carry(nbuf, Sp):
    """(nb, P, bs) narrow-path carry back to the canonical (P, Sp)."""
    if nbuf.ndim == 3:
        _, P, _ = nbuf.shape
        return nbuf.transpose(1, 0, 2).reshape(P, Sp)
    return nbuf


def stream_step_float(buffer, chunk, start, prev,
                      cfg: MFCCConfig = MFCCConfig(), *,
                      interpret: bool = False,
                      transposed_state: bool = False,
                      mel_floor: float = 0.0,
                      chunk_layout: str | None = None,
                      dft_passes: int | None = None):
    """One fused streaming feature step (float, radix-2 split-DFT tail).

    buffer (S, P) f32 emphasized carry; chunk (S, C) raw samples (f32 or
    int16) -- or (C, S) when ``chunk_layout="positions"``; start (S,)
    int32 = P - count (reset already merged); prev (S,) f32 raw previous
    sample (reset already merged).
    Returns (feats (S, F, ncep) f32, new_buffer (S, P) f32); frame slots
    beyond each stream's valid count are garbage the caller masks.

    ``transposed_state=True``: the carry buffer is stored (P, S) -- the
    kernel's native layout -- so the serving loop's state never
    round-trips a transpose; with the "stream" chunk layout the raw chunk
    also ships stream-major and transposes in VMEM, and with "positions"
    (caller supplies (C, S)) the step has NO relayout at all, host, XLA
    or VMEM.  new_buffer comes back (P, S) likewise.

    ``dft_passes``: split-DFT MXU pass count (None = module default 6;
    3 = the opt-in fast mode -- see pallas_mfcc.R2_DFT_PASSES)."""
    from .pallas_mfcc import _resolve_passes, _resolve_pack256
    dft_passes = _resolve_passes(dft_passes)
    layout = _resolve_chunk_layout(chunk_layout)
    if transposed_state:
        P0, S = buffer.shape
    else:
        S, P0 = buffer.shape
    C = chunk.shape[0] if layout == "positions" else chunk.shape[1]
    P, F, Wp, nbits = _geometry(cfg, C)
    assert P0 == P
    nfft, hop, ncep = cfg.nfft, cfg.hop, cfg.nceptrums
    bs = _block_streams(cfg, C)
    nb = -(-S // bs)
    Sp = nb * bs
    if chunk.dtype != jnp.int16:
        chunk = chunk.astype(jnp.float32)
    if transposed_state:
        bufT = buffer.astype(jnp.float32)
        if Sp > S:
            bufT = jnp.pad(bufT, ((0, 0), (0, Sp - S)))
    else:
        bufT = _pad_streams(buffer.astype(jnp.float32), Sp).T
    chk = (_pad_streams(chunk, Sp) if layout == "stream"
           else _pad_lanes(chunk, Sp) if layout == "positions"
           else _pad_streams(chunk, Sp).T)
    startr = _pad_streams(start.astype(jnp.int32)[:, None], Sp).T
    prevr = _pad_streams(prev.astype(jnp.float32)[:, None], Sp).T
    from .pallas_fladder import (pallas_fladder_config_ok,
                                 _fladder_constants, _float_operators)
    use_ladder = (STREAM_FLADDER and dft_passes == 6
                  and pallas_fladder_config_ok(cfg))
    if use_ladder:
        wincol, melP, dctP = _float_operators(cfg)
        twf, _, _ = _fladder_constants(nfft)
        consts = [jnp.asarray(a) for a in (wincol, twf, melP, dctP)]
    else:
        consts = [jnp.asarray(a)
                  for a in _radix2_operators(cfg, _resolve_pack256(None))]
    L = F * bs

    chunk_t = layout == "stream"
    ins, in_specs, nbuf_spec, nbuf_shape = _stream_operand_layout(
        [bufT, chk, startr, prevr], bs, nb, Sp, jnp.float32,
        chunk_t=chunk_t)
    if use_ladder:
        kern = functools.partial(_stream_fladder_kernel, nfft=nfft,
                                 hop=hop, P=P, C=C, Wp=Wp, F=F,
                                 nbits=nbits, bs=bs, chunk_t=chunk_t,
                                 mel_floor=mel_floor)
        tail_scratch = pltpu.VMEM((nfft, L), jnp.float32)
    else:
        kern = functools.partial(_stream_float_kernel, nfft=nfft, hop=hop,
                                 P=P, C=C, Wp=Wp, F=F, nbits=nbits, bs=bs,
                                 chunk_t=chunk_t, mel_floor=mel_floor,
                                 dft_passes=dft_passes)
        tail_scratch = pltpu.VMEM((nfft // 2, 2 * L), jnp.float32)
    out, nbuf = pl.pallas_call(
        kern,
        grid=(nb,),
        in_specs=in_specs + [
            pl.BlockSpec(a.shape, lambda n, nd=a.ndim: (0,) * nd,
                         memory_space=pltpu.VMEM) for a in consts],
        out_specs=[
            pl.BlockSpec((1, ncep, L), lambda n: (n, 0, 0),
                         memory_space=pltpu.VMEM),
            nbuf_spec,
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nb, ncep, L), jnp.float32),
            nbuf_shape,
        ],
        scratch_shapes=[
            pltpu.VMEM((Wp, bs), jnp.float32),
            tail_scratch,
        ],
        interpret=interpret,
    )(*ins, *consts)
    feats = (out.reshape(nb, ncep, F, bs).transpose(0, 3, 2, 1)
             .reshape(Sp, F, ncep)[:S])
    nbuf = _restore_carry(nbuf, Sp)
    return feats, (nbuf[:, :S] if transposed_state else nbuf.T[:S])


def stream_step_int(buffer, chunk, start, prev,
                    cfg: MFCCConfig = MFCCConfig(), *,
                    interpret: bool = False,
                    transposed_state: bool = False,
                    chunk_layout: str | None = None):
    """One fused streaming feature step (bit-exact INT, sigma-layout ladder).

    buffer (S, P) int32 emphasized carry; chunk (S, C) raw int16-range
    samples (int16 or int32) -- or (C, S) when ``chunk_layout=
    "positions"``; start (S,) int32 = P - count; prev (S,) int32
    raw previous sample.  Returns (feats (S, F, ncep) int32, new_buffer
    (S, P) int32); invalid frame slots are garbage the caller masks.
    ``transposed_state``: carry stored/returned (P, S) -- see
    stream_step_float."""
    layout = _resolve_chunk_layout(chunk_layout)
    if transposed_state:
        P0, S = buffer.shape
    else:
        S, P0 = buffer.shape
    C = chunk.shape[0] if layout == "positions" else chunk.shape[1]
    P, F, Wp, nbits = _geometry(cfg, C)
    assert P0 == P
    nfft, ncep = cfg.nfft, cfg.nceptrums
    bs = _block_streams(cfg, C)
    nb = -(-S // bs)
    Sp = nb * bs
    if chunk.dtype != jnp.int16:
        chunk = chunk.astype(jnp.int32)
    if transposed_state:
        bufT = buffer.astype(jnp.int32)
        if Sp > S:
            bufT = jnp.pad(bufT, ((0, 0), (0, Sp - S)))
    else:
        bufT = _pad_streams(buffer.astype(jnp.int32), Sp).T
    chk = (_pad_streams(chunk, Sp) if layout == "stream"
           else _pad_lanes(chunk, Sp) if layout == "positions"
           else _pad_streams(chunk, Sp).T)
    startr = _pad_streams(start.astype(jnp.int32)[:, None], Sp).T
    prevr = _pad_streams(prev.astype(jnp.int32)[:, None], Sp).T

    tw = _ladder_packed_constants(nfft, layout=_ladder_layout(nfft))
    fb_limbs, fb_shift = _fb_limb_matrix(cfg)
    dtw = _dct_packed_constants(cfg.nfilters)
    from .. import tables
    wc = np.asarray(tables.int_window_curve(nfft, cfg.window_precision),
                    np.int32)
    wincol = np.concatenate([wc[0::2], wc[1::2]]).reshape(nfft, 1)
    n4 = 4 * cfg.nfilters
    L = F * bs

    chunk_t = layout == "stream"
    ins, in_specs, nbuf_spec, nbuf_shape = _stream_operand_layout(
        [bufT, chk, startr, prevr], bs, nb, Sp, jnp.int32,
        chunk_t=chunk_t)
    out, nbuf = pl.pallas_call(
        functools.partial(_stream_int_kernel, cfg=cfg, fb_shift=fb_shift,
                          P=P, C=C, Wp=Wp, F=F, nbits=nbits, bs=bs,
                          chunk_t=chunk_t),
        grid=(nb,),
        in_specs=in_specs + [
            pl.BlockSpec((nfft, 1), lambda n: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nfft, tw.shape[1]), lambda n: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(fb_limbs.shape, lambda n: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n4, dtw.shape[1]), lambda n: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, ncep, L), lambda n: (n, 0, 0),
                         memory_space=pltpu.VMEM),
            nbuf_spec,
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nb, ncep, L), jnp.int32),
            nbuf_shape,
        ],
        scratch_shapes=[
            pltpu.VMEM((Wp, bs), jnp.int32),
            pltpu.VMEM((nfft, L), jnp.int32),
            pltpu.VMEM((n4, L), jnp.int32),
        ],
        interpret=interpret,
    )(*ins, jnp.asarray(wincol), jnp.asarray(tw),
      jnp.asarray(fb_limbs), jnp.asarray(dtw))
    feats = (out.reshape(nb, ncep, F, bs).transpose(0, 3, 2, 1)
             .reshape(Sp, F, ncep)[:S])
    nbuf = _restore_carry(nbuf, Sp)
    return feats, (nbuf[:, :S] if transposed_state else nbuf.T[:S])
