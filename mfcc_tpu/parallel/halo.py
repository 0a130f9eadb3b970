"""Explicit sequence-parallel halo exchange: shard_map + ppermute.

``sharding.mfcc_sharded_fn`` relies on XLA to infer the cross-shard halo for
the overlapped frame gather from sharding constraints alone.  That is
correct but leaves the collective pattern to the compiler.  This module is
the hand-scheduled alternative (docs/ROADMAP.md): each time-shard sends its
LEADING ``nfft - hop`` emphasized samples to its left neighbor over the sp
axis with ONE ``ppermute`` -- the minimal halo volume per boundary -- and
every frame is then computed entirely shard-locally.

The reference analogue is the Frame ring buffer's overlap re-read
(mfcc/core/frame.py:86-114): re-reading ``windowlen - stepsize`` samples at
each frame boundary becomes re-receiving exactly those samples from the
neighbor chip.

Constraints (asserted): the per-shard length must be a multiple of hop (so
frame starts align with shard boundaries) and at least nfft.  Use
``pad_for_halo`` to round a signal up.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..config import MFCCConfig
from ..ops import float_ops, int_ops, framing


def pad_for_halo(T: int, mesh: Mesh, cfg: MFCCConfig) -> int:
    """Smallest T' >= T with T' divisible by sp*hop and T'/sp >= nfft."""
    sp = mesh.shape.get("sp", 1)
    step = sp * cfg.hop
    Tp = -(-T // step) * step
    return max(Tp, sp * -(-cfg.nfft // cfg.hop) * cfg.hop)


def mfcc_halo_fn(mesh: Mesh, cfg: MFCCConfig = MFCCConfig(), *,
                 int_path: bool = False, method: str = "dft",
                 precision: str = "highest", dtype=jnp.float32):
    """jit-compiled (S, T) -> (S, F_padded, ncep) with an explicit ppermute
    halo over sp.  F_padded = T//hop; rows beyond cfg.n_frames(T) are
    padding (their windows extend past T) -- slice them off with
    ``[:, :cfg.n_frames(T)]``.

    ``int_path=True`` runs the bit-exact fixed-point pipeline under the
    same halo schedule (the collective carries emphasized int32 samples)."""
    sp = mesh.shape.get("sp", 1)
    nfft, hop = cfg.nfft, cfg.hop
    ov = nfft - hop                      # halo samples per boundary

    if int_path:
        features = lambda fr: int_ops.mfcc_int_frames(fr, cfg=cfg)
    else:
        features = lambda fr: float_ops.mfcc_frames(
            fr, cfg, method=method, precision=precision, dtype=dtype)

    def local(emph):                     # (S_loc, T_loc) one sp-shard
        T_loc = emph.shape[-1]
        assert T_loc % hop == 0 and T_loc >= nfft, \
            "per-shard length must be a hop multiple >= nfft (pad_for_halo)"
        # one collective: my leading ov samples -> left neighbor's tail halo
        halo = jax.lax.ppermute(emph[:, :ov], "sp",
                                perm=[(i, i - 1) for i in range(1, sp)])
        ext = jnp.concatenate([emph, halo], axis=-1)
        # every local frame start is shard-local: starts 0, hop, ...,
        # T_loc - hop (the last ones reach into the halo)
        frames = framing.extract_frames(ext, nfft, hop)  # (S_loc, F_loc+?, nfft)
        frames = frames[:, : T_loc // hop]               # exactly F_loc rows
        return features(frames)

    def fn(audio):
        if int_path:
            # pre-emphasis crosses sp boundaries by one sample; computed
            # under the (dp, sp) sharding so XLA inserts that halo
            emph = framing.preemphasis_int(audio.astype(jnp.int32),
                                           width=cfg.width)
        else:
            emph = framing.preemphasis(audio.astype(dtype))
        sharded = shard_map(
            local, mesh=mesh,
            in_specs=P("dp", "sp"),
            out_specs=P("dp", "sp", None))
        return sharded(emph)

    return jax.jit(fn)
