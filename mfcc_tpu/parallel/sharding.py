"""Multi-chip scaling: jax.sharding over a device mesh.

The algorithm has no cross-stream dependence (SURVEY.md section 2.8): the
reference's only concurrency is hardware pipelining + stream FIFOs, and its
"two clock domains" boundary maps to the host<->device boundary here.  Scaling
is therefore:

  * dp -- pure data parallelism over the stream-batch axis (the natural axis;
    collectives ride ICI only if a reduction is requested);
  * sp -- sequence parallelism over the time axis of long signals: the
    overlapped frame gather crosses shard boundaries, and XLA inserts the
    halo exchanges automatically from the sharding constraints -- the
    TPU-native replacement for the ring buffer's overlap re-reads
    (mfcc/core/frame.py:86-114).

No NCCL/MPI translation: pick a mesh, annotate shardings, let XLA insert
collectives.
"""

from __future__ import annotations


import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import MFCCConfig
from ..ops import float_ops, int_ops, framing


def make_mesh(n_devices: int | None = None, axes=("dp", "sp")) -> Mesh:
    """Build a mesh over the first n_devices.  With 2 axes the devices are
    factored dp-major: dp gets the largest power-of-two factor <= n/1."""
    devs = jax.devices()
    n = n_devices or len(devs)
    devs = np.array(devs[:n])
    if len(axes) == 1:
        return Mesh(devs.reshape(n), axes)
    # factor n into (dp, sp): sp = 2 if even else 1
    sp = 2 if n % 2 == 0 and n > 1 else 1
    dp = n // sp
    return Mesh(devs.reshape(dp, sp), axes)


def shard_streams(audio, mesh: Mesh) -> jax.Array:
    """Place an (S, T) batch with S sharded over dp, T over sp."""
    return jax.device_put(audio, NamedSharding(mesh, P("dp", "sp")))


def mfcc_sharded_fn(mesh: Mesh, cfg: MFCCConfig = MFCCConfig(), *,
                    int_path: bool = False, method: str = "dft",
                    precision: str = "highest", dtype=jnp.float32):
    """jit-compiled (S, T) -> (S, F, ncep) with dp over streams and sp over
    frames; plus a psum'd activity metric to exercise a real collective."""

    def fn(audio):
        audio = jax.lax.with_sharding_constraint(
            audio, NamedSharding(mesh, P("dp", "sp")))
        if int_path:
            cep = int_ops.mfcc_int_batch(audio, cfg)
        else:
            cep = float_ops.mfcc_batch(audio, cfg, method=method,
                                       precision=precision, dtype=dtype)
        # frames axis sharded over sp when divisible (otherwise frames stay
        # replicated along sp; streams remain dp-sharded)
        sp = mesh.shape.get("sp", 1)
        fspec = P("dp", "sp", None) if cep.shape[1] % sp == 0 \
            else P("dp", None, None)
        cep = jax.lax.with_sharding_constraint(cep, NamedSharding(mesh, fspec))
        # a global scalar metric (mean c0 energy) -> all-reduce over the mesh
        energy = jnp.mean(cep[..., 0].astype(jnp.float32) ** 2)
        return cep, energy

    return jax.jit(fn)


def streaming_sharded_fn(mesh: Mesh, cfg: MFCCConfig = MFCCConfig(), *,
                         dtype=jnp.float32):
    """Sharded streaming step: state and chunks sharded over dp (streams are
    independent; state never crosses chips)."""
    from .. import streaming

    sm_axes = NamedSharding(mesh, P("dp"))
    sm_axes2 = NamedSharding(mesh, P("dp", None))

    def step(chunks, state, reset):
        chunks = jax.lax.with_sharding_constraint(chunks, sm_axes2)
        frames, mask, new_state = jax.vmap(
            lambda c, b, ct, p, r: streaming._chunk_step(
                c, streaming.StreamState(b, ct, p), r, cfg,
                framing.preemphasis, dtype)
        )(chunks, state.buffer, state.count, state.prev, reset)
        feats = float_ops.mfcc_frames(frames, cfg, dtype=dtype)
        return feats, mask, streaming.StreamState(*new_state)

    return jax.jit(step)
