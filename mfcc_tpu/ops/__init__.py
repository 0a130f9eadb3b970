"""TPU compute ops (JAX / Pallas).

``float_ops``    -- the float pipeline as MXU matmuls + VPU elementwise ops.
``int_ops``      -- the bit-exact fixed-point pipeline, vectorized int32/int64.
``framing``      -- pre-emphasis + overlapped frame extraction (shared).
``pallas_mfcc``  -- fused single-kernel float batch pipeline (lazy import).
``pallas_int``   -- fused bit-exact INT batch pipeline (lazy import).
``pallas_stream``-- fused streaming-step kernels, the serving path (lazy).
``df32``         -- compensated double-f32 accuracy mode (lazy import).
"""

from . import framing, float_ops, int_ops  # noqa: F401
