"""mfcc_tpu -- TPU-native streaming MFCC front-end framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
lambdaconcept/mfcc (an FPGA fixed-point MFCC core + host software):

  * float pipeline (the notebooks' executable spec) as fused MXU matmuls;
  * bit-exact fixed-point pipeline (the RTL's integer arithmetic);
  * stateful multi-stream chunked streaming with reset protocol;
  * data-parallel scaling over TPU meshes (pure batch sharding over ICI);
  * host I/O: wav decode, framed transport protocol (magic 0xa55a,
    reset word 0x80000000), batch CLI, golden generation, visualization.
"""

from .config import MFCCConfig, DEFAULT_CONFIG, MIC_CONFIG, RESET_WORD, MAGIC_WORD
from .pipeline import MFCC

__version__ = "0.1.0"

__all__ = [
    "MFCC", "MFCCConfig", "DEFAULT_CONFIG", "MIC_CONFIG",
    "RESET_WORD", "MAGIC_WORD", "__version__",
]
