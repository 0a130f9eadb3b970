from .features import (  # noqa: F401
    Spectrogram, MelSpectrogram, LogMelSpectrogram, MFCCFeatures,
    IntMFCCFeatures, LibrosaMFCC,
)
