from . import wav, transport  # noqa: F401
