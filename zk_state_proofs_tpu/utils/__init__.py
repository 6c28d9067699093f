"""Config, error taxonomy, profiling."""

from .config import BucketConfig, Config
from .errors import MissingKeyError, PackingError, VerificationError, WitnessError
from .profiling import Meter, timed, tpu_trace

__all__ = [
    "BucketConfig",
    "Config",
    "MissingKeyError",
    "PackingError",
    "VerificationError",
    "WitnessError",
    "Meter",
    "timed",
    "tpu_trace",
]
