"""openjph_tpu: a TPU-native HTJ2K (ISO/IEC 15444-15) codec framework.

JAX/XLA/Pallas compute path with host-side Tier-2 codestream machinery;
OpenJPH-compatible capability surface.
"""
from .codec import decode, encode, Decoder, Encoder  # noqa: F401
from .tpu.pipeline import decode_tpu, decode_tpu_batch, \
    TpuDecoder, VideoDecoder  # noqa: F401
from .tpu.encode_pipeline import encode_tpu, encode_tpu_batch, \
    TpuEncoder, VideoEncoder  # noqa: F401
from .core.message import (  # noqa: F401
    OjphError, OjphWarning, set_info_stream, set_warning_stream,
    set_error_stream, configure_info, configure_warning,
    configure_error, set_message_level)
from .utils import trace  # noqa: F401

__version__ = '0.1.0'
