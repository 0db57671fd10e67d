"""Multimodal columns: image/audio/video payloads as opaque ``binary``
columns with typed metadata, JVM-side sniffing, and an Arrow-batched
``mapInPandas`` decode path.
"""

from .binary import (  # noqa: F401
    attach_binary_payloads,
    decode_features,
    sniff_format,
)
