from . import (  # noqa: F401
    chunking,
    dedup,
    incremental,
    integrity,
    layout,
    multimodal,
    sampling,
    shapes,
    similarity,
    skew,
    temporal,
    textops,
)
