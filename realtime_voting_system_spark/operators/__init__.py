from . import (  # noqa: F401
    dedup,
    integrity,
    multimodal,
    sampling,
    shapes,
    similarity,
    skew,
    temporal,
    textops,
)
