from . import dedup, shapes, similarity, textops  # noqa: F401
