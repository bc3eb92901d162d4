from . import dedup, extract, multimodal, politeness, similarity  # noqa: F401
