from .fold import fold_conversations  # noqa: F401
