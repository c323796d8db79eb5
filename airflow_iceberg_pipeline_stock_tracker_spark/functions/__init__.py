from .money import cents, dollars  # noqa: F401
