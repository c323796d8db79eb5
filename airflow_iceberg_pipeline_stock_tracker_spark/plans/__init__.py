from .queries import RELATIONAL_QUERIES  # noqa: F401
