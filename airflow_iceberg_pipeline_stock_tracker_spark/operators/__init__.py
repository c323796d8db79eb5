from .dq import dq_checks  # noqa: F401
from .cumulate import cumulate  # noqa: F401
