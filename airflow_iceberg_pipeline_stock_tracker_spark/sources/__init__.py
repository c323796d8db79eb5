from .tables import load_table, register_views  # noqa: F401
from .prices import prices_standin  # noqa: F401
