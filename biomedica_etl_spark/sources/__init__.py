from .registry import tbl  # noqa: F401
from .sink import write_bucketed, write_routed  # noqa: F401
