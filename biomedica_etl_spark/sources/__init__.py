from .registry import tbl  # noqa: F401
