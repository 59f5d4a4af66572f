from .stream_runner import stream_apply  # noqa: F401
