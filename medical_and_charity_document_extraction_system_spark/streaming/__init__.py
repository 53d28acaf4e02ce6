from .stream import run_extraction_stream  # noqa: F401
