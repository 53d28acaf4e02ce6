from .pipeline import run_extraction, run_extraction_branching  # noqa: F401
