from .rollup import combine_page_results, rollup_pages  # noqa: F401
from .engines import create_engine, get_engine, available_engines  # noqa: F401
