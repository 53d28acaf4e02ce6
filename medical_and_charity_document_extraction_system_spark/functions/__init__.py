from .html_extract import main_text, extract_blocks  # noqa: F401
from .fields import extract_spans, FIELD_PATTERNS  # noqa: F401
from .normalize import preprocess_text  # noqa: F401
