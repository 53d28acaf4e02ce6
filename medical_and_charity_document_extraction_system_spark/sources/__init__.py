from .pages import (  # noqa: F401
    synthesize_pages,
    render_row,
    expected_record,
    BUCKET_DIRECT,
    BUCKET_PDF_TEXT,
    BUCKET_PDF_SCANNED,
    BUCKET_ERROR,
    BUCKET_HTML,
)
