"""Input adapters: the pages Parquet source and a paged-API source."""

from .pages import read_pages  # noqa: F401
from .paged_api import http_page_fetch, read_paged_api  # noqa: F401
