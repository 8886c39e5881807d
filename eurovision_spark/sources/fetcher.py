"""Registry acquisition: paginated HTTP crawl with retry/backoff.

Driver-side fetcher (SURVEY §3.3: acquisition stays outside Spark; its
landing directory is the engine's source). Parity with scrape.py:

- page count discovered from page 1 via the "Displaying page 1 of N"
  regex with digit-grouping strip (scrape.py:46-61, 57);
- retry on timeout/connection error with exponential backoff, 1 s
  doubling to a 600 s cap (scrape.py:18-43). Unlike the reference,
  non-200 responses also escalate the backoff (scrape.py:40 drops the
  returned backoff — a noted defect, not replicated);
- one file per page in the landing dir (vs the reference's single
  append file, scrape.py:63-67) so Spark reads pages in parallel and
  the streaming ingest sees each page as a micro-batch input
  (streaming/ingest.py).

The HTTP transport is injectable; the default uses ``requests`` when
present (import-gated — not required by the engine).
"""

from __future__ import annotations

import re
import time
from collections.abc import Callable
from pathlib import Path

# URL templates are configuration (reference magicString.txt keeps them
# in a separate file); callers pass their own.
PAGE_COUNT_RE = re.compile(r"Displaying page 1 of ([0-9,]+)")

Transport = Callable[[str], tuple[int, str]]  # url -> (status, body)


def default_transport(url: str, connect_timeout: float = 2.0, read_timeout: float = 5.0):
    """requests-backed GET (scrape.py:33 timeouts); import-gated."""
    try:
        import requests
    except ImportError as e:  # pragma: no cover - baked-in envs lack requests
        raise NotImplementedError("no HTTP transport available; inject one") from e
    r = requests.get(url, timeout=(connect_timeout, read_timeout))
    return r.status_code, r.text


def fetch_with_backoff(
    url: str,
    transport: Transport,
    max_backoff: float = 600.0,
    sleep: Callable[[float], None] = time.sleep,
) -> str:
    """GET with the reference's backoff policy (scrape.py:18-43): start
    1 s, double per failure, cap at ``max_backoff``; retry forever."""
    backoff = 1.0
    while True:
        try:
            status, body = transport(url)
        except Exception:
            status, body = None, None
        if status == 200:
            return body
        sleep(backoff)
        backoff = min(backoff * 2, max_backoff)


def discover_page_count(first_page: str) -> int:
    """Page count from the page-1 body (scrape.py:46-61); digit-grouping
    commas stripped (scrape.py:57). Raises if undiscoverable
    (fail-fast, scrape.py:60-61)."""
    m = PAGE_COUNT_RE.search(first_page)
    if not m:
        raise ValueError("page count not found in first page")
    return int(m.group(1).replace(",", ""))


def crawl(
    url_template: str,
    landing_dir: str,
    transport: Transport,
    sleep: Callable[[float], None] = time.sleep,
    max_pages: int | None = None,
) -> int:
    """Crawl pages 1..N into one file per page; returns the page count.

    ``url_template`` must contain ``{page}``.
    """
    out = Path(landing_dir)
    out.mkdir(parents=True, exist_ok=True)
    first = fetch_with_backoff(url_template.format(page=1), transport, sleep=sleep)
    total = discover_page_count(first)
    if max_pages is not None:
        total = min(total, max_pages)
    (out / "page-00001.txt").write_text(f"### PAGE 1 ####\n{first}", encoding="utf8")
    for page in range(2, total + 1):
        body = fetch_with_backoff(url_template.format(page=page), transport, sleep=sleep)
        (out / f"page-{page:05d}.txt").write_text(
            f"### PAGE {page} ####\n{body}", encoding="utf8"
        )
    return total
