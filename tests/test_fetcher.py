"""Fetcher tests (scrape.py parity) with a fake transport — no network."""

from __future__ import annotations

import pytest

from eurovision_spark.sources.fetcher import (
    crawl,
    discover_page_count,
    fetch_with_backoff,
)


def test_discover_page_count_with_digit_grouping():
    assert discover_page_count("... Displaying page 1 of 2,741 ...") == 2741
    with pytest.raises(ValueError):
        discover_page_count("no marker here")


def test_backoff_doubles_and_caps():
    calls = {"n": 0}
    sleeps: list[float] = []

    def flaky(url):
        calls["n"] += 1
        if calls["n"] < 5:
            raise ConnectionError("boom")
        return 200, "ok"

    body = fetch_with_backoff("u", flaky, max_backoff=4.0, sleep=sleeps.append)
    assert body == "ok"
    assert sleeps == [1.0, 2.0, 4.0, 4.0]  # doubling, capped


def test_backoff_on_non_200():
    seen = {"n": 0}
    sleeps: list[float] = []

    def throttled(url):
        seen["n"] += 1
        return (503, "slow down") if seen["n"] == 1 else (200, "ok")

    assert fetch_with_backoff("u", throttled, sleep=sleeps.append) == "ok"
    assert sleeps == [1.0]  # unlike scrape.py:40, non-200 escalates too


def test_crawl_one_file_per_page(tmp_path):
    def fake(url):
        page = int(url.rsplit("=", 1)[1])
        if page == 1:
            return 200, "Displaying page 1 of 3\nEudraCT Number: 2004-000001-11"
        return 200, f"EudraCT Number: 2004-00000{page}-1{page}"

    total = crawl("http://x/?page={page}", str(tmp_path / "land"), fake, sleep=lambda s: None)
    assert total == 3
    files = sorted(p.name for p in (tmp_path / "land").iterdir())
    assert files == ["page-00001.txt", "page-00002.txt", "page-00003.txt"]
    assert "### PAGE 2 ####" in (tmp_path / "land" / "page-00002.txt").read_text()
