"""HTTP media source: resolve a URL column to binary payloads.

Data-plane analog of the reference's image-over-HTTP endpoint
(ref: src/main/java/app/WebServer.java:175-215 — the web UI streams
image bytes for a path; SURVEY S10). A distributed engine inverts the
direction: instead of SERVING bytes it FETCHES them, as an Arrow-batched
``mapInPandas`` projection ``url -> (url, data, status)`` feeding the
multimodal pipeline (operators/multimodal.py).

The fetcher is pluggable:
- ``fetcher="fake"`` (default): deterministic bytes derived from the
  URL string — the Spark-side plumbing (schema, batching, error
  isolation) is fully real and testable without network access, the
  same honesty contract as the stubbed media decode.
- ``fetcher="urllib"``: real ``urllib.request`` fetch, per-row error
  isolation (a failed URL yields ``data=NULL, status=-1`` instead of
  failing the task — the S4 per-file-error-skip analog). This sandbox
  has no network, so it is exercised only via the error path.
- any callable ``str -> bytes`` for custom transports.

Scale notes: fetch concurrency = task parallelism; repartition the URL
table to ~(cores x small factor) before calling so slow origins don't
serialize behind one task. No driver-side fetching ever.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame

FETCH_SCHEMA = "url string, data binary, status int"


def _fake_fetch(url: str) -> bytes:
    """Deterministic stand-in: 256 bytes seeded by the URL digest."""
    seed = hashlib.sha256(url.encode()).digest()
    return (seed * 8)[:256]


def _urllib_fetch(url: str) -> bytes:
    import urllib.request

    with urllib.request.urlopen(url, timeout=10) as resp:  # noqa: S310
        return resp.read()


def fetch_urls(
    urls: DataFrame,
    url_col: str = "url",
    fetcher: str | Callable[[str], bytes] = "fake",
) -> DataFrame:
    """urls(url) -> (url, data, status); status 200 on success, -1 on a
    per-row fetch error (row survives, task does not fail)."""
    if fetcher == "fake":
        fn = _fake_fetch
    elif fetcher == "urllib":
        fn = _urllib_fetch
    elif callable(fetcher):
        fn = fetcher
    else:
        raise ValueError(f"unknown fetcher {fetcher!r}")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"url": [], "data": [], "status": []}
            for url in pdf[url_col]:
                try:
                    out["data"].append(fn(url))
                    out["status"].append(200)
                except Exception:  # noqa: BLE001 - per-row isolation (S4)
                    out["data"].append(None)
                    out["status"].append(-1)
                out["url"].append(url)
            yield pd.DataFrame(out)

    return urls.select(url_col).mapInPandas(run, FETCH_SCHEMA)
