"""Generate the committed WET driver fixture (tests/fixtures/wet/).

Writes TWO artifacts from ONE source-of-truth row list:

- ``crawl-00000.warc.wet.gz`` - a Common-Crawl-shaped WET file (gzip,
  one member per record) built by ``encode_warc``;
- ``expected_documents.parquet`` - the rows the documents projection
  must produce, computed INDEPENDENTLY of the engine's reader/projection
  (host via urllib, char counts via Python len), so the driver's
  ``wet_documents`` hash check compares the Spark parse of the raw WET
  bytes against an independently-derived expectation - not the reader
  against itself.

Deterministic: fixed content, fixed order, no timestamps. Re-run only
when the fixture needs to change, then commit both artifacts.
"""

from __future__ import annotations

import os
import sys
from urllib.parse import urlsplit


def _spark_host(uri: str) -> str | None:
    """Case-preserving twin of Spark's ``parse_url(..., 'HOST')``
    (java.net.URI.getHost): netloc minus userinfo and port.
    ``urlsplit().hostname`` would LOWERCASE the host - Spark does not -
    so a fixture URI with a mixed-case host would bake in an
    expectation the engine can never produce (the same
    fixture-vs-engine divergence class as netloc's port/userinfo)."""
    host = urlsplit(uri).netloc.rpartition("@")[2]
    if host.startswith("["):  # bracketed IPv6 literal keeps its brackets
        return host[: host.index("]") + 1] or None
    return host.split(":", 1)[0] or None

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nyc_government_hiring_audit_data_platform_spark.sources.warc_source import (  # noqa: E402
    encode_warc,
)

OUT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests",
    "fixtures",
    "wet",
)

# (warc_type, target_uri, text) - the source of truth. Interleaves
# non-conversion records so record_index stability across type
# filtering is part of what the driver hash pins down. Content covers
# multibyte UTF-8, internal CRLF, leading/trailing space, and an empty
# payload.
ROWS: list[tuple[str, str, str]] = [
    ("warcinfo", "", "software: fixture-crawler 1.0"),
    (
        "conversion",
        "https://example.com/articles/1",
        "The quick brown fox jumps over the lazy dog. " * 3,
    ),
    (
        "conversion",
        "https://example.com/articles/2",
        "Pack my box with five dozen liquor jugs.\r\nSecond line here.",
    ),
    ("request", "https://example.com/articles/2", "GET /articles/2"),
    (
        "conversion",
        "https://news.example.org/2024/01/report",
        "Večerní zprávy: český text s diakritikou "
        "a úpělně běžnými slovy.",
    ),
    (
        "conversion",
        "https://data.example.net/table?id=7",
        "  leading and trailing spaces preserved  ",
    ),
    ("metadata", "https://data.example.net/table?id=7", "fetch-ms: 12"),
    (
        "conversion",
        "https://example.com/articles/1",
        "The quick brown fox jumps over the lazy dog. " * 3,
    ),
    ("conversion", "https://mirror.example.com/empty", ""),
    (
        # mixed-case host: Spark's parse_url HOST (java.net.URI) is
        # case-PRESERVING, so the independent expectation must be too
        "conversion",
        "https://CDN.Example.COM/assets/readme",
        "Mixed-case host row pins case-preserving source derivation.",
    ),
    (
        "conversion",
        "https://blog.example.io/posts/42",
        "日本語のテキストと emoji "
        "\U0001f680 mixed with ASCII tail.",
    ),
]


def main() -> None:
    os.makedirs(OUT_DIR, exist_ok=True)
    wet = encode_warc(
        [(t, u, body.encode("utf-8")) for t, u, body in ROWS],
        compress=True,
        per_record_members=True,
    )
    with open(os.path.join(OUT_DIR, "crawl-00000.warc.wet.gz"), "wb") as f:
        f.write(wet)

    expected = {
        "rec": [],
        "text": [],
        "source": [],
        "n_chars": [],
    }
    for i, (wtype, uri, body) in enumerate(ROWS):
        if wtype != "conversion":
            continue
        expected["rec"].append(i)
        expected["text"].append(body)
        expected["source"].append(_spark_host(uri) or "unknown")
        expected["n_chars"].append(len(body))
    table = pa.table(
        {
            "rec": pa.array(expected["rec"], pa.int64()),
            "text": pa.array(expected["text"], pa.string()),
            "source": pa.array(expected["source"], pa.string()),
            "n_chars": pa.array(expected["n_chars"], pa.int64()),
        }
    )
    pq.write_table(table, os.path.join(OUT_DIR, "expected_documents.parquet"))
    print(f"wrote {len(expected['rec'])} expected rows to {OUT_DIR}")


if __name__ == "__main__":
    main()
