"""WARC source + sink (sources/warc.py): record grammar, shard
round trip, extraction parity through the archive format."""

import gzip
import io
import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from conftest import SF_SMALL

from crawl4ai_ray.sources.warc import (
    _record,
    parse_warc_bytes,
    read_warc,
    warc_export_for,
    write_warc,
)


def test_record_grammar_roundtrip():
    html = b"<html><body>WARC/1.0\r\n\r\ntrap &amp; bytes</body></html>"
    rec = _record("https://x.example.com/a", 1767225600_123456, html)
    url, ts, out = next(parse_warc_bytes(rec))
    assert url == "https://x.example.com/a"
    assert ts == 1767225600_123456  # microsecond-exact
    assert out == html  # payload containing 'WARC/1.0' cannot confuse the parser


def test_multi_record_stream():
    recs = b"".join(
        _record(f"https://x.example.com/{i}", 1767225600_000000 + i, bytes([65 + i]) * i)
        for i in range(5)
    )
    got = list(parse_warc_bytes(recs))
    assert [u for u, _, _ in got] == [f"https://x.example.com/{i}" for i in range(5)]
    assert [h for _, _, h in got] == [bytes([65 + i]) * i for i in range(5)]


def test_gzip_members_concatenate():
    a = gzip.compress(_record("https://x/1", 0, b"one"), mtime=0)
    b = gzip.compress(_record("https://x/2", 0, b"two"), mtime=0)
    raw = gzip.GzipFile(fileobj=io.BytesIO(a + b)).read()
    assert [h for _, _, h in parse_warc_bytes(raw)] == [b"one", b"two"]


def test_corpus_roundtrip_exact(small_corpus, ray_session, tmp_path):
    manifest = write_warc(small_corpus, str(tmp_path)).to_pandas()
    assert manifest["n_records"].sum() == 500
    assert all(p.endswith(".warc.gz") for p in manifest["path"])
    assert not [f for f in os.listdir(tmp_path) if f.endswith(".tmp")]
    got = read_warc(str(tmp_path)).to_pandas().sort_values("url").reset_index(drop=True)
    want = (
        pq.read_table(small_corpus, columns=["url", "warc_ts", "html"])
        .to_pandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_export_cache_marker(ray_session):
    d = warc_export_for(SF_SMALL)
    assert os.path.exists(os.path.join(d, "_OK"))
    # second call reuses (no rewrite): marker mtime unchanged
    m0 = os.path.getmtime(os.path.join(d, "_OK"))
    assert warc_export_for(SF_SMALL) == d
    assert os.path.getmtime(os.path.join(d, "_OK")) == m0


def test_query_registered_in_window():
    from crawl4ai_ray.pipelines.queries import QUERIES
    from crawl4ai_ray.pipelines.oracles import ORACLES

    keys = list(QUERIES)
    assert "warc_roundtrip" in keys[:50]
    assert "warc_roundtrip" in ORACLES
