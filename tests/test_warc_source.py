"""WARC Python-DataSource tests: synthetic archives written in-test
(plain + gzip multi-member), read through spark.read.format("warc")."""

from __future__ import annotations

import gzip

import pytest

from data_pipeline_example_spark.sources.warc import (
    WarcDataSource,
    read_warc,
    warc_documents,
)


def _record(rec_id: str, rec_type: str, uri: str, payload: bytes) -> bytes:
    head = (
        f"WARC/1.0\r\n"
        f"WARC-Record-ID: {rec_id}\r\n"
        f"WARC-Type: {rec_type}\r\n"
        f"WARC-Target-URI: {uri}\r\n"
        f"WARC-Date: 2024-01-01T00:00:00Z\r\n"
        f"Content-Type: application/http; msgtype=response\r\n"
        f"Content-Length: {len(payload)}\r\n"
        f"\r\n"
    ).encode()
    return head + payload + b"\r\n\r\n"


HTML = (
    b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
    b"<html><body><h1>Hello</h1><p>corpus   text</p></body></html>"
)


@pytest.fixture(scope="module")
def warc_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("warc")
    body = (
        _record("<urn:uuid:1>", "response", "http://a.example/", HTML)
        + _record("<urn:uuid:2>", "request", "http://a.example/", b"GET / HTTP/1.1")
        + _record("<urn:uuid:3>", "response", "http://b.example/", b"plain payload")
    )
    (d / "seg1.warc").write_bytes(body)
    # gzip variant: one gzip member per record (the Common Crawl layout)
    members = b"".join(
        gzip.compress(_record(f"<urn:uuid:{i}>", "response", f"http://gz{i}.example/", b"gz body"))
        for i in (4, 5)
    )
    (d / "seg2.warc.gz").write_bytes(members)
    return d


def test_warc_read_both_files_and_schema(spark, warc_dir):
    df = read_warc(spark, str(warc_dir / "*.warc*"))
    rows = df.collect()
    assert len(rows) == 5  # 3 plain + 2 gz
    assert df.columns == [
        "warc_record_id", "warc_type", "target_uri", "warc_date",
        "content_type", "content_length", "payload", "source_file",
    ]
    by_id = {r["warc_record_id"]: r for r in rows}
    assert by_id["<urn:uuid:1>"]["payload"] == bytearray(HTML)
    assert by_id["<urn:uuid:1>"]["content_length"] == len(HTML)
    assert by_id["<urn:uuid:4>"]["warc_type"] == "response"
    # parallelism contract: one partition per file
    assert df.rdd.getNumPartitions() == 2


def test_warc_documents_extraction(spark, warc_dir):
    spark.dataSource.register(WarcDataSource)
    docs = warc_documents(
        spark.read.format("warc").load(str(warc_dir / "seg1.warc"))
    ).collect()
    assert len(docs) == 2  # request record filtered out
    by_url = {r["url"]: r for r in docs}
    assert by_url["http://a.example/"]["text"] == "Hello corpus text"
    # no HTTP header block → whole payload is the body
    assert by_url["http://b.example/"]["text"] == "plain payload"
    assert len({r["doc_id"] for r in docs}) == 2  # distinct hashed ids


def test_warc_truncated_tail_record_tolerated(spark, tmp_path):
    good = _record("<urn:uuid:g>", "response", "http://ok.example/", b"complete")
    trunc = _record("<urn:uuid:t>", "response", "http://cut.example/", b"X" * 100)
    (tmp_path / "t.warc").write_bytes(good + trunc[: len(trunc) - 60])
    rows = read_warc(spark, str(tmp_path / "t.warc")).collect()
    ids = {r["warc_record_id"] for r in rows}
    assert "<urn:uuid:g>" in ids  # the intact record always survives
    trow = [r for r in rows if r["warc_record_id"] == "<urn:uuid:t>"]
    if trow:  # truncated tail may surface partially — never corrupts others
        assert len(trow[0]["payload"]) < 100
