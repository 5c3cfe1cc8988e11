"""WARC source parsing (sources/warc.py) — synthetic archives only."""

import gzip

import pytest

from deepseek_ocr_omnidocbench_spark.sources.warc import (
    parse_warc_records,
    read_warc,
    warc_to_pages,
)


def _record(rtype: str, url: str, date: str, payload: bytes) -> bytes:
    hdr = (f"WARC/1.0\r\n"
           f"WARC-Type: {rtype}\r\n"
           f"WARC-Target-URI: {url}\r\n"
           f"WARC-Date: {date}\r\n"
           f"Content-Length: {len(payload)}\r\n"
           f"\r\n").encode()
    return hdr + payload + b"\r\n\r\n"


def _http(body: bytes, status: int = 200,
          ctype: str = "text/html") -> bytes:
    return (f"HTTP/1.1 {status} OK\r\n"
            f"Content-Type: {ctype}\r\n"
            f"Content-Length: {len(body)}\r\n\r\n").encode() + body


BODY_A = b"<html><body><p>Hello WARC</p></body></html>"
BODY_B = b"<html><body><p>Zweite Seite</p></body></html>"


def _warc_bytes() -> bytes:
    return (
        _record("warcinfo", "", "2024-01-01T00:00:00Z", b"software: test")
        + _record("request", "https://a.example/x",
                  "2024-01-01T00:00:01Z", b"GET /x HTTP/1.1\r\n\r\n")
        + _record("response", "https://a.example/x",
                  "2024-01-01T00:00:01Z", _http(BODY_A))
        + _record("response", "https://b.example/y",
                  "2024-02-02T12:30:45Z", _http(BODY_B, status=404))
    )


def test_parse_warc_records_plain():
    recs = parse_warc_records(_warc_bytes())
    assert [r["type"] for r in recs] == \
        ["warcinfo", "request", "response", "response"]
    assert recs[2]["url"] == "https://a.example/x"
    assert recs[2]["payload"].endswith(BODY_A)


def test_parse_warc_records_gzip_members():
    # Common Crawl style: each record its own gzip member, concatenated
    gz = b"".join(gzip.compress(_record(
        "response", f"https://g.example/{i}",
        "2024-01-01T00:00:00Z", _http(b"page %d" % i, ctype="text/plain")))
        for i in range(3))
    recs = parse_warc_records(gz)
    assert len(recs) == 3
    assert recs[1]["url"] == "https://g.example/1"


def test_parse_warc_truncated_tail_is_tolerated():
    blob = _warc_bytes() + b"WARC/1.0\r\nContent-Length: 999\r\n\r\nshort"
    assert len(parse_warc_records(blob)) == 4


def test_warc_to_pages_spark(spark):
    df = spark.createDataFrame([(_warc_bytes(),)], "content binary")
    out = {r["url"]: r for r in warc_to_pages(df).collect()}
    assert set(out) == {"https://a.example/x", "https://b.example/y"}
    a = out["https://a.example/x"]
    assert bytes(a["html"]) == BODY_A
    assert a["http_status"] == 200 and "text/html" in a["content_type"]
    assert a["warc_ts"].year == 2024 and a["warc_ts"].second == 1
    assert out["https://b.example/y"]["http_status"] == 404


def test_read_warc_and_extract(spark, tmp_path):
    (tmp_path / "seg-00000.warc.gz").write_bytes(
        gzip.compress(_warc_bytes()))
    pages = read_warc(spark, str(tmp_path))
    rows = pages.collect()
    assert len(rows) == 2
    # the WARC output feeds the extractor directly
    from deepseek_ocr_omnidocbench_spark.operators.html_extract import (
        extract_pages,
    )
    ok = pages.where(pages.http_status == 200).select("url", "html")
    md = extract_pages(ok).collect()
    assert len(md) == 1 and "Hello WARC" in md[0]["md"]


def test_parse_warc_never_raises_on_mutations():
    """Any truncation or byte flip yields a (possibly shorter) record
    list, never an exception — one poisoned segment must not kill a
    task."""
    import gzip as _gzip

    base = _warc_bytes()
    for cut in range(0, len(base), 37):
        assert isinstance(parse_warc_records(base[:cut]), list)
    mutated = bytearray(base)
    for pos in range(0, len(mutated), 101):
        old = mutated[pos]
        mutated[pos] = (old + 1) % 256
        assert isinstance(parse_warc_records(bytes(mutated)), list)
        mutated[pos] = old
    # truncated gzip members
    gz = _gzip.compress(base)
    for cut in (1, 10, len(gz) // 2, len(gz) - 1):
        try:
            out = parse_warc_records(gz[:cut])
            assert isinstance(out, list)
        except Exception as e:
            raise AssertionError(f"raised at cut={cut}: {e!r}")


def test_parse_warc_corrupt_gzip_returns_empty_or_partial():
    import gzip as _gzip

    gz = bytearray(_gzip.compress(_warc_bytes()))
    for pos in range(2, len(gz), 53):
        m = bytearray(gz)
        m[pos] = (m[pos] + 1) % 256
        assert isinstance(parse_warc_records(bytes(m)), list)


class TestCdxIndex:
    def _cdx(self, spark, blob):
        from deepseek_ocr_omnidocbench_spark.sources.warc import cdx_index
        df = spark.createDataFrame([(bytearray(blob),)], "content binary")
        return cdx_index(df).orderBy("ts14").collect()

    def test_offsets_allow_record_seek(self, spark):
        import hashlib
        blob = _warc_bytes()
        out = self._cdx(spark, blob)
        assert len(out) == 2  # responses only
        for r in out:
            # the CDX contract: blob[offset : offset+length] IS the
            # record (header through payload end)
            rec = blob[r["offset"]:r["offset"] + r["length"]]
            assert rec.startswith(b"WARC/1.0")
            payload = rec.split(b"\r\n\r\n", 1)[1]
            assert hashlib.md5(payload).hexdigest() == r["digest"]
        assert out[0]["ts14"] == "20240101000001"
        assert out[0]["http_status"] == 200
        assert out[1]["ts14"] == "20240202123045"
        assert out[1]["http_status"] == 404

    def test_corrupt_tail_indexes_prefix(self, spark):
        blob = _warc_bytes() + b"WARC/1.0\r\nbroken"
        out = self._cdx(spark, blob)
        assert len(out) == 2


class TestSurtKey:
    def _k(self, spark, url):
        from pyspark.sql import functions as F
        from deepseek_ocr_omnidocbench_spark.operators.filters import (
            surt_key)
        df = spark.createDataFrame([(url,)], "url string")
        return df.select(surt_key(F.col("url")).alias("k")).collect()[0]["k"]

    def test_reverses_host_labels(self, spark):
        assert self._k(spark, "https://news.example.com/a/b") == \
            "com,example,news)/a/b"

    def test_lowercases_strips_www_port_query(self, spark):
        assert self._k(spark,
                       "HTTP://WWW.Example.COM:8080/Path?q=1#frag") == \
            "com,example)/Path"

    def test_bare_host_gets_root_path(self, spark):
        assert self._k(spark, "https://example.org") == "org,example)/"

    def test_domain_pages_sort_contiguously(self, spark):
        keys = sorted([
            self._k(spark, "https://a.example.com/z"),
            self._k(spark, "https://other.org/a"),
            self._k(spark, "https://b.example.com/a"),
        ])
        # both example.com subdomains adjacent under SURT order
        assert keys[0].startswith("com,example,a)")
        assert keys[1].startswith("com,example,b)")
