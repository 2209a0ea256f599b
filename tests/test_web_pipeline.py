"""WARC container parsing + HTML text extraction (round 13): the
first two stages of a CommonCrawl-style ingestion pipeline, built
from-the-spec on stdlib (ISO 28500 record framing, per-record gzip
members via a raw zlib loop, html.parser tokenization with entity
decoding and script/style subtree dropping).

Pinned here:
- WARC round-trip across framing modes (plain / gzip members),
  multi-record files, header fidelity, exact Content-Length payload
  slicing;
- loud refusals: bad version line, missing Content-Length, truncated
  payload, missing record separator, truncated gzip member;
- HTML extraction semantics: entities decode, script/style drop,
  whitespace collapses — property-fuzzed against the closed-form
  template;
- the two Spark operators match a driver-side recomputation.
"""


import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from datafusion_async_parquet_index_spark.operators.web import (
    _doc_warc,
    decode_warc,
    encode_warc,
    encode_warc_record,
    html_to_text,
    parse_http_response,
    synthesize_warc_media,
    web_warc_html_text,
    web_warc_metadata,
)


def _mk(n=3, gz=False):
    recs = [encode_warc_record(
        "resource",
        {"WARC-Record-ID": f"<urn:uuid:{i}>", "X-Seq": str(i)},
        f"payload-{i}".encode() * (i + 1)) for i in range(n)]
    return encode_warc(recs, gzip_members=gz)


@pytest.mark.parametrize("gz", [False, True], ids=["plain", "gzip"])
def test_warc_round_trip(gz):
    data = _mk(4, gz)
    recs = decode_warc(data)
    assert len(recs) == 4
    for i, r in enumerate(recs):
        assert r["type"] == "resource"
        assert r["headers"]["X-Seq"] == str(i)
        assert r["payload"] == f"payload-{i}".encode() * (i + 1)


def test_warc_payload_may_contain_record_magic():
    """Content-Length framing, not delimiter scanning: a payload that
    CONTAINS the record separator and a WARC/1.0 line must round-trip
    intact."""
    evil = b"\r\n\r\nWARC/1.0\r\nWARC-Type: fake\r\n\r\n"
    rec = encode_warc_record("resource", {"WARC-Record-ID": "<x>"},
                             evil)
    out = decode_warc(rec)
    assert len(out) == 1 and out[0]["payload"] == evil


def test_warc_refusals():
    with pytest.raises(ValueError, match="bad version"):
        decode_warc(b"NOTWARC/1.0\r\n\r\n")
    with pytest.raises(ValueError, match="unsupported WARC version"):
        decode_warc(b"WARC/2.0\r\nContent-Length: 0\r\n\r\n\r\n\r\n")
    with pytest.raises(ValueError, match="without Content-Length"):
        decode_warc(b"WARC/1.0\r\nWARC-Type: x\r\n\r\n\r\n\r\n")
    ok = encode_warc_record("resource", {}, b"abcdef")
    with pytest.raises(ValueError, match="truncated"):
        decode_warc(ok[:-6])
    # corrupt the separator
    bad = bytearray(ok)
    bad[-1] = 0x58
    with pytest.raises(ValueError, match="separator"):
        decode_warc(bytes(bad))
    # truncated gzip member
    gz = encode_warc([ok], gzip_members=True)
    with pytest.raises(ValueError, match="gzip member truncated"):
        decode_warc(gz[:len(gz) // 2])


def test_gzip_members_are_independent():
    """Each record is its own gzip member (the CommonCrawl seekable
    shape): decompressing only the FIRST member yields exactly the
    first record."""
    import zlib

    r0 = encode_warc_record("resource", {"A": "1"}, b"first")
    r1 = encode_warc_record("resource", {"A": "2"}, b"second")
    data = encode_warc([r0, r1], gzip_members=True)
    d = zlib.decompressobj(wbits=31)       # exactly ONE member
    first = d.decompress(data)
    assert d.eof and first == r0
    # and the second member starts right where the first ended
    d2 = zlib.decompressobj(wbits=31)
    assert d2.decompress(d.unused_data) == r1


def test_http_response_parse():
    http = (b"HTTP/1.1 404 Not Found\r\nX-A: b\r\n"
            b"Content-Type: text/plain\r\n\r\nbody bytes")
    out = parse_http_response(http)
    assert out["status"] == 404
    assert out["headers"]["content-type"] == "text/plain"
    assert out["body"] == b"body bytes"
    with pytest.raises(ValueError, match="status line"):
        parse_http_response(b"GARBAGE\r\n\r\nx")


def test_html_to_text_semantics():
    doc = ("<html><head><title>T</title><style>p{}</style>"
           "<script>var x = '<p>not text</p>';</script></head>"
           "<body><h1>A&amp;B</h1>\n\n  <p>two  words</p>"
           "<div>nested <b>bold</b> tail</div></body></html>")
    assert html_to_text(doc) == "T A&B two words nested bold tail"


@settings(max_examples=30, deadline=None)
@given(st.integers(0, 10_000),
       st.text(alphabet=st.characters(min_codepoint=32,
                                      max_codepoint=126),
               min_size=1, max_size=200))
def test_pipeline_closed_form(doc_id, text):
    """warc -> http -> html -> text equals the template's closed form
    for arbitrary printable text (entity escape/decode is the
    identity; whitespace collapses)."""
    from hypothesis import assume
    assume(text.strip())
    w = _doc_warc(doc_id, "src", text)
    recs = decode_warc(w)
    resp = next(r for r in recs if r["type"] == "response")
    body = parse_http_response(resp["payload"])["body"].decode()
    got = html_to_text(body)
    assert got == f"Doc {doc_id} {' '.join(text.split())} " \
                  f"tail & {doc_id}"


def test_url_canonicalization_semantics():
    from datafusion_async_parquet_index_spark.operators.web import (
        _doc_url_variant,
        canonicalize_url,
    )
    c = canonicalize_url
    # RFC 3986 syntax normalization
    assert c("HTTP://Ex.COM:80/a/b") == "http://ex.com/a/b"
    assert c("https://ex.com:443/x") == "https://ex.com/x"
    assert c("https://ex.com:8443/x") == "https://ex.com:8443/x"
    assert c("http://ex.com/a/../b/./c") == "http://ex.com/b/c"
    assert c("http://ex.com") == "http://ex.com/"
    assert c("http://ex.com/p?z=1&a=2") == "http://ex.com/p?a=2&z=1"
    assert c("http://ex.com/p?utm_source=x&gclid=y&k=v#frag") == \
        "http://ex.com/p?k=v"
    # every corpus variant collapses to the canonical form
    for did in range(12):
        got = canonicalize_url(_doc_url_variant("web", did))
        tail = "?a=1&b=2" if did % 6 in (4, 5) else ""
        assert got == f"http://web.example/doc/{did}{tail}", (did, got)


def test_link_extraction_order_and_filtering():
    from datafusion_async_parquet_index_spark.operators.web import (
        _doc_link_html,
        extract_links,
    )
    html = _doc_link_html(12, "hello <world> & co")
    links = extract_links(html)
    assert links == [f"/doc/{(7 * 12 + j * j) % 1000}"
                     for j in (1, 2, 3)]
    # anchors without href and non-anchor tags are ignored
    assert extract_links(
        '<a name="x"></a><link href="/css"><a href="/ok">t</a>'
    ) == ["/ok"]


def test_web_graph_operators_match_driver(spark, sf_dir):
    from datafusion_async_parquet_index_spark.operators.web import (
        web_link_graph_degrees,
        web_url_canonical_dedup,
    )
    deg = {r["target"]: r["in_degree"] for r in
           web_link_graph_degrees(spark, sf_dir).collect()}
    docs = [r["doc_id"] for r in
            spark.read.parquet(f"{sf_dir}/documents.parquet")
            .select("doc_id").collect()]
    expect = {}
    for d in docs:
        for j in (1, 2, 3):
            t = (7 * d + j * j) % 1000
            expect[t] = expect.get(t, 0) + 1
    assert deg == expect
    assert sum(deg.values()) == 3 * len(docs)
    rows = web_url_canonical_dedup(spark, sf_dir).collect()
    assert len(rows) == len(docs)          # distinct URLs per doc
    assert all(r["canonical"].startswith("http://") for r in rows)


def test_web_operators_match_driver(spark, sf_dir):
    media = synthesize_warc_media(spark, sf_dir).orderBy("doc_id")
    sample = media.limit(8).collect()
    meta = {r["doc_id"]: r for r in
            web_warc_metadata(spark, sf_dir).collect()}
    textq = {r["doc_id"]: r for r in
             web_warc_html_text(spark, sf_dir).collect()}
    for row in sample:
        payload = bytes(row["payload"])
        # even doc_ids gzip, odd plain — both framings present
        assert (payload[:2] == b"\x1f\x8b") == (row["doc_id"] % 2 == 0)
        recs = decode_warc(payload)
        resp = next(r for r in recs if r["type"] == "response")
        http = parse_http_response(resp["payload"])
        g = meta[row["doc_id"]]
        assert g["n_records"] == len(recs) == 2
        assert g["http_status"] == 200
        assert g["body_bytes"] == len(http["body"])
        t = textq[row["doc_id"]]
        ext = html_to_text(http["body"].decode())
        assert t["ext_len"] == len(ext)
        assert t["prefix48"] == ext[:48]
