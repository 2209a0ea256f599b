"""Web-crawl ingestion operators: WARC container parsing and HTML
text extraction — the first two stages of every CommonCrawl-style
training-data pipeline (round 13).

Same honest from-the-spec posture as the image/audio codecs in
operators/multimodal.py: the WARC reader/writer implements ISO
28500 (WARC/1.0) record framing directly — version line, named
headers, Content-Length-delimited payload, CRLF CRLF record
separator, per-record gzip members (the CommonCrawl on-disk shape,
parsed with a raw zlib member loop) — and the HTML text extractor
rides stdlib ``html.parser`` (a real tokenizer, entity decoding
included), dropping script/style subtrees and collapsing whitespace.

Scale shape: every operator is one linear Arrow-batched mapInPandas
pass over the synthesized container bytes — no shuffle, no driver
bytes; parsing cost is per-row CPU, so inputs spread to full
parallelism (see spread_for_compute — a no-op at 100 TB where the
scan already carries more partitions than cores).

Oracle posture: containers are SYNTHESIZED from the documents table
by a deterministic generative formula (URL/status/HTML template from
doc_id + text), so DuckDB recomputes every extracted field
relationally — a parser that slipped record framing, gzip member
boundaries, HTTP header parsing, entity decoding, or tag stripping
could not reproduce the hashes.
"""

from __future__ import annotations

import html as _html
import io
import zlib
from html.parser import HTMLParser
from typing import Callable, Dict, Iterator, List, Optional

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from .util import read_table, spread_for_compute

_CRLF = b"\r\n"


# -- WARC/1.0 record framing (ISO 28500) --------------------------------

def encode_warc_record(warc_type: str, headers: Dict[str, str],
                       payload: bytes) -> bytes:
    """One WARC/1.0 record: version line, WARC-Type + caller headers +
    Content-Length, blank line, payload, record separator."""
    out = bytearray(b"WARC/1.0\r\n")
    out += f"WARC-Type: {warc_type}\r\n".encode("utf-8")
    for k, v in headers.items():
        out += f"{k}: {v}\r\n".encode("utf-8")
    out += f"Content-Length: {len(payload)}\r\n".encode("utf-8")
    out += _CRLF
    out += payload
    out += _CRLF + _CRLF
    return bytes(out)


def encode_warc(records: List[bytes], gzip_members: bool = False
                ) -> bytes:
    """Concatenate records into a WARC file; ``gzip_members``
    compresses EACH record as its own gzip member (the CommonCrawl
    convention — lets a reader seek to a record and decompress it
    alone)."""
    if not gzip_members:
        return b"".join(records)
    import gzip as _gz

    out = bytearray()
    for rec in records:
        buf = io.BytesIO()
        with _gz.GzipFile(fileobj=buf, mode="wb", mtime=0) as fh:
            fh.write(rec)
        out += buf.getvalue()
    return bytes(out)


def _gunzip_members(data: bytes) -> bytes:
    """Decompress ALL gzip members (raw zlib loop — a WARC file is a
    sequence of independent members, not one stream)."""
    out = bytearray()
    pos = 0
    while pos < len(data):
        d = zlib.decompressobj(wbits=31)
        out += d.decompress(data[pos:])
        if not d.eof:
            raise ValueError(
                "WARC gzip member truncated (no stream end)")
        consumed = len(data) - pos - len(d.unused_data)
        if consumed <= 0:
            raise ValueError("WARC gzip member made no progress")
        pos += consumed
    return bytes(out)


def decode_warc(data: bytes) -> List[dict]:
    """Parse a WARC file (plain or per-record-gzipped) into records:
    [{type, headers: {name: value}, payload: bytes}]. Refuses LOUDLY
    (ValueError) on a bad version line, a missing Content-Length, or
    truncated payload/separator."""
    if data[:2] == b"\x1f\x8b":
        data = _gunzip_members(data)
    records = []
    pos = 0
    n = len(data)
    while pos < n:
        if data[pos:pos + 5] != b"WARC/":
            raise ValueError(
                f"not a WARC record at offset {pos} (bad version "
                f"line)")
        hdr_end = data.find(_CRLF + _CRLF, pos)
        if hdr_end < 0:
            raise ValueError("WARC header block truncated")
        lines = data[pos:hdr_end].split(_CRLF)
        version = lines[0].decode("utf-8", "replace")
        if not version.startswith("WARC/1."):
            raise ValueError(
                f"unsupported WARC version {version!r} (1.x only)")
        headers: Dict[str, str] = {}
        for ln in lines[1:]:
            k, sep, v = ln.decode("utf-8", "replace").partition(":")
            if not sep:
                raise ValueError(
                    f"malformed WARC header line {ln!r}")
            headers[k.strip()] = v.strip()
        if "Content-Length" not in headers:
            raise ValueError("WARC record without Content-Length")
        clen = int(headers["Content-Length"])
        body_start = hdr_end + 4
        body_end = body_start + clen
        if body_end + 4 > n:
            raise ValueError("WARC payload truncated")
        if data[body_end:body_end + 4] != _CRLF + _CRLF:
            raise ValueError(
                "WARC record separator missing (framing slip)")
        records.append({
            "type": headers.get("WARC-Type", ""),
            "headers": headers,
            "payload": data[body_start:body_end],
        })
        pos = body_end + 4
    return records


def parse_http_response(payload: bytes) -> dict:
    """Split an HTTP/1.x response payload (the body of a WARC
    ``response`` record) into {status, headers, body}."""
    sep = payload.find(_CRLF + _CRLF)
    if sep < 0:
        raise ValueError("HTTP response without header terminator")
    head = payload[:sep].split(_CRLF)
    status_line = head[0].decode("utf-8", "replace")
    parts = status_line.split(" ", 2)
    if len(parts) < 2 or not parts[0].startswith("HTTP/"):
        raise ValueError(f"bad HTTP status line {status_line!r}")
    headers = {}
    for ln in head[1:]:
        k, _sep, v = ln.decode("utf-8", "replace").partition(":")
        headers[k.strip().lower()] = v.strip()
    return {"status": int(parts[1]), "headers": headers,
            "body": payload[sep + 4:]}


# -- HTML text extraction (stdlib html.parser) ---------------------------

class _TextExtractor(HTMLParser):
    """Collect text nodes, skipping <script>/<style> subtrees;
    convert_charrefs (the default) decodes entities into the data
    stream."""

    _SKIP = {"script", "style"}

    def __init__(self):
        super().__init__()
        self.chunks: List[str] = []
        self._skip_depth = 0

    def handle_starttag(self, tag, attrs):
        if tag in self._SKIP:
            self._skip_depth += 1

    def handle_endtag(self, tag):
        if tag in self._SKIP and self._skip_depth:
            self._skip_depth -= 1

    def handle_data(self, data):
        if not self._skip_depth and data.strip():
            self.chunks.append(data)


def html_to_text(doc: str) -> str:
    """Visible text of an HTML document: tags stripped, script/style
    subtrees dropped, entities decoded, whitespace collapsed to
    single spaces."""
    p = _TextExtractor()
    p.feed(doc)
    p.close()
    return " ".join(" ".join(p.chunks).split())


# -- deterministic corpus: documents -> HTML -> HTTP -> WARC -------------

def _doc_url(source: str, doc_id: int) -> str:
    return f"http://{source}.example/doc/{doc_id}"


def _doc_html(doc_id: int, text: str) -> str:
    """The generative template the oracles recompute: a title, a
    script that MUST be dropped, the escaped document text (entity
    round-trip), and a tail with a literal entity."""
    return (f"<html><head><title>Doc {doc_id}</title>"
            f"<script>var skip_{doc_id} = 1;</script></head>"
            f"<body><p>{_html.escape(text)}</p>"
            f"<p>tail &amp; {doc_id}</p></body></html>")


def _doc_warc(doc_id: int, source: str, text: str) -> bytes:
    """One WARC file per document: a warcinfo record plus a response
    record whose HTTP body is the HTML page; even doc_ids gzip each
    record (the CommonCrawl shape), odd ones stay plain."""
    info = encode_warc_record(
        "warcinfo",
        {"WARC-Record-ID": f"<urn:uuid:info-{doc_id}>",
         "Content-Type": "application/warc-fields"},
        f"software: spark-graft\r\nformat: WARC/1.0 doc {doc_id}\r\n"
        .encode("utf-8"))
    body = _doc_html(doc_id, text).encode("utf-8")
    http = (b"HTTP/1.1 200 OK\r\n"
            b"Content-Type: text/html; charset=utf-8\r\n"
            + f"Content-Length: {len(body)}\r\n".encode("utf-8")
            + _CRLF + body)
    resp = encode_warc_record(
        "response",
        {"WARC-Record-ID": f"<urn:uuid:resp-{doc_id}>",
         "WARC-Target-URI": _doc_url(source, doc_id),
         "Content-Type": "application/http; msgtype=response"},
        http)
    return encode_warc([info, resp], gzip_members=doc_id % 2 == 0)


def synthesize_warc_media(spark: SparkSession, sf_dir: str
                          ) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text")

    def _make(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [
                _doc_warc(int(i), s, t)
                for i, s, t in zip(pdf["doc_id"], pdf["source"],
                                   pdf["text"])]
            yield pd.DataFrame({"doc_id": pdf["doc_id"].to_numpy(),
                                "payload": payloads})

    # per-row parse/compress work: spread by rows, not bytes
    spread = spread_for_compute(docs)
    return spread.mapInPandas(_make, schema=StructType([
        StructField("doc_id", LongType()),
        StructField("payload", BinaryType()),
    ]))


WARC_META_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("n_records", IntegerType()),
    StructField("url", StringType()),
    StructField("warc_type", StringType()),
    StructField("http_status", IntegerType()),
    StructField("http_content_type", StringType()),
    StructField("body_bytes", LongType()),
])


def web_warc_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WARC record inventory FROM REAL CONTAINER BYTES: synthesize a
    two-record WARC file per document (warcinfo + HTTP response,
    alternating plain / per-record-gzip framing), parse the records
    back out (version line, header block, Content-Length payload
    framing, gzip member loop), and surface the response record's
    URI, HTTP status/content-type and exact body size. The DuckDB
    oracle recomputes every field from the generative formula —
    including the HTML byte length THROUGH the entity escaping."""

    def _meta(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("doc_id", "n_records", "url",
                                   "warc_type", "http_status",
                                   "http_content_type", "body_bytes")}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                recs = decode_warc(bytes(payload))
                resp = next(r for r in recs if r["type"] == "response")
                http = parse_http_response(resp["payload"])
                out["doc_id"].append(int(doc_id))
                out["n_records"].append(len(recs))
                out["url"].append(
                    resp["headers"].get("WARC-Target-URI", ""))
                out["warc_type"].append(resp["type"])
                out["http_status"].append(http["status"])
                out["http_content_type"].append(
                    http["headers"].get("content-type", ""))
                out["body_bytes"].append(len(http["body"]))
            yield pd.DataFrame(out)

    media = synthesize_warc_media(spark, sf_dir)
    return media.mapInPandas(_meta, schema=WARC_META_SCHEMA)


# body_bytes = len(html template) with text ESCAPED: & -> &amp; (+4),
# < -> &lt; (+3), > -> &gt; (+3) — recomputed relationally via
# replace-length deltas ('" and ' never occur in the corpus template
# path because html.escape(quote=False) is not used; escape() quotes
# them too: " -> &quot; (+5), ' -> &#x27; (+5)).
WEB_WARC_META_SQL = """
    WITH m AS (
        SELECT doc_id, source, text,
               length(text)
               + 4 * (length(text) - length(replace(text, '&', '')))
               + 3 * (length(text) - length(replace(text, '<', '')))
               + 3 * (length(text) - length(replace(text, '>', '')))
               + 5 * (length(text) - length(replace(text, '"', '')))
               + 5 * (length(text) - length(replace(text, chr(39),
                                                    '')))
                 AS esc_len
        FROM documents
    )
    SELECT doc_id,
           CAST(2 AS INT) AS n_records,
           'http://' || source || '.example/doc/' || doc_id AS url,
           'response' AS warc_type,
           CAST(200 AS INT) AS http_status,
           'text/html; charset=utf-8' AS http_content_type,
           CAST(esc_len
                + length('<html><head><title>Doc </title>'
                         || '<script>var skip_ = 1;</script></head>'
                         || '<body><p></p><p>tail &amp; </p>'
                         || '</body></html>')
                + 3 * length(CAST(doc_id AS VARCHAR))
                AS BIGINT) AS body_bytes
    FROM m
"""


HTML_TEXT_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("ext_len", LongType()),
    StructField("n_words", LongType()),
    StructField("prefix48", StringType()),
])


def web_warc_html_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full crawl-ingestion pipeline over real bytes: WARC
    (gzip-member or plain) -> response record -> HTTP body -> HTML ->
    VISIBLE TEXT (stdlib tokenizer: tags stripped, the script subtree
    dropped, entities decoded, whitespace collapsed). Returns the
    extracted length, word count and a 48-char prefix per document —
    all recomputed relationally by the oracle, because extraction of
    the known template has the closed form
    'Doc {id} {collapsed text} tail & {id}' (escape then extract is
    the identity on the text)."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("doc_id", "ext_len", "n_words",
                                   "prefix48")}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                recs = decode_warc(bytes(payload))
                resp = next(r for r in recs if r["type"] == "response")
                http = parse_http_response(resp["payload"])
                text = html_to_text(http["body"].decode("utf-8"))
                out["doc_id"].append(int(doc_id))
                out["ext_len"].append(len(text))
                out["n_words"].append(len(text.split()))
                out["prefix48"].append(text[:48])
            yield pd.DataFrame(out)

    media = synthesize_warc_media(spark, sf_dir)
    return media.mapInPandas(_extract, schema=HTML_TEXT_SCHEMA)


WEB_WARC_HTML_TEXT_SQL = """
    WITH m AS (
        SELECT doc_id,
               'Doc ' || doc_id || ' '
               || trim(regexp_replace(text, '\\s+', ' ', 'g'))
               || ' tail & ' || doc_id AS ext
        FROM documents
    )
    SELECT doc_id,
           CAST(length(ext) AS BIGINT) AS ext_len,
           CAST(len(regexp_split_to_array(ext, ' ')) AS BIGINT)
               AS n_words,
           substr(ext, 1, 48) AS prefix48
    FROM m
"""


WEB_QUERIES: Dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "web_warc_metadata": web_warc_metadata,
    "web_warc_html_text": web_warc_html_text,
}

WEB_ORACLE: Dict[str, str] = {
    "web_warc_metadata": WEB_WARC_META_SQL,
    "web_warc_html_text": WEB_WARC_HTML_TEXT_SQL,
}


# -- URL canonicalization (RFC 3986 normalization) -----------------------

_TRACKING_PARAMS = frozenset({
    "utm_source", "utm_medium", "utm_campaign", "utm_term",
    "utm_content", "fbclid", "gclid", "ref",
})
_DEFAULT_PORTS = {"http": 80, "https": 443}


def canonicalize_url(url: str) -> str:
    """Deterministic URL canonical form (RFC 3986 section 6 syntax
    normalization + the pipeline-standard extras): lowercase scheme
    and host, drop default ports, resolve ``.``/``..`` path segments,
    collapse empty path to ``/``, percent-decode unreserved
    characters, sort query parameters, drop tracking parameters and
    the fragment. Two crawl records of the same page under cosmetic
    URL variation canonicalize to one key — the dedup prerequisite."""
    from urllib.parse import (
        parse_qsl, unquote, urlencode, urlsplit, urlunsplit,
    )

    parts = urlsplit(url.strip())
    scheme = parts.scheme.lower()
    host = (parts.hostname or "").lower()
    port = parts.port
    netloc = host
    if port is not None and port != _DEFAULT_PORTS.get(scheme):
        netloc = f"{host}:{port}"
    # dot-segment resolution (RFC 3986 5.2.4)
    segs: List[str] = []
    for seg in unquote(parts.path).split("/"):
        if seg == ".":
            continue
        if seg == "..":
            if len(segs) > 1:
                segs.pop()
            continue
        segs.append(seg)
    path = "/".join(segs) or "/"
    if not path.startswith("/"):
        path = "/" + path
    q = sorted((k, v) for k, v in parse_qsl(parts.query,
                                            keep_blank_values=True)
               if k not in _TRACKING_PARAMS)
    return urlunsplit((scheme, netloc, path, urlencode(q), ""))


def _doc_url_variant(source: str, doc_id: int) -> str:
    """One of six cosmetic variants of _doc_url, selected by doc_id —
    every variant canonicalizes back to the plain form."""
    base = f"{source}.example"
    v = doc_id % 6
    if v == 0:
        return f"http://{base}/doc/{doc_id}"
    if v == 1:
        return f"HTTP://{base.upper()}:80/doc/{doc_id}"
    if v == 2:
        return f"http://{base}/a/../doc/./{doc_id}"
    if v == 3:
        return f"http://{base}/doc/{doc_id}?utm_source=feed#frag"
    if v == 4:
        return f"http://{base}/doc/{doc_id}?b=2&a=1"
    return f"http://{base}:80/x/../doc/{doc_id}?a=1&b=2&gclid=z"


def web_url_canonical_dedup(spark: SparkSession, sf_dir: str
                            ) -> DataFrame:
    """URL-level dedup through REAL canonicalization: every document
    carries a cosmetically-varied URL (case, default port, dot
    segments, tracking params, fragment, query order — six variant
    shapes cycled by doc_id), canonicalization collapses the
    variation, and grouping by (canonical, had_query) counts the
    population per canonical shape. Scale shape: canonicalize is one
    JVM-adjacent Arrow batch pass (pure-Python string work per row,
    spread to full parallelism); the groupBy shuffles only canonical
    URLS, never documents."""
    import pandas as pd  # noqa: F811

    from pyspark.sql import functions as F

    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", "source")

    def _canon(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            canon = []
            for doc_id, source in zip(pdf["doc_id"], pdf["source"]):
                canon.append(canonicalize_url(
                    _doc_url_variant(source, int(doc_id))))
            yield pd.DataFrame({"doc_id": pdf["doc_id"].to_numpy(),
                                "canonical": canon})

    spread = spread_for_compute(docs)
    canon = spread.mapInPandas(_canon, schema=StructType([
        StructField("doc_id", LongType()),
        StructField("canonical", StringType()),
    ]))
    return (canon.groupBy("canonical")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.min("doc_id").alias("min_doc_id"))
            .filter(F.col("n_docs") >= 1))


# Oracle: the canonical form of every variant is
# 'http://{source}.example/doc/{id}' with the query reduced to the
# sorted non-tracking params — variants 0-3 lose the query entirely,
# 4 and 5 keep 'a=1&b=2'.
WEB_URL_CANON_SQL = """
    WITH c AS (
        SELECT doc_id,
               'http://' || source || '.example/doc/' || doc_id
               || CASE WHEN doc_id % 6 IN (4, 5)
                       THEN '?a=1&b=2' ELSE '' END AS canonical
        FROM documents
    )
    SELECT canonical,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(MIN(doc_id) AS BIGINT) AS min_doc_id
    FROM c GROUP BY canonical
"""


# -- link extraction + degree aggregation --------------------------------

class _LinkExtractor(HTMLParser):
    def __init__(self):
        super().__init__()
        self.hrefs: List[str] = []

    def handle_starttag(self, tag, attrs):
        if tag == "a":
            for k, v in attrs:
                if k == "href" and v:
                    self.hrefs.append(v)


def extract_links(doc: str) -> List[str]:
    """All <a href=...> targets of an HTML document, in order."""
    p = _LinkExtractor()
    p.feed(doc)
    p.close()
    return p.hrefs


def _doc_link_html(doc_id: int, text: str) -> str:
    """Page with three outbound links to deterministic neighbor ids
    ((7 id + j^2) mod 1000 for j = 1..3) buried among the text."""
    links = "".join(
        f'<a href="/doc/{(7 * doc_id + j * j) % 1000}">n{j}</a>'
        for j in (1, 2, 3))
    return (f"<html><body><p>{_html.escape(text[:40])}</p>{links}"
            f"</body></html>")


def web_link_graph_degrees(spark: SparkSession, sf_dir: str
                           ) -> DataFrame:
    """LINK GRAPH out of real HTML: every document's page embeds
    three anchor tags to deterministic neighbor ids; a real tokenizer
    pass extracts the hrefs, targets explode, and a distributed
    groupBy aggregates IN-degree per target page. The page-rank-
    shaped first step of crawl graph analysis. Scale shape: the
    extraction is one linear Arrow pass; only (target, 1) pairs
    shuffle — three per document regardless of page size — and the
    aggregation is a map-side-combinable count."""
    import pandas as pd  # noqa: F811

    from pyspark.sql import functions as F

    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", "text")

    def _links(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "target": []}
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                page = _doc_link_html(int(doc_id), text)
                for href in extract_links(page):
                    out["doc_id"].append(int(doc_id))
                    out["target"].append(
                        int(href.rsplit("/", 1)[-1]))
            yield pd.DataFrame(out)

    spread = spread_for_compute(docs)
    edges = spread.mapInPandas(_links, schema=StructType([
        StructField("doc_id", LongType()),
        StructField("target", LongType()),
    ]))
    return (edges.groupBy("target")
            .agg(F.count(F.lit(1)).alias("in_degree"),
                 F.min("doc_id").alias("min_source")))


WEB_LINK_DEGREES_SQL = """
    WITH e AS (
        SELECT doc_id, (7 * doc_id + j * j) % 1000 AS target
        FROM documents, (SELECT unnest(range(1, 4)) AS j)
    )
    SELECT target,
           CAST(COUNT(*) AS BIGINT) AS in_degree,
           CAST(MIN(doc_id) AS BIGINT) AS min_source
    FROM e GROUP BY target
"""


WEB_QUERIES["web_url_canonical_dedup"] = web_url_canonical_dedup
WEB_QUERIES["web_link_graph_degrees"] = web_link_graph_degrees
WEB_ORACLE["web_url_canonical_dedup"] = WEB_URL_CANON_SQL
WEB_ORACLE["web_link_graph_degrees"] = WEB_LINK_DEGREES_SQL
