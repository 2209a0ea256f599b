"""Round-14 web realism: chunked transfer decoding, charset
sniff/decode, container-shape WARC with seek-in member reads, and the
deterministic PageRank power step (VERDICT r13 asks #3/#4/#5/#8).

Same posture as test_web_pipeline.py: the decoding paths are pinned
against hand-built wire bytes and closed forms, never against the
encoder that produced them.
"""

import zlib

import pytest

from datafusion_async_parquet_index_spark.operators.web import (
    _chunk_http_body,
    _doc_warc_v2,
    canonicalize_url,
    decode_body_text,
    decode_warc,
    dechunk_http_body,
    html_to_text,
    parse_http_response,
    sniff_charset,
    synthesize_warc_containers,
    web_crawl_clean_pipeline,
    web_chunked_charset_text,
    web_pagerank_step,
)


# -- chunked transfer-encoding -------------------------------------------

def test_dechunk_round_trip():
    body = bytes(range(256)) * 3
    for size in (1, 7, 64, 1024):
        assert dechunk_http_body(_chunk_http_body(body, size)) == body
    assert dechunk_http_body(b"0\r\n\r\n") == b""


def test_dechunk_ignores_chunk_extensions_and_trailers():
    wire = (b"5;name=value;other\r\nhello\r\n"
            b"0\r\nTrailer-One: x\r\nTrailer-Two: y\r\n\r\n")
    assert dechunk_http_body(wire) == b"hello"


def test_dechunk_hand_built_wire():
    # exact RFC 9112 framing, hex sizes with mixed case
    wire = b"4\r\nWiki\r\n5\r\npedia\r\nE\r\n in\r\n\r\nchunks.\r\n0\r\n\r\n"
    assert dechunk_http_body(wire) == b"Wikipedia in\r\n\r\nchunks."


def test_dechunk_refusals():
    with pytest.raises(ValueError, match="bad chunk size"):
        dechunk_http_body(b"xyz\r\nabc\r\n0\r\n\r\n")
    with pytest.raises(ValueError, match="truncated"):
        dechunk_http_body(b"10\r\nshort\r\n")
    with pytest.raises(ValueError, match="missing chunk terminator"):
        dechunk_http_body(b"3\r\nabcX\r\n0\r\n\r\n")
    with pytest.raises(ValueError, match="missing chunk-size"):
        dechunk_http_body(b"")
    with pytest.raises(ValueError, match="unterminated trailer"):
        dechunk_http_body(b"1\r\na\r\n0\r\nTrailer: x")


def test_parse_http_response_dechunks():
    resp = (b"HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n"
            b"Transfer-Encoding: chunked\r\n\r\n"
            + _chunk_http_body(b"the payload", 4))
    out = parse_http_response(resp)
    assert out["chunked"] is True
    assert out["body"] == b"the payload"
    plain = parse_http_response(
        b"HTTP/1.1 200 OK\r\nContent-Length: 2\r\n\r\nok")
    assert plain["chunked"] is False and plain["body"] == b"ok"


# -- charset sniff + decode ----------------------------------------------

def test_sniff_charset_precedence():
    # BOM wins over everything
    assert sniff_charset("text/html; charset=latin-1",
                         b"\xef\xbb\xbfx") == "utf-8"
    assert sniff_charset("", b"\xff\xfe\x00\x00") == "utf-16"
    # header param beats meta tag
    assert sniff_charset(
        'text/html; charset="ISO-8859-1"',
        b'<meta charset="utf-8">') == "iso-8859-1"
    # meta tag variants
    assert sniff_charset(
        "text/html", b'<html><meta charset="windows-1252"><body>'
    ) == "windows-1252"
    assert sniff_charset(
        "text/html",
        b"<meta http-equiv='Content-Type' "
        b"content='text/html; charset=latin1'>") == "latin1"
    # default
    assert sniff_charset("text/html", b"<html>plain</html>") == "utf-8"


def test_decode_body_text_charsets():
    assert decode_body_text(b"caf\xc3\xa9", "text/html") \
        == ("caf\xe9", "utf-8")
    assert decode_body_text(
        b"caf\xe9", "text/html; charset=iso-8859-1") \
        == ("caf\xe9", "iso-8859-1")
    text, cs = decode_body_text(
        b'<meta charset="iso-8859-1">caf\xe9', "text/html")
    assert cs == "iso-8859-1" and text.endswith("caf\xe9")


def test_decode_body_text_refuses_unsupported_charset():
    with pytest.raises(ValueError, match="shift_jis"):
        decode_body_text(b"x", "text/html; charset=shift_jis")
    with pytest.raises(ValueError, match="euc-jp"):
        decode_body_text(b'<meta charset="euc-jp">x', "text/html")


# -- RFC 3986 6.2.2: reserved escapes survive canonicalization -----------

def test_canonicalize_reserved_percent_escapes_stay_encoded():
    # ADVICE r13: '/a%2Fb' must NOT collapse into '/a/b'
    assert canonicalize_url("http://ex.com/a%2Fb") \
        == "http://ex.com/a%2Fb"
    assert canonicalize_url("http://ex.com/a%2Fb") \
        != canonicalize_url("http://ex.com/a/b")
    # unreserved escapes decode (6.2.2.2); other hex uppercases (6.2.2.1)
    assert canonicalize_url("http://ex.com/%41%7e/%2fx%3f") \
        == "http://ex.com/A~/%2Fx%3F"
    # %2E decodes to '.' (unreserved) and THEN dot-resolves
    assert canonicalize_url("http://ex.com/a/%2E%2E/b") \
        == "http://ex.com/b"
    # malformed escape passes through untouched
    assert canonicalize_url("http://ex.com/a%Zq") \
        == "http://ex.com/a%Zq"


# -- v2 corpus: per-variant wire shapes ----------------------------------

@pytest.mark.parametrize("doc_id", [100, 101, 102, 103])
def test_v2_corpus_variant_shapes(doc_id):
    variant = doc_id % 4
    payload = _doc_warc_v2(doc_id, "web", "some document text here")
    recs = decode_warc(payload)
    assert len(recs) == 1
    http = parse_http_response(recs[0]["payload"])
    assert http["chunked"] == (variant in (1, 3))
    text, cs = decode_body_text(
        http["body"], http["headers"].get("content-type", ""))
    assert cs == ("iso-8859-1" if variant in (2, 3) else "utf-8")
    ext = html_to_text(text)
    expect = f"Doc {doc_id} some document text here"
    if variant in (2, 3):
        expect += f" enc caf\xe9 {doc_id}"
    expect += f" tail & {doc_id}"
    assert ext == expect


def test_v2_variant3_sniffs_meta_charset():
    """Variant 3's header carries NO charset: decoding must come from
    the <meta charset> bytes, through the chunked framing."""
    payload = _doc_warc_v2(103, "web", "x")
    http = parse_http_response(decode_warc(payload)[0]["payload"])
    assert "charset" not in http["headers"]["content-type"]
    _text, cs = decode_body_text(
        http["body"], http["headers"]["content-type"])
    assert cs == "iso-8859-1"


# -- container shape: seek-in gzip-member reads --------------------------

def test_container_members_are_seekable(spark, sf_dir):
    rows = synthesize_warc_containers(spark, sf_dir).collect()
    assert len(rows) >= 2
    total_docs = sum(len(r["doc_ids"]) for r in rows)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert total_docs == docs
    r = rows[0]
    payload = bytes(r["payload"])
    # every recorded (offset, length) slice is a SELF-CONTAINED gzip
    # member holding exactly one response record for the recorded doc
    for off, ln, did in zip(r["offsets"], r["lengths"], r["doc_ids"]):
        d = zlib.decompressobj(wbits=31)
        rec_bytes = d.decompress(payload[off:off + ln])
        assert d.eof and not d.unused_data
        recs = decode_warc(rec_bytes)
        assert len(recs) == 1 and recs[0]["type"] == "response"
        uri = recs[0]["headers"]["WARC-Target-URI"]
        assert int(uri.rsplit("/", 1)[-1]) == did
    # offsets/lengths tile the payload exactly after the warcinfo head
    assert r["offsets"][0] + sum(r["lengths"]) == len(payload)
    # a slice off by one byte is NOT a valid member (framing is real)
    bad = payload[r["offsets"][1] + 1:
                  r["offsets"][1] + 1 + r["lengths"][1]]
    with pytest.raises(Exception):
        d = zlib.decompressobj(wbits=31)
        if not d.decompress(bad) or not d.eof:
            raise ValueError("not a member")


# -- pagerank power step --------------------------------------------------

def test_pagerank_step_closed_form(spark, sf_dir):
    got = {r["target"]: (r["in_degree"], r["rank_bp"]) for r in
           web_pagerank_step(spark, sf_dir).collect()}
    docs = [r["doc_id"] for r in
            spark.read.parquet(f"{sf_dir}/documents.parquet")
            .select("doc_id").collect()]
    contrib = {}
    for d in docs:
        for j in (1, 2, 3):
            t = (7 * d + j * j) % 1000
            contrib.setdefault(t, []).append(10000 // 3)
    expect = {t: (len(cs), 1500 + (85 * sum(cs)) // 100)
              for t, cs in contrib.items()}
    assert got == expect


# -- the spark rows agree with a local replay ----------------------------

def test_chunked_charset_row_matches_local_replay(spark, sf_dir):
    rows = {r["doc_id"]: r for r in
            web_chunked_charset_text(spark, sf_dir).collect()}
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .select("doc_id", "source", "text").limit(12).collect()
    for d in docs:
        payload = _doc_warc_v2(d["doc_id"], d["source"], d["text"])
        http = parse_http_response(decode_warc(payload)[0]["payload"])
        text, cs = decode_body_text(
            http["body"], http["headers"].get("content-type", ""))
        ext = html_to_text(text)
        g = rows[d["doc_id"]]
        assert g["charset"] == cs
        assert g["chunked"] == int(http["chunked"])
        assert g["ext_len"] == len(ext)
        assert g["n_words"] == len(ext.split())
        assert g["prefix40"] == ext[:40]


def test_boilerplate_dropping_semantics():
    html = ('<body><header>H</header><nav>N <a href="/x">x</a></nav>'
            '<aside>A<nav>inner</nav></aside>'
            '<main><p>the article body</p></main>'
            '<noscript>ns</noscript><template>t</template>'
            '<footer>F</footer></body>')
    assert html_to_text(html, drop_boilerplate=True) \
        == "the article body"
    # full mode keeps the chrome, in document order
    assert html_to_text(html) == "H N x A inner the article body ns t F"
    # nested same-class containers close correctly
    nested = "<nav>a<nav>b</nav>c</nav>kept"
    assert html_to_text(nested, drop_boilerplate=True) == "kept"


def test_boilerplate_row_closed_form(spark, sf_dir):
    from datafusion_async_parquet_index_spark.operators.web import (
        _doc_boiler_html,
        web_boilerplate_text,
    )

    rows = {r["doc_id"]: r for r in
            web_boilerplate_text(spark, sf_dir).collect()}
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .select("doc_id", "text").limit(8).collect()
    for d in docs:
        page = _doc_boiler_html(d["doc_id"], d["text"])
        main = html_to_text(page, drop_boilerplate=True)
        full = html_to_text(page)
        g = rows[d["doc_id"]]
        assert g["main_len"] == len(main)
        assert g["full_len"] == len(full)
        assert g["prefix40"] == main[:40]
        assert len(main) < len(full)  # chrome really dropped


def test_pagerank_iterations_closed_form(spark, sf_dir):
    from datafusion_async_parquet_index_spark.operators.web import (
        PR_ITERS,
        web_pagerank_iterations,
    )

    got = {r["node"]: r["rank_bp"] for r in
           web_pagerank_iterations(spark, sf_dir).collect()}
    docs = [r["doc_id"] for r in
            spark.read.parquet(f"{sf_dir}/documents.parquet")
            .select("doc_id").collect()]
    edges = [(d, (7 * d + j * j) % 1000)
             for d in docs for j in (1, 2, 3)]
    nodes = {s for s, _ in edges} | {t for _, t in edges}
    out_deg = {}
    for s, _ in edges:
        out_deg[s] = out_deg.get(s, 0) + 1
    rank = {n: 10000 for n in nodes}
    for _ in range(PR_ITERS):
        s_in = {}
        for s, t in edges:
            s_in[t] = s_in.get(t, 0) + rank[s] // out_deg[s]
        rank = {n: 1500 + (85 * s_in.get(n, 0)) // 100
                for n in nodes}
    assert got == rank
    assert len(got) == len(nodes)


def test_crawl_clean_pipeline_flags(spark, sf_dir):
    from datafusion_async_parquet_index_spark.functions import STOPWORDS
    from datafusion_async_parquet_index_spark.operators.curation import (
        GOPHER_MAX_WORDS,
        GOPHER_MIN_STOPWORDS,
        GOPHER_MIN_WORDS,
    )

    rows = web_crawl_clean_pipeline(spark, sf_dir).collect()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert len(rows) == docs
    by_id = {r["doc_id"]: r for r in rows}
    sample = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .select("doc_id", "source", "text").limit(6).collect()
    import re

    for d in sample:
        payload = _doc_warc_v2(d["doc_id"], d["source"], d["text"])
        http = parse_http_response(decode_warc(payload)[0]["payload"])
        text, _cs = decode_body_text(
            http["body"], http["headers"].get("content-type", ""))
        ext = html_to_text(text)
        toks = [t for t in re.split(r"[^a-z0-9]+", ext.lower()) if t]
        n_words = len(ext.split())
        stop_hits = sum(1 for t in toks if t in STOPWORDS)
        n_stop = len({t for t in toks if t in STOPWORDS})
        g = by_id[d["doc_id"]]
        assert g["n_words"] == n_words
        assert g["n_stop"] == n_stop
        assert g["lang_guess"] == (
            "en" if stop_hits * 20 >= len(toks) else "other")
        assert g["keep"] == int(
            GOPHER_MIN_WORDS <= n_words <= GOPHER_MAX_WORDS
            and n_stop >= GOPHER_MIN_STOPWORDS)
