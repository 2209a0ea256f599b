"""Real MP4 (ISO BMFF) container metadata parse — the last entry of
the honest-stub ledger becomes a real box walk (codec FRAME decode is
still a loud NotImplementedError; no codec claim is made).

Pinned here:
- encode_mp4 -> decode_mp4_metadata round-trips every field (movie
  header, per-track handler/dims/duration/timescale/sample count,
  opaque mdat size) across parameter sweeps;
- the walker handles 64-bit largesize boxes and size-0 (to-EOF)
  boxes, and descends only the metadata tree;
- loud ValueError refusals: truncated header, overrunning box,
  missing ftyp/moov, unknown mvhd/tkhd version;
- frame decode still refuses (decode_image_stub contract unchanged);
- Spark-side mm_mp4_metadata == driver-side recomputation.
"""

import struct

import pytest

from datafusion_async_parquet_index_spark.operators.multimodal import (
    decode_image_stub,
    decode_mp4_metadata,
    encode_mp4,
    mm_mp4_metadata,
    synthesize_mp4_media,
)


def _sample(did: int, text: str) -> bytes:
    secs = 1 + did % 30
    k = 1 + did % 8
    tracks = [{"handler": "vide", "width": 160 * k, "height": 90 * k,
               "duration": 600 * secs, "timescale": 600,
               "n_samples": 25 * secs}]
    if did % 3 == 0:
        tracks.append({"handler": "soun", "width": 0, "height": 0,
                       "duration": 48000 * secs, "timescale": 48000,
                       "n_samples": 100 + len(text)})
    return encode_mp4(duration=600 * secs, timescale=600,
                      tracks=tracks, mdat=text.encode())


@pytest.mark.parametrize("did,text", [
    (0, "audio doc"), (1, "x"), (7, "seven"), (29, "y" * 300),
    (30, "wrap"), (123, "abc"),
])
def test_roundtrip_fields(did, text):
    m = decode_mp4_metadata(_sample(did, text))
    secs = 1 + did % 30
    k = 1 + did % 8
    assert m["brand"] == "isom"
    assert (m["timescale"], m["duration"]) == (600, 600 * secs)
    assert m["mdat_bytes"] == len(text.encode())
    vid = next(t for t in m["tracks"] if t["handler"] == "vide")
    assert (vid["width"], vid["height"]) == (160 * k, 90 * k)
    assert vid["n_samples"] == 25 * secs
    assert vid["timescale"] == 600 and vid["duration"] == 600 * secs
    if did % 3 == 0:
        aud = next(t for t in m["tracks"] if t["handler"] == "soun")
        assert aud["n_samples"] == 100 + len(text)
        assert aud["timescale"] == 48000
        assert m["n_tracks"] == 2
    else:
        assert m["n_tracks"] == 1


def test_largesize_and_to_eof_boxes():
    p = _sample(4, "payload")
    # rewrite the trailing mdat as a 64-bit largesize box
    i = p.index(b"mdat") - 4
    size = struct.unpack_from(">I", p, i)[0]
    body = p[i + 8:i + size]
    large = (struct.pack(">I4sQ", 1, b"mdat", 16 + len(body)) + body)
    m = decode_mp4_metadata(p[:i] + large)
    assert m["mdat_bytes"] == len(body)
    # size-0: box extends to end of file
    to_eof = struct.pack(">I4s", 0, b"mdat") + body + b"extra!"
    m2 = decode_mp4_metadata(p[:i] + to_eof)
    assert m2["mdat_bytes"] == len(body) + 6


def test_refusals():
    p = _sample(2, "t")
    with pytest.raises(ValueError, match="truncated"):
        decode_mp4_metadata(b"\x00\x00\x00")
    with pytest.raises(ValueError, match="overruns"):
        decode_mp4_metadata(p[:40])
    with pytest.raises(ValueError, match="missing ftyp"):
        # a well-formed lone mdat is not an MP4
        decode_mp4_metadata(struct.pack(">I4s", 12, b"mdat") + b"abcd")
    # unknown version field refuses by name
    bad = bytearray(p)
    j = bad.index(b"mvhd") + 4
    bad[j] = 9
    with pytest.raises(ValueError, match="mvhd version"):
        decode_mp4_metadata(bytes(bad))


def test_frame_decode_still_refuses():
    with pytest.raises(NotImplementedError, match="codec"):
        decode_image_stub(_sample(3, "x"), "video/mp4")


def test_mm_mp4_metadata_matches_driver(spark, sf_dir):
    sample = (synthesize_mp4_media(spark, sf_dir)
              .orderBy("doc_id").limit(10).collect())
    got = {r["doc_id"]: r for r in
           mm_mp4_metadata(spark, sf_dir).collect()}
    for row in sample:
        m = decode_mp4_metadata(bytes(row["payload"]))
        g = got[row["doc_id"]]
        assert g["duration"] == m["duration"]
        assert g["n_tracks"] == m["n_tracks"]
        assert g["mdat_bytes"] == m["mdat_bytes"]
        vid = next(t for t in m["tracks"] if t["handler"] == "vide")
        assert (g["video_w"], g["video_h"]) == (vid["width"],
                                                vid["height"])
