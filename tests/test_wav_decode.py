"""Real PCM WAV decode (round 11, extending the BMP/PNG real-codec
pattern to audio): encode_wav/decode_wav are a genuine RIFF/PCM codec
— chunk walk with word alignment, fmt geometry cross-checks, int16
little-endian deinterleave — and mm_decode_wav_stats computes features
from SAMPLES DECODED OUT OF THE CONTAINER.

Pinned here:
- byte-exact golden layout for a handcrafted 3-frame stereo clip
  (independently derived from the RIFF spec, not from the encoder);
- encode -> decode round-trip property-fuzzed across frame counts,
  channel counts, and rates;
- unknown chunks (LIST) skipped with word alignment, like real
  writers emit;
- loud refusal of non-WAV bytes, compressed format tags, non-16-bit
  depths, corrupt fmt geometry, ragged data, truncation;
- Spark-side mm_decode_wav_stats == driver-side recomputation.
"""

import struct

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from datafusion_async_parquet_index_spark.operators.multimodal import (
    WAV_ENERGY_WINDOW,
    decode_wav,
    encode_wav,
    mm_decode_wav_stats,
    mm_wav_energy_stats,
)


def test_golden_wav_bytes():
    """3 frames x 2 channels at 8 kHz, laid out by hand from the RIFF
    spec: 16-byte PCM fmt chunk, interleaved little-endian samples."""
    samples = np.array([[1, -1], [2, -2], [300, -300]], dtype=np.int16)
    blob = encode_wav(samples, 8000)
    data = samples.astype("<i2").tobytes()
    want = (b"RIFF" + struct.pack("<I", 4 + 8 + 16 + 8 + len(data))
            + b"WAVE"
            + b"fmt " + struct.pack("<I", 16)
            + struct.pack("<HHIIHH", 1, 2, 8000, 8000 * 4, 4, 16)
            + b"data" + struct.pack("<I", len(data)) + data)
    assert blob == want
    rate, ch, back = decode_wav(blob)
    assert (rate, ch) == (8000, 2)
    assert (back == samples).all()


@settings(max_examples=40, deadline=None)
@given(
    n=st.integers(min_value=1, max_value=400),
    ch=st.integers(min_value=1, max_value=4),
    rate=st.sampled_from([8_000, 16_000, 44_100]),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_roundtrip_property(n, ch, rate, seed):
    rng = np.random.RandomState(seed)
    samples = rng.randint(-32768, 32768, (n, ch)).astype(np.int16)
    got_rate, got_ch, back = decode_wav(encode_wav(samples, rate))
    assert (got_rate, got_ch) == (rate, ch)
    assert (back == samples).all()


def test_unknown_chunks_skipped_word_aligned():
    """A LIST chunk with an ODD length between fmt and data must be
    skipped with its pad byte — misaligned walks would misread the
    data chunk header."""
    samples = np.array([[5], [6]], dtype=np.int16)
    blob = encode_wav(samples, 8000)
    # splice LIST (length 3, +1 pad) after the fmt chunk
    head, tail = blob[:12 + 8 + 16], blob[12 + 8 + 16:]
    spliced = (head + b"LIST" + struct.pack("<I", 3) + b"abc\x00"
               + tail)
    spliced = (b"RIFF" + struct.pack("<I", len(spliced) - 8)
               + spliced[8:])
    rate, ch, back = decode_wav(spliced)
    assert (back == samples).all()


def test_loud_refusals():
    samples = np.zeros((4, 1), dtype=np.int16)
    blob = bytearray(encode_wav(samples, 8000))
    with pytest.raises(ValueError, match="RIFF/WAVE"):
        decode_wav(b"OggS" + bytes(blob)[4:])
    # compressed format tag (e.g. 85 = MP3) refused
    bad = bytearray(blob)
    struct.pack_into("<H", bad, 20, 85)
    with pytest.raises(ValueError, match="format_tag=85"):
        decode_wav(bytes(bad))
    # 8-bit depth refused
    bad = bytearray(blob)
    struct.pack_into("<H", bad, 34, 8)
    with pytest.raises(ValueError, match="bits=8"):
        decode_wav(bytes(bad))
    # corrupt block_align refused
    bad = bytearray(blob)
    struct.pack_into("<H", bad, 32, 6)
    with pytest.raises(ValueError, match="geometry"):
        decode_wav(bytes(bad))
    # ragged data refused: declare one extra byte in the data chunk
    ragged = bytes(blob) + b"\x00"
    ragged = bytearray(ragged)
    struct.pack_into("<I", ragged, 40, 9)   # data length 8 -> 9
    struct.pack_into("<I", ragged, 4, len(ragged) - 8)
    with pytest.raises(ValueError, match="frames"):
        decode_wav(bytes(ragged))
    # truncation refused
    with pytest.raises(ValueError, match="truncated|missing"):
        decode_wav(bytes(blob)[:30])


def test_spark_stats_match_driver_recomputation(spark, sf_dir):
    rows = {r["doc_id"]: r
            for r in mm_decode_wav_stats(spark, sf_dir).collect()}
    docs = {r["doc_id"]: r["text"] for r in
            spark.read.parquet(f"{sf_dir}/documents.parquet")
            .select("doc_id", "text").limit(50).collect()}
    for doc_id, text in docs.items():
        b = text.encode("utf-8")
        n = 64 + doc_id % 193
        ch = 1 + doc_id % 2
        rate = 8000 * (1 + doc_id % 3)
        j = np.arange(n * ch)
        vals = (np.frombuffer(b, dtype=np.uint8)[j % len(b)]
                .astype(np.int64) - 128) * 256
        r = rows[doc_id]
        assert (r["rate"], r["channels"], r["n_frames"]) == (rate, ch, n)
        assert r["samp_sum"] == int(vals.sum())
        assert r["samp_wsum"] == int((vals * (1 + j % 103)).sum())

def test_wav_energy_matches_driver_recomputation(spark, sf_dir):
    """Windowed energy over DECODED samples equals the generative
    formula's windows (ragged tail window included)."""
    rows = {r["doc_id"]: r
            for r in mm_wav_energy_stats(spark, sf_dir).collect()}
    docs = {r["doc_id"]: r["text"] for r in
            spark.read.parquet(f"{sf_dir}/documents.parquet")
            .select("doc_id", "text").limit(30).collect()}
    for doc_id, text in docs.items():
        b = text.encode("utf-8")
        n = 64 + doc_id % 193
        ch = 1 + doc_id % 2
        j = np.arange(n * ch)
        s = (np.frombuffer(b, dtype=np.uint8)[j % len(b)]
             .astype(np.int64) - 128) * 256
        sq = s * s
        nw = (sq.size + WAV_ENERGY_WINDOW - 1) // WAV_ENERGY_WINDOW
        pad = np.zeros(nw * WAV_ENERGY_WINDOW, dtype=np.int64)
        pad[:sq.size] = sq
        wins = pad.reshape(nw, WAV_ENERGY_WINDOW).sum(axis=1)
        r = rows[doc_id]
        assert r["n_windows"] == nw
        assert r["tot_energy"] == int(sq.sum())
        assert r["max_win_energy"] == int(wins.max())

def test_wav_resample_matches_driver_recomputation(spark, sf_dir):
    """decode -> nearest rate-conversion -> encode -> decode equals the
    relational frame-index replay (up-, identity-, and down-sampling
    all present: the corpus cycles 8/16/24 kHz)."""
    from datafusion_async_parquet_index_spark.operators.multimodal import (
        WAV_TARGET_RATE,
        mm_resample_wav_stats,
    )

    rows = {r["doc_id"]: r
            for r in mm_resample_wav_stats(spark, sf_dir).collect()}
    docs = {r["doc_id"]: r["text"] for r in
            spark.read.parquet(f"{sf_dir}/documents.parquet")
            .select("doc_id", "text").limit(40).collect()}
    saw_rates = set()
    for doc_id, text in docs.items():
        b = text.encode("utf-8")
        n = 64 + doc_id % 193
        ch = 1 + doc_id % 2
        rate = 8000 * (1 + doc_id % 3)
        saw_rates.add(rate)
        onf = (n * WAV_TARGET_RATE) // rate
        j = np.arange(onf * ch)
        src = (((j // ch) * rate) // WAV_TARGET_RATE) * ch + (j % ch)
        vals = (np.frombuffer(b, dtype=np.uint8)[src % len(b)]
                .astype(np.int64) - 128) * 256
        r = rows[doc_id]
        assert (r["out_rate"], r["channels"], r["out_frames"]) \
            == (WAV_TARGET_RATE, ch, onf)
        assert r["rs_samp_sum"] == int(vals.sum())
        assert r["rs_samp_wsum"] == int((vals * (1 + j % 109)).sum())
    assert saw_rates == {8000, 16000, 24000}
