"""External-codec JPEG validation (round 14, VERDICT r13 ask #2).

Both the production decoder (``operators.multimodal.decode_jpeg``) and
the in-test reference decoder in ``test_jpeg_decode.py`` are in-house —
a shared misreading of T.81 (the G.1.2.3 progressive corners
especially) would pass every cross-validation. This module breaks that
symmetry with the JDK's ImageIO JPEG plugin, an IJG-derived
implementation with entirely independent authorship:

* **Leg A (exact, encoder-direction)**: our ``encode_jpeg`` output —
  baseline 4:4:4/4:2:0/4:2:2, DRI, and full progressive SOF2 — is
  decoded by ImageIO and must reproduce the fixed-point corpus pixels
  bit-exactly (per-MCU-constant images + all-ones quant make the lossy
  round trip exactly invertible; globally-gray RGB keeps chroma
  constant so the external decoder's upsampling filter cannot differ).
* **Leg B (decoder-direction)**: checked-in fixture bytes produced by
  ImageIO (``tests/fixtures/jpeg_external/*.jpg``, generator source
  ``GenJpegFixtures.java`` alongside) with ImageIO's own decoded
  rasters pinned. Grayscale fixtures — baseline and progressive, which
  exercise the successive-approximation scan script the JDK writer
  emits — must match within +/-1 (T.81 IDCT precision only; no chroma
  path). RGB fixtures are 4:2:0 with libjpeg's *fancy* (triangular)
  chroma upsampling, while our decoder uses sample replication — a
  decoder freedom T.81 explicitly leaves open — so RGB asserts exact
  dimensions, tight luma agreement, and a coarse per-sample bound that
  only the chroma-interpolation difference can consume.

The external decode at test time runs ``DecodeJpegToRaw.java`` (same
fixtures dir) in a java subprocess; skipped if no JDK is on PATH.
"""

from __future__ import annotations

import glob
import os
import shutil
import subprocess

import numpy as np
import pytest

from datafusion_async_parquet_index_spark.operators.multimodal import (
    decode_jpeg,
    encode_jpeg,
)

FIXDIR = os.path.join(os.path.dirname(__file__), "fixtures",
                      "jpeg_external")

_HAVE_JAVA = shutil.which("javac") is not None and (
    shutil.which("java") is not None)


def _load_fixture(stem):
    meta = open(os.path.join(FIXDIR, stem + ".meta")).read().split()
    w, h, nc = int(meta[0]), int(meta[1]), int(meta[2])
    raw = open(os.path.join(FIXDIR, stem + ".rgb"), "rb").read()
    ref = np.frombuffer(raw, np.uint8).reshape(h, w, nc)
    data = open(os.path.join(FIXDIR, stem + ".jpg"), "rb").read()
    return data, w, h, nc, ref


def _fixture_stems(kind):
    return sorted(
        os.path.basename(p)[:-4]
        for p in glob.glob(os.path.join(FIXDIR, f"*{kind}*.jpg")))


# -- Leg B: external encoder -> our decoder ------------------------------

@pytest.mark.parametrize("stem", _fixture_stems("gray"))
def test_external_gray_fixture_decodes_exactly(stem):
    """JDK-encoded grayscale JPEG (baseline + progressive with the
    writer's successive-approximation scan script) must decode to the
    externally-pinned raster within +/-1 — the only legal decoder
    variance left with no chroma in play is IDCT precision."""
    data, w, h, nc, ref = _load_fixture(stem)
    assert nc == 1
    dw, dh, arr = decode_jpeg(data)
    assert (dw, dh) == (w, h)
    arr = arr.reshape(h, w, 1)
    diff = np.abs(arr.astype(int) - ref.astype(int))
    assert diff.max() <= 1, f"{stem}: maxdiff {diff.max()}"


@pytest.mark.parametrize("stem", _fixture_stems("rgb"))
def test_external_rgb_fixture_decodes_within_upsampling_freedom(stem):
    """JDK-encoded 4:2:0 RGB: dimensions exact, luma tight (the luma
    plane is not chroma-interpolated), full samples within the bound
    that libjpeg fancy-vs-replication chroma upsampling can produce on
    smooth ramp content (measured max 20 on the 13x7 fixture)."""
    data, w, h, nc, ref = _load_fixture(stem)
    assert nc == 3
    dw, dh, arr = decode_jpeg(data)
    assert (dw, dh) == (w, h)
    arr = arr.reshape(h, w, 3)

    def luma(a):
        return (0.299 * a[:, :, 0] + 0.587 * a[:, :, 1]
                + 0.114 * a[:, :, 2])

    ld = np.abs(luma(arr.astype(float)) - luma(ref.astype(float)))
    assert ld.max() <= 5.0, f"{stem}: luma maxdiff {ld.max():.2f}"
    assert ld.mean() <= 1.0, f"{stem}: luma meandiff {ld.mean():.3f}"
    fd = np.abs(arr.astype(int) - ref.astype(int))
    assert fd.max() <= 32, f"{stem}: sample maxdiff {fd.max()}"


# -- Leg A: our encoder -> external decoder ------------------------------

def _external_decode(paths):
    """Decode JPEG files with the JDK's ImageIO via the checked-in
    DecodeJpegToRaw helper; returns {path: (w, h, nc, array)}."""
    cls = os.path.join(FIXDIR, "DecodeJpegToRaw.class")
    if not os.path.exists(cls):
        subprocess.run(
            ["javac", os.path.join(FIXDIR, "DecodeJpegToRaw.java")],
            check=True, capture_output=True)
    subprocess.run(["java", "-cp", FIXDIR, "DecodeJpegToRaw"]
                   + list(paths), check=True, capture_output=True)
    out = {}
    for p in paths:
        w, h, nc = map(int, open(p + ".meta").read().split())
        arr = np.frombuffer(open(p + ".rgb", "rb").read(),
                            np.uint8).reshape(h, w, nc)
        out[p] = (w, h, nc, arr)
    return out


def _blocky(rng, h, w, cell):
    base = rng.randint(16, 240,
                       size=((h + cell - 1) // cell,
                             (w + cell - 1) // cell)).astype(np.uint8)
    return np.kron(base, np.ones((cell, cell), np.uint8))[:h, :w]


@pytest.mark.skipif(not _HAVE_JAVA, reason="no JDK on PATH")
def test_our_encodings_decode_exactly_in_external_decoder(tmp_path):
    """Every encoder mode — baseline 4:4:4 / 4:2:0 / 4:2:2, DRI
    restarts, and progressive SOF2 (multi-scan successive
    approximation) — must round-trip bit-exactly through the JDK's
    IJG-derived decoder on the fixed-point corpus. An encoder that
    slipped scan headers, EOB-run semantics, G.1.2.3 correction bits,
    byte stuffing, or restart alignment cannot pass a foreign
    decoder."""
    rng = np.random.RandomState(7)
    ones = [1] * 64
    g16 = _blocky(rng, 48, 64, 16)
    rgb = np.repeat(_blocky(rng, 32, 48, 16)[:, :, None], 3, axis=2)
    cases = {
        "gray444": (g16, encode_jpeg(g16, quant=ones)),
        "gray_prog": (g16, encode_jpeg(g16, quant=ones,
                                       progressive=True)),
        "gray_dri": (g16, encode_jpeg(g16, quant=ones,
                                      restart_interval=2)),
        "rgb420": (rgb, encode_jpeg(rgb, quant=ones,
                                    subsampling="420")),
        "rgb422": (rgb, encode_jpeg(rgb, quant=ones,
                                    subsampling="422")),
        "rgb420_prog": (rgb, encode_jpeg(rgb, quant=ones,
                                         subsampling="420",
                                         progressive=True)),
        "rgb420_dri_prog": (rgb, encode_jpeg(rgb, quant=ones,
                                             subsampling="420",
                                             restart_interval=1,
                                             progressive=True)),
    }
    paths = {}
    for name, (_img, data) in cases.items():
        p = str(tmp_path / f"{name}.jpg")
        open(p, "wb").write(data)
        paths[name] = p
    decoded = _external_decode(list(paths.values()))
    for name, (img, _data) in cases.items():
        w, h, nc, arr = decoded[paths[name]]
        ours = img.reshape(img.shape[0], img.shape[1], -1)
        assert (h, w, nc) == ours.shape, name
        diff = np.abs(arr.astype(int) - ours.astype(int))
        assert diff.max() == 0, f"{name}: maxdiff {diff.max()}"


@pytest.mark.skipif(not _HAVE_JAVA, reason="no JDK on PATH")
def test_annex_k_tables_roundtrip_through_external_decoder(tmp_path):
    """Default Annex K quant tables (real lossy path, not the
    fixed-point corpus): the external decoder's pixels must agree with
    OUR decoder's pixels on the same bytes within IDCT precision —
    grayscale so no chroma freedom applies."""
    rng = np.random.RandomState(11)
    img = _blocky(rng, 40, 56, 8)
    data = encode_jpeg(img)  # Annex K tables, 4:4:4 gray
    p = str(tmp_path / "annexk.jpg")
    open(p, "wb").write(data)
    (w, h, nc, ext) = _external_decode([p])[p]
    dw, dh, ours = decode_jpeg(data)
    assert (w, h, nc) == (dw, dh, 1)
    diff = np.abs(ext.astype(int) - ours.reshape(h, w, 1).astype(int))
    assert diff.max() <= 1, f"maxdiff {diff.max()}"
