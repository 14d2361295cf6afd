#!/usr/bin/env python
"""Generate the MM1/MM2 expected-feature oracles (plans/_mm_oracle.py).

The tier-1 media fixtures are pure functions of media_id — a
deterministic per-id gradient BMP and a per-id quantized sine WAV
(operators/multimodal.py synth_real_media, spec replicated below) — so
every feature is a deterministic value: integer pixel/PCM sums are exact
in int64/float64, the aHash compares cross-multiplied integer sums, and
the float reductions run the same numpy ops over the same shapes on both
sides (bit-identical pairwise summation). Each expected table compiles
into a self-contained SQL VALUES literal: no external files, nothing for
DuckDB to compute, the driver hash-compares Spark's full
encode→Arrow→decode→feature pipeline against the spec.

Both feature vectors are PERIODIC in media_id:
  MM1 (image, even ids): width id%16, height id%9, pixels id%256 →
      period lcm(16, 9, 256) = 2304 → 1152 even-residue rows.
  MM2 (audio, odd ids): duration id%20, frequency id%40 →
      period 40 → 20 odd-residue rows.
The oracles join documents on doc_id % period, so ONE static SQL covers
every sf dir.

INDEPENDENCE: this generator re-derives the features from the fixture
SPEC with local numpy only — it does not import the package, so the
Spark path (codec encode → Arrow batch → codec decode → feature math) is
checked end-to-end against an implementation that shares none of its
plumbing.

    PYTHONPATH=. python tools/gen_mm_oracle.py   # rewrites plans/_mm_oracle.py
"""

from __future__ import annotations

import os

import numpy as np

IMG_PERIOD = 2304  # lcm(16, 9, 256)
AUD_PERIOD = 40  # lcm(20, 40)


def image_features(mid: int) -> tuple:
    # the synth_real_media image spec: per-id gradient, RGB
    w, h = 32 + mid % 16 * 8, 24 + mid % 9 * 8
    xx = np.arange(w, dtype=np.uint16)
    yy = np.arange(h, dtype=np.uint16)[:, None]
    arr = np.stack(
        [
            ((xx + yy + mid) % 256).astype(np.uint8),
            ((2 * xx + mid) % 256 + 0 * yy).astype(np.uint8),
            ((3 * yy + mid) % 256 + 0 * xx).astype(np.uint8),
        ],
        axis=2,
    )
    # the extract_image_features spec: channel means (exact integer sums
    # single-rounded), exact-integer brightness, cross-multiplied integer
    # aHash (64·block_sum > total_sum) — all pure functions of pixel
    # values, immune to float-summation order
    g3 = arr.sum(axis=2, dtype=np.int64)
    h8, w8 = h // 8 * 8, w // 8 * 8
    bsum = g3[:h8, :w8].reshape(8, h8 // 8, 8, w8 // 8).sum(axis=(1, 3), dtype=np.int64)
    bits = (bsum * 64 > bsum.sum()).flatten()
    phash = int(np.packbits(bits).view(">u8")[0]) - (1 << 63)
    return (
        mid,
        w,
        h,
        float(arr[:, :, 0].mean()),
        float(arr[:, :, 1].mean()),
        float(arr[:, :, 2].mean()),
        float(int(g3.sum()) / (3.0 * h * w)),
        phash,
    )


def audio_features(mid: int) -> tuple:
    # the synth_real_media audio spec: 0.5-amplitude sine, 8 kHz
    rate, dur_ms = 8000, 200 + mid % 20 * 50
    n = rate * dur_ms // 1000
    t = np.arange(n, dtype=np.float64) / rate
    raw = 0.5 * np.sin(2 * np.pi * (220 + mid % 40 * 20) * t)
    # the WAV16 round trip: encode quantizes to int16, decode returns
    # float32 sample/32767 — the only loss in the tier-1 path
    pcm = np.round(np.clip(raw, -1.0, 1.0) * 32767.0).astype("<i2")
    x = pcm.astype(np.float32) / 32767.0
    # the extract_audio_features spec
    return (
        mid,
        int(x.size),
        float(np.sqrt((x.astype(np.float64) ** 2).mean())),
        float(np.abs(x).max()),
        int((np.diff(np.signbit(x)) != 0).sum()),
    )


def _dlit(x: float) -> str:
    """Exact DOUBLE literal: repr round-trips; the e0 suffix forces
    DuckDB's DOUBLE parse (a bare decimal infers DECIMAL, which both
    truncates and canonicalizes differently)."""
    s = repr(x)
    assert "e" not in s and "E" not in s, s  # all features are in sane ranges
    return s + "e0"


def main() -> None:
    img_rows = []
    for rid in range(0, IMG_PERIOD, 2):  # even ids are images
        m, w, h, r, g, b, br, ph = image_features(rid)
        img_rows.append(
            f"({m},{w},{h},{_dlit(r)},{_dlit(g)},{_dlit(b)},{_dlit(br)},{ph})"
        )
    mm1 = f"""\
WITH expected(rid, width, height, mean_r, mean_g, mean_b, brightness, phash) AS (
VALUES
{",".join(img_rows)}
)
SELECT d.doc_id AS media_id, e.width, e.height, e.mean_r, e.mean_g,
       e.mean_b, e.brightness, e.phash
FROM documents d JOIN expected e ON d.doc_id % {IMG_PERIOD} = e.rid
WHERE d.doc_id % 2 = 0
"""
    aud_rows = []
    for rid in range(1, AUD_PERIOD, 2):  # odd ids are audio
        m, ns, rms, peak, zc = audio_features(rid)
        aud_rows.append(f"({m},{ns},{_dlit(rms)},{_dlit(peak)},{zc})")
    mm2 = f"""\
WITH expected(rid, n_samples, rms, peak, zero_crossings) AS (
VALUES
{",".join(aud_rows)}
)
SELECT d.doc_id AS media_id, e.n_samples, e.rms, e.peak, e.zero_crossings
FROM documents d JOIN expected e ON d.doc_id % {AUD_PERIOD} = e.rid
WHERE d.doc_id % 2 = 1
"""
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "open_data_lakehouse_demo_spark",
        "plans",
        "_mm_oracle.py",
    )
    with open(out, "w") as f:
        f.write(
            '"""GENERATED by tools/gen_mm_oracle.py — do not edit.\n\n'
            "Expected multimodal features for the tier-1 BMP/WAV fixtures,\n"
            "one row per id residue (see the generator's docstring).\n"
            '"""\n\n'
            f"MM1_ORACLE_SQL = {mm1!r}\n\n"
            f"MM2_ORACLE_SQL = {mm2!r}\n"
        )
    print(
        f"wrote {out} (MM1 {len(img_rows)} rows / {len(mm1)} chars, "
        f"MM2 {len(aud_rows)} rows / {len(mm2)} chars)"
    )


if __name__ == "__main__":
    main()
