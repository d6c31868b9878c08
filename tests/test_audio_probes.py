"""FLAC / MP3 / OGG container probes, the WAV fmt probe, and the real
PCM sample-decode statistics tier (sources/multimodal.py audio family)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from unified_firmographic_data_pipeline_spark.sources.multimodal import (
    audio_from_params,
    audio_meta,
    flac_encode_minimal,
    flac_meta,
    is_flac,
    is_mp3,
    is_ogg,
    mp3_encode_minimal,
    mp3_meta,
    ogg_vorbis_encode_minimal,
    ogg_vorbis_meta,
    pcm_stats,
    probe_audio_meta,
    wav_encode_square,
    wav_fmt,
    wav_pcm_samples,
)


# ------------------------------------------------------------------ probes
@pytest.mark.parametrize(
    "sr,ch,total",
    [(8000, 1, 1), (16000, 2, 123_456), (96000, 8, (1 << 36) - 1)],
)
def test_flac_streaminfo_roundtrip(sr, ch, total):
    b = flac_encode_minimal(sr, ch, total)
    assert is_flac(b)
    assert flac_meta(b) == (sr, ch, total * 1000 // sr)


@pytest.mark.parametrize("sr", [44100, 48000, 32000])
@pytest.mark.parametrize("br", [32, 128, 320])
def test_mp3_frame_walk_counts_frames(sr, br):
    for n in (1, 7, 200):
        b = mp3_encode_minimal(n, br, sr)
        assert is_mp3(b)
        assert mp3_meta(b) == (sr, br, n * 1152 * 1000 // sr)


def test_ogg_vorbis_id_header_and_final_granule():
    b = ogg_vorbis_encode_minimal(22050, 2, 543_210)
    assert is_ogg(b)
    assert ogg_vorbis_meta(b) == (22050, 2, 543_210 * 1000 // 22050)


def test_wav_fmt_probe():
    b = wav_encode_square(500, 3, 800, sample_rate=16000)
    assert wav_fmt(b) == (16000, 1)


@pytest.mark.parametrize(
    "junk",
    [b"", b"fLaC", b"\xff\xfb", b"OggS" + bytes(30), b"not audio at all"],
)
def test_malformed_streams_probe_to_none(junk):
    cont, sr, ch, br, dur = audio_meta(junk or None)
    # container may classify by magic, but no metadata is invented
    assert (sr, dur) == (None, None) or cont == "unknown"


def test_audio_meta_dispatch():
    assert audio_meta(wav_encode_square(5, 3, 100, 8000))[0] == "wav"
    assert audio_meta(flac_encode_minimal(8000, 1, 8000))[0] == "flac"
    assert audio_meta(mp3_encode_minimal(2))[0] == "mp3"
    assert audio_meta(ogg_vorbis_encode_minimal(48000, 1, 48000))[0] == "ogg"
    assert audio_meta(b"junk")[0] == "unknown"


# ------------------------------------------------------- PCM sample decode
def test_wav_pcm_samples_decodes_exact_waveform():
    b = wav_encode_square(1230, 7, 1000, 8000)
    x = wav_pcm_samples(b)
    i = np.arange(1000)
    expected = np.where((i // 7) % 2 == 0, 1230, -1230)
    assert np.array_equal(x, expected)


def test_wav_pcm_samples_rejects_8bit():
    from unified_firmographic_data_pipeline_spark.sources.multimodal import wav_encode_silence

    assert wav_pcm_samples(wav_encode_silence(100)) is None


def test_pcm_closed_forms():
    a, h, n = 770, 13, 2049
    x = wav_pcm_samples(wav_encode_square(a, h, n)).astype(np.int64)
    assert int(np.max(np.abs(x))) == a
    assert float(np.sqrt(np.mean(x * x))) == float(a)  # exact: n*a^2 < 2^53
    crossings = int(np.count_nonzero(np.signbit(x[1:]) != np.signbit(x[:-1])))
    assert crossings == (n - 1) // h


# ------------------------------------------------------------- Spark paths
def test_probe_and_pcm_stats_spark(spark):
    params = spark.createDataFrame(
        [
            (0, "wav", 8000, 1, None, 800, 300, 5),
            (1, "flac", 16000, 2, None, 48_000, None, None),
            (2, "mp3", 44100, 1, 128, 10 * 1152, None, None),
            (3, "ogg", 22050, 2, None, 44_100, None, None),
            (4, "nope", None, None, None, None, None, None),
        ],
        "media_id long, container string, sample_rate int, channels int, "
        "bitrate_kbps int, total_samples long, amplitude int, half_period int",
    )
    media = audio_from_params(params)
    meta = {
        r["media_id"]: r.asDict()
        for r in probe_audio_meta(media.select("media_id", "payload")).collect()
    }
    assert meta[0]["container"] == "wav" and meta[0]["duration_ms"] == 800 * 2 * 1000 // 16000
    assert meta[1] == dict(
        media_id=1, container="flac", sample_rate=16000, channels=2,
        bitrate_kbps=None, duration_ms=3000,
    )
    assert meta[2]["bitrate_kbps"] == 128 and meta[2]["duration_ms"] == 10 * 1152 * 1000 // 44100
    assert meta[3]["container"] == "ogg" and meta[3]["duration_ms"] == 2000
    assert meta[4]["container"] == "unknown" and meta[4]["sample_rate"] is None

    stats = pcm_stats(media.select("media_id", "payload")).collect()
    assert len(stats) == 1  # only the 16-bit PCM wav row decodes
    s = stats[0]
    assert (s["media_id"], s["n_samples"], s["peak"]) == (0, 800, 300)
    assert s["rms"] == 300.0
    assert s["zero_crossings"] == (800 - 1) // 5


def test_payload_stays_out_of_shuffles(spark):
    # the probe output is metadata-only: payload column must be gone
    params = spark.range(3).select(
        F.col("id").alias("media_id"), F.lit("flac").alias("container"),
        F.lit(8000).cast("int").alias("sample_rate"), F.lit(1).cast("int").alias("channels"),
        F.lit(None).cast("int").alias("bitrate_kbps"), F.lit(8000).cast("long").alias("total_samples"),
        F.lit(None).cast("int").alias("amplitude"), F.lit(None).cast("int").alias("half_period"),
    )
    out = probe_audio_meta(audio_from_params(params).select("media_id", "payload"))
    assert "payload" not in out.columns
