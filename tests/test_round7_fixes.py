"""Round-7 regression tests for the round-6 ADVICE items:
MP3 channel-mode bits, WAV odd-length PCM data chunk, signed Ogg granule,
isotonic NULL score/label filtering, and the CDC sink's NULL-op handling."""

from __future__ import annotations

import struct

import numpy as np
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from unified_firmographic_data_pipeline_spark.operators.isotonic import (
    binned_label_rates,
    isotonic_calibrate_bins,
)
from unified_firmographic_data_pipeline_spark.sources.multimodal import (
    audio_meta,
    mp3_encode_minimal,
    ogg_vorbis_encode_minimal,
    ogg_vorbis_meta,
    wav_encode_square,
    wav_pcm_samples,
)


# ----------------------------------------------------------- MP3 channels
def test_mp3_mono_mode_bits_probe_to_one_channel():
    cont, sr, ch, br, dur = audio_meta(mp3_encode_minimal(3, 128, 44100, channels=1))
    assert (cont, sr, ch, br) == ("mp3", 44100, 1, 128)


def test_mp3_stereo_mode_bits_probe_to_two_channels():
    cont, sr, ch, br, dur = audio_meta(mp3_encode_minimal(3, 192, 48000, channels=2))
    assert (cont, sr, ch, br) == ("mp3", 48000, 2, 192)


def test_mp3_bad_bitrate_index_reports_no_channels():
    # bitrate index 15 is forbidden: sr is None, so channels must be too
    bad = bytes([0xFF, 0xFB, 0xF0, 0x00]) + bytes(16)
    cont, sr, ch, br, dur = audio_meta(bad)
    assert cont == "mp3" and sr is None and ch is None


# ------------------------------------------------- WAV odd-length data chunk
def test_wav_pcm_samples_tolerates_truncated_odd_byte():
    b = wav_encode_square(500, 5, 64, 8000)
    truncated = b[:-1]  # drop one byte -> odd-length data chunk
    x = wav_pcm_samples(truncated)
    assert x is not None and len(x) == 63
    full = wav_pcm_samples(b)
    assert np.array_equal(x, full[:63])


# --------------------------------------------------- signed Ogg granule (-1)
def test_ogg_negative_final_granule_means_unknown_duration():
    b = ogg_vorbis_encode_minimal(22050, 2, 1000)
    # rewrite the final page's granule to -1 ("no packet finishes here")
    n_segs0 = b[26]
    page1 = 27 + n_segs0 + sum(b[27 : 27 + n_segs0])
    patched = (
        b[: page1 + 6]
        + (-1).to_bytes(8, "little", signed=True)
        + b[page1 + 14 :]
    )
    sr, ch, dur = ogg_vorbis_meta(patched)
    assert (sr, ch) == (22050, 2)
    assert dur is None


def test_ogg_positive_granule_still_measures():
    assert ogg_vorbis_meta(ogg_vorbis_encode_minimal(22050, 2, 44100)) == (
        22050,
        2,
        2000,
    )


# --------------------------------------------------- isotonic NULL handling
def test_isotonic_null_score_and_label_rows_are_filtered(spark):
    rows = [(0.1, 1), (0.2, 0), (None, 1), (0.9, None), (0.8, 1), (None, None)]
    df = spark.createDataFrame(rows, "score double, label int")
    bins = binned_label_rates(df, "score", "label", 4, 0.0, 1.0).collect()
    assert sum(r["n"] for r in bins) == 3  # only fully-labeled rows counted
    out = isotonic_calibrate_bins(df, "score", "label", n_bins=4, lo=0.0, hi=1.0)
    pdf = out.orderBy("bin").toPandas()
    assert pdf["n"].sum() == 3
    assert (pdf["fitted_rate"].diff().fillna(0) >= -1e-12).all()


# ------------------------------------------------------- CDC NULL-op upsert
def test_stream_cdc_null_op_behaves_as_upsert(spark, tmp_path):
    from unified_firmographic_data_pipeline_spark.streaming.ingest import (
        stream_cdc_apply_sink,
    )

    sch = StructType(
        [
            StructField("k", LongType()),
            StructField("v", StringType()),
            StructField("price", DoubleType()),
            StructField("op", StringType()),
            StructField("seq", LongType()),
        ]
    )
    src = str(tmp_path / "cdc_src")
    table = str(tmp_path / "cdc_tbl")
    ckpt = str(tmp_path / "cdc_ckpt")
    events = [
        (1, "a", 1.0, "I", 1),
        (1, "a2", 1.5, None, 2),  # NULL op: must upsert, not vanish
        (2, "b", 2.0, "I", 1),
        (2, None, None, "D", 2),
    ]
    spark.createDataFrame(events, sch).coalesce(1).write.mode("append").parquet(src)
    q = stream_cdc_apply_sink(
        spark.readStream.schema(sch).parquet(src),
        table,
        checkpoint=ckpt,
        keys=["k"],
        seq_col="seq",
    )
    q.awaitTermination()
    landed = {(r["k"], r["v"]) for r in spark.read.parquet(table).collect()}
    assert landed == {(1, "a2")}
