"""Multimodal plumbing tests: schemas/batch shapes real, codec stubbed."""

import pytest
from pyspark.sql.utils import PythonException

from sdg_engine.ops import multimodal as MM


def test_audio_features_deterministic(spark):
    audio = MM.synth_audio_table(spark, 16)
    a = MM.audio_features(audio).orderBy("media_id").toPandas()
    b = MM.audio_features(audio).orderBy("media_id").toPandas()
    assert len(a) == 16
    assert (a["n_samples"] > 0).all()
    assert (a["rms"].values == b["rms"].values).all()  # seeded fake is stable


def test_audio_real_decode_raises(spark):
    audio = MM.synth_audio_table(spark, 2)
    with pytest.raises(PythonException, match="NotImplementedError"):
        MM.audio_features(audio, deterministic_fake=False).collect()


def test_video_frame_sampling_shape(spark):
    video = MM.synth_video_table(spark, 8)
    frames = MM.video_frame_sample(video, every_n=12).toPandas()
    meta = video.select("media_id", "n_frames").toPandas()
    import math

    want = int(sum(math.ceil(n / 12) for n in meta["n_frames"]))
    assert len(frames) == want
    assert set(frames.columns) == {"media_id", "frame_idx", "t_sec", "mean_luma"}
    assert (frames["frame_idx"] % 12 == 0).all()
