import numpy as np
import pandas as pd
import pytest

from osm_sidewalkreator_ray.stages.multimodal import (
    AudioFrameSampler, ImageDecoder, media_features, synthetic_media)


def test_stub_decode_deterministic():
    t = synthetic_media(4).to_pandas()
    dec = ImageDecoder(fake=True)
    out1 = dec(t[t["kind"] == "image"])
    out2 = dec(t[t["kind"] == "image"])
    pd.testing.assert_frame_equal(out1, out2)
    assert len(out1.iloc[0]["thumb"]) == 64


def test_real_codec_path_is_marked():
    t = synthetic_media(2).to_pandas()
    with pytest.raises(NotImplementedError):
        ImageDecoder(fake=False)(t[t["kind"] == "image"])
    with pytest.raises(NotImplementedError):
        AudioFrameSampler(fake=False)(t[t["kind"] == "audio"])


@pytest.mark.usefixtures("ray_session")
def test_media_pipeline_end_to_end():
    df = media_features(n=100)
    assert len(df) == 100
    assert set(df["kind"]) == {"image", "audio"}
    assert "payload" not in df.columns  # wide column dropped in-stage
    # deterministic through the distributed path
    pd.testing.assert_frame_equal(df, media_features(n=100))
