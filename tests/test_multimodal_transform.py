"""Real multimodal transforms: nearest-neighbor resize exactness,
spectral centroid of a pure sine, frame iteration/sampling round-trip,
and the actor-pool stage end-to-end."""

import numpy as np
import pytest

from hikma_engine_ray.stages.multimodal import (
    decode_ppm,
    encode_frames,
    encode_ppm,
    encode_wav,
    iter_frames,
    resize_nearest,
    sample_frames,
    spectral_features,
    synthesize_video_table,
    transform_media,
)


def test_resize_nearest_exact():
    img = np.arange(16, dtype=np.uint8).reshape(4, 4)
    out = resize_nearest(img, 2, 2)
    # index map: rows/cols [0,2]
    assert out.tolist() == [[0, 2], [8, 10]]
    up = resize_nearest(img, 8, 8)
    assert up.shape == (8, 8)
    assert up[0, 0] == 0 and up[7, 7] == 15
    rgb = np.stack([img] * 3, axis=2)
    assert resize_nearest(rgb, 2, 2).shape == (2, 2, 3)


def test_spectral_centroid_of_sine():
    rate = 8000
    t = np.arange(rate) / rate  # 1 s
    for f in (440.0, 1200.0):
        x = (np.sin(2 * np.pi * f * t) * 30000).astype(np.int16)
        sp = spectral_features(x, rate)
        assert abs(sp["centroid_hz"] - f) < 5.0, sp
        assert abs(sp["rolloff_hz"] - f) < 5.0, sp
        assert sp["bandwidth_hz"] < 60.0


def test_frame_roundtrip_and_sampling():
    rng = np.random.RandomState(3)
    frames = [rng.randint(0, 256, (6, 5, 3)).astype(np.uint8)
              for _ in range(7)]
    payload = encode_frames(frames)
    back = list(iter_frames(payload))
    assert len(back) == 7
    for a, b in zip(frames, back):
        np.testing.assert_array_equal(a, b)
    sampled = sample_frames(payload, 3)
    assert len(sampled) == 3  # frames 0, 3, 6
    np.testing.assert_array_equal(sampled[1], frames[3])


def test_transform_stage_end_to_end(ray_session):
    import ray.data as rd

    from hikma_engine_ray.stages.multimodal import (
        synthesize_decodable_media_table,
    )

    media = synthesize_decodable_media_table(12)
    vids = synthesize_video_table(4, frames=9)
    ds = rd.from_arrow(media).union(rd.from_arrow(vids))
    out = transform_media(ds, out_h=8, out_w=8, frame_stride=4).to_pandas()
    assert len(out) == 16
    img = out[out["kind"] == "image"]
    # resized 8x8 payloads: P6 = 11-byte header + 192 raster, P5 = 11 + 64
    assert set(img["out_units"]) == {203, 75}
    aud = out[out["kind"] == "audio"]
    assert (aud["centroid_hz"] > 0).all()
    vid = out[out["kind"] == "video"]
    assert (vid["out_units"] == 3).all()  # frames 0,4,8 of 9
    assert ((vid["mean_luma"] > 100) & (vid["mean_luma"] < 155)).all()
