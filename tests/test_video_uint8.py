"""uint8 video transport: records store raw uint8 (4× smaller), the batch
transform normalizes on device, numerics match the fp32 offline path."""

import numpy as np

import jax
import jax.numpy as jnp

from mme_tpu.data.records import load_keyframes
from mme_tpu.models.fusion import TAVSpec
from mme_tpu.train.build_tav import make_video_keep_transform


def _write_frames(tmp_path, n=3, size=48):
    from PIL import Image
    d = tmp_path / "kf"
    d.mkdir()
    rng = np.random.RandomState(0)
    for i in range(n):
        Image.fromarray(rng.randint(0, 255, (size, size, 3), dtype=np.uint8)
                        ).save(d / f"f{i}.png")  # lossless → exact compare
    return str(d / "*.png")


def test_uint8_roundtrip_matches_fp32_path(tmp_path):
    glob = _write_frames(tmp_path)
    f32 = load_keyframes(glob, num_frames=4, size=32)
    u8 = load_keyframes(glob, num_frames=4, size=32, normalize=False)
    assert u8.dtype == np.uint8 and f32.dtype == np.float32

    spec = TAVSpec(output_dim=7).tiny()
    transform = make_video_keep_transform(spec, random_mask=False)
    batch = {"video": jnp.asarray(u8[None])}
    out = np.asarray(transform(jax.random.PRNGKey(0), batch)["video"][0])
    # real frames: identical normalization formula, fp32 both ways
    np.testing.assert_allclose(out[:3], f32[:3], rtol=1e-5, atol=1e-5)
    # padding frame (index 3): exact 0.0 in BOTH paths (reference pads
    # after normalization, models/tav.py:154-160)
    assert np.all(f32[3] == 0.0)
    assert np.all(out[3] == 0.0)


def test_build_tav_dataset_uint8(tmp_path):
    import wave

    import pandas as pd

    from mme_tpu.data.records import PickleDatasetConfig, build_tav_dataset

    glob = _write_frames(tmp_path)
    wav = tmp_path / "a.wav"
    with wave.open(str(wav), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes(np.zeros(800, np.int16).tobytes())
    df = pd.DataFrame({
        "text": ["hi there"] * 4,
        "audio_path": [str(wav)] * 4,
        "emotion": [0, 1, 0, 1],
        "dialog": [0, 0, 1, 1],
    })
    mk = lambda u8: build_tav_dataset(
        df, PickleDatasetConfig(text_max_len=8, audio_max_samples=1000,
                                video_uint8=u8),
        video_frames=4, video_size=32, keyframe_glob=glob)
    ds8, ds32 = mk(True), mk(False)
    assert ds8.features["video"].dtype == np.uint8
    assert ds32.features["video"].dtype == np.float32

    spec = TAVSpec(output_dim=7).tiny()
    transform = make_video_keep_transform(spec, random_mask=False)
    out = np.asarray(transform(
        jax.random.PRNGKey(0),
        {"video": jnp.asarray(ds8.features["video"])})["video"])
    np.testing.assert_allclose(out, ds32.features["video"],
                               rtol=1e-5, atol=1e-5)
