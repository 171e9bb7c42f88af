"""Pure-python video decode path: y4m wire format, sampling, and the full
decode -> preprocess -> CLIP-encode -> RVFS extraction chain (the previously
ffmpeg-gated path of reference clip_extractor.py:100-176 / mm_utils.py:126-174,
now exercised without external binaries)."""

import numpy as np
import pytest

from revisionllm_tpu.data.video_reader import (
    VideoExtractor,
    decode_frames_py,
    read_y4m,
    resample_fps,
    scale_shorter_center_crop,
    write_y4m,
)


def _synthetic_frames(t=12, h=48, w=64, seed=0):
    """Smooth gradient frames (chroma subsampling is benign on gradients)."""
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 255, size=(3,), dtype=np.int32)
    yy, xx = np.mgrid[0:h, 0:w]
    frames = np.zeros((t, h, w, 3), np.uint8)
    for i in range(t):
        for c in range(3):
            frames[i, :, :, c] = (base[c] + 2 * i + yy + xx) % 256
    return frames


class TestY4M:
    def test_c444_roundtrip(self, tmp_path):
        frames = _synthetic_frames()
        p = str(tmp_path / "v.y4m")
        write_y4m(p, frames, fps=25.0)
        got, fps = read_y4m(p)
        assert fps == 25.0
        assert got.shape == frames.shape
        # BT.601 matrix round-trip: a few intensity levels of error
        err = np.abs(got.astype(int) - frames.astype(int))
        assert err.max() <= 4
        assert err.mean() < 1.5

    def test_fractional_fps_header(self, tmp_path):
        p = str(tmp_path / "v.y4m")
        write_y4m(p, _synthetic_frames(t=2), fps=23.976)
        _, fps = read_y4m(p)
        assert abs(fps - 23.976) < 1e-6

    def test_c420_decodes(self, tmp_path):
        """Hand-built C420 stream (the most common y4m flavor)."""
        h, w = 16, 16
        y = np.full((h, w), 120, np.uint8)
        cb = np.full((h // 2, w // 2), 128, np.uint8)
        cr = np.full((h // 2, w // 2), 200, np.uint8)
        p = tmp_path / "c420.y4m"
        with open(p, "wb") as f:
            f.write(b"YUV4MPEG2 W16 H16 F30:1 C420jpeg\n")
            for _ in range(3):
                f.write(b"FRAME\n" + y.tobytes() + cb.tobytes() + cr.tobytes())
        frames, fps = read_y4m(str(p))
        assert frames.shape == (3, 16, 16, 3)
        assert fps == 30.0
        # Cr >> 128 -> red-shifted pixels
        assert frames[0, 0, 0, 0] > frames[0, 0, 0, 2]

    def test_bad_magic_raises(self, tmp_path):
        p = tmp_path / "bad.y4m"
        p.write_bytes(b"NOTY4M W2 H2\nFRAME\n\x00\x00\x00\x00")
        with pytest.raises(ValueError):
            read_y4m(str(p))


class TestSampling:
    def test_resample_downsamples(self):
        idx = resample_fps(100, src_fps=25.0, target_fps=5.0)
        assert len(idx) == 20  # 4 s * 5 fps
        assert idx[0] < idx[-1] <= 99
        assert (np.diff(idx) > 0).all()

    def test_resample_identity_fps(self):
        idx = resample_fps(30, src_fps=10.0, target_fps=10.0)
        assert len(idx) == 30
        np.testing.assert_array_equal(idx, np.arange(30))

    def test_scale_center_crop_landscape(self):
        frames = _synthetic_frames(t=2, h=48, w=96)
        out = scale_shorter_center_crop(frames, 32)
        assert out.shape == (2, 32, 32, 3)

    def test_scale_center_crop_portrait_constant(self):
        frames = np.full((1, 96, 48, 3), 77, np.uint8)
        out = scale_shorter_center_crop(frames, 24)
        assert out.shape == (1, 24, 24, 3)
        np.testing.assert_array_equal(out, 77)  # bilinear keeps constants


class TestVideoExtractor:
    """Parity with reference mm_utils.py:126-174 sampling semantics."""

    @pytest.fixture()
    def video(self, tmp_path):
        p = str(tmp_path / "clip.y4m")
        write_y4m(p, _synthetic_frames(t=50, h=32, w=32), fps=10.0)
        return p

    def test_default_n_frames(self, video):
        vid, images, idx = VideoExtractor(N=8).extract({"video": video, "id": "v1"})
        assert vid == "v1"
        assert images.shape == (8, 3, 32, 32)
        np.testing.assert_array_equal(idx, np.linspace(0, 49, 8, dtype=np.int32))

    def test_start_end_range(self, video):
        _, images, idx = VideoExtractor(N=4).extract(
            {"video": video, "id": "v"}, start_end=(10, 19)
        )
        np.testing.assert_array_equal(idx, np.linspace(10, 19, 4, dtype=np.int32))

    def test_sample_fps(self, video):
        # 50 frames at 10 fps, sample_fps=2 -> int(50*2//10) = 10 frames
        _, images, idx = VideoExtractor().extract(
            {"video": video, "id": "v"}, sample_fps=2
        )
        assert images.shape[0] == 10

    def test_split_seconds(self, video):
        # split (1.0 s, 3.0 s) at 10 fps -> frames 10..30
        _, _, idx = VideoExtractor(N=5).extract(
            {"video": video, "id": "v", "split": (1.0, 3.0)}
        )
        assert idx[0] == 10 and idx[-1] == 30


class TestDecodeChain:
    def test_decode_frames_py(self, tmp_path):
        p = str(tmp_path / "v.y4m")
        write_y4m(p, _synthetic_frames(t=40, h=36, w=60), fps=20.0)
        out = decode_frames_py(p, target_fps=5.0, size=28)
        assert out.shape == (10, 28, 28, 3)  # 2 s * 5 fps
        assert out.dtype == np.uint8

    def test_feature_extraction_routes_y4m(self, tmp_path):
        """decode_frames (the ffmpeg entry point) takes the pure path for
        .y4m regardless of ffmpeg availability."""
        from revisionllm_tpu.data.feature_extraction import decode_frames

        p = str(tmp_path / "v.y4m")
        write_y4m(p, _synthetic_frames(t=20, h=32, w=32), fps=10.0)
        out = decode_frames(p, target_fps=5.0, size=28)
        assert out.shape == (10, 28, 28, 3)

    def test_end_to_end_extraction(self, tmp_path):
        """Full chain on a synthetic video: y4m decode -> CLIP preprocess ->
        tiny ViT encode -> RVFS store (reference chapters_clip_extractor
        60-121 + clip_extractor 100-176, no ffmpeg/decord)."""
        torch = pytest.importorskip("torch")
        from transformers import CLIPConfig, CLIPModel

        from revisionllm_tpu.data.feature_extraction import (
            ClipFeatureExtractor,
            extract_video_features,
        )
        from revisionllm_tpu.data.feature_store import RvfsStore
        from revisionllm_tpu.models.clip import convert_hf_clip

        cfg = CLIPConfig(
            text_config=dict(
                vocab_size=99, hidden_size=64, intermediate_size=128,
                num_hidden_layers=2, num_attention_heads=1,
                max_position_embeddings=16, eos_token_id=98,
            ),
            vision_config=dict(
                hidden_size=64, intermediate_size=128, num_hidden_layers=2,
                num_attention_heads=1, image_size=28, patch_size=14,
            ),
            projection_dim=32,
        )
        torch.manual_seed(0)
        state = {k: v.numpy() for k, v in CLIPModel(cfg).eval().state_dict().items()}
        params = convert_hf_clip(state)
        params["visual"]["num_heads"] = 1
        params["text"]["num_heads"] = 1

        vp = str(tmp_path / "movie.y4m")
        write_y4m(vp, _synthetic_frames(t=30, h=32, w=48), fps=10.0)
        out_store = str(tmp_path / "feats.rvfs")
        extractor = ClipFeatureExtractor(params, batch_size=8)
        n = extract_video_features(
            extractor, {"movie": vp}, out_store, target_fps=5.0, size=28
        )
        assert n == 1
        feats = RvfsStore(out_store).get_record("movie")["features"]
        assert feats.shape == (15, 32)  # 3 s * 5 fps, projection_dim
        assert np.isfinite(feats).all()
