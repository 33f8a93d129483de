"""Media layer tests: C++ decode/probe/encode, sampling, sensors, fixtures."""

import os

import numpy as np
import pytest

from vision_collision_detection_tpu.media import (
    decode_frames,
    encode_video,
    load_synced_sensor,
    peak_acceleration_time,
    probe,
    sample_clip_indices,
)
from vision_collision_detection_tpu.media.decoder import MediaError
from vision_collision_detection_tpu.media.synthetic import generate_dataset


@pytest.fixture(scope="module")
def ramp_video(tmp_path_factory):
    """50-frame 10fps video whose red channel encodes the frame index."""
    path = str(tmp_path_factory.mktemp("media") / "ramp.mp4")
    n, h, w = 50, 120, 160
    frames = np.zeros((n, h, w, 3), np.uint8)
    for i in range(n):
        frames[i, :, :, 0] = int(i * 255 / (n - 1))
    encode_video(path, frames, fps=10)
    return path, n, h, w


class TestDecoder:
    def test_probe(self, ramp_video):
        path, n, h, w = ramp_video
        info = probe(path)
        assert (info.width, info.height) == (w, h)
        assert info.fps == pytest.approx(10.0)
        assert info.num_frames == n
        assert info.duration == pytest.approx(5.0)

    def test_sequential_decode_accuracy(self, ramp_video):
        path, n, h, w = ramp_video
        idx = list(range(0, n, 5))
        dec = decode_frames(path, idx)
        assert dec.shape == (len(idx), h, w, 3)
        for k, i in enumerate(idx):
            expected = i * 255 / (n - 1)
            assert abs(int(dec[k, 60, 80, 0]) - expected) < 12  # lossy codec

    def test_random_access_seek(self, ramp_video):
        path, n, _, _ = ramp_video
        dec = decode_frames(path, [30, 37, 44])
        for k, i in enumerate([30, 37, 44]):
            assert abs(int(dec[k, 60, 80, 0]) - i * 255 / (n - 1)) < 12

    def test_letterbox_decode(self, ramp_video):
        path, n, h, w = ramp_video
        out = decode_frames(path, [0, 10], target_size=64)
        assert out.shape == (2, 64, 64, 3)
        # 120x160 → content 48x64, pads (64-48)//2 = 8 top/bottom
        assert out[:, :8].max() == 0 and out[:, -8:].max() == 0

    def test_eof_padding(self, ramp_video):
        path, n, _, _ = ramp_video
        out = decode_frames(path, [45, 48, 60, 70])
        np.testing.assert_array_equal(out[1], out[2])
        np.testing.assert_array_equal(out[2], out[3])

    def test_missing_file_raises(self):
        with pytest.raises(MediaError):
            decode_frames("/nonexistent/clip.mp4", [0, 1])

    def test_unsorted_indices_rejected(self, ramp_video):
        path, *_ = ramp_video
        with pytest.raises(MediaError):
            decode_frames(path, [5, 3, 1])


@pytest.fixture(scope="module")
def bframe_video(tmp_path_factory):
    """H.264 stream with disposable B-frames and a mid-stream scenecut IDR —
    the structure of real dashcam footage (and the two decode paths the
    mpeg4 ramp fixture never exercises: non-ref skip + DTS-indexed keyframe
    seeks)."""
    path = str(tmp_path_factory.mktemp("media") / "bframes.mp4")
    n, h, w = 96, 96, 128
    frames = np.zeros((n, h, w, 3), np.uint8)
    yy, xx = np.mgrid[0:h, 0:w]
    for t in range(n):
        # smooth motion so x264 emits B-frames; hard cut at 40 → scenecut IDR
        base = ((xx * 2 + t * 5) % 256) if t < 40 else ((yy * 3 + t * 7 + 128) % 256)
        frames[t, ..., 0] = base
        frames[t, ..., 1] = (base + 85) % 256
        frames[t, ..., 2] = (base + 170) % 256
    encode_video(path, frames, fps=10, codec="libx264", gop=48, bframes=3,
                 crf=20.0, preset="medium")
    return path, n


class TestBFrameStreams:
    """Pins the two B-frame-stream behaviors:

    1. non-ref skip bit-exactness: unneeded disposable frames are dropped at
       the decoder (AVDISCARD_NONREF per packet) without changing a single
       byte of any RETURNED frame;
    2. seek-ahead termination: the MP4 index maps keyframes by DTS while the
       demuxer seeks by PTS, so a scenecut IDR's display index is
       over-estimated by the reorder depth — without the has_b_frames margin
       + one-seek-per-wanted-index guard this looped forever (round-4 fix).
    """

    PATTERNS = [
        list(range(0, 25)),          # dense head
        list(range(0, 96, 7)),       # sparse uniform
        [10, 38, 39, 41, 44, 60],    # straddles the scenecut
        [2, 50, 90],                 # sparse across the mid-stream IDR
        [45],                        # single frame past the IDR (the hang case)
    ]

    def test_nonref_skip_bitexact(self, bframe_video):
        from vision_collision_detection_tpu.media.decoder import (
            set_skip_unneeded,
        )

        path, n = bframe_video
        try:
            set_skip_unneeded(False)
            full = decode_frames(path, list(range(n)))
            for idx in self.PATTERNS:
                set_skip_unneeded(False)
                off = decode_frames(path, idx)
                set_skip_unneeded(True)
                on = decode_frames(path, idx)
                np.testing.assert_array_equal(on, off)
                np.testing.assert_array_equal(on, full[idx])
        finally:
            set_skip_unneeded(True)  # restore the default

    def test_nonref_skip_actually_skips(self, bframe_video):
        from vision_collision_detection_tpu.media.decoder import (
            decode_profile,
            profile_decode,
        )

        path, n = bframe_video
        profile_decode(True)
        try:
            decode_frames(path, list(range(0, n, 7)))
            prof = decode_profile()
        finally:
            profile_decode(False)
        assert prof["frames_skipped_nonref"] > 0

    def test_eof_padding_with_disposable_tail(self, bframe_video):
        """Pad-with-last policy must be skip-invariant even when the
        stream's final display frames are disposable B-frames."""
        from vision_collision_detection_tpu.media.decoder import (
            set_skip_unneeded,
        )

        path, n = bframe_video
        idx = [n - 9, n - 3, n + 5, n + 9]  # two real, two past EOF
        try:
            set_skip_unneeded(False)
            off = decode_frames(path, idx)
            set_skip_unneeded(True)
            on = decode_frames(path, idx)
        finally:
            set_skip_unneeded(True)
        np.testing.assert_array_equal(on, off)
        np.testing.assert_array_equal(on[2], on[1])
        np.testing.assert_array_equal(on[3], on[1])

    def test_pool_decode_bitexact(self, bframe_video, tmp_path):
        """decode_batch (C++ thread pool) over B-frame files matches
        per-file decode_frames byte-for-byte."""
        from vision_collision_detection_tpu.media.decoder import decode_batch

        path, n = bframe_video
        idx = np.tile(np.arange(0, n, 5, dtype=np.int64), (3, 1))
        frames, ok = decode_batch([path] * 3, idx, (64, 96))
        assert ok.all()
        single = decode_frames(path, list(range(0, n, 5)), (64, 96))
        for k in range(3):
            np.testing.assert_array_equal(frames[k], single)

    def test_long_gop_sparse_seek(self, tmp_path):
        """Sparse sampling on a long-GOP B-frame stream: seek-ahead must
        terminate and return the exact frames (the `<=` catch path when a
        seek overshoots a wanted index)."""
        from vision_collision_detection_tpu.media.decoder import (
            set_skip_unneeded,
        )

        path = str(tmp_path / "longgop.mp4")
        n, h, w = 200, 96, 128
        frames = np.zeros((n, h, w, 3), np.uint8)
        yy, xx = np.mgrid[0:h, 0:w]
        for t in range(n):
            seg = t // 50  # scene cut every 50 frames → scattered IDRs
            base = ((xx * (seg + 2) + t * 5) % 256)
            frames[t, ..., 0] = base
            frames[t, ..., 1] = (base + 90) % 256
            frames[t, ..., 2] = (base + 180) % 256
        encode_video(path, frames, fps=10, codec="libx264", gop=120,
                     bframes=3, crf=20.0, preset="veryfast")
        idx = [0, 49, 51, 103, 150, 199]
        try:
            set_skip_unneeded(False)
            off = decode_frames(path, idx)
            set_skip_unneeded(True)
            on = decode_frames(path, idx)
        finally:
            set_skip_unneeded(True)
        np.testing.assert_array_equal(on, off)
        full = decode_frames(path, list(range(n)))
        np.testing.assert_array_equal(on, full[idx])


def test_flag2_fast_bitexact(ramp_video, bframe_video):
    """AV_CODEC_FLAG2_FAST must be bit-exact on both fixture families
    (mpeg4 ramp, H.264 with B-frames) before it can ever be adopted as a
    default. The flag allows non-spec-compliant codec shortcuts; for these
    codecs ffmpeg's fast path only relaxes error concealment, so clean
    streams must decode identically. This pins that invariant — if an
    ffmpeg upgrade changes it, this fails rather than silently corrupting
    frames."""
    from vision_collision_detection_tpu.media.decoder import (
        get_fast_decode,
        set_fast_decode,
    )

    assert not get_fast_decode()  # ships off by default
    for path, n in [(ramp_video[0], ramp_video[1]), bframe_video]:
        idx = list(range(n))
        try:
            set_fast_decode(False)
            off = decode_frames(path, idx)
            set_fast_decode(True)
            on = decode_frames(path, idx)
        finally:
            set_fast_decode(False)
        np.testing.assert_array_equal(on, off)


class TestSampler:
    def test_center(self):
        idx = sample_clip_indices("center", 150, 50)
        assert idx[0] == 150 // 2 - 25 and len(idx) == 50
        # short video: start at 0, runs past EOF (decoder pads)
        idx = sample_clip_indices("center", 30, 50)
        assert idx[0] == 0 and idx[-1] == 49

    def test_metadata_time(self):
        idx = sample_clip_indices(
            "metadata_time", 300, 50, video_fps=30.0, event_time_sec=5.0
        )
        assert idx[0] == 150 - 25
        # event near end clamps to fit
        idx = sample_clip_indices(
            "metadata_time", 300, 50, video_fps=30.0, event_time_sec=9.9
        )
        assert idx[0] == 250
        # no fps → random fallback stays in range
        idx = sample_clip_indices(
            "metadata_time", 100, 50, rng=np.random.default_rng(0)
        )
        assert 0 <= idx[0] <= 50

    def test_random_bounds(self):
        rng = np.random.default_rng(1)
        for _ in range(20):
            idx = sample_clip_indices("random", 80, 50, rng=rng)
            assert 0 <= idx[0] <= 30 and len(idx) == 50

    def test_uniform(self):
        idx = sample_clip_indices("uniform", 200, 50)
        assert idx[0] == 0 and idx[-1] == 199 and len(idx) == 50
        assert (np.diff(idx) >= 0).all()


class TestSensors:
    def test_sync_and_peak(self, tmp_path):
        import pandas as pd

        t = np.arange(0, 5, 0.02)  # 50 Hz
        ax = np.sin(t)
        ay = np.zeros_like(t)
        az = np.ones_like(t)
        az[100] = 5.0  # peak at t=2.0
        df = pd.DataFrame({
            "time_sec": t + 1000.0,  # absolute start time
            "accel_x_G": ax, "accel_y_G": ay, "accel_z_G": az,
        })
        path = str(tmp_path / "sensor.csv")
        df.to_csv(path, index=True)

        peak_t, peak_g = peak_acceleration_time(path)
        assert peak_t == pytest.approx(1002.0)
        synced = load_synced_sensor(path, video_fps=10.0, frame_count=50)
        assert synced.shape == (50, 4)
        # frame 20 is t=2.0 where the spike lives
        assert synced[20, 2] == pytest.approx(5.0, abs=0.2)
        np.testing.assert_allclose(
            synced[:, 0], np.sin(np.arange(50) / 10.0), atol=0.01
        )

    def test_missing_returns_zeros(self):
        z = load_synced_sensor("/nope.csv", 10.0, 50)
        assert z.shape == (50, 4) and z.sum() == 0
        assert load_synced_sensor(None, 10.0, 50).sum() == 0


class TestSynthetic:
    def test_generate(self, tmp_path):
        csv = generate_dataset(
            str(tmp_path), clips_per_class=2, num_frames=20, height=48,
            width=64, splits=("train", "val"),
        )
        import pandas as pd

        df = pd.read_csv(csv)
        assert len(df) == 6
        assert set(df["video_type"]) == {"Normal", "Near Collision", "Collision"}
        assert set(df["split"]) == {"train", "val"}
        for _, row in df.iterrows():
            assert os.path.exists(row["video_path"])
            info = probe(row["video_path"])
            assert info.num_frames == 20
            dec = decode_frames(row["video_path"], [0, 10], target_size=32)
            assert dec.shape == (2, 32, 32, 3)
        # collision clips have the accel spike
        collision = df[df["video_type"] == "Collision"].iloc[0]
        _, peak_g = peak_acceleration_time(collision["sensor_path"])
        assert peak_g > 2.0


class TestVideoWriter:
    def test_streaming_matches_oneshot(self, tmp_path):
        """Chunked appends through VideoWriter produce the same stream a
        one-shot encode_video produces (same codec path), decodable with
        the same frame count and content."""
        from vision_collision_detection_tpu.media.decoder import (
            VideoWriter,
            decode_frames,
            encode_video,
            probe,
        )

        rng = np.random.default_rng(11)
        frames = (rng.random((12, 48, 64, 3)) * 255).astype(np.uint8)
        one = str(tmp_path / "one.mp4")
        chunked = str(tmp_path / "chunked.mp4")
        encode_video(one, frames, fps=6.0)
        with VideoWriter(chunked, w=64, h=48, fps=6.0) as vw:
            vw.append(frames[:5])
            vw.append(frames[5:11])
            vw.append(frames[11])  # single-frame [H,W,3] form
        assert vw.frames_written == 12
        assert probe(chunked).num_frames == 12
        a = decode_frames(one, list(range(12)))
        b = decode_frames(chunked, list(range(12)))
        np.testing.assert_array_equal(a, b)

    def test_closed_writer_rejects_append(self, tmp_path):
        from vision_collision_detection_tpu.media.decoder import (
            MediaError,
            VideoWriter,
        )

        vw = VideoWriter(str(tmp_path / "x.mp4"), w=32, h=32, fps=5.0)
        vw.append(np.zeros((2, 32, 32, 3), np.uint8))
        vw.close()
        with pytest.raises(MediaError):
            vw.append(np.zeros((1, 32, 32, 3), np.uint8))


class TestFastResize:
    """Planar-YUV fast resize (vcd_set_fast_resize / ClipDataset
    fast_resize): close to the exact convert-then-resize path, exact
    fallback where the fast geometry doesn't apply."""

    @pytest.fixture(scope="class")
    def textured_video(self, tmp_path_factory):
        """320x480 landscape clip with high-frequency texture — the
        worst case for a resample-order change."""
        path = str(tmp_path_factory.mktemp("fast") / "tex.mp4")
        rng = np.random.default_rng(7)
        n, h, w = 12, 320, 480
        frames = (rng.random((n, h, w, 3)) * 255).astype(np.uint8)
        encode_video(path, frames, fps=10)
        return path

    def test_close_to_exact(self, textured_video):
        from vision_collision_detection_tpu.media.decoder import (
            get_fast_resize,
            set_fast_resize,
        )

        idx = list(range(0, 12, 2))
        exact = decode_frames(textured_video, idx, target_size=112,
                              letterbox=True, fast_resize=False)
        fast = decode_frames(textured_video, idx, target_size=112,
                             letterbox=True, fast_resize=True)
        set_fast_resize(False)
        assert not get_fast_resize()
        assert fast.shape == exact.shape
        d = np.abs(exact.astype(np.int16) - fast.astype(np.int16))
        # bound: chroma interpolation order + one dropped uint8
        # quantization; measured max 4/255 on 720p dashcam-like content
        assert int(d.max()) <= 8, int(d.max())
        assert float(d.mean()) < 1.5, float(d.mean())
        # black letterbox bars identical
        assert (fast[:, :8] == exact[:, :8]).all()

    def test_portrait_bars_fall_back_to_exact(self, tmp_path):
        """pad_w != 0 (portrait into square) is outside the fast geometry:
        output must be BIT-identical to the exact path even with the flag
        on."""
        path = str(tmp_path / "portrait.mp4")
        rng = np.random.default_rng(3)
        frames = (rng.random((6, 240, 120, 3)) * 255).astype(np.uint8)
        encode_video(path, frames, fps=10)
        idx = list(range(6))
        exact = decode_frames(path, idx, target_size=112, letterbox=True,
                              fast_resize=False)
        fast = decode_frames(path, idx, target_size=112, letterbox=True,
                             fast_resize=True)
        from vision_collision_detection_tpu.media.decoder import (
            set_fast_resize,
        )
        set_fast_resize(False)
        np.testing.assert_array_equal(exact, fast)

    def test_dataset_plumbs_flag(self, tmp_path):
        """ClipDataset(fast_resize=True) batches stay close to the exact
        dataset's batches (native batch decode path)."""
        import pandas as pd

        from vision_collision_detection_tpu.data.datasets import (
            ClipDataset,
            ClipRecord,
        )

        csv = generate_dataset(str(tmp_path / "ds"), clips_per_class=1,
                               num_frames=10, height=180, width=320)
        df = pd.read_csv(csv)
        records = [
            ClipRecord(video_id=str(r.id), video_path=r.video_path, label=0)
            for r in df.itertuples()
        ]
        kw = dict(fps=5, duration=1, frame_size=96)
        exact_ds = ClipDataset(records, fast_resize=False, **kw)
        fast_ds = ClipDataset(records, fast_resize=True, **kw)
        be = exact_ds.get_batch(range(len(records)))
        bf = fast_ds.get_batch(range(len(records)))
        from vision_collision_detection_tpu.media.decoder import (
            set_fast_resize,
        )
        set_fast_resize(False)
        assert not be["error"].any() and not bf["error"].any()
        d = np.abs(be["frames"].astype(np.int16) - bf["frames"].astype(np.int16))
        assert int(d.max()) <= 8

    def test_per_call_flag_does_not_leak_to_global(self, textured_video):
        """fast_resize is plumbed PER CALL into the C library (advisor
        finding: the old implementation mutated a process-global as a side
        effect, racing concurrent datasets and leaking the mode to later
        default-mode callers)."""
        from vision_collision_detection_tpu.media.decoder import (
            get_fast_resize,
            set_fast_resize,
        )

        set_fast_resize(False)
        idx = list(range(0, 12, 2))
        fast = decode_frames(textured_video, idx, target_size=112,
                             letterbox=True, fast_resize=True)
        # the per-call override must NOT have touched the global default
        assert not get_fast_resize()
        # a default-mode call right after the fast call takes the exact path
        default_after = decode_frames(textured_video, idx, target_size=112,
                                      letterbox=True)
        exact = decode_frames(textured_video, idx, target_size=112,
                              letterbox=True, fast_resize=False)
        np.testing.assert_array_equal(default_after, exact)
        assert np.abs(exact.astype(np.int16)
                      - fast.astype(np.int16)).max() > 0

    def test_global_default_still_honored_when_flag_is_none(
            self, textured_video):
        from vision_collision_detection_tpu.media.decoder import (
            set_fast_resize,
        )

        idx = list(range(0, 12, 2))
        fast = decode_frames(textured_video, idx, target_size=112,
                             letterbox=True, fast_resize=True)
        set_fast_resize(True)
        try:
            via_global = decode_frames(textured_video, idx, target_size=112,
                                       letterbox=True)
        finally:
            set_fast_resize(False)
        np.testing.assert_array_equal(via_global, fast)

    def test_concurrent_mixed_modes_are_isolated(self, textured_video):
        """Two threads decoding the same clip with OPPOSITE per-call modes
        must each get their own path's pixels — the old global toggle made
        the last setter win for all in-flight decodes."""
        from concurrent.futures import ThreadPoolExecutor

        idx = list(range(0, 12, 2))
        exact = decode_frames(textured_video, idx, target_size=112,
                              letterbox=True, fast_resize=False)
        fast = decode_frames(textured_video, idx, target_size=112,
                             letterbox=True, fast_resize=True)

        def run(mode):
            return decode_frames(textured_video, idx, target_size=112,
                                 letterbox=True, fast_resize=mode)

        with ThreadPoolExecutor(max_workers=4) as ex:
            futs = [ex.submit(run, m) for m in
                    (True, False, True, False) * 4]
            results = [f.result() for f in futs]
        for i, r in enumerate(results):
            expected = fast if (i % 2 == 0) else exact
            np.testing.assert_array_equal(r, expected)


class TestLowresDecode:
    """Reduced-resolution decode (data.lowres_decode / decode lowres=k):
    libavcodec decodes mpeg4-family streams directly at 1/2^k size. Pins the
    accuracy envelope on supported codecs and the two clamp behaviors —
    unsupported codecs (H.264) and too-small sources must be BIT-identical
    full-res decodes, never a silent quality cliff."""

    @pytest.fixture(scope="class")
    def smooth_video(self, tmp_path_factory):
        """640x480 clip with smooth low-frequency content — what survives
        a DCT-domain downscale; dashcam footage is closer to this than to
        white noise."""
        path = str(tmp_path_factory.mktemp("lowres") / "smooth.mp4")
        n, h, w = 12, 480, 640
        yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
        frames = np.zeros((n, h, w, 3), np.uint8)
        for t in range(n):
            r = 128 + 100 * np.sin(2 * np.pi * (xx / 200 + t * 0.05))
            g = 128 + 100 * np.sin(2 * np.pi * (yy / 150 - t * 0.03))
            b = 128 + 100 * np.sin(2 * np.pi * ((xx + yy) / 300))
            frames[t] = np.stack([r, g, b], -1).clip(0, 255).astype(np.uint8)
        encode_video(path, frames, fps=10)
        return path

    def test_close_to_full_res(self, smooth_video):
        idx = list(range(0, 12, 2))
        full = decode_frames(smooth_video, idx, target_size=112,
                             letterbox=True, lowres=0)
        half = decode_frames(smooth_video, idx, target_size=112,
                             letterbox=True, lowres=1)
        assert half.shape == full.shape
        d = np.abs(full.astype(np.int16) - half.astype(np.int16))
        # DCT-crop low-pass vs AA triangle filter: measured max ~20/255,
        # mean ~1.2/255 on smooth 720p content; bound with headroom.
        assert int(d.max()) <= 48, int(d.max())
        assert float(d.mean()) < 4.0, float(d.mean())
        # letterbox bars identical (640x480 → content 112x84, pad 14)
        assert (half[:, :14] == full[:, :14]).all()

    def test_composes_with_fast_resize(self, smooth_video):
        idx = list(range(0, 12, 2))
        full = decode_frames(smooth_video, idx, target_size=112,
                             letterbox=True)
        combo = decode_frames(smooth_video, idx, target_size=112,
                              letterbox=True, fast_resize=True, lowres=1)
        d = np.abs(full.astype(np.int16) - combo.astype(np.int16))
        assert int(d.max()) <= 48, int(d.max())
        assert float(d.mean()) < 4.0, float(d.mean())

    def test_unsupported_codec_falls_back_bitexact(self, bframe_video):
        """H.264 has max_lowres=0: any requested level must decode
        bit-identically to a full-res decode (transparent fallback)."""
        path, n = bframe_video
        idx = list(range(0, n, 7))
        full = decode_frames(path, idx, target_size=64, letterbox=True,
                             lowres=0)
        for k in (1, 2, 3):
            req = decode_frames(path, idx, target_size=64, letterbox=True,
                                lowres=k)
            np.testing.assert_array_equal(req, full)

    def test_clamps_to_cover_content_box(self, ramp_video):
        """160x120 source into a 96px canvas: content is 96x72, and
        160>>1 = 80 < 96 would force an upscale — so the level must clamp
        to 0 and the output must be BIT-identical to full-res."""
        path, *_ = ramp_video
        idx = [0, 10, 20]
        full = decode_frames(path, idx, target_size=96, letterbox=True,
                             lowres=0)
        clamped = decode_frames(path, idx, target_size=96, letterbox=True,
                                lowres=3)
        np.testing.assert_array_equal(clamped, full)

    def test_batch_matches_single(self, smooth_video):
        from vision_collision_detection_tpu.media.decoder import decode_batch

        idx = np.array([[0, 2, 4, 6], [1, 3, 5, 7]], np.int64)
        single = np.stack([
            decode_frames(smooth_video, row, target_size=112, letterbox=True,
                          lowres=1)
            for row in idx
        ])
        batch, ok = decode_batch([smooth_video] * 2, idx, 112,
                                 letterbox=True, lowres=1)
        assert ok.all()
        np.testing.assert_array_equal(batch, single)

    def test_per_call_does_not_leak_to_global(self, smooth_video):
        from vision_collision_detection_tpu.media.decoder import (
            get_lowres,
            set_lowres,
        )

        set_lowres(0)
        idx = list(range(0, 12, 2))
        half = decode_frames(smooth_video, idx, target_size=112,
                             letterbox=True, lowres=1)
        assert get_lowres() == 0  # per-call level must not touch the global
        default_after = decode_frames(smooth_video, idx, target_size=112,
                                      letterbox=True)
        full = decode_frames(smooth_video, idx, target_size=112,
                             letterbox=True, lowres=0)
        np.testing.assert_array_equal(default_after, full)
        assert np.abs(full.astype(np.int16)
                      - half.astype(np.int16)).max() > 0

    def test_global_default_honored_when_none(self, smooth_video):
        from vision_collision_detection_tpu.media.decoder import set_lowres

        idx = list(range(0, 12, 2))
        half = decode_frames(smooth_video, idx, target_size=112,
                             letterbox=True, lowres=1)
        set_lowres(1)
        try:
            via_global = decode_frames(smooth_video, idx, target_size=112,
                                       letterbox=True)
        finally:
            set_lowres(0)
        np.testing.assert_array_equal(via_global, half)

    def test_dataset_plumbs_lowres(self, tmp_path):
        """ClipDataset(lowres_decode=1) batches stay close to the full-res
        dataset's batches (native batch decode path)."""
        import pandas as pd

        from vision_collision_detection_tpu.data.datasets import (
            ClipDataset,
            ClipRecord,
        )

        csv = generate_dataset(str(tmp_path / "ds"), clips_per_class=1,
                               num_frames=10, height=360, width=640)
        df = pd.read_csv(csv)
        records = [
            ClipRecord(video_id=str(r.id), video_path=r.video_path, label=0)
            for r in df.itertuples()
        ]
        kw = dict(fps=5, duration=1, frame_size=96)
        full_ds = ClipDataset(records, lowres_decode=0, **kw)
        half_ds = ClipDataset(records, lowres_decode=1, **kw)
        bf = full_ds.get_batch(range(len(records)))
        bh = half_ds.get_batch(range(len(records)))
        assert not bf["error"].any() and not bh["error"].any()
        d = np.abs(bf["frames"].astype(np.int16)
                   - bh["frames"].astype(np.int16))
        assert int(d.max()) <= 48
        assert float(d.mean()) < 4.0
