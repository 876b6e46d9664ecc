"""MJPEG/AVI video muxer structural tests (no ffmpeg in the image)."""
import io
import struct

import numpy as np

from voxe_tpu.viz.video import write_video


def test_write_video_produces_decodable_container(tmp_path):
    rng = np.random.default_rng(0)
    frames = [rng.integers(0, 255, (48, 64, 3), dtype=np.uint8) for _ in range(5)]
    path = write_video(tmp_path / "rendered_video.mp4", frames, fps=12)
    data = path.read_bytes()

    # RIFF/AVI header + index present
    assert data[:4] == b"RIFF" and data[8:12] == b"AVI "
    assert b"idx1" in data and b"MJPG" in data

    # every frame chunk is a decodable JPEG of the right size
    from PIL import Image

    count, offset = 0, 0
    while True:
        i = data.find(b"00dc", offset)
        if i < 0 or i + 8 > len(data):
            break
        size = struct.unpack("<I", data[i + 4 : i + 8])[0]
        payload = data[i + 8 : i + 8 + size]
        if payload[:2] == b"\xff\xd8":
            img = Image.open(io.BytesIO(payload))
            assert img.size == (64, 48)
            count += 1
        offset = i + 8 + size
    assert count == 2 * len(frames) - len(frames)  # movi chunks + idx entries share fourcc; jpeg-validated ones == 5
