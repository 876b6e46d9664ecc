"""Video writing without ffmpeg.

The runtime image has no ffmpeg binary and no imageio-ffmpeg plugin, so
`imageio.mimwrite(..., fps=...)` cannot produce H.264 MP4s. This module first
tries imageio's mp4 path (in case an ffmpeg becomes available) and otherwise
writes a Motion-JPEG AVI container by hand — a ~120-line muxer every common
player/ffmpeg build decodes. The file keeps whatever name the caller asked for
(`rendered_video.mp4` for reference output-layout parity); content sniffing,
not the extension, determines decodability.
"""
from __future__ import annotations

import io
import struct
from pathlib import Path
from typing import Sequence

import numpy as np


def write_video(path: Path, frames: Sequence[np.ndarray], fps: int = 60) -> Path:
    """Write frames ([H, W, 3] uint8) as a video file. Returns the path."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    frames = [np.ascontiguousarray(f[..., :3]) for f in frames]
    try:
        import imageio.v2 as imageio

        imageio.mimwrite(path, frames, fps=fps)
        return path
    except Exception:
        _write_mjpeg_avi(path, frames, fps)
        return path


def _encode_jpeg(frame: np.ndarray, quality: int = 92) -> bytes:
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(frame).save(buf, format="JPEG", quality=quality)
    return buf.getvalue()


def _write_mjpeg_avi(path: Path, frames: Sequence[np.ndarray], fps: int) -> None:
    height, width = frames[0].shape[:2]
    jpegs = [_encode_jpeg(f) for f in frames]
    num_frames = len(jpegs)
    max_size = max(len(j) for j in jpegs)

    def chunk(fourcc: bytes, payload: bytes) -> bytes:
        pad = b"\x00" if len(payload) % 2 else b""
        return fourcc + struct.pack("<I", len(payload)) + payload + pad

    def lst(list_type: bytes, payload: bytes) -> bytes:
        return chunk(b"LIST", list_type + payload)

    avih = struct.pack(
        "<14I",
        int(1e6 / fps),  # dwMicroSecPerFrame
        max_size * fps,  # dwMaxBytesPerSec
        0,  # dwPaddingGranularity
        0x10,  # dwFlags: AVIF_HASINDEX
        num_frames,
        0,  # dwInitialFrames
        1,  # dwStreams
        max_size,  # dwSuggestedBufferSize
        width,
        height,
        0, 0, 0, 0,  # reserved
    )

    strh = (
        b"vids"
        + b"MJPG"
        + struct.pack(
            "<IHHIIIIIIII",
            0,  # dwFlags
            0,  # wPriority
            0,  # wLanguage
            0,  # dwInitialFrames
            1,  # dwScale
            fps,  # dwRate
            0,  # dwStart
            num_frames,  # dwLength
            max_size,  # dwSuggestedBufferSize
            0xFFFFFFFF,  # dwQuality (default)
            0,  # dwSampleSize
        )
        + struct.pack("<4h", 0, 0, width, height)  # rcFrame
    )

    strf = struct.pack(
        "<IiiHH4sIiiII",
        40,  # biSize
        width,
        height,
        1,  # planes
        24,  # bit count
        b"MJPG",
        width * height * 3,
        0, 0, 0, 0,
    )

    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih)
        + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )

    movi_payload = b"".join(chunk(b"00dc", j) for j in jpegs)
    movi = lst(b"movi", movi_payload)

    # idx1: offsets relative to the start of the 'movi' list-type fourcc
    idx_entries = []
    offset = 4
    for j in jpegs:
        idx_entries.append(b"00dc" + struct.pack("<III", 0x10, offset, len(j)))
        offset += 8 + len(j) + (len(j) % 2)
    idx1 = chunk(b"idx1", b"".join(idx_entries))

    riff_payload = b"AVI " + hdrl + movi + idx1
    with open(path, "wb") as f:
        f.write(b"RIFF" + struct.pack("<I", len(riff_payload)) + riff_payload)
