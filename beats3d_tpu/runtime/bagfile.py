"""Pure-python RealSense .bag (ROS bag v2.0) demuxer — no pyrealsense2.

The reference plays .bag recordings through librealsense
(/root/reference/src/rs_util.py:9-20: enable_device_from_file + non-realtime
playback); RealSense .bag files are ROS bag v2.0 containers carrying
sensor_msgs/Image messages on per-stream topics.  This module reads exactly
that subset so recorded sessions demux on a TPU host with no camera SDK:

* bag v2.0 record framing (header fields / op codes / chunks),
* ``none``-compressed chunks (librealsense's default) and bare records,
* sensor_msgs/Image on ``*/Depth_*/image/data`` (z16 -> (H, W) uint16) and
  ``*/Color_*/image/data`` (rgb8 -> (H, W, 3) uint8),
* sensor_msgs/CameraInfo on the depth stream's ``*/info/camera_info`` for
  intrinsics (K[0]=fx, K[4]=fy, K[2]=ppx, K[5]=ppy).

Depth/color pairing mirrors the reference's datagen gate
(live_data_convert.py:306-317): each depth frame takes the nearest color
frame by timestamp and drops it when the divergence exceeds
``pair_tolerance`` seconds.

Fixture bags for tests are produced by :func:`write_minimal_bag`.
"""
from __future__ import annotations

import struct
from typing import Dict, Iterator, List, Optional, Tuple

import numpy as np

MAGIC = b"#ROSBAG V2.0\n"

OP_MSG = 0x02
OP_BAGHDR = 0x03
OP_INDEX = 0x04
OP_CHUNK = 0x05
OP_CHUNKINFO = 0x06
OP_CONN = 0x07


def _parse_fields(buf: bytes) -> Dict[bytes, bytes]:
    fields = {}
    off = 0
    while off < len(buf):
        (flen,) = struct.unpack_from("<I", buf, off)
        off += 4
        field = buf[off : off + flen]
        off += flen
        k, _, v = field.partition(b"=")
        fields[k] = v
    return fields


def _records(buf: bytes) -> Iterator[Tuple[Dict[bytes, bytes], bytes]]:
    off = 0
    n = len(buf)
    while off + 8 <= n:
        (hlen,) = struct.unpack_from("<I", buf, off)
        off += 4
        header = _parse_fields(buf[off : off + hlen])
        off += hlen
        (dlen,) = struct.unpack_from("<I", buf, off)
        off += 4
        data = buf[off : off + dlen]
        off += dlen
        yield header, data


def _read_string(buf: bytes, off: int) -> Tuple[bytes, int]:
    (n,) = struct.unpack_from("<I", buf, off)
    return buf[off + 4 : off + 4 + n], off + 4 + n


def _parse_image(data: bytes):
    """sensor_msgs/Image -> (header_stamp_s, height, width, encoding, pixels)."""
    off = 4  # header.seq
    secs, nsecs = struct.unpack_from("<II", data, off)
    off += 8
    _, off = _read_string(data, off)  # frame_id
    height, width = struct.unpack_from("<II", data, off)
    off += 8
    encoding, off = _read_string(data, off)
    off += 1  # is_bigendian
    (step,) = struct.unpack_from("<I", data, off)
    off += 4
    (dn,) = struct.unpack_from("<I", data, off)
    off += 4
    pixels = data[off : off + dn]
    return secs + nsecs * 1e-9, height, width, encoding, step, pixels


def _parse_camera_info(data: bytes):
    """sensor_msgs/CameraInfo -> (fx, fy, ppx, ppy, width, height)."""
    off = 4
    off += 8  # stamp
    _, off = _read_string(data, off)  # frame_id
    height, width = struct.unpack_from("<II", data, off)
    off += 8
    _, off = _read_string(data, off)  # distortion_model
    (nd,) = struct.unpack_from("<I", data, off)  # D array
    off += 4 + 8 * nd
    k = struct.unpack_from("<9d", data, off)
    return k[0], k[4], k[2], k[5], width, height


class BagReader:
    """Demuxed contents of a RealSense-style ROS bag."""

    def __init__(self, path: str, pair_tolerance: float = 1 / 45.0):
        with open(path, "rb") as f:
            magic = f.read(len(MAGIC))
            if magic != MAGIC:
                raise ValueError(f"{path}: not a ROS bag v2.0 file")
            body = f.read()

        conn_topic: Dict[int, bytes] = {}
        depth: List[Tuple[float, np.ndarray]] = []
        color: List[Tuple[float, np.ndarray]] = []
        self.intrinsics_raw: Optional[Tuple[float, float, float, float,
                                            int, int]] = None

        def handle(header: Dict[bytes, bytes], data: bytes):
            op = header.get(b"op", b"\x00")[0]
            if op == OP_CONN:
                cid = struct.unpack("<I", header[b"conn"])[0]
                conn_topic[cid] = header[b"topic"]
            elif op == OP_MSG:
                cid = struct.unpack("<I", header[b"conn"])[0]
                topic = conn_topic.get(cid, b"")
                if topic.endswith(b"/image/data"):
                    ts, h, w, enc, step, px = _parse_image(data)
                    if b"Depth" in topic or enc in (b"z16", b"mono16",
                                                    b"16UC1"):
                        arr = np.frombuffer(px, np.uint16).reshape(h, w)
                        depth.append((ts, arr))
                    elif b"Color" in topic or enc in (b"rgb8",):
                        arr = np.frombuffer(px, np.uint8).reshape(h, w, 3)
                        color.append((ts, arr))
                elif topic.endswith(b"/camera_info") and (
                        b"Depth" in topic or self.intrinsics_raw is None):
                    self.intrinsics_raw = _parse_camera_info(data)
            elif op == OP_CHUNK:
                if header.get(b"compression", b"none") != b"none":
                    raise ValueError(
                        "compressed bag chunks unsupported "
                        f"({header[b'compression']!r}); re-record with "
                        "compression off"
                    )
                for h2, d2 in _records(data):
                    handle(h2, d2)

        for header, data in _records(body):
            handle(header, data)

        depth.sort(key=lambda t: t[0])
        color.sort(key=lambda t: t[0])
        self.depth = depth
        self.color = color
        self.pair_tolerance = pair_tolerance

    def paired_frames(self):
        """(depth_ts, depth, color_ts|None, color|None) per depth frame —
        nearest color by timestamp, dropped beyond pair_tolerance
        (live_data_convert.py:306-317 semantics)."""
        cts = np.array([t for t, _ in self.color]) if self.color else None
        for ts, d in self.depth:
            c = ct = None
            if cts is not None and len(cts):
                j = int(np.argmin(np.abs(cts - ts)))
                if abs(cts[j] - ts) <= self.pair_tolerance:
                    ct, c = self.color[j]
            yield ts, d, ct, c


class BagSource:
    """Hardware-free .bag playback with the RecordedSource interface."""

    def __init__(self, path: str, loop: bool = False,
                 pair_tolerance: float = 1 / 45.0):
        from ..utils.intrinsics import CameraIntrinsics

        self.reader = BagReader(path, pair_tolerance)
        if not self.reader.depth:
            raise ValueError(f"{path}: no depth image messages found")
        h, w = self.reader.depth[0][1].shape
        if self.reader.intrinsics_raw is not None:
            fx, fy, ppx, ppy, iw, ih = self.reader.intrinsics_raw
            self.intrinsics = CameraIntrinsics(
                width=int(iw) or w, height=int(ih) or h,
                fx=fx, fy=fy, ppx=ppx, ppy=ppy,
            )
        else:
            self.intrinsics = CameraIntrinsics.d415(w, h)
        self.loop = loop

    def frames(self):
        from .camera import Frame

        while True:
            for ts, d, ct, c in self.reader.paired_frames():
                yield Frame(depth=d, timestamp=ts, color=c,
                            color_timestamp=ct)
            if not self.loop:
                return

    def stop(self):
        pass


# ---------------------------------------------------------------------------
# fixture writer (tests / demos): a minimal spec-compliant bag
# ---------------------------------------------------------------------------

def _field(name: bytes, value: bytes) -> bytes:
    body = name + b"=" + value
    return struct.pack("<I", len(body)) + body


def _record(fields: List[Tuple[bytes, bytes]], data: bytes) -> bytes:
    header = b"".join(_field(k, v) for k, v in fields)
    return (struct.pack("<I", len(header)) + header
            + struct.pack("<I", len(data)) + data)


def _ser_string(s: bytes) -> bytes:
    return struct.pack("<I", len(s)) + s


def _ser_image(ts: float, arr: np.ndarray, encoding: bytes) -> bytes:
    secs = int(ts)
    nsecs = int(round((ts - secs) * 1e9))
    h, w = arr.shape[:2]
    step = arr.strides[0]
    px = arr.tobytes()
    return (struct.pack("<III", 0, secs, nsecs) + _ser_string(b"cam")
            + struct.pack("<II", h, w) + _ser_string(encoding)
            + b"\x00" + struct.pack("<I", step)
            + struct.pack("<I", len(px)) + px)


def _ser_camera_info(intr) -> bytes:
    k = [intr.fx, 0.0, intr.ppx, 0.0, intr.fy, intr.ppy, 0.0, 0.0, 1.0]
    return (struct.pack("<III", 0, 0, 0) + _ser_string(b"cam")
            + struct.pack("<II", intr.height, intr.width)
            + _ser_string(b"plumb_bob")
            + struct.pack("<I", 0)  # empty D
            + struct.pack("<9d", *k)
            + struct.pack("<9d", *([0.0] * 9))
            + struct.pack("<12d", *([0.0] * 12))
            + struct.pack("<II", 0, 0)
            + struct.pack("<IIII", 0, 0, 0, 0) + b"\x00")


def _ts_fields(ts: float) -> bytes:
    secs = int(ts)
    nsecs = int(round((ts - secs) * 1e9))
    return struct.pack("<II", secs, nsecs)


def write_minimal_bag(path: str, depth_frames, timestamps,
                      color_frames=None, color_timestamps=None,
                      intrinsics=None):
    """Write a minimal uncompressed ROS bag v2.0 with RealSense-style topics
    (tests' stand-in for a camera recording; real librealsense bags use the
    same container/topics/message types)."""
    conns = [
        (0, b"/device_0/sensor_0/Depth_0/image/data"),
        (1, b"/device_0/sensor_0/Color_0/image/data"),
        (2, b"/device_0/sensor_0/Depth_0/info/camera_info"),
    ]
    msgs = []
    for ts, d in zip(timestamps, depth_frames):
        msgs.append((0, ts, _ser_image(ts, np.asarray(d, np.uint16),
                                       b"z16")))
    if color_frames is not None:
        for ts, c in zip(color_timestamps, color_frames):
            msgs.append((1, ts, _ser_image(ts, np.asarray(c, np.uint8),
                                           b"rgb8")))
    if intrinsics is not None:
        msgs.append((2, timestamps[0], _ser_camera_info(intrinsics)))
    msgs.sort(key=lambda m: m[1])

    chunk_parts = []
    for cid, topic in conns:
        conn_hdr = (
            _field(b"topic", topic)
            + _field(b"type", b"sensor_msgs/Image" if cid < 2
                     else b"sensor_msgs/CameraInfo")
            + _field(b"md5sum", b"0" * 32)
            + _field(b"message_definition", b"")
        )
        chunk_parts.append(_record(
            [(b"op", bytes([OP_CONN])),
             (b"conn", struct.pack("<I", cid)),
             (b"topic", topic)],
            conn_hdr,
        ))
    for cid, ts, data in msgs:
        chunk_parts.append(_record(
            [(b"op", bytes([OP_MSG])),
             (b"conn", struct.pack("<I", cid)),
             (b"time", _ts_fields(ts))],
            data,
        ))
    chunk = b"".join(chunk_parts)

    with open(path, "wb") as f:
        f.write(MAGIC)
        baghdr = _record(
            [(b"op", bytes([OP_BAGHDR])),
             (b"index_pos", struct.pack("<Q", 0)),
             (b"conn_count", struct.pack("<I", len(conns))),
             (b"chunk_count", struct.pack("<I", 1))],
            b" " * 4096,
        )
        f.write(baghdr)
        f.write(_record(
            [(b"op", bytes([OP_CHUNK])),
             (b"compression", b"none"),
             (b"size", struct.pack("<I", len(chunk)))],
            chunk,
        ))
