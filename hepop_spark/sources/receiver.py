"""Landing-zone receivers: the thin ingest edge in front of Structured
Streaming.

The reference binds UDP/TCP sockets and feeds packets straight into its
in-process buffer (hepop.js:996-1014 — note its TCP path assumes one data
chunk == one HEP packet, no framing). Spark has no robust socket source for
binary protocols, so the idiomatic shape is a small receiver process that
appends incoming frames to a landing directory (or Kafka in production),
which `spark.readStream` then consumes with checkpointing — the landing
files play the WAL role the reference assigns to its parquet flushes
(README.md:11 "Parquet Columnar WAL").

Frames are spooled as length-prefixed records into rotating segment files,
plus a parquet conversion helper so the streaming job reads a proper binary
column. LP text lines are spooled verbatim into `.lp` text segments.
"""

from __future__ import annotations

import os
import socket
import socketserver
import struct
import threading
import time


class SegmentSpool:
    """Append frames to rotating segment files: `{dir}/{prefix}-{n}.seg`,
    each record length-prefixed (u32 BE). Rotation by record count keeps
    segments micro-batch sized."""

    def __init__(self, out_dir: str, prefix: str = "seg", rotate_every: int = 1000):
        self.out_dir = out_dir
        self.prefix = prefix
        self.rotate_every = rotate_every
        self._n = 0
        self._count = 0
        self._fh = None
        # process-incarnation token: segment names must be unique ACROSS
        # RESTARTS, not just within one run — a restarted spool that
        # reuses `{prefix}-00000000` overwrites the old segment at a path
        # the consumer has already processed, silently dropping the new
        # batch (found by tests/test_round7.py::TestServeRestartContinuity)
        self._epoch = f"{time.time_ns():016x}"
        self._lock = threading.Lock()
        os.makedirs(out_dir, exist_ok=True)

    def _open_next(self):
        if self._fh:
            self._fh.close()
            # atomically publish the finished segment for the stream reader
            os.rename(self._tmp_path, self._pub_path)
        self._tmp_path = os.path.join(
            self.out_dir, f".{self.prefix}-{self._epoch}-{self._n:08d}.tmp")
        self._pub_path = os.path.join(
            self.out_dir, f"{self.prefix}-{self._epoch}-{self._n:08d}.seg")
        self._fh = open(self._tmp_path, "ab")
        self._n += 1
        self._count = 0

    def append(self, frame: bytes) -> None:
        with self._lock:
            if self._fh is None or self._count >= self.rotate_every:
                self._open_next()
            self._fh.write(struct.pack(">I", len(frame)) + frame)
            self._count += 1

    def flush(self) -> None:
        """Publish the current segment (reference timer flush, hepop.js:151-157)."""
        with self._lock:
            if self._fh:
                self._fh.close()
                os.rename(self._tmp_path, self._pub_path)
                self._fh = None

    def close(self) -> None:
        self.flush()


def read_segment_file(path: str) -> list[bytes]:
    """Length-prefixed frames of ONE published segment file."""
    with open(path, "rb") as fh:
        data = fh.read()
    frames = []
    off = 0
    while off + 4 <= len(data):
        (ln,) = struct.unpack(">I", data[off:off + 4])
        frames.append(data[off + 4:off + 4 + ln])
        off += 4 + ln
    return frames


def read_segments(seg_dir: str) -> list[bytes]:
    """Read back all published length-prefixed frames (driver/test helper)."""
    frames = []
    for name in sorted(os.listdir(seg_dir)):
        if not name.endswith(".seg"):
            continue
        frames.extend(read_segment_file(os.path.join(seg_dir, name)))
    return frames


def segments_to_parquet(spark, seg_dir: str, out_dir: str) -> int:
    """Convert published segments to a parquet binary column the streaming
    job consumes (`readStream.schema('frame binary').parquet(...)`)."""
    frames = read_segments(seg_dir)
    if frames:
        spark.createDataFrame([(f,) for f in frames], "frame binary").write.mode(
            "append"
        ).parquet(out_dir)
    return len(frames)


class HepUdpReceiver:
    """UDP receiver: each datagram is one HEP frame (reference hepop.js:
    1006-1014)."""

    def __init__(self, spool: SegmentSpool, host: str = "127.0.0.1", port: int = 0):
        self.spool = spool
        self.sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        self.sock.bind((host, port))
        self.port = self.sock.getsockname()[1]
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._run, daemon=True)

    def start(self):
        self._thread.start()
        return self

    def _run(self):
        self.sock.settimeout(0.2)
        while not self._stop.is_set():
            try:
                data, _ = self.sock.recvfrom(65535)
            except socket.timeout:
                continue
            if data:
                self.spool.append(data)

    def stop(self):
        self._stop.set()
        self._thread.join(timeout=2)
        self.sock.close()
        self.spool.flush()


class HepTcpReceiver:
    """TCP receiver with proper HEP3 framing — each record starts with
    'HEP3' + u16 total length, so partial/coalesced chunks reassemble
    correctly (IMPROVING on the reference, which assumes one chunk = one
    packet, hepop.js:996-1003)."""

    def __init__(self, spool: SegmentSpool, host: str = "127.0.0.1", port: int = 0):
        self.spool = spool
        spool_ref = spool

        class Handler(socketserver.BaseRequestHandler):
            def handle(self):
                buf = b""
                while True:
                    chunk = self.request.recv(65536)
                    if not chunk:
                        break
                    buf += chunk
                    while len(buf) >= 6:
                        if buf[:4] != b"HEP3":
                            # resync: drop to next magic
                            idx = buf.find(b"HEP3", 1)
                            buf = buf[idx:] if idx >= 0 else b""
                            continue
                        (total,) = struct.unpack(">H", buf[4:6])
                        if len(buf) < total:
                            break
                        spool_ref.append(buf[:total])
                        buf = buf[total:]

        self.server = socketserver.ThreadingTCPServer((host, port), Handler)
        self.server.daemon_threads = True
        self.port = self.server.server_address[1]
        self._thread = threading.Thread(target=self.server.serve_forever, daemon=True)

    def start(self):
        self._thread.start()
        return self

    def stop(self):
        self.server.shutdown()
        self.server.server_close()
        self._thread.join(timeout=2)
        self.spool.flush()


class LpLineSpool:
    """LP text spool: raw lines into rotating `.lp` text segments that the
    `readStream.format('text')` source consumes directly."""

    def __init__(self, out_dir: str, rotate_every: int = 1000):
        self.out_dir = out_dir
        self.rotate_every = rotate_every
        self._n = 0
        self._lines: list[str] = []
        # unique across restarts: the file-source CHECKPOINT keys processed
        # files by path, so a restarted spool reusing `w-00000000.lp`
        # overwrites an already-consumed segment and the new rows are
        # silently skipped — restart data loss
        # (tests/test_round7.py::TestServeRestartContinuity)
        self._epoch = f"{time.time_ns():016x}"
        self._lock = threading.Lock()
        os.makedirs(out_dir, exist_ok=True)

    def append(self, line: str) -> None:
        with self._lock:
            self._lines.append(line)
            if len(self._lines) >= self.rotate_every:
                self._publish()

    def _publish(self):
        if not self._lines:
            return
        tmp = os.path.join(self.out_dir, f".w-{self._epoch}-{self._n:08d}.tmp")
        pub = os.path.join(self.out_dir, f"w-{self._epoch}-{self._n:08d}.lp")
        with open(tmp, "w") as fh:
            fh.write("\n".join(self._lines))
        os.rename(tmp, pub)
        self._n += 1
        self._lines = []

    def flush(self) -> None:
        with self._lock:
            self._publish()
