"""Realtime streaming server: remote clients drive a TPU-hosted model.

The reference embeds its model inside the DAW process (libtorch in a Pd
external).  A TPU cannot live inside a DAW, so the production-shaped
deployment is a small socket server on the TPU host: clients stream
pitch/loudness blocks, the server answers with rendered audio, state (GRU
carry + oscillator phase) lives server-side per connection.

Wire protocol (little-endian):
  hello:    server → client: magic b'DDSP', uint32 sample_rate,
            uint32 block_size, uint32 flags (bit 0: session also streams
            input audio — mfcc-autoencoder bundles)
  request:  client → server: uint32 n (samples, multiple of block_size),
            n float32 pitch, n float32 loudness[, n float32 audio when
            flags bit 0 is set]
  response: server → client: uint32 n, n float32 audio
  n == 0 from the client closes the session.

Autoencoder sessions (flags bit 0): the server runs a per-connection causal
MFCC extractor (ops/spectral.py StreamingMFCC) over the client's audio and
answers with ONE block of output latency — the first response leads with a
silent block — because MFCC frame 0's reflect pad needs one sample beyond
block 0.  That keeps the MFCC↔audio alignment identical to training (no
feature time-shift), and still undercuts the reference's own realtime
budget of TWO blocks of pipeline latency (ddsp_tilde.cpp:7,87).

One thread per connection; each connection holds its own StreamState and
session counter, all sharing ONE compiled step function (one XLA compile
per server, not per connection; the model dispatch is ~0.5 ms, so a single
chip serves hundreds of realtime voices — BASELINE.md).
"""

from __future__ import annotations

import socket
import struct
import threading
from typing import Optional

import numpy as np

MAGIC = b"DDSP"
# Largest request accepted (samples): 10 s at 192 kHz.  A session streaming
# realtime sends block-sized requests; the cap only bounds the buffer a
# malicious/buggy client can make the server allocate per request.
MAX_REQUEST_SAMPLES = 1_920_000


def _recv_exact(conn: socket.socket, n: int) -> Optional[bytes]:
    buf = b""
    while len(buf) < n:
        chunk = conn.recv(n - len(buf))
        if not chunk:
            return None
        buf += chunk
    return buf


class _Pending:
    """A session's in-flight pooled request awaiting its dispatch."""

    __slots__ = ("slot", "f0", "loud", "mfcc", "event", "audio", "error")

    def __init__(self, slot, f0, loud, mfcc=None):
        self.slot = slot
        self.f0 = f0
        self.loud = loud
        self.mfcc = mfcc
        self.event = threading.Event()
        self.audio = None
        self.error = None


class StreamServer:
    """voices=1 (default): one StreamState per connection, each request is
    its own batch-1 dispatch.  voices=V>1: VoicePool mode — sessions own
    slots of ONE batch-V state and a dispatcher thread coalesces pending
    requests into single batched dispatches (see streaming/pool.py for why
    this is the TPU-native serving shape).  Pool trade-offs: noise draws
    come from one batch-level PRNG stream, and a connection beyond V is
    closed at accept (no hello)."""

    def __init__(
        self,
        bundle_dir: str,
        host: str = "127.0.0.1",
        port: int = 0,
        voices: int = 1,
    ):
        from ddsp_pytorch_tpu.config import Config as _Config
        from ddsp_pytorch_tpu.export import make_streaming_synth
        from os import path as _path

        self._bundle_dir = bundle_dir
        cfg = _Config.from_yaml(_path.join(bundle_dir, "config.yaml"))
        self._needs_audio = cfg.model.name == "mfcc-autoencoder"
        # ONE compiled step shared by every session (per-connection state);
        # make_streaming_synth is the single bundle→synth constructor (the
        # same one the C++ runtime instantiates).
        self._synth = make_streaming_synth(bundle_dir, batch=max(1, voices))
        self.sample_rate = self._synth.sample_rate
        self.block_size = self._synth.block_size

        self._sock = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self._sock.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self._sock.bind((host, port))
        self._sock.listen(8)
        self.address = self._sock.getsockname()
        self._stop = threading.Event()
        self._threads = []
        self._conns = set()  # live session sockets (closed by stop())
        self._lock = threading.Lock()  # serialize device dispatch
        self._session_seed = 0

        self._pool = None
        self._dispatcher = None
        if voices > 1:
            import queue

            from ddsp_pytorch_tpu.streaming.pool import VoicePool

            self._pool = VoicePool(self._synth)
            self._queue = queue.Queue()
            self._dispatcher = threading.Thread(
                target=self._dispatch_loop, daemon=True
            )
            self._dispatcher.start()

    # ------------------------------------------------------------ session
    def _serve_conn(self, conn: socket.socket) -> None:
        slot = None
        try:
            if self._pool is not None:
                slot = self._pool.acquire()
                if slot is None:  # pool full: close without a hello
                    return
            conn.sendall(
                MAGIC
                + struct.pack(
                    "<III",
                    self.sample_rate,
                    self.block_size,
                    1 if self._needs_audio else 0,
                )
            )
            if self._pool is None:
                with self._lock:
                    # distinct seed per session: concurrent streams must
                    # not share one noise-RNG stream (identical controls
                    # would otherwise produce bit-identical "random" noise)
                    seed = self._session_seed
                    self._session_seed += 1
                    state = self._synth.fresh_state(seed=seed)
            if self._needs_audio:
                from ddsp_pytorch_tpu.export import make_streaming_mfcc

                if self._pool is None:
                    from ddsp_pytorch_tpu.streaming import (
                        AutoencoderStreamSession,
                    )

                    # per-connection causal extractor + one-block-latency
                    # FIFOs (AutoencoderStreamSession docstring), sharing
                    # the server's one compiled synth
                    session = AutoencoderStreamSession(
                        self._synth,
                        make_streaming_mfcc(self._bundle_dir),
                        seed=seed,
                    )
                else:
                    # pooled AE session: the synth state lives in the pool
                    # (this slot's rows); the causal extractor and the
                    # one-block-latency FIFOs stay per-connection
                    extractor = make_streaming_mfcc(self._bundle_dir)
                    frame_fifo = np.zeros((0, extractor.n_mfcc), np.float32)
                    ctrl_fifo = np.zeros((0, 2), np.float32)
                    out_fifo = np.zeros(self.block_size, np.float32)
            n_ch = 3 if self._needs_audio else 2
            while not self._stop.is_set():
                head = _recv_exact(conn, 4)
                if head is None:
                    return
                (n,) = struct.unpack("<I", head)
                if n == 0:
                    return
                if n % self.block_size != 0 or n > MAX_REQUEST_SAMPLES:
                    # reject oversized n before allocating/recv'ing its
                    # payload (n is a raw uint32 off the wire)
                    conn.sendall(struct.pack("<I", 0))
                    return
                payload = _recv_exact(conn, 4 * n_ch * n)
                if payload is None:
                    return
                data = np.frombuffer(payload, np.float32)
                pitch, loud = data[:n], data[n : 2 * n]
                if self._needs_audio and self._pool is None:
                    with self._lock:
                        audio = session.step_samples(
                            pitch, loud, data[2 * n :]
                        )
                    conn.sendall(
                        struct.pack("<I", n)
                        + audio.astype(np.float32).tobytes()
                    )
                    continue
                if self._needs_audio:  # pooled AE session
                    frames = extractor.push(data[2 * n :][None])[0]
                    frame_fifo = np.concatenate([frame_fifo, frames])
                    ctrl_fifo = np.concatenate(
                        [
                            ctrl_fifo,
                            np.stack(
                                [
                                    pitch[:: self.block_size],
                                    loud[:: self.block_size],
                                ],
                                axis=1,
                            ),
                        ]
                    )
                    r = min(len(frame_fifo), len(ctrl_fifo))
                    if r:
                        pending = _Pending(
                            slot,
                            ctrl_fifo[:r, :1],
                            ctrl_fifo[:r, 1:],
                            frame_fifo[:r],
                        )
                        self._queue.put(pending)
                        if not pending.event.wait(timeout=30):
                            return
                        if pending.error is not None:
                            return
                        frame_fifo = frame_fifo[r:]
                        ctrl_fifo = ctrl_fifo[r:]
                        out_fifo = np.concatenate([out_fifo, pending.audio])
                    audio, out_fifo = out_fifo[:n], out_fifo[n:]
                    conn.sendall(
                        struct.pack("<I", n)
                        + audio.astype(np.float32).tobytes()
                    )
                    continue
                if self._pool is not None:
                    pending = _Pending(
                        slot,
                        pitch[:: self.block_size, None],
                        loud[:: self.block_size, None],
                    )
                    self._queue.put(pending)
                    if not pending.event.wait(timeout=30):
                        return
                    if pending.error is not None:
                        return
                    audio = pending.audio
                else:
                    f0 = pitch[None, :: self.block_size, None]
                    ld = loud[None, :: self.block_size, None]
                    with self._lock:
                        audio_dev, state = self._synth.step_stateless(
                            state, f0, ld
                        )
                    audio = np.asarray(audio_dev)[0]
                conn.sendall(struct.pack("<I", n) + audio.astype(np.float32).tobytes())
        finally:
            if slot is not None:
                self._pool.release(slot)
            self._conns.discard(conn)
            conn.close()

    def _dispatch_loop(self) -> None:
        """Coalesce pending pooled requests into batched dispatches.

        Each round: wait for one request, drain whatever else is queued,
        group by frame count (one dispatch per group), answer every
        session.  A duplicate slot in one round (a pipelining client) is
        deferred to the next round."""
        import queue

        while not self._stop.is_set():
            try:
                first = self._queue.get(timeout=0.1)
            except queue.Empty:
                continue
            batch = [first]
            while True:
                try:
                    batch.append(self._queue.get_nowait())
                except queue.Empty:
                    break
            groups = {}
            deferred = []
            for item in batch:
                g = groups.setdefault(item.f0.shape[0], {})
                if item.slot in g:
                    deferred.append(item)
                else:
                    g[item.slot] = item
            for d in deferred:
                self._queue.put(d)
            for items in groups.values():
                requests = {
                    s: (
                        (it.f0, it.loud)
                        if it.mfcc is None
                        else (it.f0, it.loud, it.mfcc)
                    )
                    for s, it in items.items()
                }
                try:
                    # pool.step returns host rows from one device gather +
                    # one pull (the device→host link is the scarce
                    # resource, not the chip)
                    outs = self._pool.step(requests)
                    for s, audio in outs.items():
                        items[s].audio = audio
                except Exception as e:  # surface to the waiting sessions
                    for it in items.values():
                        it.error = e
                for it in items.values():
                    it.event.set()

    # ------------------------------------------------------------- control
    def serve_forever(self) -> None:
        while not self._stop.is_set():
            try:
                conn, _ = self._sock.accept()
            except OSError:
                return
            self._conns.add(conn)
            t = threading.Thread(target=self._serve_conn, args=(conn,), daemon=True)
            t.start()
            # prune finished sessions so a long-lived server doesn't hold a
            # Thread object per historical connection
            self._threads = [x for x in self._threads if x.is_alive()]
            self._threads.append(t)

    def start(self) -> None:
        self._acceptor = threading.Thread(target=self.serve_forever, daemon=True)
        self._acceptor.start()

    def stop(self) -> None:
        self._stop.set()
        try:
            self._sock.close()
        except OSError:
            pass
        # unblock sessions parked in recv(): _stop is only checked between
        # requests, so an idle connection would otherwise outlive stop()
        for conn in list(self._conns):
            try:
                conn.shutdown(socket.SHUT_RDWR)
            except OSError:
                pass
        for t in self._threads:
            t.join(timeout=2)
        if self._dispatcher is not None:
            self._dispatcher.join(timeout=2)


class StreamClient:
    """Minimal client for the protocol above."""

    def __init__(self, host: str, port: int):
        self._sock = socket.create_connection((host, port))
        hello = _recv_exact(self._sock, 4 + 12)
        assert hello is not None and hello[:4] == MAGIC, "bad server hello"
        self.sample_rate, self.block_size, flags = struct.unpack(
            "<III", hello[4:]
        )
        # bit 0: autoencoder session — render() must also stream the input
        # audio (the timbre-transfer source) for server-side causal MFCCs
        self.needs_audio = bool(flags & 1)

    def render(
        self,
        pitch: np.ndarray,
        loudness: np.ndarray,
        audio: Optional[np.ndarray] = None,
    ) -> np.ndarray:
        pitch = np.ascontiguousarray(pitch, np.float32)
        loudness = np.ascontiguousarray(loudness, np.float32)
        n = len(pitch)
        payload = pitch.tobytes() + loudness.tobytes()
        if self.needs_audio:
            assert audio is not None and len(audio) == n, (
                "autoencoder session: pass n input-audio samples"
            )
            payload += np.ascontiguousarray(audio, np.float32).tobytes()
        self._sock.sendall(struct.pack("<I", n) + payload)
        head = _recv_exact(self._sock, 4)
        assert head is not None, "server closed"
        (m,) = struct.unpack("<I", head)
        assert m == n, f"server rejected request (n={n} % block != 0?)"
        payload = _recv_exact(self._sock, 4 * n)
        assert payload is not None
        return np.frombuffer(payload, np.float32).copy()

    def close(self) -> None:
        try:
            self._sock.sendall(struct.pack("<I", 0))
        except OSError:
            pass
        self._sock.close()


def main():
    import argparse

    p = argparse.ArgumentParser(
        description="Serve an exported bundle for realtime streaming."
    )
    p.add_argument("--bundle", required=True)
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=7770)
    p.add_argument("--voices", type=int, default=1,
                   help=">1 enables VoicePool mode: up to N concurrent "
                        "sessions batched into single device dispatches")
    args = p.parse_args()

    server = StreamServer(args.bundle, args.host, args.port,
                          voices=args.voices)
    print(
        f"serving {args.bundle} on {server.address} "
        f"(sr={server.sample_rate}, block={server.block_size})"
    )
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        server.stop()


if __name__ == "__main__":
    main()
