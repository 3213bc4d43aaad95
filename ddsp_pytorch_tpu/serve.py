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
MFCC extractor (streaming/mfcc.py StreamingMFCC) over the client's audio and
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
    """A session's in-flight pooled request awaiting its dispatch.

    Slot-release handshake: a session that gives up on a request (wait
    timeout, connection teardown) must NOT release its pool slot while the
    request can still be dispatched — the dispatcher would advance a
    re-acquired slot with the dead session's controls.  The `lock` guards a
    single exchange: the session sets `cancelled` if `done` is not yet set,
    transferring the release duty to the dispatcher; the dispatcher sets
    `done` when it finishes (or skips) the item and releases the slot iff
    it observed `cancelled`."""

    __slots__ = ("slot", "f0", "loud", "mfcc", "event", "audio", "error",
                 "lock", "done", "cancelled")

    def __init__(self, slot, f0, loud, mfcc=None):
        self.slot = slot
        self.f0 = f0
        self.loud = loud
        self.mfcc = mfcc
        self.event = threading.Event()
        self.audio = None
        self.error = None
        self.lock = threading.Lock()
        self.done = False
        self.cancelled = False


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
        dispatch_timeout: float = 120.0,
    ):
        from ddsp_pytorch_tpu.config import Config as _Config
        from ddsp_pytorch_tpu.export import make_streaming_synth
        from os import path as _path

        self._bundle_dir = bundle_dir
        cfg = _Config.from_yaml(_path.join(bundle_dir, "config.yaml"))
        self._needs_audio = cfg.model.name == "mfcc-autoencoder"
        self._n_mfcc = cfg.preprocess.n_mfcc
        # Bounds a pooled session's wait for its batched dispatch.  Must
        # cover a first-time XLA compile of the step at a new frame count
        # (~20-90 s on a tunneled chip) — a timeout shorter than the compile
        # would drop every client that connects before the step is warm.
        self._dispatch_timeout = float(dispatch_timeout)
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
            self._warmup()
            self._dispatcher = threading.Thread(
                target=self._dispatch_loop, daemon=True
            )
            self._dispatcher.start()

    def _warmup(self) -> None:
        """Compile the pooled step at the realtime wire shapes before
        accepting connections, so block-streaming clients never sit through
        an XLA compile inside a request (a cold compile in the dispatcher
        stalls EVERY connected voice, not just the new one).

        Decoder sessions dispatch one frame per block (F=1).  Autoencoder
        sessions additionally dispatch F=2 once at stream start: block 0
        releases no MFCC frames (the first frame's reflect pad needs one
        sample beyond it), so block 1 releases frames 0 and 1 together."""
        slot = self._pool.acquire()
        try:
            for f in (1, 2) if self._needs_audio else (1,):
                f0 = np.full((f, 1), 100.0, np.float32)
                loud = np.zeros((f, 1), np.float32)
                req = (f0, loud)
                if self._needs_audio:
                    req = (f0, loud, np.zeros((f, self._n_mfcc), np.float32))
                self._pool.step({slot: req})
        finally:
            self._pool.release(slot)

    # ------------------------------------------------------------ session
    def _pool_wait(self, pending: _Pending, inflight: list) -> np.ndarray:
        """Enqueue a pooled request and wait for its batched dispatch.

        `inflight` is the session's one-element handoff cell: it holds the
        pending while the dispatcher may still touch it, so the teardown
        path (finally in _serve_conn) can transfer the slot-release duty if
        the session dies mid-flight (_Pending docstring)."""
        inflight[0] = pending
        self._queue.put(pending)
        if not pending.event.wait(timeout=self._dispatch_timeout):
            raise TimeoutError("pooled dispatch timed out")
        if pending.error is not None:
            raise RuntimeError(f"pooled dispatch failed: {pending.error!r}")
        inflight[0] = None
        return pending.audio

    def _serve_conn(self, conn: socket.socket) -> None:
        slot = None
        inflight = [None]  # in-flight _Pending (slot-release handshake)
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
                    # would otherwise produce bit-identical "random"
                    # noise).  Pooled mode has no per-session seed — noise
                    # is a batch-level pool resource (streaming/pool.py).
                    seed = self._session_seed
                    self._session_seed += 1
            session = None
            if self._needs_audio:
                from ddsp_pytorch_tpu.export import make_streaming_mfcc
                from ddsp_pytorch_tpu.streaming import (
                    AutoencoderStreamSession,
                )

                # The causal extractor + one-block-latency FIFOs live in
                # AutoencoderStreamSession (the ONE home of those
                # invariants); only the render callback differs by mode.
                if self._pool is None:
                    state_cell = [self._synth.fresh_state(seed=seed)]

                    def step_fn(f0, loud, mfcc):
                        # the server lock scopes ONLY the device dispatch;
                        # the D2H audio pull runs unlocked (decoder-path
                        # parity below) so concurrent sessions overlap
                        # their transfers instead of serializing on them
                        with self._lock:
                            audio_dev, state_cell[0] = (
                                self._synth.step_stateless(
                                    state_cell[0],
                                    f0[None],
                                    loud[None],
                                    mfcc_frames=mfcc[None],
                                )
                            )
                        return np.asarray(audio_dev)[0]

                else:
                    # pooled AE session: the synth state lives in the pool
                    # (this slot's rows); render = batched pool dispatch
                    def step_fn(f0, loud, mfcc):
                        return self._pool_wait(
                            _Pending(slot, f0, loud, mfcc), inflight
                        )

                session = AutoencoderStreamSession(
                    self._synth,
                    make_streaming_mfcc(self._bundle_dir),
                    step_fn=step_fn,
                )
            elif self._pool is None:
                state = self._synth.fresh_state(seed=seed)
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
                if self._needs_audio:
                    try:
                        audio = session.step_samples(
                            pitch, loud, data[2 * n :]
                        )
                    except (TimeoutError, RuntimeError):
                        # pooled dispatch failed/timed out: close the
                        # session (the handshake in finally keeps the slot
                        # safe until the dispatcher is done with it)
                        if self._pool is None:
                            raise
                        return
                elif self._pool is not None:
                    pending = _Pending(
                        slot,
                        pitch[:: self.block_size, None],
                        loud[:: self.block_size, None],
                    )
                    try:
                        audio = self._pool_wait(pending, inflight)
                    except (TimeoutError, RuntimeError):
                        return
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
                release = True
                pending = inflight[0]
                if pending is not None:
                    with pending.lock:
                        if not pending.done:
                            # dispatcher still owns the request: it will
                            # release the slot when it finishes with it
                            pending.cancelled = True
                            release = False
                if release:
                    self._pool.release(slot)
            self._conns.discard(conn)
            conn.close()

    def _finish(self, item: _Pending, audio=None, error=None) -> None:
        """Complete a pooled request: publish the result, wake the session,
        and — iff the session abandoned it mid-flight — release its slot
        (the other half of the _Pending handshake)."""
        item.audio = audio
        item.error = error
        with item.lock:
            item.done = True
            release = item.cancelled
        item.event.set()
        if release:
            self._pool.release(item.slot)

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
                with item.lock:
                    cancelled = item.cancelled
                if cancelled:  # session gone before dispatch: never step it
                    self._finish(
                        item, error=ConnectionError("session cancelled")
                    )
                    continue
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
                    for s, it in items.items():
                        self._finish(it, audio=outs[s])
                except Exception as e:  # surface to the waiting sessions
                    for it in items.values():
                        self._finish(it, error=e)

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
