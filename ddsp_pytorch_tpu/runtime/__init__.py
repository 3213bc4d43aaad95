"""ctypes binding for the native streaming engine (libddsp_stream.so).

Lets Python hosts (and tests) drive the exact C++ block pipeline the native
host uses, with a Python render callback — typically StreamingSynth.step
— standing in for the embedded-CPython model host.
"""

from __future__ import annotations

import ctypes
import os
from typing import Callable, Optional

import numpy as np

_RENDER_CB = ctypes.CFUNCTYPE(
    None,
    ctypes.POINTER(ctypes.c_float),  # pitch
    ctypes.POINTER(ctypes.c_float),  # loudness
    ctypes.POINTER(ctypes.c_float),  # out
    ctypes.c_int,
    ctypes.c_void_p,
)

_RENDER_AUDIO_CB = ctypes.CFUNCTYPE(
    None,
    ctypes.POINTER(ctypes.c_float),  # pitch
    ctypes.POINTER(ctypes.c_float),  # loudness
    ctypes.POINTER(ctypes.c_float),  # input audio
    ctypes.POINTER(ctypes.c_float),  # out
    ctypes.c_int,
    ctypes.c_void_p,
)

_DEFAULT_BUILD_DIRS = (
    os.path.join(os.path.dirname(__file__), "build"),
    "/tmp/rt_build",
)


def _find_library(explicit: Optional[str] = None) -> Optional[str]:
    if explicit:
        return explicit if os.path.exists(explicit) else None
    for d in _DEFAULT_BUILD_DIRS:
        p = os.path.join(d, "libddsp_stream.so")
        if os.path.exists(p):
            return p
    return None


def build_runtime(build_dir: Optional[str] = None) -> str:
    """Configure + build the native runtime; returns the build dir."""
    import subprocess

    src = os.path.dirname(os.path.abspath(__file__))
    build_dir = build_dir or os.path.join(src, "build")
    subprocess.run(["cmake", "-S", src, "-B", build_dir], check=True,
                   capture_output=True)
    subprocess.run(["cmake", "--build", build_dir, "-j2"], check=True,
                   capture_output=True)
    return build_dir


class StreamEngine:
    """Python handle on the C++ double-buffered engine.

    render: callable invoked on the engine's worker thread —
      with_audio=False: (pitch (n,), loudness (n,)) -> audio (n,)
      with_audio=True:  (pitch (n,), loudness (n,), audio_in (n,)) ->
                        audio (n,)  (the mfcc-autoencoder timbre-transfer
                        channel; ddsp_stream_create_audio)
    """

    def __init__(
        self,
        block_size: int,
        render: Callable[..., np.ndarray],
        library: Optional[str] = None,
        with_audio: bool = False,
    ):
        path = _find_library(library)
        if path is None:
            build_runtime()
            path = _find_library(library)
        if path is None:
            raise RuntimeError("libddsp_stream.so not found; build runtime/")
        self._lib = ctypes.CDLL(path)
        self._lib.ddsp_stream_create.restype = ctypes.c_void_p
        self._lib.ddsp_stream_create.argtypes = [
            ctypes.c_int, _RENDER_CB, ctypes.c_void_p,
        ]
        self._lib.ddsp_stream_process.restype = ctypes.c_int
        self._lib.ddsp_stream_process.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int,
        ]
        # audio-channel symbols: bind lazily so a pre-existing cached .so
        # built before the audio ring landed still serves with_audio=False
        # engines; with_audio=True against such a library raises a clear
        # rebuild hint instead of an AttributeError in __init__.
        self._has_audio_api = hasattr(self._lib, "ddsp_stream_create_audio")
        if self._has_audio_api:
            self._lib.ddsp_stream_create_audio.restype = ctypes.c_void_p
            self._lib.ddsp_stream_create_audio.argtypes = [
                ctypes.c_int, _RENDER_AUDIO_CB, ctypes.c_void_p,
            ]
            self._lib.ddsp_stream_process_audio.restype = ctypes.c_int
            self._lib.ddsp_stream_process_audio.argtypes = [
                ctypes.c_void_p,
                ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_float),
                ctypes.c_int,
            ]
        elif with_audio:
            raise RuntimeError(
                f"{path} predates the input-audio ring; rebuild the native "
                "runtime (ddsp_pytorch_tpu.runtime.build_runtime())"
            )
        self._lib.ddsp_stream_latency.restype = ctypes.c_int
        self._lib.ddsp_stream_latency.argtypes = [ctypes.c_void_p]
        self._lib.ddsp_stream_blocks_rendered.restype = ctypes.c_int64
        self._lib.ddsp_stream_blocks_rendered.argtypes = [ctypes.c_void_p]
        self._lib.ddsp_stream_underruns.restype = ctypes.c_int64
        self._lib.ddsp_stream_underruns.argtypes = [ctypes.c_void_p]
        self._lib.ddsp_stream_destroy.argtypes = [ctypes.c_void_p]

        self._render_py = render
        self.block_size = block_size
        self.with_audio = with_audio
        self._size_warned = False

        def _emit(out_p, audio, n):
            # memmove reads raw bytes: the render result must be C-contiguous
            # float32 of exactly n samples, or we'd copy stride garbage /
            # read out of bounds on the realtime worker thread
            audio = np.ascontiguousarray(audio, np.float32).ravel()
            if audio.size != n:
                if not self._size_warned:
                    self._size_warned = True
                    print(
                        f"[runtime] render returned {audio.size} samples, "
                        f"expected {n}; emitting silence",
                        flush=True,
                    )
                audio = np.zeros(n, np.float32)
            ctypes.memmove(
                out_p, audio.ctypes.data, n * ctypes.sizeof(ctypes.c_float)
            )

        if with_audio:
            def _cb(pitch_p, loud_p, audio_p, out_p, n, _ctx):
                pitch = np.ctypeslib.as_array(pitch_p, (n,)).copy()
                loud = np.ctypeslib.as_array(loud_p, (n,)).copy()
                audio_in = np.ctypeslib.as_array(audio_p, (n,)).copy()
                _emit(out_p, self._render_py(pitch, loud, audio_in), n)

            self._cb = _RENDER_AUDIO_CB(_cb)  # keep a reference (GC safety)
            self._engine = self._lib.ddsp_stream_create_audio(
                block_size, self._cb, None
            )
        else:
            def _cb(pitch_p, loud_p, out_p, n, _ctx):
                pitch = np.ctypeslib.as_array(pitch_p, (n,)).copy()
                loud = np.ctypeslib.as_array(loud_p, (n,)).copy()
                _emit(out_p, self._render_py(pitch, loud), n)

            self._cb = _RENDER_CB(_cb)  # keep a reference (GC safety)
            self._engine = self._lib.ddsp_stream_create(
                block_size, self._cb, None
            )
        if not self._engine:
            raise RuntimeError("ddsp_stream_create failed")

    def process(self, pitch: np.ndarray, loudness: np.ndarray,
                audio: Optional[np.ndarray] = None) -> np.ndarray:
        """One audio tick: (n,) control in → (n,) audio out.  `audio` feeds
        the input-audio ring of a with_audio engine (None → silence)."""
        pitch = np.ascontiguousarray(pitch, np.float32)
        loudness = np.ascontiguousarray(loudness, np.float32)
        out = np.zeros_like(pitch)
        fp = ctypes.POINTER(ctypes.c_float)
        if audio is not None and not self._has_audio_api:
            raise RuntimeError(
                "this libddsp_stream.so predates the input-audio ring; "
                "rebuild the native runtime"
            )
        if audio is not None and not self.with_audio:
            # The plain engine would copy this into a ring the renderer
            # never reads — a silent no-op masking a caller mistake.
            raise ValueError(
                "audio passed to a StreamEngine created with "
                "with_audio=False; construct with with_audio=True to feed "
                "an input-audio ring"
            )
        if audio is not None:
            audio = np.ascontiguousarray(audio, np.float32)
            rc = self._lib.ddsp_stream_process_audio(
                self._engine,
                pitch.ctypes.data_as(fp),
                loudness.ctypes.data_as(fp),
                audio.ctypes.data_as(fp),
                out.ctypes.data_as(fp),
                len(pitch),
            )
        else:
            rc = self._lib.ddsp_stream_process(
                self._engine,
                pitch.ctypes.data_as(fp),
                loudness.ctypes.data_as(fp),
                out.ctypes.data_as(fp),
                len(pitch),
            )
        if rc != 0:
            raise ValueError(f"tick size {len(pitch)} must divide block size")
        return out

    @property
    def latency(self) -> int:
        return self._lib.ddsp_stream_latency(self._engine)

    @property
    def blocks_rendered(self) -> int:
        return self._lib.ddsp_stream_blocks_rendered(self._engine)

    @property
    def underruns(self) -> int:
        return self._lib.ddsp_stream_underruns(self._engine)

    def close(self) -> None:
        if getattr(self, "_engine", None):
            self._lib.ddsp_stream_destroy(self._engine)
            self._engine = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
