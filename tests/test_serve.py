"""Streaming server: protocol roundtrip, per-connection state, bad input."""

import os

import numpy as np
import pytest


@pytest.mark.slow
def test_stream_server_roundtrip(tmp_path):
    from tests.test_export_runtime import _train_tiny

    from ddsp_pytorch_tpu.export import export_run
    from ddsp_pytorch_tpu.serve import StreamClient, StreamServer

    run_dir, cfg = _train_tiny(tmp_path)
    bundle = export_run(run_dir, os.path.join(tmp_path, "export"), name="srv")

    server = StreamServer(bundle, port=0)
    server.start()
    host, port = server.address
    try:
        client = StreamClient(host, port)
        assert client.sample_rate == 16000
        assert client.block_size == 128

        n = 4 * 128
        pitch = np.full(n, 220.0, np.float32)
        loud = np.zeros(n, np.float32)
        a1 = client.render(pitch, loud)
        a2 = client.render(pitch, loud)
        assert a1.shape == (n,)
        assert np.all(np.isfinite(a1))
        # state carried across requests: phase continues, so blocks differ
        assert not np.allclose(a1, a2)

        # a second connection gets fresh state: the oscillator phase
        # restarts (harmonic content matches the first connection's first
        # block) but its noise RNG stream is per-session, not shared
        client2 = StreamClient(host, port)
        b1 = client2.render(pitch, loud)
        np.testing.assert_allclose(b1, a1, atol=1e-2)  # fresh phase
        assert not np.array_equal(b1, a1)  # independent noise draw

        # bad request size (not a block multiple) → rejected, session closed
        client3 = StreamClient(host, port)
        with pytest.raises(AssertionError):
            client3.render(np.zeros(100, np.float32), np.zeros(100, np.float32))

        client.close()
        client2.close()
    finally:
        server.stop()
