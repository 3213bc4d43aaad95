"""Is jax.block_until_ready truthful on this tunnel?  (round 4)

Protocol: queue N identical streaming-synth calls and block_until_ready
each; then pull ONE value and time it; then time calls with a per-call
pull.  On a truthful backend the pull adds only its transfer time; here
it waits ~0.4 s x N — the queued REAL work — proving block_until_ready
fake-ACKs and every dispatch-rate benchmark overstates device throughput.
Companion evidence (train path): 100 donated train steps 'ready'
instantly, first loss pull 19.6 s; scan-iteration scaling 200 steps ->
45 s, 1000 steps -> 308 s (~0.3 s/iteration, size-independent).
See BASELINE.md 'The tunnel lies'."""
import time
import numpy as np
import jax, jax.numpy as jnp
from ddsp_pytorch_tpu.export import make_streaming_synth
import os, glob
t0 = time.time()
def mark(l): print(f"[{time.time()-t0:7.1f}s] {l}", flush=True)

synth = make_streaming_synth("pretrained/ddsp_violin_bundle", batch=1)
F = 8
f0 = jnp.full((1, F, 1), 220.0); lo = jnp.zeros((1, F, 1))
a = synth.step(f0, lo); jax.block_until_ready(a)
mark("compile done")

t = time.time()
for _ in range(50):
    a = synth.step(f0, lo)
jax.block_until_ready(a)
blocked = (time.time()-t)/50
mark(f"50 calls, block_until_ready only: {blocked*1000:.2f} ms/call")

t = time.time()
x = np.asarray(a)   # pull the last block
mark(f"pull after 50 queued calls took {time.time()-t:.2f} s")

t = time.time()
for _ in range(5):
    a = synth.step(f0, lo)
    x = np.asarray(a)
mark(f"5 calls with per-call pull: {(time.time()-t)/5*1000:.1f} ms/call")
