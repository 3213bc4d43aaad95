"""Two-process multi-host training test (SURVEY.md §2.7 comm-backend row).

Spawns 2 local processes that jax.distributed.initialize over a Gloo
coordinator (CPU backend, 2 virtual devices each → a 4-device global
'data' mesh), run Trainer.fit for 3 DP steps, and dump final params.  This
exercises the multi-host plumbing that a single-process suite never
reaches: `make_array_from_process_local_data` batch assembly
(parallel/sharding.py), the DataLoader interleaved-shard mode
(data/dataset.py), full-dataset loudness stats (identical on every
process), process-0-only host artifacts, and the collective Orbax save.

The parent then recomputes the identical 3 steps single-process — same
interleaved global batch order, same stats estimator, same seed — and
asserts both workers' final params match it (and each other exactly).
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

WORKER = os.path.join(os.path.dirname(__file__), "multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_training_matches_single_process(tmp_path):
    # Whether jax.distributed/Gloo actually works can only be probed by
    # calling initialize: the worker exits 42 when it raises, and this test
    # SKIPS on that sentinel (a static hasattr(jax, 'distributed') check is
    # vacuously true on modern JAX).
    from ddsp_pytorch_tpu.data import make_synthetic_dataset

    cache = str(tmp_path / "cache")
    make_synthetic_dataset(
        cache, n_items=8, sample_rate=16000, signal_length=2048,
        block_size=64, n_harmonic=4,
    )
    out = str(tmp_path / "out")
    run_dir = str(tmp_path / "run")  # SHARED: the Orbax save is collective
    os.makedirs(out)
    port = _free_port()

    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # worker sets its own device count
    env["JAX_PLATFORMS"] = ""
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [
                sys.executable, WORKER, "--pid", str(i), "--nproc", "2",
                "--port", str(port), "--cache", cache, "--run-dir", run_dir,
                "--out", out, "--steps", "3",
            ],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        )
        for i in range(2)
    ]
    import time

    deadline = time.time() + 420
    while any(p.poll() is None for p in procs):
        if any(p.poll() == 42 for p in procs):
            # sentinel from the worker: jax.distributed.initialize raised.
            # Kill the peer (it would block in initialize until its own
            # timeout) before skipping.
            for q in procs:
                if q.poll() is None:
                    q.kill()
            break
        if time.time() > deadline:
            for q in procs:
                q.kill()
            pytest.fail("multi-host workers timed out")
        time.sleep(0.5)
    logs = [p.communicate()[0] for p in procs]
    if any(p.returncode == 42 for p in procs):
        pytest.skip("jax.distributed/Gloo backend unavailable in this jaxlib")
    assert all(p.returncode == 0 for p in procs), "\n===\n".join(logs)

    # both processes froze the same (full-dataset) loudness stats
    stats = [json.load(open(os.path.join(out, f"stats_{i}.json")))
             for i in range(2)]
    assert stats[0] == stats[1]
    assert stats[0]["step"] == 3

    # and identical final params (replicated state, bitwise across processes)
    p0 = dict(np.load(os.path.join(out, f"params_0.npz")))
    p1 = dict(np.load(os.path.join(out, f"params_1.npz")))
    assert sorted(p0) == sorted(p1)
    for k in p0:
        np.testing.assert_array_equal(p0[k], p1[k], err_msg=k)

    # ---- single-process reference: identical math, one device ----------
    import jax

    from ddsp_pytorch_tpu.config import Config
    from ddsp_pytorch_tpu.data.dataset import DataLoader, Dataset
    from ddsp_pytorch_tpu.models import load_model
    from ddsp_pytorch_tpu.ops import mean_std_loudness
    from ddsp_pytorch_tpu.training import create_train_state, make_train_step
    from ddsp_pytorch_tpu.training.train import (
        _as_jnp,
        make_optimizer,
    )

    cfg = Config.from_dict(
        {
            "preprocess": {
                "sample_rate": 16000,
                "signal_length": 2048,
                "block_size": 64,
                "out_dir": cache,
            },
            "model": {
                "name": "single-inst-decoder",
                "kwargs": {
                    "hidden_size": 16,
                    "n_harmonic": 4,
                    "n_bands": 5,
                    "sample_rate": 16000,
                    "block_size": 64,
                    "has_reverb": False,
                    "use_pallas": "never",
                },
            },
            "train": {"scales": [256, 128], "batch": 4, "optimizer": "sgd"},
        }
    )
    data = Dataset(os.path.join(cache, "train"))
    # stats exactly as the multi-host Trainer computes them: full dataset,
    # global batch, unshuffled
    mean_l, std_l = mean_std_loudness(DataLoader(data, 4, shuffle=False))
    np.testing.assert_allclose(mean_l, stats[0]["mean_loudness"], rtol=1e-6)
    np.testing.assert_allclose(std_l, stats[0]["std_loudness"], rtol=1e-6)

    # global batches exactly as assembled across the two shards: device
    # order puts process 0's rows first
    shards = [
        DataLoader(data, 2, shuffle=True, drop_last=True,
                   seed=cfg.train.seed, num_shards=2, shard_index=i)
        for i in range(2)
    ]
    model = load_model(cfg)
    tx = make_optimizer(cfg)
    step_fn = jax.jit(make_train_step(model, tx, cfg))

    state = None
    state_epoch1 = None  # state at step 2 = the epoch-1 validation point
    done = 0
    epoch = 0
    while done < 3:
        for loader in shards:
            loader.set_epoch(epoch)
        for b0, b1 in zip(*shards):
            batch = {
                k: _as_jnp(np.concatenate([b0[k], b1[k]], axis=0))
                for k in b0
            }
            if state is None:
                state = create_train_state(
                    model, batch, tx, seed=cfg.train.seed,
                    mean_loudness=mean_l, std_loudness=std_l,
                )
            state, _ = step_fn(state, batch)
            done += 1
            if done == 2:
                state_epoch1 = state
            if done >= 3:
                break
        epoch += 1

    ref = {
        "/".join(str(getattr(k, "key", k)) for k in path): np.asarray(v)
        for path, v in jax.tree_util.tree_leaves_with_path(
            jax.device_get(state.params)
        )
    }
    assert sorted(ref) == sorted(p0)
    for k in ref:
        # SGD: param delta is -lr*grad exactly; the differences are f32
        # reduction-order noise between the 4-way partitioned backward and
        # the single-device one (the multiscale log-mag loss has heavy
        # cancellation), observed ~4e-6 absolute over 3 steps at lr 1e-3 —
        # i.e. ~1e-3 relative on the gradients themselves
        np.testing.assert_allclose(
            p0[k], ref[k], atol=2e-5, rtol=0,
            err_msg=f"multi-host params diverged from single-process at {k}",
        )

    # ---- validation loss: the val loss process 0 logged at step 2 (end of
    # epoch 1) equals the single-process full-val-set number.  This pins the
    # sharded val loader + global batch assembly end-to-end (each process
    # contributes only its interleaved shard; the assembled global batch is
    # [p0 rows, p1 rows] in device order — replicate that composition so
    # the per-position noise draw matches exactly).
    from ddsp_pytorch_tpu.training.train import make_eval_step

    val_data = Dataset(os.path.join(cache, "validation"))
    eval_fn = jax.jit(make_eval_step(model, cfg))
    rng = jax.random.PRNGKey(0)  # _run_validation's fixed eval key
    losses = []
    for idxs in ([0, 2, 1, 3], [4, 6, 5, 7]):
        items = [val_data[i] for i in idxs]
        vb = {k: _as_jnp(np.stack([it[k] for it in items]))
              for k in items[0]}
        losses.append(float(eval_fn(state_epoch1, vb, rng)["loss"]))
    ref_val = float(np.mean(losses))

    logged = [json.loads(line)
              for line in open(os.path.join(run_dir, "metrics.jsonl"))]
    vals = [e["value"] for e in logged
            if e["tag"] == "loss/val" and e["step"] == 2]
    assert vals, f"no loss/val at step 2 in metrics.jsonl: {logged}"
    np.testing.assert_allclose(
        vals[-1], ref_val, rtol=1e-3,
        err_msg="multi-host val loss diverged from single-process full-val",
    )
