"""Multi-host (DCN) smoke test: 2 CPU processes x 2 virtual devices.

Validates the SURVEY §2.10 scale-out plan end to end without a cluster:
``jax.distributed.initialize`` over localhost, a global 4-device mesh
spanning both processes, per-process data sharding through
``make_array_from_process_local_data``, and a psum'd DP train step — the
result must match a single-process full-batch step exactly (MSE is linear
in the batch)."""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

_WORKER = r"""
import os, sys
import numpy as np
os.environ.pop("XLA_FLAGS", None)
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")

port, pid = sys.argv[1], int(sys.argv[2])
sys.path.insert(0, sys.argv[3])
from u2mkd_tpu.parallel import mesh as pmesh

pmesh.initialize_distributed(
    coordinator_address=f"127.0.0.1:{port}", num_processes=2, process_id=pid,
)
assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 4, jax.device_count()
assert jax.local_device_count() == 2

import jax.numpy as jnp

mesh = pmesh.make_global_mesh()

rng = np.random.RandomState(0)
x = rng.randn(8, 4).astype(np.float32)
y = rng.randn(8, 1).astype(np.float32)
w0 = rng.randn(4, 1).astype(np.float32)

# this process's contiguous half of the global batch
lo, hi = pid * 4, (pid + 1) * 4
batch = pmesh.shard_host_batch({"x": x[lo:hi], "y": y[lo:hi]}, mesh)

def step(w, batch, rng):
    def loss_fn(w):
        pred = batch["x"] @ w
        return jnp.mean((pred - batch["y"]) ** 2)
    loss, g = jax.value_and_grad(loss_fn)(w)
    g = jax.lax.pmean(g, pmesh.DATA_AXIS)
    loss = jax.lax.pmean(loss, pmesh.DATA_AXIS)
    return w - 0.1 * g, {"loss": loss}

dp_step = pmesh.data_parallel_step(step, mesh)
w1, out = dp_step(jnp.asarray(w0), batch, jnp.zeros((), jnp.uint32))
loss = float(out["loss"])
ck = float(np.asarray(w1).sum())
print(f"RESULT pid={pid} loss={loss:.8f} wsum={ck:.8f}", flush=True)
"""


def test_two_process_dp(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(port), str(i), repo],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=300)
        outs.append(out)
        assert p.returncode == 0, f"worker failed:\n{out[-3000:]}"
    results = {}
    for out in outs:
        line = [l for l in out.splitlines() if l.startswith("RESULT")][0]
        parts = dict(kv.split("=") for kv in line.split()[1:])
        results[int(parts["pid"])] = (float(parts["loss"]),
                                      float(parts["wsum"]))
    assert results[0] == results[1], results

    # single-process full-batch reference (same seeds, plain numpy SGD step)
    rng = np.random.RandomState(0)
    x = rng.randn(8, 4).astype(np.float32)
    y = rng.randn(8, 1).astype(np.float32)
    w0 = rng.randn(4, 1).astype(np.float32)
    pred = x @ w0
    loss_ref = float(np.mean((pred - y) ** 2))
    g = 2.0 * x.T @ (pred - y) / len(x)
    w1_ref = w0 - 0.1 * g
    got_loss, got_wsum = results[0]
    np.testing.assert_allclose(got_loss, loss_ref, rtol=1e-5)
    np.testing.assert_allclose(got_wsum, float(w1_ref.sum()), rtol=1e-5)
