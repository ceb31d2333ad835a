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
from u2mkd_tpu.utils.jaxinit import setup_compilation_cache
setup_compilation_cache()
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


_DISTILL_WORKER = r"""
import os, sys
import numpy as np
os.environ.pop("XLA_FLAGS", None)
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")

port, pid = sys.argv[1], int(sys.argv[2])
sys.path.insert(0, sys.argv[3])
from u2mkd_tpu.utils.jaxinit import setup_compilation_cache
setup_compilation_cache()
from u2mkd_tpu.parallel import mesh as pmesh

pmesh.initialize_distributed(
    coordinator_address=f"127.0.0.1:{port}", num_processes=2, process_id=pid,
)
assert jax.device_count() == 4

import jax.numpy as jnp
from u2mkd_tpu.data import synthetic
from u2mkd_tpu.models.tsd import TSDFull
from u2mkd_tpu.train import distill, optim

S_CAPS = (128, 64, 32, 16, 8)
T_CAPS = (192, 96, 48, 24, 12)
mesh = pmesh.make_global_mesh()

# same global batch drawn on both processes; keep this process's half
rng = np.random.RandomState(0)
raw = synthetic.make_multimodal_batch(rng, 4, 128, 192, voxel_size=0.3,
                                      num_cams=2, im_hw=(16, 24))
lo, hi = pid * 2, (pid + 1) * 2
local = jax.tree_util.tree_map(lambda x: x[lo:hi], raw)
batch = pmesh.shard_host_batch(local, mesh)

def build(axis):
    return TSDFull(num_classes=5, cr=0.25, cr_t=0.25, head_dim=4,
                   window_size=(1.2, 1.2, 1.2),
                   quant_size=(0.15, 0.15, 0.15),
                   window_size_sphere=(30.0, 30.0, 120.0),
                   quant_size_sphere=(3.75, 3.75, 5.0),
                   axis_name=axis)

model = build(pmesh.DATA_AXIS)
tx = distill.make_frozen_teacher_optimizer(optim.make_optimizer("sgd", 0.01))
lb = jax.tree_util.tree_map(jnp.asarray, local)
# init with the axis-free twin (outside shard_map), like the CLIs
st = distill.create_distill_state(build(None), tx, lb["student"],
                                  lb["teacher"], S_CAPS, T_CAPS,
                                  jax.random.PRNGKey(0))
step = pmesh.data_parallel_step(
    distill.make_distill_train_step(model, tx, S_CAPS, T_CAPS,
                                    axis_name=pmesh.DATA_AXIS), mesh)
# AOT-compile before touching any collective, then rendezvous via a file
# barrier: the distill program can take minutes to compile on a loaded
# single-core host, and Gloo's context init times out after 30s if one
# process reaches the first collective while the other is still compiling.
compiled = step.lower(st, batch, jax.random.PRNGKey(1)).compile()
bdir = os.path.dirname(os.path.abspath(sys.argv[0]))
open(os.path.join(bdir, f"compiled{pid}"), "w").close()
import time as _time
while not all(os.path.exists(os.path.join(bdir, f"compiled{i}"))
              for i in range(2)):
    _time.sleep(0.05)
st, aux = compiled(st, batch, jax.random.PRNGKey(1))
st, aux = compiled(st, batch, jax.random.PRNGKey(1))
loss = float(aux["loss"])
ck = float(sum(np.abs(np.asarray(x)).sum()
               for x in jax.tree_util.tree_leaves(
                   jax.device_get(st.params["model_s"]))))
assert np.isfinite(loss)
print(f"RESULT pid={pid} loss={loss:.8f} psum={ck:.6f}", flush=True)
"""


def _run_two(worker_src, tmp_path, timeout=2700):
    worker = tmp_path / "worker.py"
    worker.write_text(worker_src)
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
        out, _ = p.communicate(timeout=timeout)
        outs.append(out)
        assert p.returncode == 0, f"worker failed:\n{out[-3000:]}"
    results = {}
    for out in outs:
        line = [l for l in out.splitlines() if l.startswith("RESULT")][0]
        parts = dict(kv.split("=") for kv in line.split()[1:])
        results[int(parts["pid"])] = tuple(
            float(v) for k, v in parts.items() if k != "pid"
        )
    return results


@pytest.mark.slow
def test_two_process_distill(tmp_path):
    """Stage-2 parity with stage-1 infrastructure (VERDICT r2 #5): the full
    TSD distillation step runs under a 2-process global mesh with psum'd
    grads; loss and updated student params agree across processes."""
    results = _run_two(_DISTILL_WORKER, tmp_path)
    assert results[0] == results[1], results


@pytest.mark.slow
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
