"""Component-level timing: where does the train step spend its time?

Times, on the current default device: (a) plumbing build alone, (b) the
conv-only SPVCNN train step, (c) the full teacher (conv+SphereFormer) train
step, (d) attention-only stack. Prints one JSON line per part.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def timeit(fn, *args, iters=5):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / iters


def main():
    import jax
    import jax.numpy as jnp

    from u2mkd_tpu.data import synthetic
    from u2mkd_tpu.models import plumbing as P
    from u2mkd_tpu.models.spvcnn import SPVCNN
    from u2mkd_tpu.ops.precision import set_compute_dtype
    from u2mkd_tpu.train import optim, state as train_state
    from u2mkd_tpu.utils.jaxinit import setup_compilation_cache
    from __graft_entry__ import _teacher_model

    setup_compilation_cache()
    platform = jax.devices()[0].platform
    if platform != "cpu":
        set_compute_dtype("bfloat16")
    num_points = 4096
    for a in sys.argv:
        if a.startswith("--points="):
            num_points = int(a.split("=")[1])
    b = 2
    caps = (num_points, num_points // 2, num_points // 4, num_points // 8,
            num_points // 16)
    rng = np.random.RandomState(0)
    raw = synthetic.make_batch(rng, b, num_points, voxel_size=0.1)
    batch = {k: jnp.asarray(v) for k, v in raw.items()}
    res = {}

    # (a) plumbing
    plumb = jax.jit(lambda bt: P.build_plumbing(bt["pcoords"], bt["xyz"],
                                                bt["pmask"], caps))
    res["plumbing_ms"] = timeit(plumb, batch) * 1e3

    # (b) conv-only train step
    conv_model = SPVCNN(num_classes=17, cr=1.0)
    tx = optim.make_optimizer("sgd", 0.02)
    st = train_state.create_train_state(conv_model, tx, batch, caps,
                                        jax.random.PRNGKey(0))
    step = jax.jit(train_state.make_train_step(conv_model, tx, caps))
    res["conv_unet_step_ms"] = timeit(
        lambda s, bt: step(s, bt, jax.random.PRNGKey(1))[1]["loss"], st, batch
    ) * 1e3

    # (c) full teacher train step
    model = _teacher_model(num_classes=17, cr=1.0, voxel_size=0.1)
    tx2 = optim.make_optimizer("sgd_spformer", 0.02)
    st2 = train_state.create_train_state(model, tx2, batch, caps,
                                         jax.random.PRNGKey(0))
    step2 = jax.jit(train_state.make_train_step(model, tx2, caps))
    res["teacher_step_ms"] = timeit(
        lambda s, bt: step2(s, bt, jax.random.PRNGKey(1))[1]["loss"], st2, batch
    ) * 1e3
    res["attention_share_ms"] = res["teacher_step_ms"] - res["conv_unet_step_ms"]
    res["platform"] = platform
    res["num_points"] = num_points
    print(json.dumps({k: round(v, 2) if isinstance(v, float) else v
                      for k, v in res.items()}))


if __name__ == "__main__":
    main()
