import time

import numpy as np
import jax
import jax.numpy as jnp

from detectorch_tpu.utils.profiling import device_timer, trace


def test_device_timer_measures_work():
    x = jnp.ones((256, 256))
    fn = jax.jit(lambda: (x @ x).sum())
    dt = device_timer(fn, iters=3, pipeline=False)
    assert dt > 0
    dt_p = device_timer(fn, iters=3, pipeline=True)
    assert dt_p > 0


def test_trace_writes_logdir(tmp_path):
    logdir = str(tmp_path / "trace")
    with trace(logdir):
        jax.jit(lambda a: a * 2)(jnp.ones(8)).block_until_ready()
    import os

    assert os.path.isdir(logdir)
    # a plugins/profile dir with at least one capture
    found = []
    for root, dirs, files in os.walk(logdir):
        found += files
    assert found, "no trace files written"
