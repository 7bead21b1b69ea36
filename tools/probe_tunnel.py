"""Characterize the accelerator tunnel: dispatch pipelining, transfer costs.

Decides the frame-loop design: if async enqueues pipeline (per-dispatch
cost << blocked round-trip), a 1-program-per-frame loop can hide the RTT;
if every dispatch pays the RTT, the loop must batch frames into one
lax.scan program per chunk.
"""

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp
import numpy as np

import vslam_tpu  # noqa: F401  (config: matmul precision, compile cache)


def main():
    print(f"# backend: {jax.default_backend()}", flush=True)

    f = jax.jit(lambda x: x * 1.000001 + 1.0)
    x = jnp.zeros((256,), jnp.float32)
    x = jax.block_until_ready(f(x))

    # blocked per-dispatch cost
    t0 = time.perf_counter()
    for _ in range(20):
        x = jax.block_until_ready(f(x))
    print(f"noop blocked each:      {(time.perf_counter()-t0)/20*1e3:8.2f} ms",
          flush=True)

    # chained enqueue, single final block
    for n in (10, 50, 200):
        t0 = time.perf_counter()
        y = x
        for _ in range(n):
            y = f(y)
        y = jax.block_until_ready(y)
        dt = (time.perf_counter() - t0) / n * 1e3
        print(f"noop chained x{n:<4d}:      {dt:8.2f} ms/op", flush=True)

    # enqueue-only cost (dispatch returns before completion?)
    y = x
    t0 = time.perf_counter()
    for _ in range(50):
        y = f(y)
    enq = (time.perf_counter() - t0) / 50 * 1e3
    jax.block_until_ready(y)
    print(f"noop enqueue-only:      {enq:8.2f} ms/op", flush=True)

    # image upload: single vs batch
    img = np.random.randint(0, 255, (480, 752), np.uint8)
    jax.block_until_ready(jax.device_put(img))
    t0 = time.perf_counter()
    for _ in range(10):
        jax.block_until_ready(jax.device_put(img))
    print(f"h2d 1 image:            {(time.perf_counter()-t0)/10*1e3:8.2f} ms",
          flush=True)
    batch = np.random.randint(0, 255, (8, 480, 752), np.uint8)
    jax.block_until_ready(jax.device_put(batch))
    t0 = time.perf_counter()
    for _ in range(10):
        jax.block_until_ready(jax.device_put(batch))
    dt = (time.perf_counter() - t0) / 10 * 1e3
    print(f"h2d 8-image batch:      {dt:8.2f} ms ({dt/8:.2f}/img)", flush=True)

    # d2h: small pose fetch, np.asarray vs device_get
    pose = jax.block_until_ready(jnp.arange(7.0))
    t0 = time.perf_counter()
    for _ in range(10):
        np.asarray(pose)
    print(f"d2h np.asarray [7]:     {(time.perf_counter()-t0)/10*1e3:8.2f} ms",
          flush=True)

    scal = jax.block_until_ready(jnp.float32(1.0) + 0)
    t0 = time.perf_counter()
    for _ in range(10):
        jax.device_get(scal)
    print(f"d2h device_get scalar:  {(time.perf_counter()-t0)/10*1e3:8.2f} ms",
          flush=True)

    t0 = time.perf_counter()
    for _ in range(10):
        float(scal)
    print(f"d2h float(scalar):      {(time.perf_counter()-t0)/10*1e3:8.2f} ms",
          flush=True)

    # async copy overlap: enqueue work, start async copy, do host work, read
    y = jax.block_until_ready(f(x))
    t0 = time.perf_counter()
    for _ in range(10):
        y = f(y)
        y.copy_to_host_async()
        z = np.asarray(y)
    print(f"enqueue+async+read:     {(time.perf_counter()-t0)/10*1e3:8.2f} ms",
          flush=True)

    # does a heavier program pipeline? (simulates track_frame-scale work)
    g = jax.jit(lambda a: jnp.tanh(a @ a) + 1.0)
    a = jax.block_until_ready(
        jax.device_put(np.random.rand(2048, 2048).astype(np.float32)))
    jax.block_until_ready(g(a))
    t0 = time.perf_counter()
    b = a
    for _ in range(20):
        b = g(b)
    jax.block_until_ready(b)
    print(f"matmul2048 chained x20: {(time.perf_counter()-t0)/20*1e3:8.2f} "
          f"ms/op", flush=True)
    t0 = time.perf_counter()
    jax.block_until_ready(g(a))
    print(f"matmul2048 blocked:     {(time.perf_counter()-t0)*1e3:8.2f} ms",
          flush=True)


if __name__ == "__main__":
    main()
