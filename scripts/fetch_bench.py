"""Device->host fetch throughput vs (threads, chunk size) — sizes the
snapshot writer's streaming knobs (io/gadget.py _FETCH_THREADS /
_FETCH_CHUNK_BYTES).  The reference writes its 4.2 GB config-5 snapshot
in seconds from host RAM (io.c:117-128); here every byte crosses the
remote TPU tunnel first, so the fetch IS the output stage.

    python scripts/fetch_bench.py [MB_TOTAL]
"""

import os
import sys
import time
from collections import deque
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

MB = 1 << 20
TOTAL = int(float(sys.argv[1]) if len(sys.argv) > 1 else 512) * MB


def stream(arr, threads, chunk_bytes, sink):
    """The writer's exact read-ahead pattern (io/gadget.py
    _write_block_streamed)."""
    n = arr.shape[0]
    row_bytes = arr.dtype.itemsize * int(np.prod(arr.shape[1:]) or 1)
    rows = max(1, chunk_bytes // row_bytes)
    pool = ThreadPoolExecutor(threads)
    t0 = time.perf_counter()
    try:
        window = deque()
        starts = list(range(0, n, rows))
        it = iter(starts)
        depth = max(2, 2 * threads)
        for s in starts[:depth]:
            window.append(pool.submit(jax.device_get, arr[s:s + rows]))
            next(it)
        while window:
            chunk = window.popleft().result()
            for s in it:
                window.append(pool.submit(jax.device_get,
                                          arr[s:s + rows]))
                break
            if sink is not None:
                np.ascontiguousarray(chunk, arr.dtype).tofile(sink)
    finally:
        pool.shutdown(wait=False)
    return time.perf_counter() - t0


def main():
    n = TOTAL // 12
    arr = jnp.arange(n * 3, dtype=jnp.float32).reshape(n, 3)
    jax.block_until_ready(arr)
    size_mb = arr.nbytes / MB
    print(f"array {size_mb:.0f} MB on {jax.devices()[0]}", flush=True)

    # whole-array fetch (the r04 path) once, for the record
    t0 = time.perf_counter()
    np.asarray(arr[: n // 4])
    dt = time.perf_counter() - t0
    print(f"{'whole-slab np.asarray (1/4)':36s} {size_mb/4/dt:8.1f} MB/s",
          flush=True)

    for threads in (16, 48, 96, 160):
        for cb in (2 * MB, 8 * MB, 24 * MB):
            dt = stream(arr, threads, cb, None)
            print(f"threads={threads:4d} chunk={cb//MB:3d}MB "
                  f"{size_mb/dt:8.1f} MB/s  ({dt:.1f}s)", flush=True)

    # with the disk write in the loop (the real writer)
    with open("/tmp/fetch_bench.bin", "wb") as fp:
        dt = stream(arr, 96, 8 * MB, fp)
    print(f"with tofile (96 thr, 8MB)          {size_mb/dt:8.1f} MB/s",
          flush=True)
    os.unlink("/tmp/fetch_bench.bin")


if __name__ == "__main__":
    main()
