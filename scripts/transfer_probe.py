"""Host→device transfer probe for the e2e bench pipeline.

Measures `jax.device_put` throughput of a bench-shaped uint8 content-box
batch (the exact array the e2e leg ships per step) to rule host→device
transfer in or out as an e2e bottleneck. Findings on the round-4 dev host
(tunneled TPU v5 lite): 33.9 MB batch in ~29 ms ≈ 1.2 GB/s single-stream,
1.46 GB/s with two threaded puts — ~1% of the 2.4 s/batch decode time,
i.e. transfer is NOT the bottleneck (see BENCH.md).

Run from the repo root: `python scripts/transfer_probe.py`.
"""
import os
import sys
import threading
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

from vision_collision_detection_tpu.ops.letterbox import letterbox_geometry  # noqa: E402

# bench.py's fixture geometry: 720p source letterboxed to 224², content
# rows only, rounded up to even (the batch decoder's content-box contract)
SRC_H, SRC_W, FRAME_SIZE, BATCH, FRAMES = 720, 1280, 224, 16, 25


def main() -> None:
    nh, nw, _, _ = letterbox_geometry(SRC_H, SRC_W, FRAME_SIZE)
    content = (nh + nh % 2, nw + nw % 2)
    shape = (BATCH, FRAMES, content[0], content[1], 3)
    x = np.random.randint(0, 255, shape, dtype=np.uint8)
    mb = x.nbytes / 1e6
    print(f"batch shape {shape} = {mb:.1f} MB")
    dev = jax.devices()[0]
    jax.device_put(x, dev).block_until_ready()  # warmup
    for _ in range(3):
        t0 = time.perf_counter()
        jax.device_put(x, dev).block_until_ready()
        dt = time.perf_counter() - t0
        print(f"single put: {dt * 1e3:.1f} ms  ({mb / dt:.1f} MB/s)")

    t0 = time.perf_counter()
    a = jax.device_put(x, dev)
    b = jax.device_put(x, dev)
    a.block_until_ready()
    b.block_until_ready()
    dt = time.perf_counter() - t0
    print(f"two sequential-issue puts: {dt * 1e3:.1f} ms "
          f"({2 * mb / dt:.1f} MB/s)")

    out = [None, None]

    def putter(i: int) -> None:
        out[i] = jax.device_put(x, dev)

    t0 = time.perf_counter()
    threads = [threading.Thread(target=putter, args=(i,)) for i in range(2)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    for o in out:
        o.block_until_ready()
    dt = time.perf_counter() - t0
    print(f"two threaded puts: {dt * 1e3:.1f} ms ({2 * mb / dt:.1f} MB/s)")


if __name__ == "__main__":
    main()
