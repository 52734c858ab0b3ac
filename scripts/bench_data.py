"""Input-pipeline decode throughput: inline vs thread-pool workers.

The training input path must sustain batch-rate JPEG decode (a pod host
feeding 8 chips at ~134 img/s/chip needs >1k decodes/s). The native C++
decode/resize kernels release the GIL, so WebDatasetLoader(num_workers=N)
scales across host cores.

    python scripts/bench_data.py --images 256 --size 512
"""
from __future__ import annotations

import argparse
import io
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from paella_tpu.data import WebDatasetLoader, write_tar_shard


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", type=int, default=256)
    ap.add_argument("--size", type=int, default=512, help="source JPEG side")
    ap.add_argument("--workers", type=int, nargs="*", default=[0, 2, 4, 8])
    args = ap.parse_args()

    from PIL import Image

    rng = np.random.default_rng(0)

    def jpeg_bytes(i):
        img = Image.fromarray(
            rng.integers(0, 255, (args.size, args.size, 3), dtype=np.uint8)
        )
        buf = io.BytesIO()
        img.save(buf, format="JPEG", quality=90)
        return buf.getvalue()

    with tempfile.TemporaryDirectory() as d:
        shard = os.path.join(d, "bench-000.tar")
        write_tar_shard(
            shard,
            [
                (f"{i:06d}", {"jpg": jpeg_bytes(i), "txt": f"caption {i}".encode()})
                for i in range(args.images)
            ],
        )
        print(f"{args.images} JPEGs @ {args.size}^2, host cores: {os.cpu_count()}")
        for w in args.workers:
            loader = WebDatasetLoader(
                [shard], batch_size=16, image_size=256, shuffle_buffer=1,
                filter=None, resample=False, num_workers=w,
                shard_offset=0, shard_stride=1,
            )
            n = 0
            t0 = time.perf_counter()
            for images, captions in loader:
                n += images.shape[0]
            dt = time.perf_counter() - t0
            print(f"num_workers={w}: {n / dt:7.1f} img/s  ({dt:.2f}s for {n})")


if __name__ == "__main__":
    main()
