"""Host input-pipeline benchmark: JPEG decode → resize → normalize.

SURVEY §7 flags the input pipeline as the likely eval bottleneck ("3
JPEG decodes per sample ... must be parallel on host CPUs"). This
measures the native C++ path (`native/decoder.cpp`, libjpeg + thread
pool) against the PIL path on synthetic JPEGs, in 3-modal samples/s.

Prints one JSON line per path. Throughput scales ~linearly with host
cores (the build container has 1; a v5e-8 host has 112).
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from PIL import Image


def main(n_samples: int = 64):
    from signal_tpu.data import native_decoder
    from signal_tpu.data.transforms import ValTransform

    rng = np.random.default_rng(0)
    tmp = tempfile.mkdtemp(prefix="signal_pipe_bench_")
    paths = []
    for i in range(n_samples * 3):
        arr = rng.integers(0, 255, (256, 128, 3), dtype=np.uint8)
        p = os.path.join(tmp, f"{i}.jpg")
        Image.fromarray(arr).save(p, quality=90)
        paths.append(p)

    mean = std = (0.5, 0.5, 0.5)
    vt = ValTransform((256, 128), mean, std)

    # PIL path (the reference's `read_image` + torchvision val transform)
    t0 = time.perf_counter()
    for p in paths:
        vt(Image.open(p).convert("RGB"))
    dt_pil = time.perf_counter() - t0
    print(json.dumps({"metric": "pipeline_pil_3modal_samples_per_s",
                      "value": round(n_samples / dt_pil, 2),
                      "unit": "samples/s", "host_cpus": os.cpu_count()}))

    if not native_decoder.available():
        print(json.dumps({"metric": "pipeline_native_3modal_samples_per_s",
                          "value": None,
                          "note": "build with make -C native"}))
        return

    t0 = time.perf_counter()
    native_decoder.decode_batch(paths, 256, 128, mean, std, os.cpu_count() or 1)
    dt_nat = time.perf_counter() - t0
    print(json.dumps({"metric": "pipeline_native_3modal_samples_per_s",
                      "value": round(n_samples / dt_nat, 2),
                      "unit": "samples/s", "host_cpus": os.cpu_count(),
                      "speedup_vs_pil": round(dt_pil / dt_nat, 2)}))

    # uint8 path: decode+resample only, Normalize deferred to the device
    # (the production configuration, DATALOADER.DEVICE_NORMALIZE=True)
    t0 = time.perf_counter()
    native_decoder.decode_batch_u8(paths, 256, 128, os.cpu_count() or 1)
    dt_u8 = time.perf_counter() - t0
    print(json.dumps({"metric": "pipeline_native_u8_3modal_samples_per_s",
                      "value": round(n_samples / dt_u8, 2),
                      "unit": "samples/s", "host_cpus": os.cpu_count(),
                      "speedup_vs_pil": round(dt_pil / dt_u8, 2)}))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 64)
