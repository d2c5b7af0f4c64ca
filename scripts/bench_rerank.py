"""k-reciprocal re-ranking benchmark at RGBNT201 eval scale.

Times (a) `signal_tpu.reranking.re_ranking` — the dense-boolean-algebra
device rewrite — on the attached TPU, and (b) the reference's
numpy/torch implementation (`utils/reranking.py:29-100` in
maxingan2412/Signal) on this host's CPU, over the same random unit
features, and checks the two rank orderings agree.

Usage: python scripts/bench_rerank.py [N_query N_gallery] [--skip-ref]
Defaults to the RGBNT201 protocol scale (1672 query + 3115 gallery
= 4787 ids×modalities concatenated features of dim 1536) with the
engine's re-ranking parameters k1=50, k2=15, lambda=0.3.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

K1, K2, LAM = 50, 15, 0.3


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    nq = int(args[0]) if args else 1672
    ng = int(args[1]) if len(args) > 1 else 3115
    skip_ref = "--skip-ref" in sys.argv

    rng = np.random.default_rng(0)
    qf = rng.standard_normal((nq, 1536)).astype(np.float32)
    gf = rng.standard_normal((ng, 1536)).astype(np.float32)
    qf /= np.linalg.norm(qf, axis=1, keepdims=True)
    gf /= np.linalg.norm(gf, axis=1, keepdims=True)

    import jax

    from signal_tpu.reranking import re_ranking as rerank_tpu

    # compile + warm
    out_tpu = rerank_tpu(qf, gf, K1, K2, LAM)
    # tunnel-safe differential timing: the np.asarray readback inside
    # re_ranking already forces completion of each call
    def chain(iters):
        t0 = time.perf_counter()
        for _ in range(iters):
            rerank_tpu(qf, gf, K1, K2, LAM)
        return time.perf_counter() - t0

    tpu_s = (chain(6) - chain(2)) / 4

    result = {
        "metric": "rerank_k_reciprocal",
        "nq": nq, "ng": ng, "k1": K1, "k2": K2,
        "tpu_s": round(tpu_s, 3),
        "device": jax.devices()[0].device_kind,
    }
    stats = jax.devices()[0].memory_stats() or {}
    if "peak_bytes_in_use" in stats:
        result["peak_hbm_gib"] = round(stats["peak_bytes_in_use"] / 2**30, 3)
    else:
        # remote-attached backends report no runtime stats — fall back to
        # XLA's compile-time footprint of the one jitted core (args +
        # temps + output ≈ peak HBM; everything else is [N,d] features).
        # Caveat: the axon tunnel backend returns a canned constant here
        # (measured 0.451 GiB regardless of N) — for a trustworthy number
        # lower on a local backend, e.g. JAX_PLATFORMS=cpu gives 0.647 GiB
        # at the RGBNT201 protocol scale / 0.705 GiB at N=5000
        import jax.numpy as jnp

        from signal_tpu.reranking import _re_ranking_core

        n = nq + ng
        dist = jnp.zeros((n, n), jnp.float32)
        # _re_ranking_core is already jitted — lower the same
        # specialization the timed calls used (compile is a cache hit)
        mem = _re_ranking_core.lower(
            dist, num_query=nq, k1=K1, k2=K2,
            lambda_value=LAM).compile().memory_analysis()
        if mem is not None:
            total = (mem.argument_size_in_bytes + mem.temp_size_in_bytes
                     + mem.output_size_in_bytes)
            result["xla_hbm_gib"] = round(total / 2**30, 3)

    if not skip_ref and os.path.isdir("/root/reference/utils"):
        import importlib.util

        import torch

        spec = importlib.util.spec_from_file_location(
            "ref_rerank", "/root/reference/utils/reranking.py")
        ref = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(ref)
        t0 = time.perf_counter()
        out_ref = ref.re_ranking(torch.from_numpy(qf), torch.from_numpy(gf),
                                 K1, K2, LAM)
        ref_s = time.perf_counter() - t0
        result["ref_numpy_s"] = round(ref_s, 3)
        result["speedup"] = round(ref_s / tpu_s, 1)
        # ranking agreement: same top-10 per query row (the reference
        # accumulates in fp16, ours fp32 — near-ties may swap, so
        # compare set overlap rather than exact order)
        top_t = np.argsort(out_tpu, axis=1)[:, :10]
        top_r = np.argsort(out_ref, axis=1)[:, :10]
        overlap = np.mean([len(set(a) & set(b)) / 10.0
                           for a, b in zip(top_t, top_r)])
        result["top10_overlap"] = round(float(overlap), 4)

    print(json.dumps(result))


if __name__ == "__main__":
    main()
