"""On-chip quickshift benchmark: Pallas VMEM window-scan vs XLA chunk-scan.

VERDICT r4 item 3: the Pallas quickshift kernel (ops/quickshift_pallas.py)
was built and parity-tested in interpret mode but never measured on real
hardware. This tool times BOTH cores at 1024^2 / 2048^2 / 4096^2 on the
attached TPU, reports wall clocks + label agreement (the on-hardware parity
signal the advisor asked for: a real-TPU divergence beyond tie-flip levels
fails loudly here), and prints a JSON summary for BASELINE.md.

Usage: python tools/bench_quickshift.py [sizes...]   (default 1024 2048 4096)
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np  # noqa: E402


def _labels(img, use_pallas: bool):
    os.environ["OBIA_QS_PALLAS"] = "1" if use_pallas else "0"
    from obia_tpu.ops.quickshift import quickshift
    return quickshift(img, ratio=1.0, kernel_size=5.0, max_dist=10.0)


def _timed(fn, runs=3):
    t0 = time.time()
    out = fn()
    first = time.time() - t0
    best = first
    for _ in range(runs - 1):
        t0 = time.time()
        out = fn()
        best = min(best, time.time() - t0)
    return out, best, first


def main():
    sizes = [int(a) for a in sys.argv[1:]] or [1024, 2048, 4096]
    from bench import build_scene
    rows = []
    for size in sizes:
        img = build_scene(h=size, w=size)
        mp = size * size / 1e6

        lab_x, t_xla, f_xla = _timed(lambda: _labels(img, False))
        lab_p, t_pal, f_pal = _timed(lambda: _labels(img, True))

        # on-hardware parity: tie-flips on density plateaus move a tiny
        # fraction of pixels; anything past 0.5% is a real numerics bug.
        # Compare PARTITIONS, not raw ids — labels are compacted in
        # raster order, so one early tie-flip renumbers every later
        # object (raw equality read 13.6% at 4096^2 while object counts
        # differed by ONE): map each x-label to its majority p-label by
        # pair counting and measure the pixels the mapping explains.
        pair = lab_x.astype(np.int64) * (lab_p.max() + 1) + lab_p
        uniq, cnt = np.unique(pair.reshape(-1), return_counts=True)
        ux = uniq // (lab_p.max() + 1)
        order = np.argsort(cnt)  # ascending: last write per x wins = mode
        best = np.zeros(lab_x.max() + 1, np.int64)
        best[ux[order]] = cnt[order]
        agree = float(best.sum() / lab_x.size)
        row = {
            "size": size, "mp": round(mp, 2),
            "xla_s": round(t_xla, 3), "xla_first_s": round(f_xla, 1),
            "pallas_s": round(t_pal, 3), "pallas_first_s": round(f_pal, 1),
            "speedup": round(t_xla / t_pal, 2),
            "pallas_mp_s": round(mp / t_pal, 3),
            "n_objects_xla": int(lab_x.max()) + 1,
            "n_objects_pallas": int(lab_p.max()) + 1,
            "label_agreement": round(agree, 5),
        }
        rows.append(row)
        print(json.dumps(row), flush=True)
        assert agree >= 0.995, (
            f"on-hardware Pallas quickshift diverged: agreement {agree:.4f}"
            f" at {size}^2 — real numerics bug, not tie flips")
    print(json.dumps({"quickshift_bench": rows}))


if __name__ == "__main__":
    main()
