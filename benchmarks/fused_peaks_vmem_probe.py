"""Scoped-vmem probe for the fused-peaks kernel's plane_block auto-sizer.

The v5e enforces a 16 MB scoped-vmem limit per program that the CPU
Pallas interpreter (what the tests run) never checks, so an over-sized
``plane_block`` only fails on real hardware. This probe compiles
``_fused_peak_candidates`` at a ladder of plane_block values for a given
field shape and reports which fit — the calibration behind the padded-dim
formula in ``find_peaks_fused`` (ops/fused_peaks.py).

Measured 2026-08-20 on v5e (this probe):

- (36, 14, 14) heat, band_rows 16: pb=13 -> 42.08M FAIL, pb=8 -> 25.83M
  FAIL, pb=6 -> 19.30M FAIL, pb<=4 OK  (~3.27M per plane)
- (38, 46, 81) heat, band_rows 32: pb=3 -> 16.32M FAIL (just over),
  pb<=2 OK                              (~5.44M per plane)

Both shapes land on ~266 live f32 values per padded (sublane x lane)
unit of the (band_rows + 2)-row slab — lanes pad to 128 whatever w is,
which is exactly what the r4 formula (divide by raw w) missed.

Usage: python benchmarks/fused_peaks_vmem_probe.py [M H W [band_rows]]
"""

import sys

import numpy as np


def probe(m, h, w, band_rows=None, blocks=(13, 8, 6, 4, 3, 2, 1)):
    import jax
    import jax.numpy as jnp

    from terran_tpu.ops.fused_peaks import _fused_peak_candidates

    if band_rows is None:
        band_rows = min(32, -(-h // 8) * 8)
    planes = jnp.asarray(
        np.random.default_rng(0).random((m, h, w)).astype(np.float32)
    )
    results = {}
    for pb in blocks:
        if pb > m:
            continue
        try:
            out = _fused_peak_candidates(
                planes, 0.1, 10, 8, band_rows, pb, False
            )
            jax.block_until_ready(out)
            results[pb] = "OK"
            print(f"pb={pb}: OK", flush=True)
        except Exception as exc:  # noqa: BLE001 - report and continue
            msg = str(exc)
            i = msg.find("Scoped allocation")
            detail = msg[i:i + 80] if i >= 0 else msg[:120]
            results[pb] = detail
            print(f"pb={pb}: FAIL {detail}", flush=True)
    return results


if __name__ == "__main__":
    args = [int(a) for a in sys.argv[1:]]
    if args and len(args) < 3:
        sys.exit("usage: fused_peaks_vmem_probe.py [M H W [band_rows]] "
                 "— give all three of M H W or none")
    m, h, w = args[:3] if args else (36, 14, 14)
    band = args[3] if len(args) > 3 else None
    probe(m, h, w, band)
