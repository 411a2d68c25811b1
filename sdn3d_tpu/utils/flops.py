"""XLA cost-analysis FLOP/byte accounting + MFU for benched programs.

The reference measured nothing (SURVEY.md §6); the rebuild's perf claims
therefore have to carry their own accounting.  This module turns an
AOT-compiled XLA executable plus a measured steady-state time into
{flops, bytes, achieved TFLOP/s, %-of-peak (MFU), achieved GB/s,
%-of-HBM-peak} so every artifact row can say where the program sits on
the roofline (VERDICT r4 "What's missing" #3).

Caveats baked into the numbers:
  - `cost_analysis()` counts XLA HLO flops.  Pallas kernels are opaque
    customs calls — their flops count as 0 here.  The raster kernels'
    own roofline is measured separately (scripts/prof_roofline.py,
    NOTES_ROUND2); programs dominated by Pallas calls (derenderer
    train, geo.render) therefore carry an `mfu_note`.
  - f32 rows are reported against the same bf16 MXU peak: TPU v5e has
    no native f32 matmul path, XLA emulates it over the bf16 MXU with
    multi-pass accumulation, so bf16-peak is the one hardware ceiling
    both dtypes share.
  - 'bytes accessed' is LOGICAL HLO traffic — operands and results of
    every HLO op, as if none fused.  XLA's fusion keeps most
    intermediates on-chip, so pct_peak_hbm is an upper bound on real
    HBM pressure and can exceed 100% (measured 400% on the render
    bench); treat pct_peak_flops as the hard utilization floor and
    pct_peak_hbm as 'how much fusion is doing', not a bandwidth
    measurement.
"""

from __future__ import annotations

from typing import Any

# device_kind -> (dense bf16 peak FLOP/s, HBM bytes/s) per chip.
# Public numbers: v4 275 TF / 1228 GB/s, v5e 197 TF / 819 GB/s,
# v5p 459 TF / 2765 GB/s, v6e 918 TF / 1640 GB/s.
PEAKS = {
    "TPU v4": (275e12, 1228e9),
    "TPU v5 lite": (197e12, 819e9),
    "TPU v5e": (197e12, 819e9),
    "TPU v5": (459e12, 2765e9),
    "TPU v5p": (459e12, 2765e9),
    "TPU v6 lite": (918e12, 1640e9),
    "TPU v6e": (918e12, 1640e9),
}


def device_peaks(device=None) -> tuple[float, float] | None:
    """(peak FLOP/s, peak HBM B/s) for `device` (default: first jax
    device), or None when unknown (CPU, forced-CPU tests)."""
    import jax

    if device is None:
        devs = jax.devices()
        if not devs:
            return None
        device = devs[0]
    kind = getattr(device, "device_kind", "")
    for k, v in PEAKS.items():
        if kind.startswith(k):
            return v
    return None


def compiled_costs(compiled) -> dict[str, float]:
    """{'flops', 'bytes'} from an AOT-compiled executable's XLA cost
    analysis (jit(f).lower(*args).compile()).  Returns zeros when the
    backend reports no analysis."""
    try:
        ca = compiled.cost_analysis()
    except Exception:
        return {"flops": 0.0, "bytes": 0.0}
    if isinstance(ca, (list, tuple)):
        ca = ca[0] if ca else {}
    if not isinstance(ca, dict):
        return {"flops": 0.0, "bytes": 0.0}
    return {"flops": float(ca.get("flops", 0.0)),
            "bytes": float(ca.get("bytes accessed", 0.0))}


def mfu_row(flops: float, bytes_: float, seconds: float,
            device=None) -> dict[str, Any]:
    """Roofline row for a program that ran in `seconds` (hardware time,
    one chip).  Percentages are against the chip's dense-bf16 /
    HBM peaks; 'bound' names the higher-utilization resource."""
    row: dict[str, Any] = {
        "flops": flops,
        "hlo_bytes_accessed": bytes_,
    }
    if seconds and seconds > 0:
        row["tflops_per_s"] = round(flops / seconds / 1e12, 3)
    peaks = device_peaks(device)
    if peaks and seconds and seconds > 0:
        pf, pb = peaks
        row["pct_peak_flops"] = round(100.0 * flops / seconds / pf, 2)
        # logical-bytes bound: >100% means fusion kept intermediates
        # on-chip (see module docstring), not a bandwidth violation
        row["pct_peak_hbm_upper_bound"] = round(
            100.0 * bytes_ / seconds / pb, 2)
        row["bound"] = ("mxu" if row["pct_peak_flops"] >=
                        min(row["pct_peak_hbm_upper_bound"], 100.0)
                        else "hbm<=")
    return row
