"""Calibration checkpoint / resume.

The reference has no checkpointing — its closest analog is the final CSV
export (SURVEY.md §5). Long multi-chain production calibrations want crash
recovery, so the LM driver can persist its full state (parameters, damping,
iteration count, history) after every iteration and resume mid-run.
Plain JSON (atomic tmp-file rename); no external services.
"""

from __future__ import annotations

import dataclasses
import json
from pathlib import Path
from typing import Optional

import numpy as np

from heston_tpu.config import HestonParams


@dataclasses.dataclass
class LMState:
    """Resumable Levenberg-Marquardt state."""

    theta_vec: np.ndarray        # (5,) current parameters
    lam: float                   # damping
    iteration: int
    final_error: float
    converged: bool
    history: list

    def save(self, path) -> Path:
        path = Path(path)
        payload = dict(
            theta_vec=self.theta_vec.tolist(),
            lam=self.lam,
            iteration=self.iteration,
            final_error=self.final_error,
            converged=self.converged,
            history=self.history,
        )
        tmp = path.with_suffix(".tmp")
        tmp.write_text(json.dumps(payload))
        tmp.replace(path)           # atomic on POSIX
        return path

    @classmethod
    def load(cls, path) -> "LMState":
        d = json.loads(Path(path).read_text())
        return cls(
            theta_vec=np.asarray(d["theta_vec"], dtype=np.float64),
            lam=float(d["lam"]),
            iteration=int(d["iteration"]),
            final_error=float(d["final_error"]),
            converged=bool(d["converged"]),
            history=d["history"],
        )

    @classmethod
    def fresh(cls, init: HestonParams, lam: float) -> "LMState":
        return cls(theta_vec=np.array(init.bumpable()), lam=lam,
                   iteration=0, final_error=float("inf"), converged=False,
                   history=[])

    def maybe_resume(self, path: Optional[str]) -> "LMState":
        """Return the stored state if `path` exists, else self."""
        if path and Path(path).exists():
            return self.load(path)
        return self
