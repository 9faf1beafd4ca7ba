import dataclasses, time
import jax, jax.numpy as jnp, numpy as np
import bench
from heston_tpu.config import GOLDEN_DIVIDENDS, GridSpec, HestonParams, SolverConfig
from heston_tpu.pallas import fused_do
from heston_tpu.utils.cache import enable_compilation_cache
from heston_tpu.utils import roofline
enable_compilation_cache()
p = HestonParams(); spec = GridSpec(m1=50, m2=25)
base = SolverConfig(n_steps=20, theta=0.8, maturity=1.0, a2_variant="upwind", solver_engine="pallas")
ks = jnp.linspace(70.0, 130.0, 500, dtype=jnp.float32)
sol = dataclasses.replace(base, scheme="hv")
fn = lambda k: fused_do.fused_price_batch(spec, sol, k, 100.0, p.kappa, p.eta, p.sigma, p.rho, p.v0, p.r_d, p.r_f, american=True, dividends=GOLDEN_DIVIDENDS)
v = np.array(jax.jit(fn)(ks)); assert np.all(np.isfinite(v))
t = bench._device_time_per_call(fn, ks, reps=200)
dk = jax.devices()[0].device_kind
bench.emit({"batch500_hv_amer_div_s": t,
            "batch500_hv_pct_vpu_peak": roofline.report("x", t,
                roofline.batch_launch_flops(500, 50, 25, 20, "hv", True, 4),
                roofline.launch_hbm_bytes(500), dk)["x_pct_vpu_peak"]})
bench._lm_multi_timing(spec, p, jnp.float32)
print("stragglers done", flush=True)
