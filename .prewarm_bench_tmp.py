import time
import jax.numpy as jnp
import bench
from heston_tpu.config import GridSpec, HestonParams
from heston_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
p = HestonParams(); spec = GridSpec(m1=50, m2=25)
dtype = jnp.float32
for name, fn in [
    ("schemes", lambda: bench._scheme_timings(spec, p, 500, dtype)),
    ("lm", lambda: bench._lm_timing(spec, p, dtype)),
    ("lm_multi", lambda: bench._lm_multi_timing(spec, p, dtype)),
    ("book_risk", lambda: bench._book_risk(spec, p, 500, dtype)),
    ("mixed5000", lambda: bench._throughput_mixed(spec, p, dtype)),
    ("cpu_arm", lambda: bench._cpu_arm(spec, p, 500, 0.001)),
]:
    t0 = time.time()
    try:
        fn()
        print(f"PREWARM {name} ok {time.time()-t0:.1f}s", flush=True)
    except Exception as e:
        print(f"PREWARM {name} FAILED {type(e).__name__}: {e}", flush=True)
