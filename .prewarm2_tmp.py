import time
import jax.numpy as jnp
import bench
from heston_tpu.config import GridSpec, HestonParams
from heston_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
p = HestonParams(); spec = GridSpec(m1=50, m2=25)
t0=time.time()
try:
    bench._lm_multi_timing(spec, p, jnp.float32)
    print(f"PREWARM lm_multi ok {time.time()-t0:.1f}s", flush=True)
except Exception as e:
    print(f"PREWARM lm_multi FAILED {type(e).__name__}: {e}"[:400], flush=True)
for name, fn in [
    ("mixed5000", lambda: bench._throughput_mixed(spec, p, jnp.float32)),
    ("cpu_arm", lambda: bench._cpu_arm(spec, p, 500, 0.001)),
]:
    t0=time.time()
    try:
        fn(); print(f"PREWARM {name} ok {time.time()-t0:.1f}s", flush=True)
    except Exception as e:
        print(f"PREWARM {name} FAILED {type(e).__name__}: {e}"[:400], flush=True)
