import os
os.environ['XLA_FLAGS'] = os.environ.get('XLA_FLAGS','') + ' --xla_force_host_platform_device_count=8'
import jax
jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_enable_x64', True)
from pathlib import Path
jax.config.update('jax_compilation_cache_dir', str(Path.home()/'.cache'/'heston_tpu_xla_tests'))
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)
import sys
sys.path.insert(0, 'tests')
from heston_tpu.config import HestonParams
import test_precision as tp
p = HestonParams()
for tag in sorted(tp.ARM_BUDGETS):
    try:
        r = tp._arm_rmse(p, tag)
        print(f"{tag} {r:.3e}", flush=True)
    except Exception as e:
        print(f"{tag} FAILED {type(e).__name__}: {e}"[:200], flush=True)
