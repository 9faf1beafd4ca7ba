import jax
jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_enable_x64', True)
from heston_tpu import benchmarks
rows = benchmarks.run_convergence_study(
    m2_values=(15, 25, 50, 75, 100, 125, 150), n_steps=200,
    csv_path='benchmarks/convergence_grid.csv')
G = 8.8943383103218502
for r in rows:
    print(r['m2'], r['price'], abs(r['price'] - G), r['runtime_s'], flush=True)
