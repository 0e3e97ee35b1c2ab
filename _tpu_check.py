import time, jax, jax.numpy as jnp, numpy as np
x = jnp.asarray(np.random.RandomState(3).randn(779, 557).astype(np.float32))
t0 = time.perf_counter()
f = jax.jit(lambda a: jnp.tanh(a @ a.T).sum())
v = float(f(x))
print("tiny_compile_s", round(time.perf_counter() - t0, 2))
