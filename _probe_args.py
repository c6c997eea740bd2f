# Probe: is per-call latency dominated by pytree-arg dispatch overhead?
import time, jax, numpy as np, jax.numpy as jnp

def bench(fn, *args, n=200):
    out = fn(*args); jax.block_until_ready(out)
    t0=time.perf_counter()
    for _ in range(n): out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter()-t0)/n*1000

# trivial compute, varying number of input arrays
for n_args in [1, 50, 200, 400]:
    arrs = [jax.device_put(np.ones((16,16), np.float32)) for _ in range(n_args)]
    f = jax.jit(lambda xs: xs[0].sum())
    print(f"{n_args:4d} args: {bench(f, arrs):7.3f} ms")

# one big arg (86M floats) + trivial compute
big = jax.device_put(np.ones((86*1024*1024//4,), np.float32))
f2 = jax.jit(lambda x: x[0])
print("1 big arg:", bench(f2, big), "ms")
