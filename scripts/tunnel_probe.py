"""Tunnel/chip health probe: a BYTE-STABLE trivial program.

Measures what the serving numbers ride on: the per-dispatch roundtrip of
the tunneled backend, isolated from any hypervla program. Because this
file never changes, its compiled program bytes are identical across
rounds, so the backend's server-side program cache keeps its first
execution cheap even on days when FRESH programs pay a multi-minute
server-side load (measured 2026-08-21: a new 512x512 matmul's first
fetch took 257 s while the byte-identical re-run took 0.57 s, and
steady-state roundtrips were 35-60 ms vs the healthy ~1 ms).

Prints ONE JSON line:
  {"first_fetch_s": N, "roundtrip_ms_median": N, "roundtrip_ms_best": N,
   "fetch512k_ms_median": N}

roundtrip_* fetches a SCALAR (pure dispatch+latency; comparable to the
serving headline, whose action fetch is 28 bytes); fetch512k_* fetches
the full 512x512 bf16 product (transfer bandwidth; the first probe
version fetched this for the latency number and read 37 ms "roundtrips"
while the headline stepped at 1 ms — bandwidth, not latency).

DO NOT EDIT the probe computation: byte-stability across rounds is the
point (the server cache is keyed on program bytes).
"""
import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    x = jnp.ones((512, 512), jnp.bfloat16)

    @jax.jit
    def f(x):
        y = x @ x
        return jnp.float32(jnp.sum(y)), y

    s, y = f(x)
    t0 = time.perf_counter()
    np.asarray(s)
    first_fetch_s = time.perf_counter() - t0

    lat, bw = [], []
    for _ in range(10):
        t0 = time.perf_counter()
        s, y = f(x)
        np.asarray(s)
        lat.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        np.asarray(y)
        bw.append(time.perf_counter() - t0)
    print(json.dumps({
        "first_fetch_s": round(first_fetch_s, 3),
        "roundtrip_ms_median": round(1000.0 * float(np.median(lat)), 3),
        "roundtrip_ms_best": round(1000.0 * float(np.min(lat)), 3),
        "fetch512k_ms_median": round(1000.0 * float(np.median(bw)), 3),
    }))


if __name__ == "__main__":
    main()
