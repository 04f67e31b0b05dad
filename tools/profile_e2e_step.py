"""Phase breakdown of a full StreamPool.step() on the real TPU.

Wraps the pool's phases (host symbol via _fast_step, staging pack,
dispatch, route/bookkeeping) with wall timers to locate the e2e gap
between host-symbol cost and the measured step time. Run standalone:

    python tools/profile_e2e_step.py [B] [iters]
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    import jax
    import jax.numpy as jnp
    np.asarray(jnp.zeros(4) + 1)   # sync mode

    from esp32_opus_player_tpu.models.stream_pool import StreamPool
    src = "tests/fixtures/celt_fb_mono_20ms.opus"
    pool = StreamPool([src] * B, channels=1, native=True,
                      fixed_buckets=True, output="device", device_keep=2)
    pool.warmup()

    # monkey-patch phase timers
    t_acc = {"fast": 0.0, "stage": 0.0, "dispatch": 0.0, "flush": 0.0}
    orig_fast = pool._fast_step
    orig_stage = pool._stage_celt_T
    orig_launch = pool._celt_launch_T
    orig_flush = pool._flush

    def fast(*a, **k):
        t0 = time.perf_counter()
        r = orig_fast(*a, **k)
        t_acc["fast"] += time.perf_counter() - t0
        return r

    def stage(*a, **k):
        t0 = time.perf_counter()
        r = orig_stage(*a, **k)
        t_acc["stage"] += time.perf_counter() - t0
        return r

    def launch(*a, **k):
        t0 = time.perf_counter()
        r = orig_launch(*a, **k)
        t_acc["dispatch"] += time.perf_counter() - t0
        t_acc["stage"] -= 0.0
        return r

    def flush(*a, **k):
        t0 = time.perf_counter()
        r = orig_flush(*a, **k)
        t_acc["flush"] += time.perf_counter() - t0
        return r

    pool._fast_step = fast
    pool._stage_celt_T = stage
    pool._celt_launch_T = launch
    pool._flush = flush

    for _ in range(4):
        pool.step()
    pool.sync()
    for k in t_acc:
        t_acc[k] = 0.0
    t0 = time.time()
    n = 0
    for _ in range(iters):
        if not pool.step():
            break
        n += 1
    pool.sync()
    total = (time.time() - t0) / n * 1000
    print(f"B={B} n={n} total {total:.1f} ms/step "
          f"-> {B * 0.02 / (total / 1000):.0f} streams")
    for k, v in t_acc.items():
        print(f"  {k:10s} {v / n * 1000:7.2f} ms")
    other = total - sum(t_acc.values()) / n * 1000
    print(f"  {'other':10s} {other:7.2f} ms  (route loops, meta, gil)")


if __name__ == "__main__":
    main()
