"""Break down _fast_step internals: C++ group decode vs python glue.

    python tools/profile_fast_step.py [B] [iters]
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
    np.asarray(jnp.zeros(4) + 1)

    from esp32_opus_player_tpu.models.stream_pool import StreamPool
    src = "tests/fixtures/celt_fb_mono_20ms.opus"
    pool = StreamPool([src] * B, channels=1, native=True,
                      fixed_buckets=True, output="device", device_keep=2)
    pool.warmup()

    t_acc = {"gdecode": 0.0, "emit": 0.0, "launch": 0.0, "book": 0.0,
             "posgather": 0.0}
    (kind, g), = [(e[0], e[1]) for e in pool._groups]
    orig_dec = g.decode
    orig_emit = pool._emit_celt_fast
    orig_launch = pool._celt_launch_T

    def dec(*a, **k):
        t0 = time.perf_counter()
        r = orig_dec(*a, **k)
        t_acc["gdecode"] += time.perf_counter() - t0
        return r

    def emit(*a, **k):
        t0 = time.perf_counter()
        r = orig_emit(*a, **k)
        t_acc["emit"] += time.perf_counter() - t0
        return r

    def launch(*a, **k):
        t0 = time.perf_counter()
        r = orig_launch(*a, **k)
        t_acc["launch"] += time.perf_counter() - t0
        return r

    g.decode = dec
    pool._emit_celt_fast = emit
    pool._celt_launch_T = launch

    # also time the bookkeeping tail by re-wrapping _fast_step wholesale
    orig_fast = pool._fast_step

    def fast(*a, **k):
        t0 = time.perf_counter()
        r = orig_fast(*a, **k)
        dt = time.perf_counter() - t0
        t_acc["book"] += dt
        return r

    pool._fast_step = fast

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
    print(f"B={B} n={n} total {total:.1f} ms/step")
    fs = t_acc["book"] / n * 1000
    gd = t_acc["gdecode"] / n * 1000
    em = (t_acc["emit"] - t_acc["launch"]) / n * 1000
    la = t_acc["launch"] / n * 1000
    print(f"  fast_step total   {fs:7.2f} ms")
    print(f"    g.decode (C++)  {gd:7.2f} ms")
    print(f"    emit (numpy)    {em:7.2f} ms")
    print(f"    launch/stage    {la:7.2f} ms")
    print(f"    bookkeeping     {fs - gd - em - la:7.2f} ms")
    print(f"  outside fast      {total - fs:7.2f} ms")


if __name__ == "__main__":
    main()
