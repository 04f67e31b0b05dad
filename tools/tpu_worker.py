"""Persistent TPU job worker for this dev rig's tunneled device.

The axon tunnel pays a multi-minute session-priming cost per process
(journal replay + synchronized-mode switch). This worker pays it ONCE
and then executes submitted python snippets in a persistent namespace,
so kernel iteration/benchmarks don't re-pay the setup.

Protocol (file-based, no deps):
    WORKDIR=/tmp/tpuw
    submit:  write <id>.py into WORKDIR/jobs/
    result:  worker execs it (shared globals `G`), stdout+stderr and
             traceback captured to WORKDIR/out/<id>.txt, then touches
             WORKDIR/out/<id>.done
    ready:   WORKDIR/ready exists after priming
Run: python -u tools/tpu_worker.py [workdir]
"""
import io
import os
import sys
import time
import traceback

WORKDIR = sys.argv[1] if len(sys.argv) > 1 else "/tmp/tpuw"


def main():
    jobs = os.path.join(WORKDIR, "jobs")
    out = os.path.join(WORKDIR, "out")
    os.makedirs(jobs, exist_ok=True)
    os.makedirs(out, exist_ok=True)
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))

    import numpy as np
    import jax
    import jax.numpy as jnp
    t0 = time.time()
    np.asarray(jnp.zeros(4) + 1)   # priming read -> synchronized mode
    with open(os.path.join(WORKDIR, "ready"), "w") as f:
        f.write(f"primed in {time.time() - t0:.1f}s; "
                f"backend={jax.default_backend()}\n")
    print(f"ready ({time.time() - t0:.1f}s)", flush=True)

    G = {"np": np, "jax": jax, "jnp": jnp, "time": time}
    done = set()
    while True:
        pending = sorted(f for f in os.listdir(jobs)
                         if f.endswith(".py") and f not in done)
        for name in pending:
            jid = name[:-3]
            done.add(name)
            buf = io.StringIO()
            old_out, old_err = sys.stdout, sys.stderr
            sys.stdout = sys.stderr = buf
            try:
                with open(os.path.join(jobs, name)) as f:
                    src = f.read()
                exec(compile(src, name, "exec"), G)
            except BaseException:
                traceback.print_exc()
            finally:
                sys.stdout, sys.stderr = old_out, old_err
            with open(os.path.join(out, jid + ".txt"), "w") as f:
                f.write(buf.getvalue())
            with open(os.path.join(out, jid + ".done"), "w") as f:
                f.write("")
            print(f"job {jid} done", flush=True)
        if pending and os.path.exists(os.path.join(jobs, "QUIT")):
            break
        time.sleep(0.5)


if __name__ == "__main__":
    main()
