"""Multi-process decode farm: the DCN / multi-host stand-in.

``ProcFarm`` drives N WORKER PROCESSES from one coordinator. Each
worker owns a full decode pipeline (its own ``StreamPool`` — native
C++ symbol phase, device synthesis, PLC/FEC routing) over the streams
assigned to it; the coordinator's control plane carries only

  * the stream assignment (once, at spawn),
  * per-step global loss / FEC sets (split per worker),
  * compact results (PCM or final ranges) on collect.

This is the process topology of a production transcode farm
(BASELINE config 5: v5e-16, one host process per chip group, a thin
coordinator over DCN): on this rig the transport is an OS pipe and the
workers share one machine, but the protocol — assignment, per-step
control fan-out, result gather, no shared memory — is the multi-host
one. The reference player is a single-chip device with no analog
subsystem; SURVEY §2.7's "collective/communication backend" row is the
requirement this fills at the process level (the in-process analogs
are ``ShardedStreamPool`` for one-program multi-chip and ``PoolFarm``
for pool-per-device).

Workers force their JAX platform BEFORE importing jax (a spawned child
would otherwise grab this rig's single tunneled TPU out from under the
parent — exactly the double-process hazard the tunnel forbids); the
coordinator passes its own backend by default, so a CPU-backed test
farm spawns CPU-backed workers.
"""
from __future__ import annotations

import multiprocessing as mp
import os

import numpy as np

__all__ = ["ProcFarm"]


def _set_platform(platform: str):
    """Pin the worker's JAX platform BEFORE first jax import."""
    os.environ["JAX_PLATFORMS"] = platform
    if platform == "cpu":
        # match the coordinator's virtual-device setup if any
        os.environ.setdefault("XLA_FLAGS", "")
    import jax

    jax.config.update("jax_platforms", platform)


def serve_pool(conn, pool):
    """Serve the farm command loop over any conn with send()/recv().

    Protocol (coordinator -> worker):
      ("step", lost_set, fec_set) -> ("ok", any_active: bool)
      ("collect",)                -> ("ok", [pcm per local stream])
      ("ranges",)                 -> ("ok", [final_range per stream])
      ("stats",)                  -> ("ok", stats dict)
      ("stop",)                   -> ("ok", None), then exit
    Any exception is reported as ("err", repr) and the loop continues
    (the coordinator decides whether to tear down).
    """
    while True:
        msg = conn.recv()
        cmd = msg[0]
        try:
            if cmd == "step":
                conn.send(("ok", pool.step(msg[1], msg[2])))
            elif cmd == "positions":
                conn.send(("ok", [(int(pool.positions[i]),
                                   len(pool.streams[i].jobs))
                                  for i in range(pool.n)]))
            elif cmd == "collect":
                out = [np.concatenate(p) if p else
                       np.zeros((0, pool.channels), dtype=np.int16)
                       for p in pool.pcm_out]
                conn.send(("ok", out))
            elif cmd == "ranges":
                conn.send(("ok", pool.final_ranges()))
            elif cmd == "stats":
                conn.send(("ok", pool.stats()))
            elif cmd == "stop":
                conn.send(("ok", None))
                return
            else:
                conn.send(("err", f"unknown command {cmd!r}"))
        except Exception as e:  # report, keep serving
            conn.send(("err", repr(e)))


def _worker_main(conn, sources, pool_kw, platform: str):
    """Pipe-worker process entry: build the pool, serve the loop."""
    _set_platform(platform)
    from ..models.stream_pool import StreamPool

    serve_pool(conn, StreamPool(sources, **pool_kw))


class _FarmBase:
    """Coordinator control plane shared by the pipe farm (``ProcFarm``)
    and the TCP farm (``NetFarm``): round-robin stream assignment,
    per-step loss/FEC fan-out, result gather. Subclasses fill
    self._conns (objects with send/recv/close) and self._procs."""

    def _assign(self, sources, n_workers: int):
        n_workers = max(1, min(n_workers, len(sources) or 1))
        self._shard_sources = [[] for _ in range(n_workers)]
        self.placement = []      # global idx -> (worker, slot)
        for g, src in enumerate(sources):
            w = g % n_workers
            self.placement.append((w, len(self._shard_sources[w])))
            self._shard_sources[w].append(src)
        return n_workers

    @property
    def n(self) -> int:
        return len(self.placement)

    @property
    def n_workers(self) -> int:
        # count connections, not local processes: a NetFarm worker on
        # another host has a conn here but no process
        return len(self._conns)

    # ------------------------------------------------------------------
    def _split(self, idx_set):
        per = [set() for _ in self._conns]
        for g in idx_set or ():
            if 0 <= g < len(self.placement):
                w, slot = self.placement[g]
                per[w].add(slot)
        return per

    def _gather(self):
        """Receive one reply from every worker, raising on any error."""
        outs = []
        for w, conn in enumerate(self._conns):
            status, val = conn.recv()
            if status != "ok":
                raise RuntimeError(f"worker {w}: {val}")
            outs.append(val)
        return outs

    def step(self, lost=None, fec=None) -> bool:
        """One frame on every active stream, all workers in parallel
        (commands fan out first, replies gather after — the workers'
        host+device phases genuinely overlap across processes)."""
        lost_per = self._split(lost)
        fec_per = self._split(fec)
        for conn, lo, fe in zip(self._conns, lost_per, fec_per):
            conn.send(("step", lo, fe))
        return any(self._gather())

    def run(self, loss=None, fec=False):
        """Decode everything; PCM per global stream index. loss:
        callable (global_idx, packet_idx) -> bool, like PoolFarm.run."""
        while True:
            lost, fec_set = set(), set()
            if loss is not None:
                for conn in self._conns:
                    conn.send(("positions",))
                pos = self._gather()
                for g, (w, slot) in enumerate(self.placement):
                    k, npk = pos[w][slot]
                    if k >= npk or not loss(g, k):
                        continue
                    lost.add(g)
                    if fec and k + 1 < npk and not loss(g, k + 1):
                        fec_set.add(g)
            if not self.step(lost, fec_set):
                break
        return self.collect()

    def collect(self):
        for conn in self._conns:
            conn.send(("collect",))
        per = self._gather()
        return [per[w][slot] for w, slot in self.placement]

    def final_ranges(self):
        for conn in self._conns:
            conn.send(("ranges",))
        per = self._gather()
        return [per[w][slot] for w, slot in self.placement]

    def stats(self):
        for conn in self._conns:
            conn.send(("stats",))
        return self._gather()

    def close(self):
        # conns and procs can differ in count (NetFarm with external
        # workers): stop every peer, then reap the local processes
        for conn in self._conns:
            try:
                conn.send(("stop",))
                conn.recv()
            except (BrokenPipeError, EOFError, OSError):
                pass
            conn.close()
        for p in self._procs:
            p.join(timeout=10)
            if p.is_alive():
                p.terminate()
        self._conns, self._procs = [], []

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


class ProcFarm(_FarmBase):
    """Coordinator for a farm of worker processes over OS pipes
    (round-robin stream assignment), API-compatible with
    ``PoolFarm.step/run/collect``."""

    def __init__(self, sources, n_workers: int = 2, platform=None,
                 **pool_kw):
        if platform is None:
            import jax
            platform = jax.default_backend()
        self.channels = pool_kw.get("channels", 1)
        n_workers = self._assign(sources, n_workers)
        ctx = mp.get_context("spawn")   # clean JAX in every child
        self._conns, self._procs = [], []
        for w in range(n_workers):
            parent, child = ctx.Pipe()
            p = ctx.Process(target=_worker_main,
                            args=(child, self._shard_sources[w],
                                  pool_kw, platform),
                            daemon=True)
            p.start()
            child.close()
            self._conns.append(parent)
            self._procs.append(p)
