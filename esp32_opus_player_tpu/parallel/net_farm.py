"""TCP decode farm: the multi-HOST ingest path (DCN stand-in).

``NetFarm`` is the ``ProcFarm`` coordinator over TCP sockets instead
of OS pipes: workers CONNECT to the coordinator's listen address, get
their stream assignment in an init handshake, then serve the same
command protocol (``proc_farm.serve_pool``). Because the transport is
a real network socket, workers can live on OTHER machines — start one
per host with

    python -m esp32_opus_player_tpu.parallel.net_farm HOST:PORT

and build the coordinator with ``spawn_local=0`` and the matching
``listen`` address; on a single machine ``spawn_local=N`` spawns N
local worker processes that connect over loopback TCP, exercising the
identical wire path end to end (length-prefixed pickle frames — the
control plane a production v5e-16 transcode farm runs over DCN,
BASELINE config 5; see proc_farm.py for the protocol and the
reference-mapping notes).

The reference player has no analog subsystem (single chip, SD-card
byte source, SURVEY §2.7) — this is the framework's own scale story.
"""
from __future__ import annotations

import multiprocessing as mp
import pickle
import socket
import struct
import sys

__all__ = ["NetFarm", "FramedSocket", "run_worker"]

_MAGIC = b"OTPU"


class FramedSocket:
    """Length-prefixed pickle frames over a stream socket — the same
    send()/recv() surface as a multiprocessing Pipe connection, so the
    farm protocol code is transport-agnostic."""

    def __init__(self, sock: socket.socket):
        self._s = sock
        sock.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)

    def send(self, obj):
        payload = pickle.dumps(obj, protocol=pickle.HIGHEST_PROTOCOL)
        self._s.sendall(struct.pack(">I", len(payload)) + payload)

    def _recv_exact(self, n: int) -> bytes:
        buf = bytearray()
        while len(buf) < n:
            chunk = self._s.recv(n - len(buf))
            if not chunk:
                raise EOFError("farm peer closed the connection")
            buf += chunk
        return bytes(buf)

    def recv(self):
        (n,) = struct.unpack(">I", self._recv_exact(4))
        return pickle.loads(self._recv_exact(n))

    def close(self):
        try:
            self._s.shutdown(socket.SHUT_RDWR)
        except OSError:
            pass
        self._s.close()


def run_worker(addr):
    """Worker main: connect to the coordinator, handshake, serve.

    addr: (host, port). The init frame carries the worker's stream
    assignment, pool kwargs and JAX platform; the worker pins its
    platform BEFORE importing jax (same single-TPU-tunnel hazard as
    the pipe farm) and then serves the standard command loop."""
    from .proc_farm import _set_platform, serve_pool

    s = socket.create_connection(addr)
    conn = FramedSocket(s)
    conn.send((_MAGIC, "hello"))
    cmd, sources, pool_kw, platform = conn.recv()
    if cmd != "init":
        raise RuntimeError(f"expected init, got {cmd!r}")
    _set_platform(platform)
    from ..models.stream_pool import StreamPool

    conn.send(("ok", len(sources)))
    serve_pool(conn, StreamPool(sources, **pool_kw))
    conn.close()


def _local_worker(addr):
    run_worker(addr)


from .proc_farm import _FarmBase  # noqa: E402  (after helpers)


class NetFarm(_FarmBase):
    """Coordinator for a farm of TCP-connected workers. Same public
    API as ProcFarm/PoolFarm (step/run/collect/final_ranges/stats).

    listen: (host, port) to bind — port 0 picks a free port (the bound
    address is ``self.address``, pass it to remote workers).
    spawn_local: number of local worker processes to spawn and connect
    over loopback (the single-machine demonstration mode); with
    spawn_local=0 the coordinator waits for n_workers external workers
    started via ``python -m esp32_opus_player_tpu.parallel.net_farm
    HOST:PORT``."""

    def __init__(self, sources, n_workers: int = 2,
                 listen=("127.0.0.1", 0), spawn_local=None,
                 platform=None, accept_timeout: float = 120.0,
                 **pool_kw):
        if platform is None:
            import jax
            platform = jax.default_backend()
        self.channels = pool_kw.get("channels", 1)
        n_workers = self._assign(sources, n_workers)
        if spawn_local is None:
            spawn_local = n_workers
        srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        srv.bind(listen)
        srv.listen(n_workers)
        srv.settimeout(accept_timeout)
        self.address = srv.getsockname()
        self._procs = []
        ctx = mp.get_context("spawn")
        for _ in range(min(spawn_local, n_workers)):
            p = ctx.Process(target=_local_worker, args=(self.address,),
                            daemon=True)
            p.start()
            self._procs.append(p)
        self._conns = []
        try:
            for w in range(n_workers):
                sock, _peer = srv.accept()
                # accept_timeout bounds only the JOIN phase — the
                # accepted socket inherits the listen timeout, which
                # would otherwise cut off long worker steps (first-step
                # JAX compiles easily exceed it)
                sock.settimeout(None)
                conn = FramedSocket(sock)
                magic, _hello = conn.recv()
                if magic != _MAGIC:
                    raise RuntimeError("bad worker handshake")
                conn.send(("init", self._shard_sources[w], pool_kw,
                           platform))
                status, _nloc = conn.recv()
                if status != "ok":
                    raise RuntimeError(f"worker {w} init failed")
                self._conns.append(conn)
        finally:
            srv.close()


def _main(argv):
    if len(argv) != 1 or ":" not in argv[0]:
        print("usage: python -m esp32_opus_player_tpu.parallel.net_farm "
              "HOST:PORT", file=sys.stderr)
        return 2
    host, port = argv[0].rsplit(":", 1)
    run_worker((host, int(port)))
    return 0


if __name__ == "__main__":
    sys.exit(_main(sys.argv[1:]))
