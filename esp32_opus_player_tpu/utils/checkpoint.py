"""Checkpoint/resume for StreamPool (SURVEY.md §6 aux subsystems).

The pool's full decode state is explicit — device pytrees (CELT decode_mem/
preemph, per-rate SILK buckets), native host ctypes structs, scalar Python
decoders, and per-stream cursor positions — so a checkpoint is a plain
snapshot of all of it. The device state is a pytree of numpy-convertible
arrays, so orbax works too; this module is the dependency-free path
(pickle + numpy) used by ``StreamPool.save_checkpoint`` / ``load_checkpoint``.

Reference parity: the ESP32 player has no checkpointing (a reboot restarts
the stream); a 10k-stream farm needs preemptible-safe resume, so this is a
TPU-native addition, not a ported feature.

Checkpoints are TRUSTED input: they are pickle files, and unpickling
executes code — only restore checkpoints your own deployment wrote.
Native-struct blobs are size-validated before memmove so a checkpoint from
a different struct layout raises instead of corrupting memory.
"""
from __future__ import annotations

import ctypes
import hashlib
import pickle

import numpy as np

CKPT_VERSION = 1


def _stream_digest(stream) -> tuple:
    """Cheap identity check so a checkpoint is only restored onto the same
    set of sources (n_jobs + hash of the first packet)."""
    first = stream.jobs[0].data if stream.jobs else b""
    return (len(stream.jobs), hashlib.sha1(first).hexdigest())


def snapshot(pool) -> dict:
    """Capture the pool's complete decode state as a picklable dict."""
    if hasattr(pool, "_flush"):
        pool._flush()   # materialize pipelined device launches first
    ck = dict(
        version=CKPT_VERSION,
        n=pool.n,
        channels=pool.channels,
        native=pool.native,
        digests=[_stream_digest(s) for s in pool.streams],
        positions=[int(p) for p in pool.positions],
        path=list(pool.path),
        pcm_out=[[np.asarray(a) for a in per] for per in pool.pcm_out],
        device_state={k: np.asarray(v) for k, v in pool.state.items()},
        silk_buckets={fs: {k: np.asarray(v) for k, v in st.items()}
                      for fs, st in pool.silk_buckets.items()},
        silk2_buckets={fs: {k: np.asarray(v) for k, v in st.items()}
                       for fs, st in pool.silk2_buckets.items()},
        stats=dict(pool._stats, buckets=dict(pool._stats["buckets"])),
        last_rng=dict(getattr(pool, "_last_rng", {})),
        plc_trackers={i: pickle.dumps(t)
                      for i, t in getattr(pool, "_plc_trk", {}).items()},
        plc_trackers2={k: pickle.dumps(t)
                       for k, t in getattr(pool, "_plc_trk2",
                                           {}).items()},
        last_pred={i: np.asarray(v)
                   for i, v in getattr(pool, "_last_pred", {}).items()},
        silk2_hosts={i: (bytes(h.st[0]), bytes(h.st[1]), h.prev_dom)
                     for i, h in getattr(pool, "_silk2_hosts",
                                         {}).items()},
    )
    if pool.native:
        # ms/msb rows have no per-row host engines (None)
        ck["celt_hosts"] = [None if h is None else bytes(h.st)
                            for h in pool.celt_hosts]
        ck["celt_hosts_start"] = [None if h is None else h.start
                                  for h in pool.celt_hosts]
        # rfc_plc pools use python silk hosts even when native
        ck["silk_hosts"] = None if pool.silk_hosts is None else \
            [None if h is None else bytes(h.st) for h in pool.silk_hosts]
    else:
        ck["celt_hosts"] = [pickle.dumps(h) for h in pool.celt_hosts]
    # scalar decoders are pure-Python state (numpy + ints) — picklable
    ck["scalar"] = [pickle.dumps(d) for d in pool.scalar]
    # CELT-PLC loss-run tracker (rows concealed on the latest step)
    ck["celt_plc_prev_lost"] = sorted(getattr(pool, "_plc_prev_lost",
                                              set()))
    # celt_decode_lost bookkeeping mirrors (noise-branch selection):
    # conceals-since-last-good per row + the skip_plc flag set
    ck["celt_plc_loss_cnt"] = dict(getattr(pool, "_plc_loss_cnt", {}))
    ck["celt_plc_skip"] = sorted(getattr(pool, "_plc_skip", set()))
    # batched-multistream sub-pools checkpoint recursively
    ck["ms_subs"] = {key: snapshot(sp)
                     for key, sp in getattr(pool, "_ms_subs", {}).items()}
    # heterogeneous pools: kind-lifted sub-pools likewise
    ck["kind_subs"] = {key: snapshot(sp)
                       for key, sp in getattr(pool, "_kind_subs",
                                              {}).items()}
    return ck


def _memmove_checked(dst_struct, raw: bytes) -> None:
    """memmove a pickled blob into a ctypes struct, refusing layout
    mismatches (e.g. a checkpoint written by a different native build)."""
    want = ctypes.sizeof(dst_struct)
    if len(raw) != want:
        raise ValueError(
            f"native state blob is {len(raw)} bytes but "
            f"{type(dst_struct).__name__} is {want} — checkpoint was "
            "written by an incompatible struct layout/version")
    ctypes.memmove(ctypes.byref(dst_struct), raw, want)


def restore(pool, ck: dict) -> None:
    """Load a snapshot into a freshly constructed pool over the SAME
    sources (validated by per-stream digests)."""
    import jax.numpy as jnp

    if ck["version"] != CKPT_VERSION:
        raise ValueError(f"checkpoint version {ck['version']} != "
                         f"{CKPT_VERSION}")
    if ck["n"] != pool.n or ck["channels"] != pool.channels \
            or ck["native"] != pool.native:
        raise ValueError("checkpoint pool shape mismatch")
    digests = [_stream_digest(s) for s in pool.streams]
    if digests != ck["digests"]:
        raise ValueError("checkpoint sources differ from this pool's")

    pool._pending = []   # a restored pool has no in-flight launches
    pool.positions = np.asarray(ck["positions"], dtype=np.int64)
    pool.path = list(ck["path"])
    pool.pcm_out = [[np.asarray(a) for a in per] for per in ck["pcm_out"]]
    pool.state = {k: jnp.asarray(v) for k, v in ck["device_state"].items()}
    pool.silk_buckets = {fs: {k: jnp.asarray(v) for k, v in st.items()}
                         for fs, st in ck["silk_buckets"].items()}
    pool.silk2_buckets = {fs: {k: jnp.asarray(v) for k, v in st.items()}
                          for fs, st in ck.get("silk2_buckets", {}).items()}
    pool._stats = dict(ck["stats"], buckets=dict(ck["stats"]["buckets"]))
    pool._last_rng = dict(ck.get("last_rng", {}))
    pool._plc_trk = {i: pickle.loads(b)
                     for i, b in ck.get("plc_trackers", {}).items()}
    pool._plc_trk2 = {k: pickle.loads(b)
                      for k, b in ck.get("plc_trackers2", {}).items()}
    pool._last_pred = {i: np.asarray(v)
                       for i, v in ck.get("last_pred", {}).items()}
    # restore INTO the pool's existing stereo hosts — group-backed pools
    # alias rows of the batch StateArray, so replacing the dict would
    # strand the restored state outside the buffer the batch engine reads
    for i, (r0, r1, dom) in ck.get("silk2_hosts", {}).items():
        h = pool._silk2_host(i)
        _memmove_checked(h.st[0], r0)
        _memmove_checked(h.st[1], r1)
        h.prev_dom = dom
    if pool.native:
        for h, raw, start in zip(pool.celt_hosts, ck["celt_hosts"],
                                 ck["celt_hosts_start"]):
            if h is None or raw is None:
                continue
            _memmove_checked(h.st, raw)
            h.start = start
        if ck["silk_hosts"] is not None and pool.silk_hosts is not None:
            for h, raw in zip(pool.silk_hosts, ck["silk_hosts"]):
                if h is not None and raw is not None:
                    _memmove_checked(h.st, raw)
    else:
        pool.celt_hosts = [pickle.loads(b) for b in ck["celt_hosts"]]
    pool.scalar = [pickle.loads(b) for b in ck["scalar"]]
    pool._plc_prev_lost = set(ck.get("celt_plc_prev_lost", ()))
    pool._plc_loss_cnt = dict(ck.get("celt_plc_loss_cnt", {}))
    pool._plc_skip = set(ck.get("celt_plc_skip", ()))
    for key, sub_ck in ck.get("ms_subs", {}).items():
        restore(pool._ms_subs[key], sub_ck)
    for key, sub_ck in ck.get("kind_subs", {}).items():
        restore(pool._kind_subs[key], sub_ck)


def save(pool, path: str) -> None:
    with open(path, "wb") as f:
        pickle.dump(snapshot(pool), f, protocol=pickle.HIGHEST_PROTOCOL)


def load(pool, path: str) -> None:
    with open(path, "rb") as f:
        restore(pool, pickle.load(f))
