"""StreamPool: decode many concurrent Ogg/Opus streams (BASELINE config 4).

Per frame step:
  1. host: per-stream container pull + packet parse + symbol phase
     (native C++ engine for CELT) — embarrassingly parallel over host cores;
  2. group the frames into static-shape device buckets
     (LM, C, CC, transient) and pad each group to a power-of-two capacity
     (bounds XLA recompiles);
  3. device: gather the per-stream state rows, run the jitted batched
     synthesis, scatter the state back (duplicate pad indices write
     identical values, so the scatter is deterministic).

CELT-only streams take the batched native+device path; SILK/hybrid streams
fall back to the scalar bit-exact decoder (batched SILK exists in
models/batch_silk.py and is merged here in a later round).
"""
from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from ..host import opusfile
from ..host.packet import Mode, parse_packet
from . import batch_celt
from .batch_celt import NB_EBANDS, celt_synth_step
from ..ops.celt.jax_synthesis import SHORT_MDCT_SIZE, I32


def _pow2_cap(n: int) -> int:
    c = 1
    while c < n:
        c <<= 1
    return c


class StreamPool:
    def __init__(self, sources, channels: int = 1, native: bool = True,
                 compat_ref: bool = True, host_threads: int = 0):
        """sources: list of paths/bytes of Ogg/Opus streams."""
        self.streams = [opusfile.parse_stream(
            s if isinstance(s, (bytes, bytearray)) else open(s, "rb").read())
            for s in sources]
        self.n = len(self.streams)
        self.channels = channels
        self.native = native
        self.positions = [0] * self.n
        self.pcm_out = [[] for _ in range(self.n)]
        self.state = batch_celt.make_state(self.n, channels)
        self._pool = None
        if native:
            from ..host.native import NativeCELTHost
            self.celt_hosts = [NativeCELTHost(channels)
                               for _ in range(self.n)]
            if host_threads > 1:
                from concurrent.futures import ThreadPoolExecutor
                self._pool = ThreadPoolExecutor(host_threads)
        else:
            from .celt_decoder import CELTDecoder
            self.celt_hosts = [CELTDecoder(channels, compat_ref=compat_ref)
                               for _ in range(self.n)]
        # scalar fallbacks for non-CELT packets
        from .opus_decoder import OpusDecoder
        self.scalar = [OpusDecoder(channels, compat_ref=compat_ref)
                       for _ in range(self.n)]

    # ------------------------------------------------------------------
    def _host_one(self, i: int):
        s = self.streams[i]
        if self.positions[i] >= len(s.jobs):
            return None
        job = s.jobs[self.positions[i]]
        self.positions[i] += 1
        parsed = parse_packet(job.data)
        if parsed.mode != Mode.CELT_ONLY or parsed.frame_size != 960 or \
                len(parsed.frames) != 1:
            # scalar fallback path (SILK/hybrid/multi-frame)
            pcm = self.scalar[i].decode(job.data)
            return ("scalar", i, pcm, job)
        host = self.celt_hosts[i]
        if self.native:
            si = host.decode_symbol_phase(parsed.frames[0], 960)
        else:
            from ..host.range_decoder import RangeDecoder
            si = host.decode_with_ec(RangeDecoder(parsed.frames[0]), None,
                                     960, defer_synthesis=True)
        return ("celt", i, si, job)

    def step(self) -> bool:
        """Decode one frame on every active stream. Returns False when all
        streams are exhausted."""
        if self._pool is not None:
            results = list(self._pool.map(self._host_one, range(self.n)))
        else:
            results = [self._host_one(i) for i in range(self.n)]
        results = [r for r in results if r is not None]
        if not results:
            return False

        # scalar results pass through
        groups: dict[tuple, list] = {}
        for kind, i, payload, job in results:
            if kind == "scalar":
                self.pcm_out[i].append(self._trim(payload, job))
            else:
                key = (payload["LM"], payload["C"], self.channels,
                       payload["transient"])
                groups.setdefault(key, []).append((i, payload, job))

        for (LM, C, CC, transient), items in groups.items():
            self._device_group(items, LM, C, CC, transient)
        return True

    def _trim(self, pcm, job):
        lo = job.discard_front
        hi = pcm.shape[0] - job.trim_end
        return pcm[lo:max(hi, lo)]

    def _device_group(self, items, LM, C, CC, transient):
        N = SHORT_MDCT_SIZE << LM
        n = len(items)
        cap = _pow2_cap(n)
        idxs = np.array([it[0] for it in items]
                        + [items[0][0]] * (cap - n), dtype=np.int32)
        X = np.zeros((cap, C, N), dtype=np.int32)
        bandE = np.zeros((cap, 2, NB_EBANDS), dtype=np.int32)
        start = np.zeros(cap, dtype=np.int32)
        end = np.zeros(cap, dtype=np.int32)
        comb1 = np.zeros((6, cap), dtype=np.int32)
        comb2 = np.zeros((6, cap), dtype=np.int32)
        for b in range(cap):
            si = items[min(b, n - 1)][1]
            X[b] = np.asarray(si["X"][:C * N], dtype=np.int32).reshape(C, N)
            bandE[b] = np.asarray(si["bandE"],
                                  dtype=np.int32).reshape(2, NB_EBANDS)
            start[b] = si["start"]
            end[b] = si["end"]
            comb1[:, b] = si["comb1"]
            comb2[:, b] = si["comb2"]
        jidx = jnp.asarray(idxs)
        dm = self.state["decode_mem"][jidx]
        pre = self.state["preemph"][jidx]
        pcm, dm2, pre2 = celt_synth_step(
            dm, pre, jnp.asarray(X), jnp.asarray(bandE), jnp.asarray(start),
            jnp.asarray(end), tuple(jnp.asarray(v) for v in comb1),
            tuple(jnp.asarray(v) for v in comb2),
            LM=LM, C=C, CC=CC, transient=transient)
        self.state["decode_mem"] = self.state["decode_mem"].at[jidx].set(dm2)
        self.state["preemph"] = self.state["preemph"].at[jidx].set(pre2)
        out = np.asarray(pcm[:n]).astype(np.int16)
        for b, (i, _si, job) in enumerate(items):
            frame = out[b].T  # (N, CC)
            self.pcm_out[i].append(self._trim(frame, job))

    def run(self):
        """Decode everything; returns a list of (n_i, channels) int16."""
        while self.step():
            pass
        return [np.concatenate(p) if p else
                np.zeros((0, self.channels), dtype=np.int16)
                for p in self.pcm_out]
