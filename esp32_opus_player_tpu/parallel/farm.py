"""PoolFarm: a pod-scale decode farm (BASELINE config 5 shape).

One StreamPool per device, streams partitioned round-robin. The decode has
no cross-stream math (SURVEY.md §2.7), so the farm is pure data
parallelism: each shard's host symbol phase + device synthesis runs
against its own chip, and shards never exchange data on the hot path —
ICI/DCN is only touched when a stream is admitted or migrated.

Elasticity: `add_stream()` admits a new stream to the least-loaded shard
at any point (a fresh stream starts from reset state, so admission costs
one pool rebuild of that shard's state arrays — O(shard size) device
memory traffic, no cross-shard movement). Loss/FEC schedules pass through
per-stream with their global index.

The reference plays exactly one stream on one core pair
(reference src/main.cpp); a farm is a TPU-native addition.
"""
from __future__ import annotations

import numpy as np

import jax

from ..models.stream_pool import StreamPool


def _carry_state(old: StreamPool, new: StreamPool) -> None:
    """Copy a pool's complete decode state into a freshly constructed
    pool whose first old.n sources are identical (add_stream grows a
    shard by one). Recurses into multistream and kind-lifted sub-pools
    (their old slots are a prefix of the new pool's: the admitted
    stream's rows always append at the end of each sub-group)."""
    if any(new.path[i][0] == "sub" and old.path[i][0] != "sub"
           for i in range(old.n)):
        # admission changed the pool's partitioning (a uniform pool
        # became heterogeneous, so existing rows moved from the direct
        # fast path into kind sub-pools): their state cannot be copied
        # across that layout change
        raise NotImplementedError(
            "add_stream would re-partition a uniform superstep pool "
            "into kind sub-pools; admit same-kind streams to this "
            "shard, or build the farm heterogeneous from the start")
    new.positions[:old.n] = old.positions
    new.pcm_out[:old.n] = old.pcm_out
    new.path[:old.n] = old.path
    for k in new.state:
        if k == "decode_mem" and new._t_mode:
            # transposed pools carry decode_mem as (CC, L, streams) —
            # the streams axis is LAST there (preemph and the PLC keys
            # stay streams-leading)
            new.state[k] = new.state[k].at[:, :, :old.n] \
                .set(old.state[k])
        else:
            new.state[k] = new.state[k].at[:old.n].set(old.state[k])
    for fs, st in old.silk_buckets.items():
        dst = new._silk_bucket(fs)
        for k in dst:
            dst[k] = dst[k].at[:old.n].set(st[k])
    new.celt_hosts[:old.n] = old.celt_hosts
    if new.silk_hosts is not None:
        new.silk_hosts[:old.n] = old.silk_hosts
    new.scalar[:old.n] = old.scalar
    new._stats = old._stats
    for key, osub in old._ms_subs.items():
        _carry_state(osub, new._ms_subs[key])
    for key, osub in old._kind_subs.items():
        osub.sync()
        _carry_state(osub, new._kind_subs[key])


class PoolFarm:
    def __init__(self, sources, devices=None, channels: int = 1,
                 native: bool = True, compat_ref: bool = True,
                 host_threads: int = 0, fixed_buckets: bool = False,
                 rfc_plc: bool = False, superstep_k: int = 1,
                 out_fs: int = 48000, ms_batch: bool = True):
        """superstep_k/out_fs/ms_batch pass straight through to each
        shard's StreamPool — a farm with superstep_k=K runs ONE device
        program per K frames per shard (the single-pool fast path at
        pod scale) instead of one dispatch per frame."""
        self.devices = list(devices if devices is not None
                            else jax.devices())
        self.channels = channels
        self._pool_kw = dict(channels=channels, native=native,
                             compat_ref=compat_ref,
                             host_threads=host_threads,
                             fixed_buckets=fixed_buckets, rfc_plc=rfc_plc,
                             superstep_k=superstep_k, out_fs=out_fs,
                             ms_batch=ms_batch)
        n_sh = len(self.devices)
        # round-robin partition; remember each stream's (shard, slot)
        self._shard_sources = [[] for _ in range(n_sh)]
        self.placement = []     # global idx -> (shard, slot)
        for g, src in enumerate(sources):
            s = g % n_sh
            self.placement.append((s, len(self._shard_sources[s])))
            self._shard_sources[s].append(src)
        self.pools = []
        for s, dev in enumerate(self.devices):
            with jax.default_device(dev):
                self.pools.append(StreamPool(self._shard_sources[s],
                                             **self._pool_kw))

    @property
    def n(self) -> int:
        return len(self.placement)

    # ------------------------------------------------------------------
    def _split(self, idx_set):
        """Global stream-index set -> per-shard local index sets."""
        per = [set() for _ in self.pools]
        for g in idx_set or ():
            if 0 <= g < len(self.placement):
                s, slot = self.placement[g]
                per[s].add(slot)
        return per

    def step(self, lost=None, fec=None) -> bool:
        """One frame on every active stream across all shards."""
        lost_per = self._split(lost)
        fec_per = self._split(fec)
        any_active = False
        for s, (pool, dev) in enumerate(zip(self.pools, self.devices)):
            with jax.default_device(dev):
                if pool.step(lost_per[s], fec_per[s]):
                    any_active = True
        return any_active

    def run(self, loss=None, fec=False):
        """Decode everything; returns PCM per global stream index.
        loss: callable (global_stream_idx, packet_idx) -> bool."""
        while True:
            lost, fec_set = set(), set()
            if loss is not None:
                for g, (s, slot) in enumerate(self.placement):
                    pool = self.pools[s]
                    k = pool.positions[slot]
                    if k >= len(pool.streams[slot].jobs) or not loss(g, k):
                        continue
                    lost.add(g)
                    if fec and k + 1 < len(pool.streams[slot].jobs) \
                            and not loss(g, k + 1):
                        fec_set.add(g)
            if not self.step(lost, fec_set):
                break
        return self.collect()

    def collect(self):
        """PCM accumulated so far, indexed by global stream index.
        collected() (vs raw pcm_out) flushes each shard's pipeline and
        assembles multistream/kind-lifted sub-pool rows."""
        per_shard = [pool.collected() for pool in self.pools]
        return [per_shard[s][slot] for s, slot in self.placement]

    def drain(self):
        """Serving-style: return-and-clear per global stream."""
        per_shard = [pool.drain() for pool in self.pools]
        return [per_shard[s][slot] for s, slot in self.placement]

    # ------------------------------------------------------------------
    def add_stream(self, source) -> int:
        """Admit a new stream mid-flight to the least-loaded shard
        (fewest active streams). Returns its global index. The shard's
        pool is rebuilt with the grown state arrays; existing streams'
        decode state carries over exactly."""
        actives = []
        for pool in self.pools:
            actives.append(sum(1 for i in range(pool.n)
                               if pool.positions[i]
                               < len(pool.streams[i].jobs)))
        s = int(np.argmin(actives))
        dev = self.devices[s]
        old = self.pools[s]
        # drain the old shard's pipeline (incl. any buffered K-frame
        # superstep window) before its state arrays are copied — a
        # buffered window would otherwise be dropped with its frames
        old.sync()
        with jax.default_device(dev):
            new = StreamPool(self._shard_sources[s] + [source],
                             **self._pool_kw)
            # carry over the old shard's state verbatim (recursing
            # into multistream / kind-lifted sub-pools)
            _carry_state(old, new)
        self._shard_sources[s].append(source)
        self.pools[s] = new
        g = len(self.placement)
        self.placement.append((s, new.n - 1))
        return g

    # ------------------------------------------------------------------
    def stats(self) -> dict:
        """Aggregate + per-shard decode statistics."""
        shard_stats = [pool.stats() for pool in self.pools]
        agg = dict(shards=len(self.pools), streams=self.n)
        for key in ("steps", "frames", "bytes_in", "samples_out",
                    "frames_celt", "frames_silk", "frames_hybrid",
                    "frames_scalar", "frames_lost", "frames_fec",
                    "active_streams"):
            agg[key] = sum(st[key] for st in shard_stats)
        agg["per_shard"] = [
            dict(device=str(d), streams=st["streams"],
                 active=st["active_streams"], frames=st["frames"])
            for d, st in zip(self.devices, shard_stats)]
        return agg

    def save_checkpoint(self, path: str) -> None:
        """One checkpoint file per shard: path.shard{N}."""
        for s, pool in enumerate(self.pools):
            pool.save_checkpoint(f"{path}.shard{s}")

    def load_checkpoint(self, path: str) -> None:
        for s, pool in enumerate(self.pools):
            pool.load_checkpoint(f"{path}.shard{s}")
