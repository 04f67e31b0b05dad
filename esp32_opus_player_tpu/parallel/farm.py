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

import ctypes

import numpy as np

import jax

from ..models.stream_pool import StreamPool


def _copy_host(dst, src):
    """Carry one per-stream host engine's state from the old pool into
    the new pool's engine. Native hosts get a BYTE COPY into the new
    object's state struct — crucial because grouped pools (host_groups)
    decode through the NEW pool's StateArray rows, which the new host
    objects alias; swapping the list entry for the old object would
    leave the batched symbol phase reading freshly-reset state (the
    r04 red-test bug: the first post-admission frame decoded with
    zeroed oldLogE/postfilter host state). Pure-Python hosts
    (native=False CELTDecoder / OpusDecoder rows) have no aliasing, so
    the old object itself carries over. Returns the host to install."""
    if dst is None or src is None or dst is src:
        return src if src is not None else dst
    dst_st = getattr(dst, "st", None)
    src_st = getattr(src, "st", None)
    if dst_st is None or src_st is None:
        return src                       # python host: by reference
    if isinstance(dst_st, tuple):        # stereo host: (mid, side)
        for d, s in zip(dst_st, src_st):
            ctypes.memmove(ctypes.byref(d), ctypes.byref(s),
                           ctypes.sizeof(d))
    else:
        ctypes.memmove(ctypes.byref(dst_st), ctypes.byref(src_st),
                       ctypes.sizeof(dst_st))
    for attr in ("start", "end", "prev_dom"):
        if hasattr(src, attr):
            setattr(dst, attr, getattr(src, attr))
    return dst


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
    for i in range(old.n):
        new.celt_hosts[i] = _copy_host(new.celt_hosts[i],
                                       old.celt_hosts[i])
    if new.silk_hosts is not None and old.silk_hosts is not None:
        for i in range(old.n):
            new.silk_hosts[i] = _copy_host(new.silk_hosts[i],
                                           old.silk_hosts[i])
    for i, h in old._silk2_hosts.items():
        new._silk2_hosts[i] = _copy_host(new._silk2_hosts.get(i), h)
    new.scalar[:old.n] = old.scalar
    new._stats = old._stats
    # lazily-built per-stream side state: standalone objects/values,
    # carried by reference (nothing in the new pool aliases them)
    new._plc_trk.update(old._plc_trk)
    new._plc_trk2.update(old._plc_trk2)
    new._last_pred.update(old._last_pred)
    new._last_rng.update(old._last_rng)
    new._plc_prev_lost |= old._plc_prev_lost
    new._plc_loss_cnt.update(old._plc_loss_cnt)
    new._plc_skip |= old._plc_skip
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
                 out_fs: int = 48000, ms_batch: bool = True,
                 output: str = "host", device_keep: int | None = None):
        """superstep_k/out_fs/ms_batch/output/device_keep pass straight
        through to each shard's StreamPool — a farm with superstep_k=K
        runs ONE device program per K frames per shard (the single-pool
        fast path at pod scale) instead of one dispatch per frame;
        output='device' keeps each shard's PCM in its chip's HBM for
        on-chip consumers."""
        self.devices = list(devices if devices is not None
                            else jax.devices())
        self.channels = channels
        self._pool_kw = dict(channels=channels, native=native,
                             compat_ref=compat_ref,
                             host_threads=host_threads,
                             fixed_buckets=fixed_buckets, rfc_plc=rfc_plc,
                             superstep_k=superstep_k, out_fs=out_fs,
                             ms_batch=ms_batch, output=output,
                             device_keep=device_keep)
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
        """Admit a new stream mid-flight. Shards are tried in ascending
        load (fewest active streams first); if admitting to a shard
        would re-partition its uniform superstep pool into kind
        sub-pools (existing rows' state cannot be carried across that
        layout change), the next shard is tried instead — a
        different-kind stream lands on a matching-kind or empty shard
        rather than hard-failing the farm. Only if EVERY shard would
        re-partition does the NotImplementedError propagate. Returns
        the stream's global index. The chosen shard's pool is rebuilt
        with grown state arrays; existing streams' decode state carries
        over exactly (native host state is byte-copied into the new
        pool's group StateArrays, _copy_host)."""
        actives = []
        for pool in self.pools:
            actives.append(sum(1 for i in range(pool.n)
                               if pool.positions[i]
                               < len(pool.streams[i].jobs)))
        last_err = None
        for s in np.argsort(np.asarray(actives), kind="stable"):
            s = int(s)
            dev = self.devices[s]
            old = self.pools[s]
            # drain the old shard's pipeline (incl. any buffered
            # K-frame superstep window) before its state arrays are
            # copied — a buffered window would otherwise be dropped
            # with its frames
            old.sync()
            with jax.default_device(dev):
                new = StreamPool(self._shard_sources[s] + [source],
                                 **self._pool_kw)
                try:
                    # carry over the old shard's state verbatim
                    # (recursing into multistream / kind-lifted
                    # sub-pools)
                    _carry_state(old, new)
                except NotImplementedError as e:
                    last_err = e
                    continue
            self._shard_sources[s].append(source)
            self.pools[s] = new
            g = len(self.placement)
            self.placement.append((s, new.n - 1))
            return g
        raise last_err

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
