"""Single-program multi-chip StreamPool: one jitted step over a device
mesh, state sharded on the streams axis (SURVEY.md §2.7).

Unlike PoolFarm (pool-per-device with separate programs), this variant
compiles ONE program whose stream-axis tensors carry a NamedSharding over
the mesh — GSPMD partitions every kernel with zero collectives, because
Opus decode has no cross-stream math. Design choices that make the
partitioning trivial (and TPU-idiomatic):

  * every stream is PINNED to its shard: the step is a FULL-batch launch
    (no gather/scatter indexing across the batch, which would induce
    all-to-alls) — exhausted/inactive rows are masked on device, so the
    compiled step never changes shape;
  * the host symbol phase stays the batched C++ engine (one call per
    step), producing contiguous per-row tensors that device_put shards.

superstep_k=K runs K frames per device program (lax.scan over the same
full-batch frame body, staging stacked on a leading K axis that stays
REPLICATED while the streams axis shards) — the same launch-amortization
move as StreamPool's single-chip superstep, so the SPMD path hits the
same per-chip ceiling instead of paying one dispatch per frame. The
per-frame active mask rides inside the window: a padded flush frame is
all-inactive and keeps the state bit-for-bit.

Two program families:

  * fused (shard_map, the TPU path): each shard runs StreamPool's OWN
    fast-path frame bodies on its local block — the transposed CELT
    pipeline (_celt_packed_frame_T: in-VMEM Pallas iMDCT, per-lane comb
    delay kernel) and the fused SILK core (which picks its Pallas
    kernel per shard). Pallas kernels cannot be auto-partitioned by
    GSPMD, so shard_map is the ONLY legal multi-chip composition of
    the fast path — the scale-out program traces the same single-chip
    frame body per shard, and the per-chip ceiling MEASURES within
    noise of the single-pool headline at steady state (r05 A/B
    decomposition, docs/CEILING.md addendum: compiled cost analysis is
    byte-identical; the 18% gap BENCH_r04 recorded was a first-window
    warmup artifact of the tunneled dev rig, fixed in
    bench_sharded_device by warm+reps). Zero collectives: decode has
    no cross-stream math (SURVEY.md §2.7).
  * auto-partitioned (GSPMD, the portable fallback): the row-major
    full-batch bodies below, pure XLA ops that GSPMD shards from the
    NamedSharding annotations alone. Used off-TPU (CPU CI meshes).

Covers the uniform high-volume farm shapes (CELT-only and mono-SILK
pools, BASELINE configs 1/2/4 at pod scale) WITH the serving surface:
loss/FEC masks ride the masked step (reference loss semantics — CELT
state-keep + silence, SILK empty-bitstream decode, LBRR recovery; see
_host_frame), stats() reports the farm-grade counters, and
save/load_checkpoint give preemptible-safe resume. RFC-mode
CONCEALMENT (rfc_plc pitch/noise PLC, CNG, glue) and heterogeneous
pools stay PoolFarm's job — one full-featured StreamPool per chip —
either as one ShardedStreamPool per kind or a farm of shard pools
(which carry superstep_k per kind).
"""
from __future__ import annotations

import functools
import os

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P, NamedSharding

from ..host import opusfile
from ..models import batch_celt, host_groups as hg
from ..models.batch_celt import celt_synth_step
from ..models.silk_decoder import MAX_LPC_ORDER
from ..ops.silk import jax_core as sjc
from ..ops.celt.jax_synthesis import I32
from .mesh import make_stream_mesh, stream_sharding

_ENDBAND_OF_BW = {1101: 13, 1102: 17, 1103: 17, 1104: 19, 1105: 21}
_FS_OF_BW = {1101: 8, 1102: 12, 1103: 16, 1104: 16, 1105: 16}


# --------------------------------------------------------------- fused
@functools.lru_cache(maxsize=None)
def _fused_celt_superstep(mesh, LM: int, C: int, CC: int,
                          interpret: bool):
    """shard_map program: every shard runs StreamPool's transposed
    K-frame CELT body (_celt_packed_frame_T — Pallas iMDCT + comb) on
    its local lane block. State dmT (CC, L, n) shards on the LANES
    axis; staging (K, n, W) on the rows axis; no collectives."""
    from ..models.stream_pool import _celt_packed_frame_T

    def body(dmT, pre, stgK):
        def f(carry, stg):
            d, p = carry
            pcmT, d2, p2 = _celt_packed_frame_T(
                d, p, stg, LM=LM, C=C, CC=CC, chunk=13, masked=True,
                downsample=1, interpret=interpret)
            return (d2, p2), pcmT
        (dmT, pre), pcmK = jax.lax.scan(f, (dmT, pre), stgK)
        return pcmK, dmT, pre

    sm = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(None, None, "streams"), P("streams"),
                  P(None, "streams")),
        out_specs=(P(None, None, None, "streams"),
                   P(None, None, "streams"), P("streams")),
        check_vma=False)   # pallas_call emits ShapeDtypeStructs sans vma
    return jax.jit(sm, donate_argnums=(0, 1))


@functools.lru_cache(maxsize=None)
def _fused_silk_superstep(mesh, fs: int, nb: int, order: int,
                          frame: int):
    """shard_map program: every shard runs the full-batch mono-SILK
    K-frame scan on its local rows (the SILK core picks its fused
    Pallas kernel per shard on TPU — legal under shard_map, not under
    GSPMD auto-partitioning)."""
    def body(st, excK, AK, BK, ivK, boolsK, activeK):
        def f(carry, xs):
            exc, A, B, iv, bools, active = xs
            out, st2 = _silk_sharded_frame(
                carry, exc, A, B, iv, bools, active,
                fs=fs, nb=nb, order=order, frame=frame)
            return st2, out
        st, outs = jax.lax.scan(
            f, st, (excK, AK, BK, ivK, boolsK, activeK))
        return outs, st

    sm = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P("streams"),) + (P(None, "streams"),) * 6,
        out_specs=(P(None, "streams"), P("streams")),
        check_vma=False)   # the SILK core may lower to pallas per shard
    return jax.jit(sm, donate_argnums=(0,))


def _celt_sharded_frame(dm, pre, X, bandE, secT, tr, active, *,
                        LM: int, C: int, CC: int):
    """Full-batch CELT frame body (traced by the per-frame step AND the
    K-frame superstep): no row indexing, so the streams axis partitions
    with zero collectives. Inactive rows keep their state.
    secT: (n, 14) int32 — stream axis leading so it shards like the
    rest; transposed on device."""
    sec = secT.T
    start, end = sec[0], sec[1]
    comb1 = tuple(sec[2 + k] for k in range(6))
    comb2 = tuple(sec[8 + k] for k in range(6))
    X = X.astype(jnp.int32)
    bandE = bandE.astype(jnp.int32)
    outs = [celt_synth_step(dm, pre, X, bandE, start, end, comb1, comb2,
                            LM=LM, C=C, CC=CC, transient=t)
            for t in (False, True)]
    pcm = jnp.where(tr[:, None, None], outs[1][0], outs[0][0])
    dm2 = jnp.where(tr[:, None, None], outs[1][1], outs[0][1])
    pre2 = jnp.where(tr[:, None], outs[1][2], outs[0][2])
    dm2 = jnp.where(active[:, None, None], dm2, dm)
    pre2 = jnp.where(active[:, None], pre2, pre)
    return pcm.astype(jnp.int16), dm2, pre2


@functools.partial(jax.jit, static_argnames=("LM", "C", "CC"),
                   donate_argnums=(0, 1))
def _celt_sharded_step(dm, pre, X, bandE, secT, tr, active, *,
                       LM: int, C: int, CC: int):
    return _celt_sharded_frame(dm, pre, X, bandE, secT, tr, active,
                               LM=LM, C=C, CC=CC)


@functools.partial(jax.jit, static_argnames=("LM", "C", "CC"),
                   donate_argnums=(0, 1))
def _celt_sharded_superstep(dm, pre, XK, bandEK, secTK, trK, activeK, *,
                            LM: int, C: int, CC: int):
    """K frames in ONE sharded device program: lax.scan over the
    full-batch frame body. Window staging carries a leading K axis
    (replicated); every other axis shards exactly like the per-frame
    step, so GSPMD partitions the scan body with zero collectives.
    Returns (pcmK (K, n, CC, N) int16, dm', pre')."""
    def body(carry, xs):
        dm, pre = carry
        X, bandE, secT, tr, active = xs
        pcm, dm2, pre2 = _celt_sharded_frame(
            dm, pre, X, bandE, secT, tr, active, LM=LM, C=C, CC=CC)
        return (dm2, pre2), pcm
    (dm, pre), pcmK = jax.lax.scan(
        body, (dm, pre), (XK, bandEK, secTK, trK, activeK))
    return pcmK, dm, pre


def _silk_sharded_frame(st, exc, A, B, iv, bools, active, *,
                        fs: int, nb: int, order: int, frame: int):
    """Full-batch mono-SILK frame body (core synthesis + resample to
    48 k), traced by the per-frame step AND the K-frame superstep."""
    ltp = 20 * fs
    outBuf = st["outBuf"]
    xq, sLPC2 = sjc.silk_core_frame(
        outBuf[:, :ltp + frame], st["sLPC"], exc, A, B,
        iv[:, 0], iv[:, 1], iv[:, 2], bools[:, 0], bools[:, 1],
        iv[:, 3], bools[:, 2], fs_khz=fs, nb_subfr=nb, order=order)
    hist = jnp.concatenate([outBuf[:, frame:ltp], xq], axis=-1)
    new_outbuf = jnp.concatenate(
        [hist, jnp.zeros((xq.shape[0], 20 * fs), dtype=I32)], axis=-1)
    sMid = st["sMid"]
    resin = jnp.concatenate([sMid[:, 1:2], xq[:, :-1]], axis=-1)
    out48, sIIR, sFIR, delay = sjc.resample_to_48k(
        st["sIIR"], st["sFIR"], st["delay"], resin,
        fs_in_khz=fs, in_len=frame)
    m1 = active[:, None]
    st2 = dict(st)
    st2["outBuf"] = jnp.where(m1, new_outbuf, st["outBuf"])
    st2["sLPC"] = jnp.where(m1, sLPC2, st["sLPC"])
    st2["sMid"] = jnp.where(m1, xq[:, frame - 2:frame], st["sMid"])
    st2["sIIR"] = jnp.where(m1, sIIR, st["sIIR"])
    st2["sFIR"] = jnp.where(m1, sFIR, st["sFIR"])
    st2["delay"] = jnp.where(m1, delay, st["delay"])
    return out48.astype(jnp.int16), st2


@functools.partial(jax.jit, static_argnames=("fs", "nb", "order", "frame"),
                   donate_argnums=(0,))
def _silk_sharded_step(st, exc, A, B, iv, bools, active, *,
                       fs: int, nb: int, order: int, frame: int):
    return _silk_sharded_frame(st, exc, A, B, iv, bools, active,
                               fs=fs, nb=nb, order=order, frame=frame)


@functools.partial(jax.jit, static_argnames=("fs", "nb", "order", "frame"),
                   donate_argnums=(0,))
def _silk_sharded_superstep(st, excK, AK, BK, ivK, boolsK, activeK, *,
                            fs: int, nb: int, order: int, frame: int):
    """K mono-SILK frames in ONE sharded device program (lax.scan over
    the full-batch frame body). Returns (pcmK (K, n, 960) int16, st')."""
    def body(carry, xs):
        exc, A, B, iv, bools, active = xs
        out, st2 = _silk_sharded_frame(
            carry, exc, A, B, iv, bools, active,
            fs=fs, nb=nb, order=order, frame=frame)
        return st2, out
    st, outs = jax.lax.scan(
        body, st, (excK, AK, BK, ivK, boolsK, activeK))
    return outs, st


class ShardedStreamPool:
    """Decode N uniform streams with ONE jitted step over a mesh.

    sources must be a uniform pool (all CELT 20 ms, or all mono SILK of
    one internal rate); n must divide evenly over the mesh devices.

    superstep_k=K buffers K frames of host staging and runs them as ONE
    sharded device program (see _celt_sharded_superstep) — one dispatch
    per K frames per chip-set instead of per frame. Partial trailing
    windows pad with all-inactive frames (state preserved bit-for-bit),
    so the compiled (K, ...) shape is reused.

    fused=True (default on TPU; force with OTPU_SHARDMAP=1) runs the
    shard_map programs — StreamPool's transposed/Pallas fast path per
    shard (see module docstring). fused=False keeps the GSPMD
    auto-partitioned row-major programs (the CPU-CI default)."""

    def __init__(self, sources, mesh=None, channels: int = 1,
                 compat_ref: bool = True, superstep_k: int = 1,
                 fused: bool | None = None):
        from ..host.packet import (Mode, get_samples_per_frame,
                                   get_bandwidth, get_nb_frames)
        self.mesh = mesh if mesh is not None else make_stream_mesh()
        self.streams = [opusfile.parse_stream(
            s if isinstance(s, (bytes, bytearray))
            else open(s, "rb").read()) for s in sources]
        self.n = len(self.streams)
        ndev = self.mesh.devices.size
        if self.n % ndev:
            raise ValueError(f"{self.n} streams do not shard evenly over "
                             f"{ndev} devices")
        self.channels = channels
        self.compat_ref = compat_ref
        self.superstep_k = max(1, int(superstep_k))
        backend = jax.default_backend()
        if fused is None:
            fused = backend == "tpu" \
                or os.environ.get("OTPU_SHARDMAP") == "1"
        self.fused = bool(fused)
        self._interp = backend != "tpu"
        self.positions = [0] * self.n
        self.pcm_out = [[] for _ in range(self.n)]
        self._stats = dict(steps=0, frames=0, frames_lost=0,
                           frames_fec=0, samples_out=0)
        self._sh = stream_sharding(self.mesh)
        # window staging: leading K axis replicated, streams axis sharded
        self._shK = NamedSharding(self.mesh, P(None, "streams"))
        # fused CELT state: transposed (CC, L, lanes) — lanes shard
        self._sh_lanes = NamedSharding(self.mesh, P(None, None, "streams"))
        self._win: list = []      # buffered (staging tuple, pos, ok)
        # dispatched-but-unfetched windows: (device pcmK, frames).
        # Depth-1 deferred materialization — the PREVIOUS window's PCM
        # streams back (copy_to_host_async) while the next window's
        # host symbol phases and device execution run (VERDICT r04
        # weak #4: the fetch used to be synchronous per window)
        self._pending: list = []

        # classify: the pool must be uniform
        kinds = set()
        for s in self.streams:
            for j in s.jobs:
                p0 = j.data[0]
                mode = Mode.CELT_ONLY if p0 & 0x80 else (
                    Mode.HYBRID if (p0 & 0x60) == 0x60 else Mode.SILK_ONLY)
                kinds.add((mode, get_samples_per_frame(p0),
                           get_nb_frames(j.data),
                           _FS_OF_BW.get(int(get_bandwidth(p0)), 16)))
        if len(kinds) != 1:
            raise ValueError(f"non-uniform pool: {kinds}")
        mode, spf, nfr, fs = next(iter(kinds))
        if spf != 960 or nfr != 1:
            raise ValueError("sharded pool supports 20 ms single-frame "
                             "packets")
        jls = [s.jobs for s in self.streams]
        if mode == Mode.CELT_ONLY:
            self.kind = "celt"
            end = 21 if compat_ref else _ENDBAND_OF_BW.get(
                int(get_bandwidth(self.streams[0].jobs[0].data[0])), 21)
            self.group = hg.CeltGroup(list(range(self.n)), jls, 960,
                                      channels, 0, [end] * self.n)
            if self.fused:
                from ..ops.celt.jax_synthesis import (DECODE_BUFFER_SIZE,
                                                      OVERLAP)
                L = DECODE_BUFFER_SIZE + OVERLAP
                self.state = {
                    "decode_mem": jax.device_put(
                        jnp.zeros((channels, L, self.n), dtype=I32),
                        self._sh_lanes),
                    "preemph": jax.device_put(
                        jnp.zeros((self.n, channels), dtype=I32),
                        self._sh),
                }
            else:
                state = batch_celt.make_state(self.n, channels)
                self.state = {k: jax.device_put(v, self._sh)
                              for k, v in state.items()}
        elif mode == Mode.SILK_ONLY and channels == 1:
            self.kind = "silk"
            self.fs = fs
            self.group = hg.SilkGroup(list(range(self.n)), jls, fs, 20)
            frame = ltp = 20 * fs
            st = dict(
                outBuf=jnp.zeros((self.n, ltp + frame), dtype=I32),
                sLPC=jnp.zeros((self.n, MAX_LPC_ORDER), dtype=I32),
                sIIR=jnp.zeros((self.n, 6), dtype=I32),
                sFIR=jnp.zeros((self.n, 8), dtype=I32),
                delay=jnp.zeros((self.n, fs), dtype=I32),
                sMid=jnp.zeros((self.n, 2), dtype=I32),
            )
            self.state = {k: jax.device_put(v, self._sh)
                          for k, v in st.items()}
        else:
            raise ValueError(f"unsupported sharded pool kind: {mode}")

    def _put(self, a):
        return jax.device_put(a, self._sh)

    # ------------------------------------------------------------ frame
    def _host_frame(self, lost=None, fec=None):
        """One host symbol phase over the group; returns (staging
        tuple of np arrays, pos snapshot, ok mask, lost mask) or None
        when every stream is exhausted. Cursors advance here so the
        NEXT frame's host phase reads the right packets even while the
        device window is still buffering.

        Loss semantics match the non-rfc StreamPool (the reference's:
        its celt_decode_lost is deleted): a lost CELT packet is
        consumed, the row's state is KEPT (inactive lane in the masked
        step) and silence is emitted; a lost SILK packet decodes the
        normal frame path over an EMPTY bitstream (per-row host
        fallback into the group's StateArray row — batch calls and
        fallbacks share that memory). fec recovers a lost SILK frame
        from the next packet's in-band LBRR instead when present.
        RFC-mode concealment at pod scale is PoolFarm's job (each
        shard pool has the full rfc_plc machinery)."""
        g = self.group
        pos = np.asarray(self.positions, dtype=np.int64)
        active = pos < g.table.n_packets
        if not active.any():
            return None
        lmask = np.zeros(self.n, dtype=bool)
        for i in lost or ():
            if 0 <= i < self.n:
                lmask[i] = True
        lmask &= active
        if self.kind == "celt":
            ok = g.decode(pos, active & ~lmask)
        else:
            ok = g.decode(pos, active & ~lmask)
            b = g.buf
            for r in np.nonzero(lmask)[0]:
                d = None
                if fec and r in fec \
                        and int(pos[r]) + 1 < len(self.streams[r].jobs):
                    from ..host.packet import parse_packet
                    nxt = parse_packet(
                        self.streams[r].jobs[int(pos[r]) + 1].data
                    ).frames[0]
                    d = g.hosts[r].fec_frame(nxt, self.fs, 20)
                    if d is not None:
                        self._stats["frames_fec"] += 1
                if d is None:
                    d = g.hosts[r].frame(b"", self.fs)
                b.exc[r] = d["exc"]
                b.A[r] = d["A"]
                b.B[r] = d["B"]
                b.gains[r] = d["gains"]
                b.inv[r] = d["inv"]
                b.lag[r] = d["lag"]
                b.adj[r] = d["adj"]
                b.flags[r, 0:4] = d["voiced"]
                b.flags[r, 4:8] = d["rewhiten"]
                b.flags[r, 8:12] = d["match"]
                ok[r] = True
        for r in np.nonzero(ok | lmask)[0]:
            self.positions[r] = int(pos[r]) + 1
        self._stats["steps"] += 1
        self._stats["frames"] += int((ok | lmask).sum())
        self._stats["frames_lost"] += int(lmask.sum())
        if self.kind == "celt":
            params = g.params
            sec = np.concatenate(
                [g.start[None], params[:, 15][None].astype(np.int32),
                 params[:, 3:9].T, params[:, 9:15].T], 0).astype(np.int32)
            if self.fused:
                # packed transposed-path staging row (StreamPool's
                # _stage_celt_T layout): [idx(2) tr sec(14) active
                # bandE(42) X(C*960)] int16
                from ..models.stream_pool import _CELT_HDR, NB_EBANDS
                C = g.C
                stgp = np.zeros(
                    (self.n, _CELT_HDR + 2 * NB_EBANDS + C * 960),
                    dtype=np.int16)
                stgp[:, 2] = params[:, 1].astype(np.int16)
                stgp[:, 3:17] = sec.T.astype(np.int16)
                stgp[:, 17] = ok.astype(np.int16)
                stgp[:, _CELT_HDR:_CELT_HDR + 2 * NB_EBANDS] = \
                    g.bandE.reshape(self.n, 2 * NB_EBANDS)
                stgp[:, _CELT_HDR + 2 * NB_EBANDS:] = \
                    g.X.reshape(self.n, C * 960)
                stg = (stgp,)
            else:
                stg = (g.X.reshape(self.n, g.C, 960).copy(),
                       g.bandE.reshape(self.n, 2, 21).copy(),
                       np.ascontiguousarray(sec.T),
                       params[:, 1].astype(bool).copy(),
                       ok.copy())
        else:
            b = g.buf
            iv = np.stack([b.gains, b.inv, b.lag, b.adj],
                          axis=1).astype(np.int32)
            bools = np.stack([b.flags[:, 0:4], b.flags[:, 4:8],
                              b.flags[:, 8:12]], axis=1).astype(bool)
            stg = (b.exc.copy(), b.A.copy(), b.B.copy(), iv, bools,
                   ok.copy())
        return stg, pos, ok, lmask

    def _route(self, out, pos, ok, lmask=None):
        """Distribute one frame's fetched PCM to the per-stream output
        lists (pre-skip / end-trim per packet). Fused CELT frames are
        transposed (CC, Nd, lanes): stream r is lane column r. Lost
        CELT rows (state kept, inactive lane) emit silence."""
        celt = self.kind == "celt"
        take = ok if lmask is None else (ok | lmask)
        for r in np.nonzero(take)[0]:
            k = int(pos[r])
            job = self.streams[r].jobs[k]
            if celt:
                pcm_r = out[:, :, r].T if self.fused else out[r].T
                if lmask is not None and lmask[r]:
                    pcm_r = np.zeros_like(pcm_r)
            else:
                pcm_r = out[r][:, None]
            lo, hi = job.discard_front, pcm_r.shape[0] - job.trim_end
            piece = pcm_r[lo:max(hi, lo)].astype(np.int16)
            self._stats["samples_out"] += piece.shape[0]
            self.pcm_out[r].append(piece)

    # ------------------------------------------------------- per-frame
    def _dispatch_frame(self, stg, pos, ok, lmask=None):
        if self.kind == "celt":
            X, bandE, secT, tr, okk = stg
            pcm, dm, pre = _celt_sharded_step(
                self.state["decode_mem"], self.state["preemph"],
                self._put(X), self._put(bandE), self._put(secT),
                self._put(tr), self._put(okk),
                LM=3, C=self.group.C, CC=self.channels)
            self.state["decode_mem"], self.state["preemph"] = dm, pre
            out = np.asarray(pcm)
        else:
            exc, A, B, iv, bools, okk = stg
            out48, st2 = _silk_sharded_step(
                self.state, self._put(exc), self._put(A), self._put(B),
                self._put(iv), self._put(bools), self._put(okk),
                fs=self.fs, nb=4, order=16 if self.fs == 16 else 10,
                frame=20 * self.fs)
            self.state = st2
            out = np.asarray(out48)
        self._route(out, pos, ok, lmask)

    # ------------------------------------------------------- superstep
    def _dispatch_window(self):
        """Run the buffered frames as ONE K-frame sharded program.
        A partial window pads with all-inactive zero frames so the
        compiled (K, ...) shapes are stable across flushes."""
        frames, self._win = self._win, []
        if not frames:
            return
        K = self.superstep_k
        stg0 = frames[0][0]
        while len(frames) < K:
            pad = tuple(np.zeros_like(a) for a in stg0)
            frames.append((pad, None, None, None))
        cols = [np.stack(parts)
                for parts in zip(*(f[0] for f in frames))]
        colsK = jax.device_put(tuple(cols), self._shK)
        if self.kind == "celt":
            if self.fused:
                fn = _fused_celt_superstep(self.mesh, 3, self.group.C,
                                           self.channels, self._interp)
                pcmK, dm, pre = fn(self.state["decode_mem"],
                                   self.state["preemph"], colsK[0])
            else:
                pcmK, dm, pre = _celt_sharded_superstep(
                    self.state["decode_mem"], self.state["preemph"],
                    *colsK, LM=3, C=self.group.C, CC=self.channels)
            self.state["decode_mem"], self.state["preemph"] = dm, pre
        else:
            kw = dict(fs=self.fs, nb=4,
                      order=16 if self.fs == 16 else 10,
                      frame=20 * self.fs)
            if self.fused:
                fn = _fused_silk_superstep(self.mesh, **kw)
                pcmK, st2 = fn(self.state, *colsK)
            else:
                pcmK, st2 = _silk_sharded_superstep(
                    self.state, *colsK, **kw)
            self.state = st2
        try:
            pcmK.copy_to_host_async()
        except AttributeError:
            pass
        self._pending.append((pcmK, frames))
        self._retire(limit=1)

    def _retire(self, limit: int = 0):
        """Fetch + route the oldest pending windows until at most
        `limit` remain in flight."""
        while len(self._pending) > limit:
            pcmK, frames = self._pending.pop(0)
            outK = np.asarray(pcmK)
            for k, (_stg, pos, ok, lmask) in enumerate(frames):
                if pos is None:
                    break
                self._route(outK[k], pos, ok, lmask)

    # ----------------------------------------------------------- drive
    def step(self, lost=None, fec=None) -> bool:
        """One frame on every active stream. superstep_k>1 buffers the
        frame's staging and dispatches once per K frames (flush() or
        run() drain a trailing partial window). lost/fec: sets of
        stream indices (see _host_frame for the pod-scale loss
        semantics)."""
        fr = self._host_frame(lost, fec)
        if fr is None:
            return False
        if self.superstep_k == 1 and not self.fused:
            self._dispatch_frame(*fr)
            return True
        # fused programs are window-shaped for every K (a K=1 window is
        # a length-1 scan), so fused mode always buffers+dispatches here
        self._win.append(fr)
        if len(self._win) >= self.superstep_k:
            self._dispatch_window()
        return True

    def flush(self):
        """Dispatch any buffered partial window (padded to K) and
        fetch every in-flight window's PCM."""
        if self._win:
            self._dispatch_window()
        self._retire(0)

    def run(self, loss=None, fec=False):
        """Decode everything; loss: callable (stream_idx, packet_idx)
        -> bool (pod-scale loss semantics, see _host_frame)."""
        while True:
            lost, fec_set = set(), set()
            if loss is not None:
                for i in range(self.n):
                    k = self.positions[i]
                    if k >= len(self.streams[i].jobs) or not loss(i, k):
                        continue
                    lost.add(i)
                    if fec and k + 1 < len(self.streams[i].jobs) \
                            and not loss(i, k + 1):
                        fec_set.add(i)
            if not self.step(lost, fec_set):
                break
        self.flush()
        return [np.concatenate(p) if p else
                np.zeros((0, self.channels), dtype=np.int16)
                for p in self.pcm_out]

    # ------------------------------------------------------ aux surface
    def stats(self) -> dict:
        """Decode statistics (the farm-grade observability surface,
        scoped to what the SPMD vehicle executes)."""
        active = sum(1 for i in range(self.n)
                     if self.positions[i] < len(self.streams[i].jobs))
        return dict(self._stats, streams=self.n, kind=self.kind,
                    mesh_devices=int(self.mesh.devices.size),
                    superstep_k=self.superstep_k, fused=self.fused,
                    active_streams=active)

    def save_checkpoint(self, path: str) -> None:
        """Snapshot the complete decode state: device pytrees (fetched
        to host), the group's native StateArray, cursors, buffered
        window staging, and undelivered PCM — preemptible-safe resume
        for the SPMD vehicle."""
        import pickle
        self._retire(0)    # land in-flight PCM in pcm_out first
        jax.block_until_ready(jax.tree_util.tree_leaves(self.state)[0])
        ck = dict(
            n=self.n, kind=self.kind, channels=self.channels,
            superstep_k=self.superstep_k,
            positions=list(self.positions),
            state={k: np.asarray(v) for k, v in self.state.items()},
            group_states=bytes(self.group.states.buf),
            win=[(tuple(np.asarray(a) for a in stg), pos, ok, lm)
                 for stg, pos, ok, lm in self._win],
            pcm_out=[[np.asarray(a) for a in per]
                     for per in self.pcm_out],
            stats=dict(self._stats),
        )
        with open(path, "wb") as f:
            pickle.dump(ck, f, protocol=pickle.HIGHEST_PROTOCOL)

    def load_checkpoint(self, path: str) -> None:
        """Restore a save_checkpoint snapshot onto this pool (must be
        constructed over the same sources/mesh shape)."""
        import pickle
        with open(path, "rb") as f:
            ck = pickle.load(f)
        if ck["n"] != self.n or ck["kind"] != self.kind \
                or ck["channels"] != self.channels \
                or ck["superstep_k"] != self.superstep_k:
            raise ValueError("checkpoint pool shape mismatch")
        self.positions = list(ck["positions"])
        sh = {"decode_mem": self._sh_lanes} if self.fused \
            and self.kind == "celt" else {}
        self.state = {k: jax.device_put(v, sh.get(k, self._sh))
                      for k, v in ck["state"].items()}
        raw = ck["group_states"]
        if len(raw) != self.group.states.buf.nbytes:
            raise ValueError("native state blob size mismatch")
        self.group.states.buf[:] = np.frombuffer(
            raw, dtype=np.uint8).reshape(self.group.states.buf.shape)
        self._win = [(stg, pos, ok, lm)
                     for stg, pos, ok, lm in ck["win"]]
        self.pcm_out = [[np.asarray(a) for a in per]
                        for per in ck["pcm_out"]]
        self._stats = dict(ck["stats"])
