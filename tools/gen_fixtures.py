"""Generate the Ogg/Opus test fixtures + golden data.

Outputs (committed to the repo so tests are hermetic):
  tests/fixtures/<name>.opus          — Ogg/Opus file (system libopus encoder)
  tests/fixtures/manifest.json        — per-fixture metadata
  tests/golden/<name>.pcm             — raw s16le interleaved stereo 48 kHz PCM
                                         from the compiled reference oracle
  tests/golden/<name>.ranges.json     — per-packet OPUS_GET_FINAL_RANGE from
                                         libopus (entropy-path golden) + packet
                                         sizes and TOC bytes

Run: python tools/gen_fixtures.py   (builds tests/oracle first if needed)
"""
from __future__ import annotations

import json
import pathlib
import subprocess
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).parent))
import libopus_ctypes as lo  # noqa: E402
import oggmux  # noqa: E402

ROOT = pathlib.Path(__file__).resolve().parent.parent
FIXDIR = ROOT / "tests" / "fixtures"
GOLDDIR = ROOT / "tests" / "golden"
ORACLE = ROOT / "tests" / "oracle" / "build" / "ref_decode"

# 48kHz samples per frame for each TOC config (RFC 6716 §3.1).
_CFG_DUR = [480, 960, 1920, 2880] * 3 + [480, 960] * 2 + \
           [120, 240, 480, 960] * 4


def toc_duration48k(packet: bytes) -> int:
    toc = packet[0]
    cfg, code = toc >> 3, toc & 3
    per_frame = _CFG_DUR[cfg]
    if code == 0:
        n = 1
    elif code in (1, 2):
        n = 2
    else:
        n = packet[1] & 0x3F
    return per_frame * n


def synth(kind: str, seconds: float, channels: int, fs: int = 48000,
          seed: int = 1234) -> np.ndarray:
    """Deterministic test signals, amplitude well inside int16."""
    rng = np.random.default_rng(seed)
    n = int(seconds * fs)
    t = np.arange(n) / fs
    if kind == "music":
        x = np.zeros(n)
        for f0, a in [(220, .22), (330, .16), (440, .12), (587, .1),
                      (1760, .06), (3520, .04), (7040, .025), (12000, .012)]:
            vib = 1 + 0.003 * np.sin(2 * np.pi * 5.1 * t + f0)
            x += a * np.sin(2 * np.pi * f0 * vib * t)
        x *= 0.75 + 0.25 * np.sin(2 * np.pi * 0.9 * t)
        x += 0.01 * rng.standard_normal(n)
    elif kind == "voice":
        f0 = 118 * (1 + 0.08 * np.sin(2 * np.pi * 2.3 * t))
        phase = 2 * np.pi * np.cumsum(f0) / fs
        x = np.zeros(n)
        for h in range(1, 14):
            formant = np.exp(-((h * 118 - 700) / 600) ** 2) + \
                0.6 * np.exp(-((h * 118 - 1800) / 500) ** 2) + 0.25
            x += (formant / h) * np.sin(h * phase)
        # syllable-style energy envelope incl. brief near-silence
        env = np.clip(np.sin(2 * np.pi * 3.1 * t), 0.02, 1.0)
        x = 0.35 * x * env + 0.004 * rng.standard_normal(n)
    elif kind == "drums":
        # percussive: exponential-decay noise bursts + tonal bed -> many
        # transient frames (anti-collapse, short MDCTs)
        x = 0.05 * np.sin(2 * np.pi * 180 * t)
        period = int(0.11 * fs)
        for start in range(0, n - 2000, period):
            ln = 1800
            burst = rng.standard_normal(ln) * np.exp(-np.arange(ln) / 300.0)
            x[start:start + ln] += 0.7 * burst
    elif kind == "noise":
        x = 0.25 * rng.standard_normal(n)
    else:
        raise ValueError(kind)
    x = np.clip(x, -0.95, 0.95)
    pcm = (x * 32767).astype(np.int16)
    if channels == 2:
        delayed = np.roll(pcm, 7)
        right = (0.7 * delayed + 0.3 * pcm).astype(np.int16)
        pcm = np.stack([pcm, right], axis=1)
    else:
        pcm = pcm[:, None]
    return pcm


FIXTURES = [
    # name, kind, ch, seconds, frame_ms, ctls
    ("celt_fb_mono_20ms", "music", 1, 2.0, 20,
     dict(mode=lo.MODE_CELT_ONLY, bw=lo.OPUS_BANDWIDTH_FULLBAND, br=96000)),
    ("celt_fb_stereo_20ms", "music", 2, 2.0, 20,
     dict(mode=lo.MODE_CELT_ONLY, bw=lo.OPUS_BANDWIDTH_FULLBAND, br=128000)),
    ("celt_nb_mono_20ms", "voice", 1, 2.0, 20,
     dict(mode=lo.MODE_CELT_ONLY, bw=lo.OPUS_BANDWIDTH_NARROWBAND, br=32000)),
    ("celt_swb_stereo_10ms", "music", 2, 1.5, 10,
     dict(mode=lo.MODE_CELT_ONLY, bw=lo.OPUS_BANDWIDTH_SUPERWIDEBAND,
          br=96000)),
    ("celt_fb_mono_5ms", "music", 1, 1.0, 5,
     dict(mode=lo.MODE_CELT_ONLY, bw=lo.OPUS_BANDWIDTH_FULLBAND, br=128000)),
    ("celt_fb_stereo_2p5ms", "music", 2, 0.5, 2.5,
     dict(mode=lo.MODE_CELT_ONLY, bw=lo.OPUS_BANDWIDTH_FULLBAND, br=192000)),
    ("silk_nb_mono_20ms", "voice", 1, 2.0, 20,
     dict(mode=lo.MODE_SILK_ONLY, bw=lo.OPUS_BANDWIDTH_NARROWBAND, br=12000,
          app=lo.OPUS_APPLICATION_VOIP)),
    ("silk_mb_mono_20ms", "voice", 1, 2.0, 20,
     dict(mode=lo.MODE_SILK_ONLY, bw=lo.OPUS_BANDWIDTH_MEDIUMBAND, br=16000,
          app=lo.OPUS_APPLICATION_VOIP)),
    ("silk_wb_mono_20ms", "voice", 1, 2.0, 20,
     dict(mode=lo.MODE_SILK_ONLY, bw=lo.OPUS_BANDWIDTH_WIDEBAND, br=24000,
          app=lo.OPUS_APPLICATION_VOIP)),
    ("silk_wb_stereo_20ms", "voice", 2, 2.0, 20,
     dict(mode=lo.MODE_SILK_ONLY, bw=lo.OPUS_BANDWIDTH_WIDEBAND, br=36000,
          app=lo.OPUS_APPLICATION_VOIP)),
    ("silk_wb_mono_60ms", "voice", 1, 2.4, 60,
     dict(mode=lo.MODE_SILK_ONLY, bw=lo.OPUS_BANDWIDTH_WIDEBAND, br=20000,
          app=lo.OPUS_APPLICATION_VOIP)),
    ("silk_wb_mono_10ms", "voice", 1, 1.5, 10,
     dict(mode=lo.MODE_SILK_ONLY, bw=lo.OPUS_BANDWIDTH_WIDEBAND,
          br=24000, app=lo.OPUS_APPLICATION_VOIP)),
    ("silk_wb_mono_40ms", "voice", 1, 2.4, 40,
     dict(mode=lo.MODE_SILK_ONLY, bw=lo.OPUS_BANDWIDTH_WIDEBAND,
          br=22000, app=lo.OPUS_APPLICATION_VOIP)),
    ("silk_nb_stereo_40ms", "voice", 2, 2.4, 40,
     dict(mode=lo.MODE_SILK_ONLY, bw=lo.OPUS_BANDWIDTH_NARROWBAND, br=18000,
          app=lo.OPUS_APPLICATION_VOIP)),
    ("silk_nb_stereo_20ms", "voice", 2, 2.0, 20,
     dict(mode=lo.MODE_SILK_ONLY, bw=lo.OPUS_BANDWIDTH_NARROWBAND,
          br=24000, app=lo.OPUS_APPLICATION_VOIP)),
    # 16 kbps NB "stereo": the encoder collapses to MONO payloads —
    # exercises mono-SILK-into-stereo-API (reference UB, see manifest)
    ("silk_nb2mono_20ms", "voice", 2, 2.0, 20,
     dict(mode=lo.MODE_SILK_ONLY, bw=lo.OPUS_BANDWIDTH_NARROWBAND,
          br=16000, app=lo.OPUS_APPLICATION_VOIP)),
    ("silk_wb_fec_mono_20ms", "voice", 1, 2.0, 20,
     dict(mode=lo.MODE_SILK_ONLY, bw=lo.OPUS_BANDWIDTH_WIDEBAND, br=24000,
          app=lo.OPUS_APPLICATION_VOIP, fec=1, loss=20)),
    ("silk_wb_fec_stereo_20ms", "voice", 2, 2.0, 20,
     dict(mode=lo.MODE_SILK_ONLY, bw=lo.OPUS_BANDWIDTH_WIDEBAND, br=36000,
          app=lo.OPUS_APPLICATION_VOIP, fec=1, loss=20)),
    ("silk_wb_stereo_60ms", "voice", 2, 2.4, 60,
     dict(mode=lo.MODE_SILK_ONLY, bw=lo.OPUS_BANDWIDTH_WIDEBAND, br=18000,
          app=lo.OPUS_APPLICATION_VOIP)),
    ("hybrid_fb_stereo_20ms", "music", 2, 2.0, 20,
     dict(mode=lo.MODE_HYBRID, bw=lo.OPUS_BANDWIDTH_FULLBAND, br=40000)),
    ("hybrid_swb_mono_20ms", "voice", 1, 2.0, 20,
     dict(mode=lo.MODE_HYBRID, bw=lo.OPUS_BANDWIDTH_SUPERWIDEBAND, br=28000,
          app=lo.OPUS_APPLICATION_VOIP)),
    ("hybrid_fb_mono_10ms", "music", 1, 1.5, 10,
     dict(mode=lo.MODE_HYBRID, bw=lo.OPUS_BANDWIDTH_FULLBAND, br=36000)),
    ("hybrid_fb_stereo_10ms", "music", 2, 1.5, 10,
     dict(mode=lo.MODE_HYBRID, bw=lo.OPUS_BANDWIDTH_FULLBAND, br=56000)),
    # 10 ms in-band FEC (RFC 6716: a 10 ms packet carries ONE LBRR flag
    # and one nb_subfr=2 LBRR copy; silk.cpp:1565 with nFramesPerPacket=1)
    ("silk_wb_fec_mono_10ms", "voice", 1, 1.5, 10,
     dict(mode=lo.MODE_SILK_ONLY, bw=lo.OPUS_BANDWIDTH_WIDEBAND, br=32000,
          app=lo.OPUS_APPLICATION_VOIP, fec=1, loss=20)),
    ("silk_wb_fec_stereo_10ms", "voice", 2, 1.5, 10,
     dict(mode=lo.MODE_SILK_ONLY, bw=lo.OPUS_BANDWIDTH_WIDEBAND, br=44000,
          app=lo.OPUS_APPLICATION_VOIP, fec=1, loss=20)),
    ("hybrid_swb_fec_mono_10ms", "voice", 1, 1.5, 10,
     dict(mode=lo.MODE_HYBRID, bw=lo.OPUS_BANDWIDTH_SUPERWIDEBAND, br=36000,
          app=lo.OPUS_APPLICATION_VOIP, fec=1, loss=20)),
    ("hybrid_swb_fec_mono_20ms", "voice", 1, 2.0, 20,
     dict(mode=lo.MODE_HYBRID, bw=lo.OPUS_BANDWIDTH_SUPERWIDEBAND, br=28000,
          app=lo.OPUS_APPLICATION_VOIP, fec=1, loss=20)),
    ("celt_fb_mono_drums_20ms", "drums", 1, 2.0, 20,
     dict(mode=lo.MODE_CELT_ONLY, bw=lo.OPUS_BANDWIDTH_FULLBAND, br=96000)),
    ("celt_fb_stereo_drums_20ms", "drums", 2, 2.0, 20,
     dict(mode=lo.MODE_CELT_ONLY, bw=lo.OPUS_BANDWIDTH_FULLBAND, br=128000)),
    # mode transitions: SILK -> CELT -> hybrid segments in one stream
    ("modeswitch_stereo_20ms", "music", 2, 3.0, 20, dict(switch=True)),
    # mapping family 1 (multistream header path), 1 coupled stream
    ("celt_fb_stereo_family1", "music", 2, 1.0, 20,
     dict(mode=lo.MODE_CELT_ONLY, bw=lo.OPUS_BANDWIDTH_FULLBAND, br=128000,
          family=1)),
]


def encode_fixture(name, kind, channels, seconds, frame_ms, opts):
    fs = 48000
    frame = int(fs * frame_ms / 1000)
    pcm = synth(kind, seconds, channels, seed=hash(name) % (2**31))
    nframes = pcm.shape[0] // frame
    pcm = pcm[: nframes * frame]

    app = opts.get("app", lo.OPUS_APPLICATION_AUDIO)
    enc = lo.Encoder(fs, channels, app)
    enc.ctl_set(lo.OPUS_SET_COMPLEXITY, 10)
    if "br" in opts:
        enc.ctl_set(lo.OPUS_SET_BITRATE, opts["br"])
    if "bw" in opts:
        enc.ctl_set(lo.OPUS_SET_BANDWIDTH, opts["bw"])
    if "mode" in opts:
        enc.ctl_set(lo.OPUS_SET_FORCE_MODE, opts["mode"])
    if opts.get("fec"):
        enc.ctl_set(lo.OPUS_SET_INBAND_FEC, 1)
        enc.ctl_set(lo.OPUS_SET_PACKET_LOSS_PERC, opts.get("loss", 20))
    pre_skip = enc.ctl_get(lo.OPUS_GET_LOOKAHEAD)

    switch = opts.get("switch", False)
    packets = []
    for i in range(nframes):
        if switch:
            seg = i * 3 // nframes
            if i == 0 or i == nframes // 3 or i == 2 * nframes // 3:
                mode = [lo.MODE_SILK_ONLY, lo.MODE_CELT_ONLY,
                        lo.MODE_HYBRID][seg]
                bw = [lo.OPUS_BANDWIDTH_WIDEBAND, lo.OPUS_BANDWIDTH_FULLBAND,
                      lo.OPUS_BANDWIDTH_FULLBAND][seg]
                br = [24000, 96000, 48000][seg]
                enc.ctl_set(lo.OPUS_SET_BITRATE, br)
                enc.ctl_set(lo.OPUS_SET_BANDWIDTH, bw)
                enc.ctl_set(lo.OPUS_SET_FORCE_MODE, mode)
        packets.append(enc.encode(pcm[i * frame:(i + 1) * frame].ravel(),
                                  frame))
    durs = [toc_duration48k(p) for p in packets]

    data = oggmux.mux(packets, durs, channels=channels, pre_skip=pre_skip,
                      mapping_family=opts.get("family", 0))
    return data, packets, dict(channels=channels, pre_skip=pre_skip,
                               frame_ms=frame_ms, n_packets=len(packets),
                               n_pcm=int(sum(durs)),
                               mapping_family=opts.get("family", 0))


def golden_ranges(packets, channels):
    """Per-packet final range + decoded sample count from libopus."""
    dec = lo.Decoder(48000, channels)
    recs = []
    for p in packets:
        out = dec.decode(p)
        recs.append(dict(size=len(p), toc=p[0], n=out.shape[0],
                         final_range=dec.final_range()))
    return recs


def main():
    # optional argv name filter: regenerate ONLY the named fixtures (new
    # additions) without touching committed ones encoded by an earlier
    # libopus build
    only = set(sys.argv[1:])
    FIXDIR.mkdir(parents=True, exist_ok=True)
    GOLDDIR.mkdir(parents=True, exist_ok=True)
    if not ORACLE.exists():
        subprocess.run(["make", "-C", str(ORACLE.parent.parent)], check=True)
    manifest = {}
    if (FIXDIR / "manifest.json").exists():
        manifest = json.loads((FIXDIR / "manifest.json").read_text())
    for name, kind, ch, secs, fms, opts in FIXTURES:
        if only and name not in only:
            continue
        data, packets, meta = encode_fixture(name, kind, ch, secs, fms, opts)
        (FIXDIR / f"{name}.opus").write_bytes(data)
        recs = golden_ranges(packets, ch)
        (GOLDDIR / f"{name}.ranges.json").write_text(json.dumps(recs))
        r = subprocess.run([str(ORACLE), str(FIXDIR / f"{name}.opus"),
                            str(GOLDDIR / f"{name}.pcm")],
                           capture_output=True, text=True)
        meta["oracle_rc"] = r.returncode
        meta["oracle_stderr"] = r.stderr.strip()[-200:]
        npcm = (GOLDDIR / f"{name}.pcm").stat().st_size // 4
        meta["oracle_samples"] = npcm
        manifest[name] = meta
        print(f"{name}: {meta['n_packets']} pkts, {npcm} golden samples, "
              f"rc={r.returncode}")
    (FIXDIR / "manifest.json").write_text(json.dumps(manifest, indent=1))


if __name__ == "__main__":
    main()


def make_loss_golden(name="silk_wb_mono_20ms", ch=1, period=7):
    """Golden PCM for the packet-loss path: every `period`-th packet decoded
    as NULL through the reference multistream decoder (tests/oracle/ref_plc).
    """
    import struct
    sys.path.insert(0, str(ROOT))
    from esp32_opus_player_tpu.host import opusfile as _of
    s = _of.open_file(FIXDIR / f"{name}.opus")
    pkts = ROOT / "tests" / "golden" / f"{name}.pkts.tmp"
    with open(pkts, "wb") as f:
        f.write(struct.pack("<I", len(s.jobs)))
        for j in s.jobs:
            f.write(struct.pack("<I", len(j.data)) + j.data)
    out = GOLDDIR / f"{name}.loss{period}.pcm"
    subprocess.run([str(ORACLE.parent / "ref_plc"), str(pkts), str(out),
                    str(ch), str(period)], check=True)
    pkts.unlink()
    print(f"loss golden: {out}")
