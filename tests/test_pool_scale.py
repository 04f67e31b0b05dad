"""Moderate-scale heterogeneous pool: 96 mixed streams (every mono mode,
both CELT content types, hybrid, FEC-carrying SILK) decoded in ONE
StreamPool with packet loss + in-band FEC on a subset — proves the
bucket/gather/scatter machinery and the batched host symbol phase at a
size where the per-kind groups, pow2 capacities and the pipelined
materialization all interact (BASELINE config 4/5 shape)."""
import numpy as np
import pytest

from esp32_opus_player_tpu.host import opusfile
from esp32_opus_player_tpu.models.opus_decoder import OpusDecoder
from esp32_opus_player_tpu.models.stream_pool import StreamPool

from conftest import fixture_path, golden_pcm

KINDS = ["celt_fb_mono_20ms", "celt_fb_mono_drums_20ms",
         "celt_nb_mono_20ms", "silk_nb_mono_20ms", "silk_mb_mono_20ms",
         "silk_wb_mono_20ms", "silk_wb_fec_mono_20ms",
         "hybrid_swb_mono_20ms"]
COPIES = 12          # 8 kinds x 12 copies = 96 streams
LOSS_PERIOD = 7


def _lossy_streams(n):
    # one lossy stream per kind (the first copy of each)
    return {k * COPIES for k in range(len(KINDS))} & set(range(n))


def _has_lbrr(packet_data):
    from esp32_opus_player_tpu.host.packet import parse_packet
    from esp32_opus_player_tpu.host.range_decoder import RangeDecoder
    f = parse_packet(packet_data).frames[0]
    d = RangeDecoder(f)
    d.dec_bit_logp(1)   # VAD flag (mono 20 ms: one frame per packet)
    return bool(d.dec_bit_logp(1))


def _scalar_expected(name, lossy, fec):
    """Scalar replay of the pool's policy: FEC recovery when the next
    packet carries LBRR, the compat loss path otherwise (CELT-only
    packets carry no LBRR by definition)."""
    from esp32_opus_player_tpu.host.packet import Mode, get_mode
    s = opusfile.open_file(fixture_path(name))
    dec = OpusDecoder(1, compat_ref=True)
    out = []
    jobs = s.jobs
    for k, job in enumerate(jobs):
        lost = lossy and k > 0 and k % LOSS_PERIOD == 0
        if lost:
            pcm = None
            nxt = jobs[k + 1].data if k + 1 < len(jobs) else None
            if fec and nxt is not None \
                    and not ((k + 1) % LOSS_PERIOD == 0) \
                    and get_mode(nxt[0]) != Mode.CELT_ONLY \
                    and _has_lbrr(nxt):
                pcm = dec.decode(nxt, decode_fec=True)
            if pcm is None:
                try:
                    pcm = dec.decode(None)
                except ValueError:
                    pcm = np.zeros((960, 1), dtype=np.int16)
        else:
            pcm = dec.decode(job.data)
        lo = job.discard_front
        hi = pcm.shape[0] - job.trim_end
        out.append(pcm[lo:max(hi, lo)])
    return np.concatenate(out)


@pytest.mark.slow
def test_pool_96_heterogeneous_streams_with_loss_and_fec():
    srcs = []
    for name in KINDS:
        srcs += [str(fixture_path(name))] * COPIES
    n = len(srcs)
    lossy = _lossy_streams(n)

    pool = StreamPool(srcs, channels=1, native=True, compat_ref=True,
                      fixed_buckets=True)
    # every batched kind must be represented (no silent scalar fallback)
    kinds = {p[0] for p in pool.path}
    assert kinds == {"celt", "silk", "hybrid"}

    outs = pool.run(
        loss=lambda i, k: i in lossy and k > 0 and k % LOSS_PERIOD == 0,
        fec=True)

    for i, src in enumerate(srcs):
        name = KINDS[i // COPIES]
        if i in lossy:
            want = _scalar_expected(name, True, True)
        else:
            want = golden_pcm(name)[:, :1]
        assert np.array_equal(outs[i], want), (i, name)

    st = pool.stats()
    assert st["streams"] == n
    assert st["frames_lost"] > 0
    assert st["frames_fec"] > 0
    # the bucket histogram shows real batching (capacities >= 16)
    assert any(bk[-1] >= 16 for bk in st["buckets"])
    # final ranges present for every stream
    assert all(r is not None for r in pool.final_ranges())
