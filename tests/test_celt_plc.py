"""Batched CELT packet-loss concealment (ops/celt/jax_plc.py): the
reference DELETED celt_decode_lost (lost CELT frames play silence);
rfc_plc pools restore the libopus 1.3.1 pitch-repeat semantics. The
golden here is the SYSTEM libopus float build driven over the same
packet/loss schedule via ctypes — divergence is bounded (fixed-vs-float
decode LSBs + float32 device math), so the test enforces an SNR floor
per concealed frame rather than bit-exactness."""
import ctypes
import ctypes.util

import numpy as np
import pytest

from conftest import fixture_path


def _libopus():
    name = ctypes.util.find_library("opus")
    if not name:
        pytest.skip("system libopus not available")
    lib = ctypes.CDLL(name)
    lib.opus_decoder_create.restype = ctypes.c_void_p
    return lib


def _lib_decode(lib, dec, data, n=960):
    pcm = np.zeros(n, np.int16)
    buf = pcm.ctypes.data_as(ctypes.POINTER(ctypes.c_short))
    if data is None:
        got = lib.opus_decode(ctypes.c_void_p(dec), None, 0, buf, n, 0)
    else:
        got = lib.opus_decode(ctypes.c_void_p(dec), data, len(data),
                              buf, n, 0)
    assert got == n
    return pcm


def _snr(ref, got):
    e = got.astype(np.float64) - ref.astype(np.float64)
    return 10 * np.log10((np.sum(ref.astype(np.float64) ** 2) + 1)
                         / (np.sum(e ** 2) + 1))


@pytest.mark.slow
def test_celt_plc_matches_libopus_bounded():
    """Pool conceal vs libopus over the same loss schedule: one
    isolated loss and a 3-frame burst; every concealed frame must be
    non-silent and within bounded divergence of libopus' concealment
    (prototype measured 20-75 dB; the floor here is 15 dB)."""
    from esp32_opus_player_tpu.host import opusfile
    from esp32_opus_player_tpu.models.stream_pool import StreamPool
    lib = _libopus()
    src = str(fixture_path("celt_fb_mono_20ms"))
    jobs = opusfile.parse_stream(open(src, "rb").read()).jobs
    LOST = {20, 40, 41, 42}          # isolated + 3-burst
    err = ctypes.c_int()
    dec = lib.opus_decoder_create(48000, 1, ctypes.byref(err))
    ref_frames = {}
    for k, job in enumerate(jobs[:50]):
        if k in LOST:
            ref_frames[k] = _lib_decode(lib, dec, None)
        else:
            _lib_decode(lib, dec, job.data)
    lib.opus_decoder_destroy(ctypes.c_void_p(dec))

    pool = StreamPool([src], channels=1, compat_ref=False,
                      rfc_plc=True, fixed_buckets=True)
    for k in range(50):
        pool.step(lost={0} if k in LOST else None)
    got = pool.collected()[0][:, 0]
    pre_skip = jobs[0].discard_front
    for k in sorted(LOST):
        lo = 960 * k - pre_skip
        frame = got[lo:lo + 960]
        ref = ref_frames[k]
        rms = np.sqrt(np.mean(frame.astype(np.float64) ** 2))
        assert rms > 100, f"frame {k} concealed as near-silence"
        assert _snr(ref, frame) > 15.0, \
            f"frame {k}: SNR {_snr(ref, frame):.1f} dB vs libopus"
    # the stream keeps decoding after the burst (no crash / stuck rows)
    assert got.shape[0] >= 960 * 50 - pre_skip - 960
    st = pool.stats()
    assert st["frames_lost"] == len(LOST)
    assert st["frames_scalar"] == 0


@pytest.mark.slow
def test_celt_plc_state_carries_across_burst():
    """Consecutive losses reuse the first loss' pitch/LPC fit (libopus
    keeps them in decoder state); the device state must carry them."""
    from esp32_opus_player_tpu.models.stream_pool import StreamPool
    src = str(fixture_path("celt_fb_mono_drums_20ms"))
    pool = StreamPool([src] * 2, channels=1, compat_ref=False,
                      rfc_plc=True, fixed_buckets=True)
    for k in range(30):
        pool.step(lost={0} if 20 <= k < 24 else None)
    p_after = np.asarray(pool.state["plc_pitch"])
    assert p_after[0] > 0                  # a pitch was fit for row 0
    assert p_after[1] == 0                 # untouched row stays zero
    lpc = np.asarray(pool.state["plc_lpc"])
    assert np.any(lpc[0] != 0) and not np.any(lpc[1] != 0)
    out = pool.collected()
    # lossless stream 1 must be unaffected by stream 0's conceals
    ref = StreamPool([src], channels=1, compat_ref=False,
                     rfc_plc=True, fixed_buckets=True).run()[0]
    n = min(out[1].shape[0], ref.shape[0])
    assert np.array_equal(out[1][:n], ref[:n])


@pytest.mark.slow
def test_celt_plc_long_burst_noise_branch():
    """8-frame burst (VERDICT r04 #5): conceals 0-4 run the pitch
    branch, conceals 5+ switch to libopus' noise branch (LCG noise at
    decayed band energies through the NORMAL synthesis path). The LCG
    seeds from the range-coder state, so the noise aligns sample-for-
    sample with libopus — measured 68-72 dB SNR per concealed frame on
    this fixture (fixed-vs-float LSBs only); floor set at 30 dB."""
    from esp32_opus_player_tpu.host import opusfile
    from esp32_opus_player_tpu.models.stream_pool import StreamPool
    lib = _libopus()
    src = str(fixture_path("celt_fb_mono_20ms"))
    jobs = opusfile.parse_stream(open(src, "rb").read()).jobs
    LOST = set(range(20, 28))
    err = ctypes.c_int()
    dec = lib.opus_decoder_create(48000, 1, ctypes.byref(err))
    ref_frames = {}
    for k, job in enumerate(jobs[:40]):
        if k in LOST:
            ref_frames[k] = _lib_decode(lib, dec, None)
        else:
            _lib_decode(lib, dec, job.data)
    lib.opus_decoder_destroy(ctypes.c_void_p(dec))

    pool = StreamPool([src], channels=1, compat_ref=False, rfc_plc=True)
    for k in range(40):
        pool.step(lost={0} if k in LOST else None)
    got = pool.collected()[0][:, 0]
    pre = jobs[0].discard_front
    for k in sorted(LOST):
        frame = got[960 * k - pre:960 * k - pre + 960]
        snr = _snr(ref_frames[k], frame)
        assert snr > 30.0, f"frame {k}: SNR {snr:.1f} dB vs libopus"
    # the noise branch engaged (it tracks libopus' rms jump at frame 25)
    assert np.any(got[960 * 25 - pre:960 * 25 - pre + 960] != 0)
