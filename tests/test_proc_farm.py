"""Multi-process farm (the DCN / multi-host stand-in): N streams split
across worker PROCESSES decode bit-exactly — the VERDICT r02 ask for a
multi-process demonstration of the farm topology (SURVEY §2.7
collective/communication backend row). Each worker builds its own
StreamPool in a spawned child (fresh JAX, platform pinned to the
coordinator's backend); the coordinator fans out per-step loss/FEC
control and gathers PCM over OS pipes."""
import numpy as np
import pytest

from conftest import fixture_path

from esp32_opus_player_tpu.api import DecoderConfig, decode_file
from esp32_opus_player_tpu.parallel.proc_farm import ProcFarm

NAMES = ["celt_fb_mono_20ms", "silk_wb_mono_20ms",
         "celt_fb_mono_20ms", "silk_nb_mono_20ms"]


@pytest.mark.slow
def test_proc_farm_bitexact():
    srcs = [str(fixture_path(n)) for n in NAMES]
    refs = [decode_file(s, DecoderConfig(channels=1)) for s in srcs]
    with ProcFarm(srcs, n_workers=2, channels=1, native=True) as farm:
        assert farm.n_workers == 2
        outs = farm.run()
        rngs = farm.final_ranges()
    for i, (out, ref) in enumerate(zip(outs, refs)):
        assert np.array_equal(out, ref), NAMES[i]
    assert all(r != 0 for r in rngs)


@pytest.mark.slow
def test_proc_farm_loss_fec_routing():
    """Global per-step loss/FEC sets split correctly across workers:
    the farm result matches a scalar replay with the same loss
    pattern (FEC recovery from the next packet's LBRR)."""
    from esp32_opus_player_tpu.host import opusfile
    from esp32_opus_player_tpu.models.opus_decoder import OpusDecoder

    name = "silk_wb_fec_mono_20ms"
    src = str(fixture_path(name))
    lossfn = lambda k: k > 0 and k % 4 == 0

    s = opusfile.open_file(src)
    dec = OpusDecoder(1, compat_ref=False)
    out = []
    jobs = s.jobs
    for k, job in enumerate(jobs):
        if lossfn(k):
            if k + 1 < len(jobs) and not lossfn(k + 1):
                pcm = dec.decode(jobs[k + 1].data, decode_fec=True)
            else:
                pcm = dec.decode(None)
        else:
            pcm = dec.decode(job.data)
        lo = job.discard_front
        hi = pcm.shape[0] - job.trim_end
        out.append(pcm[lo:max(hi, lo)])
    ref = np.concatenate(out)

    with ProcFarm([src] * 3, n_workers=2, channels=1, native=True,
                  compat_ref=False, rfc_plc=True) as farm:
        outs = farm.run(loss=lambda g, k: lossfn(k), fec=True)
        st = farm.stats()
    assert len(st) == 2 and sum(d["frames_fec"] for d in st) > 0
    for g in range(3):
        assert np.array_equal(outs[g], ref), f"stream {g}"


@pytest.mark.slow
def test_net_farm_tcp_bitexact():
    """TCP farm (NetFarm): the same coordinator protocol over real
    network sockets — workers connect to the coordinator's listen
    address and get their assignment in the init handshake, so they
    can live on other hosts (the DCN ingest shape). Local spawn mode
    exercises the identical wire path over loopback."""
    from esp32_opus_player_tpu.parallel.net_farm import NetFarm
    srcs = [str(fixture_path(n)) for n in NAMES]
    refs = [decode_file(s, DecoderConfig(channels=1)) for s in srcs]
    with NetFarm(srcs, n_workers=2, channels=1, native=True) as farm:
        assert farm.n_workers == 2
        host, port = farm.address
        assert port > 0
        outs = farm.run()
        rngs = farm.final_ranges()
    for i, (out, ref) in enumerate(zip(outs, refs)):
        assert np.array_equal(out, ref), NAMES[i]
    assert all(r != 0 for r in rngs)


@pytest.mark.slow
def test_net_farm_external_worker_joins():
    """A worker started via the CLI entry (python -m ...net_farm
    HOST:PORT) — i.e. what a REMOTE host would run — joins the farm
    alongside a locally spawned worker and decodes bit-exactly."""
    import socket as _socket
    import subprocess
    import sys as _sys

    from esp32_opus_player_tpu.parallel.net_farm import NetFarm
    # reserve a port for the coordinator (close-then-reuse race is
    # acceptable in a test)
    s = _socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    code = (
        "import socket, time\n"
        "from esp32_opus_player_tpu.parallel.net_farm import run_worker\n"
        "for _ in range(600):\n"
        "    try:\n"
        f"        run_worker(('127.0.0.1', {port}))\n"
        "        break\n"
        "    except (ConnectionRefusedError, OSError):\n"
        "        time.sleep(0.1)\n"
    )
    ext = subprocess.Popen([_sys.executable, "-c", code])
    try:
        srcs = [str(fixture_path(n)) for n in NAMES[:2]]
        refs = [decode_file(s_, DecoderConfig(channels=1))
                for s_ in srcs]
        with NetFarm(srcs, n_workers=2, listen=("127.0.0.1", port),
                     spawn_local=1, channels=1, native=True,
                     platform="cpu") as farm:
            outs = farm.run()
        for i, (out, ref) in enumerate(zip(outs, refs)):
            assert np.array_equal(out, ref), NAMES[i]
    finally:
        ext.wait(timeout=60)
