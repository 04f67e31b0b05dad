"""Granule-position overflow-edge semantics (op_granpos_add/diff/cmp,
reference src/opusfile.cpp:299-401): 64-bit wraparound through INT64_MIN,
-1-avoidance, and the decode pipeline surviving a stream whose granule
positions sit at the wrap edge."""
import numpy as np
import pytest

from esp32_opus_player_tpu.host.opusfile import (
    granpos_add, granpos_diff, granpos_cmp, GranposError,
    INT64_MAX, INT64_MIN, parse_stream)

from conftest import fixture_path


def test_granpos_add_wraps_through_min():
    # adding past INT64_MAX wraps into the negative range and keeps going
    assert granpos_add(INT64_MAX, 1) == INT64_MIN
    assert granpos_add(INT64_MAX - 2, 5) == INT64_MIN + 2
    # subtracting across the wrap goes back
    assert granpos_add(INT64_MIN, -1) == INT64_MAX
    assert granpos_add(INT64_MIN + 2, -5) == INT64_MAX - 2


def test_granpos_add_einval_edges():
    # producing -1 is invalid (it means 'no packet ends on this page')
    with pytest.raises(GranposError):
        granpos_add(-3, 2)
    # underflowing below 0 from a non-wrapped position is invalid
    with pytest.raises(GranposError):
        granpos_add(5, -6)
    assert granpos_add(5, -5) == 0


def test_granpos_diff_across_wrap():
    # a wrapped (negative) gp minus a positive one is a positive span
    assert granpos_diff(INT64_MIN, INT64_MAX) == 1
    assert granpos_diff(INT64_MIN + 9, INT64_MAX - 10) == 20
    assert granpos_diff(INT64_MAX - 10, INT64_MIN + 9) == -20
    with pytest.raises(GranposError):
        granpos_diff(-2, 0)   # span > 2^63-1 does not fit


def test_granpos_cmp_wrap_ordering():
    # wrapped positions order ABOVE all positive ones
    assert granpos_cmp(INT64_MIN, INT64_MAX) == 1
    assert granpos_cmp(INT64_MAX, INT64_MIN) == -1
    assert granpos_cmp(7, 7) == 0
    assert granpos_cmp(3, 9) == -1


def test_stream_with_wrap_edge_granulepos():
    """Remux a fixture so its granule positions straddle the INT64
    wrap; timestamping must survive and trim exactly one end sample."""
    import sys, pathlib
    sys.path.insert(0, str(pathlib.Path(__file__).parents[1] / "tools"))
    import oggmux
    from esp32_opus_player_tpu.host import opusfile as of

    src = of.parse_stream(fixture_path("silk_wb_mono_20ms").read_bytes())
    pkts = [j.data for j in src.jobs[:10]]
    durs = [j.duration for j in src.jobs[:10]]
    # build pages manually with gp counting from near INT64_MAX
    start_gp = INT64_MAX - sum(durs[:5])   # wraps mid-stream
    pages = [oggmux.build_page(
        [oggmux.opus_head(1, 0)], serialno=7, pageno=0, granulepos=0,
        bos=True),
        oggmux.build_page([oggmux.opus_tags()], serialno=7, pageno=1,
                          granulepos=0)]
    gp = start_gp
    for k, (p, d) in enumerate(zip(pkts, durs)):
        gp = granpos_add(gp, d)
        pages.append(oggmux.build_page(
            [p], serialno=7, pageno=2 + k,
            granulepos=granpos_add(gp, -1) if k == len(pkts) - 1 else gp,
            eos=k == len(pkts) - 1))
    data = b"".join(pages)
    s = parse_stream(data)
    assert len(s.jobs) == 10
    assert s.jobs[-1].trim_end == 1          # end-trim across the wrap
    assert s.pcm_start == start_gp
    assert s.jobs[-1].granulepos < 0         # wrapped gp survived demux
