#!/usr/bin/env python
"""Regenerate README/INVENTORY performance numbers from artifacts.

VERDICT r02-r04 each flagged hand-written numbers drifting from the
newest bench artifact (host µs/frame, core counts, test totals). This
tool makes the numbers GENERATED:

  * the newest `BENCH_r*.json` (or a file given with --bench) supplies
    every performance figure;
  * `pytest --collect-only -q` supplies the test count (skip the slow
    collection with --tests N when the count is already known);
  * README.md's block between `<!-- perf:begin -->` / `<!-- perf:end -->`
    is rewritten wholesale, and every "NNN tests" mention in README.md +
    docs/INVENTORY.md is updated.

Run with --check to fail (exit 1) if the files would change — the
drift guard tests/test_docs_current.py runs that mode in CI.
"""
from __future__ import annotations

import argparse
import json
import pathlib
import re
import subprocess
import sys

ROOT = pathlib.Path(__file__).resolve().parent.parent


def newest_bench():
    """Newest artifact that yields the required fields (driver records
    keep only the tail of the output, which sometimes truncates the
    JSON line's head — such artifacts are skipped with a note)."""
    benches = sorted(ROOT.glob("BENCH_r*.json"),
                     key=lambda p: int(re.search(r"r(\d+)", p.name)
                                       .group(1)))
    if not benches:
        raise SystemExit("no BENCH_r*.json artifact found")
    for p in reversed(benches):
        try:
            load_bench(p)
            return p
        except SystemExit:
            print(f"note: {p.name} truncated past the headline fields; "
                  "falling back to the previous artifact",
                  file=sys.stderr)
    raise SystemExit("no artifact yields the headline fields")


def load_bench(path: pathlib.Path) -> dict:
    raw = path.read_text()
    # the driver artifact wraps the bench JSON line in a run record
    # with a "tail" field; bench.py itself prints the bare JSON line
    rec = json.loads(raw)
    if "components" in rec:
        return rec
    tail = rec.get("tail", "")
    for line in tail.splitlines():
        line = line.strip()
        if line.startswith("{"):
            try:
                d = json.loads(line)
            except json.JSONDecodeError:
                continue
            if "components" in d:
                return d
    # the driver may truncate the record to the LAST bytes of output,
    # cutting the JSON line's head — regex-extract the fields instead
    comp = {}
    for key in ("device_superstep_streams",
                "device_silk_superstep_streams",
                "device_sharded_superstep_streams",
                "host_symbol_us_per_frame_per_core",
                "host_streams_per_core", "cores_for_10k_streams",
                "host_cores_available"):
        m = re.search(rf'"{key}": ([0-9.]+)', tail)
        if m:
            comp[key] = float(m.group(1))
    m = re.search(r'"device_superstep_streams_by_B": (\{[^{}]*\})',
                  tail)
    if m:
        comp["device_superstep_streams_by_B"] = json.loads(m.group(1))
    need = ("device_superstep_streams", "device_silk_superstep_streams",
            "host_symbol_us_per_frame_per_core")
    if all(k in comp for k in need):
        return {"components": comp}
    raise SystemExit(f"{path} holds no bench JSON with components")


def count_tests() -> int:
    out = subprocess.run(
        [sys.executable, "-m", "pytest", "tests/", "--collect-only",
         "-q"], cwd=ROOT, capture_output=True, text=True)
    m = re.search(r"(\d+) tests collected", out.stdout)
    if not m:
        m = re.search(r"(\d+)/(\d+) tests collected", out.stdout)
    if not m:
        raise SystemExit("could not parse pytest collection output:\n"
                         + out.stdout[-2000:])
    return int(m.group(1))


def perf_block(c: dict, bench_name: str) -> str:
    celt = c["device_superstep_streams"]
    silk = c["device_silk_superstep_streams"]
    sharded = c.get("device_sharded_superstep_streams")
    by_b = c.get("device_superstep_streams_by_B", {})
    peak_b = max(by_b, key=lambda k: by_b[k]) if by_b else "?"
    us = c["host_symbol_us_per_frame_per_core"]
    per_core = int(c["host_streams_per_core"])
    cores10k = int(c["cores_for_10k_streams"])
    rig_cores = int(c.get("host_cores_available", 1))
    lines = [
        f"- **chip decode capacity (headline): ~{celt:,.0f} realtime "
        f"48 kHz CELT streams / ~{silk:,.0f} SILK streams** — "
        "transposed fused synthesis, K=64-frame superstep (one device "
        "program per 64 frames per bucket), varied pitch lags, "
        "masked inactive lanes (the served configuration), PCM "
        f"delivered to HBM (device-resident serving), peaking at "
        f"B={peak_b} (the bench records the capacity-vs-B curve; the "
        "top of the range regresses — HBM pressure past the sweet "
        "spot).",
    ]
    if sharded:
        lines.append(
            f"- SPMD scale-out (shard_map over the mesh): "
            f"~{sharded:,.0f} streams/chip — within noise of the "
            "single-pool headline at steady state (docs/CEILING.md "
            "addendum).")
    lines += [
        "- e2e on THIS RIG (1-core host + ~40 MB/s tunneled link — "
        "both two orders of magnitude below a production host): a few "
        "hundred streams per config, host-symbol-phase-bound (see the "
        "`configs` map and the per-phase split in the newest "
        "`BENCH_r*.json`); the K-frame superstep variants keep the "
        "dispatch phase ~0 even on lossy/PLC configs.",
        "- host symbol phase (one batched C++ call per step, GIL "
        f"released, thread-strips over cores): **~{us:.1f} "
        f"µs/frame/core** ({bench_name}, {rig_cores}-core rig) → "
        f"~{per_core:,.0f} realtime streams per host core; "
        f"**~{cores10k} cores reach the 10k-stream north star** *by "
        "linear extrapolation from the one-core measurement* — the "
        "bench sweeps a real streams-vs-threads curve on multi-core "
        "hosts, but this rig has "
        f"{rig_cores} core(s), so the multi-core claim is unverified "
        "here.",
    ]
    return "\n".join(lines)


def apply(text: str, block: str, n_tests: int | None) -> str:
    begin, end = "<!-- perf:begin -->", "<!-- perf:end -->"
    if begin in text:
        pre, rest = text.split(begin, 1)
        _, post = rest.split(end, 1)
        text = pre + begin + "\n" + block + "\n" + end + post
    if n_tests is not None:
        text = re.sub(r"\b\d+ tests\b", f"{n_tests} tests", text)
    return text


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bench", type=pathlib.Path, default=None)
    ap.add_argument("--tests", type=int, default=None,
                    help="test count (skips the pytest collection)")
    ap.add_argument("--check", action="store_true",
                    help="exit 1 if any file would change")
    args = ap.parse_args()
    bench_path = args.bench or newest_bench()
    bench = load_bench(bench_path)
    block = perf_block(bench["components"],
                       bench_path.name.replace(".json", ""))
    n_tests = args.tests if args.tests is not None else count_tests()
    changed = []
    for rel in ("README.md", "docs/INVENTORY.md"):
        p = ROOT / rel
        old = p.read_text()
        new = apply(old, block, n_tests)
        if new != old:
            changed.append(rel)
            if not args.check:
                p.write_text(new)
    if args.check and changed:
        print(f"doc drift: {changed} out of date vs {bench_path.name} "
              f"/ {n_tests} tests — run tools/gen_perf_docs.py")
        return 1
    print(f"{'would update' if args.check else 'updated'}: "
          f"{changed or 'nothing (current)'} "
          f"[{bench_path.name}, {n_tests} tests]")
    return 0


if __name__ == "__main__":
    sys.exit(main())
