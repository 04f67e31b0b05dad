"""Extract the codec constant tables from the reference sources into Python
modules under esp32_opus_player_tpu/ops/tables/.

These tables are normative Opus codec data (RFC 6716 / libopus constants:
PVQ combinatorics, MDCT twiddles, iCDF probability models, NLSF codebooks,
resampler FIR coefficients, ...) — every conforming decoder embeds the same
numbers. We machine-extract them (with provenance comments) rather than
retyping 6k numbers by hand.

Run: python tools/extract_tables.py
"""
from __future__ import annotations

import pathlib
import re

ROOT = pathlib.Path(__file__).resolve().parent.parent
REF = pathlib.Path("/root/reference/src")
OUTDIR = ROOT / "esp32_opus_player_tpu" / "ops" / "tables"

DECL_RE = re.compile(
    r"^(?:static\s+)?const\s+(u?int(?:8|16|32)_t|signed\s+char|unsigned\s+char|char|int|short|kiss_twiddle_cpx)\s+"
    r"([A-Za-z0-9_]+)\s*((?:\[[^\]]*\])+)\s*(?:PROGMEM\s*)?=\s*\{",
    re.M)

NUM_RE = re.compile(r"-?0[xX][0-9a-fA-F]+|-?\d+")

DTYPE_MAP = {
    "uint8_t": "np.uint8", "int8_t": "np.int8", "signed char": "np.int8",
    "unsigned char": "np.uint8", "char": "np.int8",
    "uint16_t": "np.uint16", "int16_t": "np.int16", "short": "np.int16",
    "uint32_t": "np.uint32", "int32_t": "np.int32", "int": "np.int32",
    "kiss_twiddle_cpx": "np.int16",  # struct {int16 r; int16 i;} -> (..., 2)
}


def strip_comments(text: str) -> str:
    text = re.sub(r"/\*.*?\*/", " ", text, flags=re.S)
    text = re.sub(r"//[^\n]*", " ", text)
    return text


def find_balanced(text: str, start: int) -> int:
    """Index just past the '}' matching the '{' at text[start]."""
    depth = 0
    for i in range(start, len(text)):
        if text[i] == "{":
            depth += 1
        elif text[i] == "}":
            depth -= 1
            if depth == 0:
                return i + 1
    raise ValueError("unbalanced braces")


def collect_macros(*paths) -> dict[str, int]:
    """Numeric object-like #defines, for resolving macro refs in tables."""
    macros: dict[str, int] = {}
    define_re = re.compile(r"^\s*#\s*define\s+([A-Za-z0-9_]+)\s+(.+?)\s*$",
                           re.M)
    for p in paths:
        text = strip_comments(p.read_text(errors="replace"))
        for m in define_re.finditer(text):
            name, val = m.group(1), m.group(2).strip()
            val = re.sub(r"(?<=[0-9a-fA-F])[uUlL]+\b", "", val)
            val = re.sub(r"\((u?int(?:8|16|32|64)_t|int|short|char)\)", "",
                         val)
            # substitute already-known macros
            for k, v in macros.items():
                val = re.sub(rf"\b{k}\b", str(v), val)
            if re.fullmatch(r"[0-9xXa-fA-F+\-*/() <>]+", val):
                try:
                    macros[name] = int(eval(val, {"__builtins__": {}}))
                except Exception:
                    pass
    return macros


def extract(src_path: pathlib.Path, macros: dict[str, int] | None = None):
    macros = macros or {}
    raw = src_path.read_text(errors="replace")
    text = strip_comments(raw)
    tables = []
    for m in DECL_RE.finditer(text):
        ctype = re.sub(r"\s+", " ", m.group(1))
        name = m.group(2)
        dims_s = m.group(3)
        brace = text.index("{", m.end() - 1)
        end = find_balanced(text, brace)
        body = text[brace:end]
        inner = body.strip()[1:-1].replace("{", " ").replace("}", " ")
        nums = []
        for tok in inner.split(","):
            tok = tok.strip()
            if not tok:
                continue
            tok = re.sub(r"(?<=[0-9a-fA-F])[uUlL]+\b", "", tok)
            for k, v in macros.items():
                if k in tok:
                    tok = re.sub(rf"\b{k}\b", str(v), tok)
            if re.fullmatch(r"[0-9xXa-fA-F+\-*() <>]+", tok):
                nums.append(int(eval(tok, {"__builtins__": {}})))
            else:
                raise ValueError(f"unparseable element {tok!r} in {name}")
        dims = []
        for d in re.findall(r"\[([^\]]*)\]", dims_s):
            d = d.strip()
            if not d:
                continue
            try:
                dims.append(int(d, 0))
            except ValueError:
                dims.append(-1)  # macro-sized dim: resolve by element count
        if dims.count(-1) > 1 or (dims.count(-1) == 1 and not nums):
            dims = []
        if ctype == "kiss_twiddle_cpx":
            dims = (dims or [len(nums) // 2]) + [2]
        # line number in the original file for provenance
        line = raw[:raw.find(name)].count("\n") + 1
        tables.append((name, ctype, dims, nums, line))
    return tables


def emit(tables, src_name: str, out_path: pathlib.Path, skip=()):
    lines = [
        '"""Codec constant tables, machine-extracted from the reference',
        f"{src_name} by tools/extract_tables.py. These are normative",
        "Opus/libopus constants (RFC 6716). Do not edit by hand.",
        '"""',
        "import numpy as np",
        "",
    ]
    seen = set()
    for name, ctype, dims, nums, line in tables:
        if name in skip or name in seen:
            continue
        seen.add(name)
        dtype = DTYPE_MAP[ctype]
        if dims and -1 in dims:
            known = 1
            for d in dims:
                if d != -1:
                    known *= d
            if known and len(nums) % known == 0:
                dims = [d if d != -1 else len(nums) // known for d in dims]
            else:
                dims = [len(nums)]
        prod = 1
        for d in dims:
            prod *= d
        if not dims or prod != len(nums):
            dims = [len(nums)]
        vals = ", ".join(str(n) for n in nums)
        shape = ", ".join(str(d) for d in dims)
        lines.append(f"# {src_name}:{line} ({ctype}{dims})")
        lines.append(f"{name} = np.array([{vals}], dtype={dtype})"
                     f".reshape({shape},)")
        lines.append("")
    out_path.write_text("\n".join(lines))
    return sorted(seen)


def main():
    OUTDIR.mkdir(parents=True, exist_ok=True)
    macros = collect_macros(REF / "celt.h", REF / "silk.h",
                            REF / "celt.cpp", REF / "silk.cpp")
    for src, out in [("celt.cpp", "celt_tables.py"),
                     ("silk.cpp", "silk_tables.py")]:
        tables = extract(REF / src, macros)
        names = emit(tables, f"src/{src}", OUTDIR / out)
        print(f"{src}: extracted {len(names)} tables -> {out}")


if __name__ == "__main__":
    main()
