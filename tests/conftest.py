import json
import pathlib

import pytest

ROOT = pathlib.Path(__file__).resolve().parent
FIXTURES = ROOT / "fixtures"
GOLDEN = ROOT / "golden"


@pytest.fixture(scope="session")
def manifest():
    return json.loads((FIXTURES / "manifest.json").read_text())


def fixture_path(name: str) -> pathlib.Path:
    return FIXTURES / f"{name}.opus"


def golden_pcm(name: str):
    import numpy as np
    return np.fromfile(GOLDEN / f"{name}.pcm", dtype=np.int16).reshape(-1, 2)


def golden_ranges(name: str):
    return json.loads((GOLDEN / f"{name}.ranges.json").read_text())
