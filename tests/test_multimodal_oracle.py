"""Guard for the embedded multimodal VALUES oracle: the entry's
_SQL_MULTIMODAL constants must equal what the declared-fake decode
stub (operators/multimodal.py) actually produces — if someone edits
the stub, this test points at the oracle to regenerate.

Regeneration snippet (prints the VALUES rows):

    rng = np.random.RandomState(7)
    for i in range(32):
        payload = rng.bytes(256)
        w, h = 64 + i % 8, 48 + i % 6
        seed = int.from_bytes(payload[:4], "little")
        img = np.random.RandomState(seed).randint(
            0, 256, size=(h, w, 3), dtype=np.uint8).astype(np.float64)
        print(i, round(img[:,:,0].mean(),6), round(img[:,:,1].mean(),6),
              round(img[:,:,2].mean(),6), round(img.mean(axis=2).std(),6))
"""

import re

import numpy as np


def _expected_rows():
    rng = np.random.RandomState(7)
    rows = []
    for i in range(32):
        payload = rng.bytes(256)
        w, h = 64 + i % 8, 48 + i % 6
        seed = int.from_bytes(payload[:4], "little")
        img = (
            np.random.RandomState(seed)
            .randint(0, 256, size=(h, w, 3), dtype=np.uint8)
            .astype(np.float64)
        )
        rows.append(
            (
                i,
                round(img[:, :, 0].mean(), 6),
                round(img[:, :, 1].mean(), 6),
                round(img[:, :, 2].mean(), 6),
                round(img.mean(axis=2).std(), 6),
            )
        )
    return rows


def test_multimodal_oracle_constants_match_stub():
    from auto_ts_spark import oracles as ORC

    values = re.findall(
        r"\(\s*(\d+),\s*([\d.]+),\s*([\d.]+),\s*([\d.]+),\s*([\d.]+)\s*\)",
        ORC._SQL_MULTIMODAL,
    )
    got = [(int(a), float(b), float(c), float(d), float(e)) for a, b, c, d, e in values]
    assert got == _expected_rows(), (
        "embedded _SQL_MULTIMODAL oracle is stale — regenerate with the "
        "snippet in this file's docstring"
    )
