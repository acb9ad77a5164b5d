"""ENS namehash (SURVEY §2.7 C7 ★) on a pure-Python Keccak-256.

Reference: normal_name_to_hash (/root/reference/airflow/dags/
create_merged.py:807-826): node = keccak(node ++ keccak(label)),
folding '.'-labels right-to-left from the 32-zero-byte root, hex out.
The reference uses Web3's keccak; this container has no keccak
library, so the engine carries a compact Keccak-f[1600] implementation
written from the public FIPS-202/Keccak specification (validated
against the standard test vectors in tests/test_functions.py).

Spark integration: an Arrow-batched pandas UDF, applied via the
distinct→compute→join idiom (the reference memoizes the same way —
create_merged.py:807 ``@memoize_ram``).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

_MASK = (1 << 64) - 1

_RC = [
    0x0000000000000001, 0x0000000000008082, 0x800000000000808A, 0x8000000080008000,
    0x000000000000808B, 0x0000000080000001, 0x8000000080008081, 0x8000000000008009,
    0x000000000000008A, 0x0000000000000088, 0x0000000080008009, 0x000000008000000A,
    0x000000008000808B, 0x800000000000008B, 0x8000000000008089, 0x8000000000008003,
    0x8000000000008002, 0x8000000000000080, 0x000000000000800A, 0x800000008000000A,
    0x8000000080008081, 0x8000000000008080, 0x0000000080000001, 0x8000000080008008,
]

# Rotation offsets r[x][y] per the Keccak reference spec.
_ROT = [
    [0, 36, 3, 41, 18],
    [1, 44, 10, 45, 2],
    [62, 6, 43, 15, 61],
    [28, 55, 25, 21, 56],
    [27, 20, 39, 8, 14],
]

_RATE = 136  # 1088-bit rate for Keccak-256


def _rol(v: int, n: int) -> int:
    n %= 64
    return ((v << n) | (v >> (64 - n))) & _MASK


def _keccak_f(s: list[list[int]]) -> list[list[int]]:
    for rc in _RC:
        c = [s[x][0] ^ s[x][1] ^ s[x][2] ^ s[x][3] ^ s[x][4] for x in range(5)]
        d = [c[(x - 1) % 5] ^ _rol(c[(x + 1) % 5], 1) for x in range(5)]
        s = [[s[x][y] ^ d[x] for y in range(5)] for x in range(5)]
        b = [[0] * 5 for _ in range(5)]
        for x in range(5):
            for y in range(5):
                b[y][(2 * x + 3 * y) % 5] = _rol(s[x][y], _ROT[x][y])
        s = [
            [b[x][y] ^ ((~b[(x + 1) % 5][y] & _MASK) & b[(x + 2) % 5][y]) for y in range(5)]
            for x in range(5)
        ]
        s[0][0] ^= rc
    return s


def keccak256(data: bytes) -> bytes:
    """Keccak-256 (the pre-FIPS variant Ethereum uses: 0x01 padding)."""
    state = [[0] * 5 for _ in range(5)]
    # multi-rate padding: 0x01 ... 0x80 (single 0x81 byte if one short)
    padded = bytearray(data)
    pad_len = _RATE - (len(padded) % _RATE)
    padded += b"\x01" + b"\x00" * (pad_len - 2) + b"\x80" if pad_len >= 2 else b"\x81"
    for block_start in range(0, len(padded), _RATE):
        block = padded[block_start : block_start + _RATE]
        for i in range(_RATE // 8):
            lane = int.from_bytes(block[i * 8 : (i + 1) * 8], "little")
            x, y = i % 5, i // 5
            state[x][y] ^= lane
        state = _keccak_f(state)
    out = bytearray()
    for i in range(4):  # 32 bytes = 4 lanes
        x, y = i % 5, i // 5
        out += state[x][y].to_bytes(8, "little")
    return bytes(out)


def ens_namehash(name: str) -> str:
    """EIP-137 namehash: right-to-left label fold, 0x-prefixed hex.

    Mirrors normal_name_to_hash (create_merged.py:813-824), including
    the empty-name → 32 zero bytes case.
    """
    node = b"\x00" * 32
    if name:
        for label in reversed(name.split(".")):
            # Empty labels ('a..b', trailing dot) hash keccak(b'') like
            # the reference — raising here would fail the whole Arrow
            # batch inside the pandas UDF for one bad row.
            node = keccak256(node + keccak256(label.encode("utf-8")))
    return "0x" + node.hex()


@pandas_udf(T.StringType())
def ens_namehash_udf(names: pd.Series) -> pd.Series:
    return names.map(lambda n: ens_namehash(n) if n is not None else None)
