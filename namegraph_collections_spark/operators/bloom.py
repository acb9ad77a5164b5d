"""Bloom-filter build + prune as pure DataFrame operators.

The scale problem this solves: a semi-join of a 100 TB fact table
against a small-but-not-broadcastable key set shuffles the ENTIRE
fact table on the join key before a single row is dropped. Spark's
own runtime row-group pruning (AQE's InSubqueryExec / bloom join
hints) covers some shapes, but an explicit, composable bloom operator
lets any pipeline stage pre-filter its big side *map-side* — zero
extra shuffle on the probe side — and then run the exact join on the
(typically 100-1000× smaller) survivor set.

Design (all JVM-side, whole-stage-codegen friendly, no UDFs):

- Build: each build-side key is hashed K times with ``xxhash64(key,
  seed)``; every hash addresses one bit in an ``m``-bit filter stored
  as ``m/64`` longs. The bit-set is computed with one hash-aggregate
  (``bit_or`` of one-hot words grouped by word index) and collapsed
  into a single-row ``map<int, bigint>`` — only OCCUPIED words are
  stored, so a sparse filter costs proportionally less to broadcast.
- Probe: the 1-row map is broadcast (crossJoin of a broadcast
  single-row aggregate — the same pattern the search and mix-plan
  queries use for global stats) and membership is a pure column
  expression: for each of the K probe hashes, ``element_at(map,
  word_idx)`` (NULL → word absent → bit unset → definitely not a
  member) must contain the probed bit. False positives are possible
  by construction; callers ALWAYS follow with the exact join on the
  survivors, so results are exact and the bloom is purely a shuffle-
  volume reducer.

Sizing: with m bits, n keys, K hashes the false-positive rate is
``(1 - e^(-K*n/m))^K``; the defaults (K=3, m=2^17) hold ~1% at
n≈10k. At real scale pass ``num_bits`` sized to the build side
(m ≈ 10 bits/key keeps fp ≈ 1% at K=3) — the map stays ≤ m/64
entries ≈ 1.3 MB per 10M keys, broadcast-cheap.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Default filter width in bits (2^17 = 16 KiB of bitmap).
DEFAULT_NUM_BITS = 1 << 17

#: Default number of hash probes per key.
DEFAULT_NUM_HASHES = 3


def _positions(key: Column, num_bits: int, num_hashes: int) -> list[Column]:
    """K bit positions for a key: pmod(xxhash64(key, seed=k), m)."""
    return [
        F.pmod(F.xxhash64(key, F.lit(k)), F.lit(num_bits)) for k in range(num_hashes)
    ]


def _one_shl(bit: Column) -> Column:
    """``1L << bit`` with a COLUMN shift count — the Python
    ``F.shiftleft`` helper only takes a literal int, so route through
    the SQL function, which accepts any int expression."""
    return F.call_function("shiftleft", F.lit(1).cast("long"), bit.cast("int"))


def bloom_build(
    df: DataFrame,
    key: str | Column,
    num_bits: int = DEFAULT_NUM_BITS,
    num_hashes: int = DEFAULT_NUM_HASHES,
) -> DataFrame:
    """Aggregate ``df``'s key column into a 1-row bloom DataFrame
    with a single ``bloom`` column of type ``map<int, bigint>``
    (word index → 64-bit word, occupied words only).

    Two narrow aggregations: per-word ``bit_or`` (shuffles only
    K rows per input row, each 12 bytes), then a single-row
    ``map_from_entries`` collapse.
    """
    key_col = F.col(key) if isinstance(key, str) else key
    pos = F.explode(F.array(*_positions(key_col, num_bits, num_hashes))).alias("pos")
    words = (
        df.select(pos)
        .select(
            F.shiftright("pos", 6).cast("int").alias("word_idx"),
            _one_shl(F.pmod("pos", F.lit(64))).alias("mask"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("mask").alias("word"))
    )
    return words.agg(
        F.map_from_entries(F.collect_list(F.struct("word_idx", "word"))).alias("bloom")
    )


def bloom_might_contain(
    bloom_map: Column, key: Column, num_bits: int = DEFAULT_NUM_BITS,
    num_hashes: int = DEFAULT_NUM_HASHES,
) -> Column:
    """Pure-column membership test against a ``map<int,bigint>`` bloom
    column. NULL map entries mean the word is all-zero (only occupied
    words are stored), i.e. definitely-absent."""
    checks = []
    for p in _positions(key, num_bits, num_hashes):
        word = F.coalesce(
            F.element_at(bloom_map, F.call_function("shiftright", p, F.lit(6)).cast("int")),
            F.lit(0).cast("long"),
        )
        mask = _one_shl(F.pmod(p, F.lit(64)))
        checks.append(word.bitwiseAND(mask) == mask)
    out = checks[0]
    for c in checks[1:]:
        out = out & c
    return out


def bloom_prune(
    df: DataFrame,
    key: str | Column,
    bloom: DataFrame,
    num_bits: int = DEFAULT_NUM_BITS,
    num_hashes: int = DEFAULT_NUM_HASHES,
) -> DataFrame:
    """Filter ``df`` to rows whose key might be in ``bloom`` (1-row
    DataFrame from :func:`bloom_build`). Broadcast join of the single
    row + a codegen filter — the probe side is never shuffled and
    keeps its partitioning. May pass false positives (callers run the
    exact join after); never drops a true member.

    The 1-row attach is a LEFT OUTER join on ``true``, not a
    crossJoin, deliberately: Catalyst's left-semi pushdown
    (PushLeftSemiLeftAntiThroughJoin) pushes a downstream exact
    semi-join THROUGH an inner/cross join, which would reorder the
    exact join below this filter and run the bloom on the
    already-joined survivors — pure overhead, prune after pay. The
    rule does not push through outer joins, so the left-outer attach
    pins the documented order: scan → bloom prune → exact join.
    Semantically identical (the build aggregate emits exactly one row
    even on empty input, so every probe row matches exactly once)."""
    key_col = F.col(key) if isinstance(key, str) else key
    return (
        df.join(F.broadcast(bloom), F.lit(True), "left")
        .filter(bloom_might_contain(F.col("bloom"), key_col, num_bits, num_hashes))
        .drop("bloom")
    )
