"""DataFrame-native Bloom-filter runtime join pruning.

Spark's own runtime row-level filtering (`bloom_filter_agg` /
`might_contain`) is an internal optimizer feature not exposed through
the public function registry, so this module builds the same pattern
from public primitives:

1. **Build** — hash each build-side key with ``k`` seeded ``xxhash64``
   probes into an ``m``-bit bitmap, materialized as ``m/64`` longs via
   a ``bit_or`` aggregation (map-side combinable; the shuffled state
   is at most ``m/64`` rows regardless of build-side size).
2. **Collect** — the bitmap (kilobytes) is collected to the driver and
   embedded as an array *literal* in the probe-side plan, exactly how
   Spark injects broadcast runtime filters.
3. **Probe** — a pure column expression tests all ``k`` bit positions,
   so the filter runs inside whole-stage codegen ahead of the shuffle
   for the exact join that removes false positives.

At 100 TB the win is shuffle volume: the probe side drops
non-matching rows at the scan, and only bloom survivors are exchanged
for the exact semi join.  False positives are bounded by the usual
``(1 - e^{-kn/m})^k``; correctness never depends on them because the
exact join always follows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def build_bloom_words(df: DataFrame, key: str, num_bits: int = 1 << 17,
                      num_hashes: int = 4) -> list[int]:
    """Aggregate the build side into an ``num_bits``-bit Bloom bitmap.

    Returns the bitmap as ``num_bits / 64`` Python ints (longs), dense
    and zero-filled, ready for :func:`might_contain_expr`.
    """
    if num_bits % 64:
        raise ValueError("num_bits must be a multiple of 64")
    n_words = num_bits // 64
    positions = F.array(*[
        F.pmod(F.xxhash64(F.col(key), F.lit(i)), F.lit(num_bits))
        for i in range(num_hashes)
    ])
    sparse = (
        df.select(F.explode(positions).alias("pos"))
        .select(
            (F.col("pos") / 64).cast("int").alias("word_idx"),
            # shiftleft's amount arg must be a column-typed expr (the
            # python helper only accepts int literals)
            F.expr("shiftleft(1L, CAST(pmod(pos, 64) AS INT))").alias("bit"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("bit").alias("word"))
        .collect()
    )
    words = [0] * n_words
    for r in sparse:
        words[r.word_idx] = r.word
    return words


def might_contain_expr(key: Column, words: list[int],
                       num_hashes: int = 4) -> Column:
    """Codegen-friendly membership test against a bitmap literal."""
    num_bits = len(words) * 64
    arr = F.lit(words)
    checks = []
    for i in range(num_hashes):
        pos = F.pmod(F.xxhash64(key, F.lit(i)), F.lit(num_bits))
        word = F.get(arr, (pos / 64).cast("int"))
        bit = F.call_function(
            "shiftright", word, F.pmod(pos, F.lit(64)).cast("int")
        )
        checks.append(bit.bitwiseAND(F.lit(1).cast("long")) == 1)
    cond = checks[0]
    for c in checks[1:]:
        cond = cond & c
    return cond


def bloom_pruned_semi_join(probe: DataFrame, build: DataFrame,
                           probe_key: str, build_key: str,
                           num_bits: int = 1 << 17,
                           num_hashes: int = 4) -> DataFrame:
    """Exact left-semi join with a Bloom pre-filter on the probe side.

    Result is identical to ``probe.join(build, ..., "left_semi")`` —
    the bloom only prunes probe rows before the shuffle.
    """
    words = build_bloom_words(build, build_key, num_bits, num_hashes)
    pruned = probe.filter(
        might_contain_expr(F.col(probe_key), words, num_hashes)
    )
    keys = build.select(F.col(build_key).alias("__bloom_key")).distinct()
    return pruned.join(
        keys, pruned[probe_key] == keys["__bloom_key"], "left_semi"
    )
