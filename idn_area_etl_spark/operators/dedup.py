"""Deduplication operators for LLM-data pipelines at scale.

Four strategies, all shuffle-conscious:

- **exact**: content-hash groupBy — one shuffle on the hash, map-side
  partial agg.
- **n-gram Jaccard**: blocked self-join (language × length band) —
  exact similarity inside blocks; block keys bound the pair explosion.
- **MinHash-LSH**: signature → banded bucket join — the 100 TB path:
  candidate generation is equi-join on (band, bucket-hash), never an
  all-pairs product.
- **SimHash**: 64-bit sign fingerprints; near-dups differ in few bits.

Everything is native column expressions (xxhash64, higher-order
aggregate/transform) — no Python in the row path.
"""

from __future__ import annotations

import threading
from contextlib import contextmanager

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

#: Mersenne-ish prime keeping (P-1)*A + B within int64.
MINHASH_PRIME = 2_147_483_647

#: Deterministic affine hash parameters (fixed across runs — they are
#: part of the signature definition, like a model seed).
_MINHASH_PARAMS = [
    ((i * 2_654_435_761 + 0x9E3779B9) % MINHASH_PRIME or 1, (i * 40_503 + 12_345) % MINHASH_PRIME)
    for i in range(1, 65)
]


def _stage(df: DataFrame) -> DataFrame:
    """Materialize an intermediate stage once (lazy local checkpoint)
    so multiple downstream consumers read stored blocks instead of
    re-running the expensive lineage (regex shingle scans, Python
    fingerprint passes).  Serialized storage: sketch rows carry long
    arrays, and deserialized Java object caching at millions of rows
    is GC-hostile; Tungsten-serialized blocks are ~4× smaller.  This
    is the same stage separation a 100 TB pipeline gets by writing the
    sketch stage to a table between jobs; lazy, so plan building stays
    action-free.

    Trade-offs of the localCheckpoint default — deliberate, but real:
    blocks are pinned with no unpersist (they live until RDD GC /
    session end, so a long-lived session accumulates storage across
    operator calls), and lineage is TRUNCATED, so losing an executor
    (dynamic allocation, spot kills) makes downstream jobs fail
    unrecoverably instead of recomputing.  Right for bounded batch
    jobs; for long-lived sessions or preemptible clusters set

        spark.conf.set("spark.idnareaetl.stageMaterialization", ...)

    to ``persist`` (recomputable lineage kept, unpersistable) or
    ``checkpoint`` (reliable checkpoint to ``sc.setCheckpointDir``'s
    fault-tolerant storage).  For a MECHANICAL release of the staged
    blocks — so a long-lived session calling many staged operators
    doesn't accumulate pinned full-data copies — wrap the calls in
    :func:`staged_scope`, which forces ``persist`` mode for its
    duration and unpersists every frame staged inside it on exit."""
    from pyspark.storagelevel import StorageLevel

    mode = df.sparkSession.conf.get(
        "spark.idnareaetl.stageMaterialization", "localCheckpoint"
    )
    if mode == "persist":
        staged = df.persist(StorageLevel.MEMORY_AND_DISK)
    elif mode == "checkpoint":
        staged = df.checkpoint(eager=False)
    elif mode == "localCheckpoint":
        staged = df.localCheckpoint(
            eager=False, storageLevel=StorageLevel.MEMORY_AND_DISK
        )
    elif mode == "none":
        # Audit facility: staging replaces a subtree with an opaque
        # `Scan ExistingRDD`, which the plan-shape audits
        # (tools/broadcast_audit.py and the test_plan_quality.py
        # sweeps) cannot classify — a data-scaled frame behind the
        # checkpoint would mechanically look "bounded".  Audits set
        # this mode so every pass judges the FULL pre-staging
        # dataflow; staging never changes values, only where the
        # pipeline is cut, so the un-staged plan is the correct
        # object to audit for 100 TB boundedness.
        return df
    else:
        # a typo ('Persist', 'persistent') must not silently fall back
        # to the lineage-truncating mode the caller was opting OUT of
        raise ValueError(
            "spark.idnareaetl.stageMaterialization must be one of "
            f"'localCheckpoint', 'persist', 'checkpoint', 'none'; "
            f"got {mode!r}"
        )
    stack = _scope_stack()
    if stack:
        stack[-1].append(staged)
    return staged


#: Per-thread stack of active :func:`staged_scope` buckets;
#: :func:`_stage` appends every frame it materializes to the CALLING
#: thread's innermost scope, so concurrent driver threads can hold
#: scopes simultaneously without cross-registering frames.
_SCOPE_STACKS = threading.local()


def _scope_stack() -> list[list[DataFrame]]:
    stack = getattr(_SCOPE_STACKS, "stack", None)
    if stack is None:
        stack = _SCOPE_STACKS.stack = []
    return stack


#: Per-session ref-count of live :func:`staged_scope` blocks (across
#: ALL threads) plus the ``stageMaterialization`` value captured by the
#: OUTERMOST scope.  Only the outermost live scope touches the
#: session-global conf: without the ref-count, two overlapping scopes
#: on one session restore each other's value out of order (A enters
#: with prev=None, B enters capturing prev='persist', A exits
#: unsetting, B exits re-setting 'persist' PERMANENTLY) — silently
#: leaving the session in persist mode for every later helper call.
#: Keyed by id(session); entries are removed when the count hits 0, so
#: the map never outlives its scopes.
_SCOPE_CONF_LOCK = threading.Lock()
_SCOPE_CONF_REFS: dict[int, list] = {}


@contextmanager
def staged_scope(spark: SparkSession):
    """Bound the lifetime of staged intermediates to a ``with`` block.

    Inside the block, ``stageMaterialization`` is forced to ``persist``
    (recomputable lineage — the only mode whose blocks CAN be released:
    a lazy ``localCheckpoint`` truncates lineage and exposes no
    unpersist hook, its blocks live until RDD garbage collection).  On
    exit, every frame staged inside the block is unpersisted, so
    long-lived sessions (notebooks, services) can call rank helpers and
    dedup sketch builders repeatedly without accumulating pinned
    full-dataset copies::

        with staged_scope(spark):
            ranked = global_row_number(df, [F.col("k")]).collect()
        # staged blocks released here

    Results must be consumed (or themselves persisted) inside the
    block: after exit a returned DataFrame recomputes its staged
    lineage from scratch on the next action — correct, just no longer
    cached.  Scopes nest; each releases only its own frames.  The
    previous ``stageMaterialization`` setting is restored on exit.

    Thread-safety (round 6): the scope stack is THREAD-LOCAL — each
    driver thread's scopes register only the frames staged by that
    thread, so concurrent threads can hold scopes simultaneously
    without cross-registering (pinned by
    ``test_staged_scope_is_thread_local``).  The one remaining shared
    piece is the session CONF toggle: ``stageMaterialization`` lives in
    the (session-global) SQL conf, so while any thread holds a scope,
    OTHER threads staging on the same session also stage in ``persist``
    mode.  That is benign — persist keeps recomputable lineage and
    evictable blocks; those frames simply aren't auto-released.  The
    conf toggle itself is REF-COUNTED per session (round 7): only the
    outermost live scope across all threads captures and restores the
    previous value, so overlapping scopes on one session can no longer
    restore each other's value out of order and durably flip the
    session into persist mode (pinned by
    ``test_staged_scope_overlap_restores_conf``).  Threads wanting
    full conf isolation should still use separate sessions
    (``spark.newSession()``), which have separate SQL confs.
    """
    key = id(spark)
    with _SCOPE_CONF_LOCK:
        ref = _SCOPE_CONF_REFS.get(key)
        if ref is None:
            prev = spark.conf.get(
                "spark.idnareaetl.stageMaterialization", None
            )
            _SCOPE_CONF_REFS[key] = [1, prev]
            spark.conf.set(
                "spark.idnareaetl.stageMaterialization", "persist"
            )
        else:
            ref[0] += 1
    bucket: list[DataFrame] = []
    stack = _scope_stack()
    stack.append(bucket)
    try:
        yield
    finally:
        stack.pop()
        with _SCOPE_CONF_LOCK:
            ref = _SCOPE_CONF_REFS[key]
            ref[0] -= 1
            if ref[0] == 0:
                del _SCOPE_CONF_REFS[key]
                prev = ref[1]
                if prev is None:
                    spark.conf.unset(
                        "spark.idnareaetl.stageMaterialization"
                    )
                else:
                    spark.conf.set(
                        "spark.idnareaetl.stageMaterialization", prev
                    )
        for staged in bucket:
            try:
                # blocking: block removal is otherwise asynchronous, so
                # "released on exit" would be eventually-true only (and
                # storage-count assertions could race); the wait is
                # negligible next to the staged computation itself
                staged.unpersist(blocking=True)
            except Exception:  # noqa: BLE001 — best-effort release
                pass


def shingles_expr(text: Column, n: int = 3) -> Column:
    """Distinct character n-gram shingles of a string column."""
    positions = F.sequence(F.lit(1), F.length(text) - F.lit(n - 1))
    return F.array_distinct(
        F.transform(positions, lambda i: F.substring(text, i, F.lit(n)))
    )


def token_shingles_expr(text: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles (w-shingling) — far more
    discriminative than char shingles on shared-vocabulary corpora,
    and ~10× fewer elements per doc.

    Execution shape: one ``regexp_extract_all`` with a lookahead
    capture — the match consumes one token (``\\S+ ?``) while the
    zero-width lookahead captures the n-token window starting there,
    so every token start yields one shingle in a single codegen'd
    regex scan.  The previous higher-order form
    (``transform(sequence(...), i -> array_join(slice(toks, i, n)))``)
    ran interpreted lambdas per position — measured ~13× slower
    (~0.8 ms/doc vs ~0.06 ms/doc at 300-char docs); value-identity
    incl. edge shapes (empty / whitespace-only / <n tokens / NULL)
    is pinned by ``tests/test_dedup.py``.

    Fewer-than-n-token docs fall back to the whole normalized text
    (one shingle), whitespace-only to ``''``, NULL text to ``[NULL]``
    — exactly the old semantics.
    """
    grams = token_ngrams_expr(text, n)
    norm = _norm_text_expr(text)
    return F.array_distinct(
        F.when(F.size(grams) > 0, grams).otherwise(F.array(norm))
    )


def _norm_text_expr(text: Column) -> Column:
    """Whitespace-collapsed, trimmed, lowercased text (the shingle
    normalization)."""
    return F.trim(F.lower(F.regexp_replace(text, r"\s+", " ")))


def token_ngrams_expr(text: Column, n: int = 3) -> Column:
    """ALL positional word n-grams (duplicates kept, one per token
    start) via the same single-regex-scan shape as
    :func:`token_shingles_expr`; empty for texts with < n tokens."""
    pat = r"(?=(" + " ".join([r"\S+"] * n) + r"))\S+ ?"
    return F.regexp_extract_all(_norm_text_expr(text), F.lit(pat), 1)


def exact_dedup_groups(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Exact dedup: group documents by content hash.

    Returns one row per distinct content with the representative
    (minimum) doc_id and copy count.  Scale: single hash-partitioned
    shuffle; partial aggregation happens map-side.
    """
    return (
        docs.groupBy(F.md5(F.col(text_col)).alias("content_hash"))
        .agg(
            F.min("doc_id").alias("rep_doc_id"),
            F.count("*").alias("n_copies"),
            F.sum("n_chars").alias("total_chars"),
        )
    )


def contamination_overlap(
    docs: DataFrame,
    n: int = 3,
    mod: int = 10,
    top_k: int = 20,
    text_col: str = "text",
) -> DataFrame:
    """Benchmark-contamination screen: rank corpus documents by the
    fraction of their word ``n``-gram shingles that also occur in a
    held-out benchmark set (here: ``doc_id % mod == 0``).

    Scale: the benchmark shingle vocabulary is deduped and broadcast
    (benchmarks are small by construction), so the corpus side is one
    explode + broadcast-hash semi-match + per-doc re-aggregation — no
    all-pairs comparison and no shuffle of the corpus text itself.
    """
    sh = docs.select(
        "doc_id", token_shingles_expr(F.col(text_col), n).alias("shingles")
    )
    bench = (
        sh.filter(F.col("doc_id") % mod == 0)
        .select(F.explode("shingles").alias("shingle"))
        .distinct()
    )
    cand = sh.filter(F.col("doc_id") % mod != 0).select(
        "doc_id",
        F.size("shingles").alias("n_shingles"),
        F.explode("shingles").alias("shingle"),
    )
    return (
        cand.join(F.broadcast(bench), "shingle")
        .groupBy("doc_id", "n_shingles")
        .agg(F.count("*").alias("n_overlap"))
        .select(
            "doc_id",
            "n_shingles",
            "n_overlap",
            F.round(
                F.col("n_overlap").cast("double") / F.col("n_shingles"), 6
            ).alias("contamination"),
        )
        .orderBy(F.col("contamination").desc(), "doc_id")
        .limit(top_k)
    )


def winnow_substring_pairs(
    docs: DataFrame,
    k: int = 20,
    w: int = 8,
    max_df: int = 20,
    min_shared: int = 3,
    top_k: int = 20,
    text_col: str = "text",
) -> DataFrame:
    """Substring-level near-dup pairs via winnowed fingerprints
    (copied passages, not whole-document similarity).

    Every shared substring of length ≥ k+w−1 chars is guaranteed to
    produce a shared fingerprint; pairs sharing ≥ ``min_shared``
    fingerprints are ranked.  Fingerprints occurring in more than
    ``max_df`` documents are dropped first — the standard ubiquitous-
    n-gram stop list (boilerplate would otherwise make the pair join
    quadratic in the corpus, the same reason suffix-array dedup
    pipelines drop high-frequency grams).

    Scale: fingerprinting is row-local; the stop-list filter bounds
    every fingerprint's pair fan-out at max_df², so pair generation is
    bounded per group — no cross product.

    Shape: ONE shuffle of the fingerprint table —
    ``groupBy(fp).collect_list(doc_id)`` — with the stop list falling
    out of the same aggregate (``size(ids) <= max_df``), then bounded
    in-group pair explosion (≤ max_df·(max_df−1)/2 = 190 structs per
    group at the default).  The previous df-filter-join + fp-equi-self-
    join shape ran the Arrow fingerprint pass twice (the aggregate and
    the join probe side shuffle through different exchanges, so
    exchange reuse can't share them) and shuffled ``fps`` three times;
    measured 1M-doc stress: 104.8 s → 22.4 s (4.7x), value-identical.
    """
    from idn_area_etl_spark.operators.text import winnow_fingerprint_rows

    # vectorized Arrow fingerprint stage — value-identical to
    # explode(winnow_fingerprints_expr(...)), ~100x cheaper per doc.
    fps = winnow_fingerprint_rows(docs, k, w, text_col)
    groups = (
        fps.groupBy("fp")
        .agg(F.array_sort(F.collect_list("doc_id")).alias("ids"))
        .filter((F.size("ids") >= 2) & (F.size("ids") <= max_df))
    )
    # ids are distinct per fp (fingerprint rows are per-doc distinct)
    # and sorted ascending, so (x, y) with y after x gives doc_a < doc_b.
    pairs = groups.select(
        F.explode(
            F.flatten(
                F.transform(
                    "ids",
                    lambda x, i: F.transform(
                        F.slice(F.col("ids"), i + F.lit(2), F.size("ids")),
                        lambda y: F.struct(x.alias("doc_a"), y.alias("doc_b")),
                    ),
                )
            )
        ).alias("p")
    ).select("p.doc_a", "p.doc_b")
    return (
        pairs.groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
        .orderBy(F.col("n_shared").desc(), "doc_a", "doc_b")
        .limit(top_k)
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    n: int = 3,
    top_k: int = 20,
    text_col: str = "text",
) -> DataFrame:
    """Exact word-n-gram Jaccard similarity over blocked pairs.

    Blocking on (lang, length-band) keeps the self-join from becoming
    an all-pairs product — the block key is the shuffle key, so each
    executor sees only intra-block pairs.  Word shingles keep the
    per-doc arrays ~6× smaller than char shingles (the intersect cost
    is quadratic-ish in array size).  For unblocked scale-out use
    minhash_candidates instead.
    """
    return (
        _blocked_jaccard(docs, n, text_col)
        .select("doc_a", "doc_b", F.round("jaccard_raw", 6).alias("jaccard"))
        .orderBy(F.desc("jaccard"), "doc_a", "doc_b")
        .limit(top_k)
    )


def jaccard_edges(
    docs: DataFrame,
    n: int = 3,
    threshold: float = 0.5,
    text_col: str = "text",
) -> DataFrame:
    """Near-duplicate edge list: blocked pairs with Jaccard ≥
    threshold, as ``(doc_a, doc_b)`` — input to
    :func:`idn_area_etl_spark.operators.graph.connected_components`
    for cluster-then-keep-one fuzzy dedup."""
    return (
        _blocked_jaccard(docs, n, text_col)
        .filter(F.col("jaccard_raw") >= threshold)
        .select("doc_a", "doc_b")
    )


def _blocked_jaccard(docs: DataFrame, n: int, text_col: str) -> DataFrame:
    """Blocked self-join with exact word-n-gram Jaccard in
    ``jaccard_raw`` (unrounded double)."""
    # Shingles are xxhash64'd to longs before the self-join: the
    # array_intersect then compares 8-byte values instead of ~20-char
    # strings (~35% cheaper per pair, measured), and Jaccard over the
    # hashed sets equals Jaccard over the string sets up to 64-bit
    # collisions (~1e-8 at millions of distinct shingles).
    sh = docs.filter(F.length(text_col) >= n).select(
        "doc_id",
        "lang",
        F.floor(F.length(text_col) / 100).cast("int").alias("len_band"),
        F.transform(
            token_shingles_expr(F.col(text_col), n), lambda s: F.xxhash64(s)
        ).alias("shingles"),
    )
    # materialize the shingle stage once — both self-join sides read it
    sh = _stage(sh)
    a, b = sh.alias("a"), sh.alias("b")
    inter = F.size(F.array_intersect(F.col("a.shingles"), F.col("b.shingles")))
    uni = F.size(F.col("a.shingles")) + F.size(F.col("b.shingles")) - inter
    return a.join(
        b,
        (F.col("a.lang") == F.col("b.lang"))
        & (F.col("a.len_band") == F.col("b.len_band"))
        & (F.col("a.doc_id") < F.col("b.doc_id")),
    ).select(
        F.col("a.doc_id").alias("doc_a"),
        F.col("b.doc_id").alias("doc_b"),
        (inter.cast("double") / uni).alias("jaccard_raw"),
    )


def minhash_signatures(
    docs: DataFrame,
    num_hashes: int = 32,
    n: int = 3,
    text_col: str = "text",
) -> DataFrame:
    """MinHash signatures: min over word-n-gram shingles of affine
    permutations of xxhash64(shingle) mod P.  num_hashes independent
    permutations → E[matching fraction] = Jaccard similarity."""
    p = F.lit(MINHASH_PRIME).cast("long")
    hashed = F.transform(
        token_shingles_expr(F.col(text_col), n),
        lambda s: F.pmod(F.xxhash64(s), p),
    )
    # Execution shape: explode the shingle hashes and take the
    # num_hashes affine-permutation minima as plain ``min`` aggregates.
    # Plain mins stay inside whole-stage codegen with map-side partial
    # aggregation — each doc's shingles come from one input row, so the
    # aggregation COMPLETES map-side and the exchange carries one
    # finished num_hashes-column row per doc.  The previous formulation
    # ran num_hashes higher-order transform+array_min lambdas per doc;
    # HOF lambdas are interpreted (no codegen) — same pathology, same
    # fix, and same measured ~order-of-magnitude win as
    # simhash_signatures below.  explode_outer keeps empty/null-shingle
    # docs as a single null-hash row; min over only-null is null,
    # matching array_min on an empty/null array.
    tok = docs.select("doc_id", F.explode_outer(hashed).alias("_h"))
    mins = tok.groupBy("doc_id").agg(
        *[
            F.min(F.pmod(F.col("_h") * F.lit(a) + F.lit(b), p)).alias(f"_m{i}")
            for i, (a, b) in enumerate(_MINHASH_PARAMS[:num_hashes])
        ]
    )
    sig = F.array(*[F.col(f"_m{i}") for i in range(num_hashes)])
    return mins.select("doc_id", sig.alias("signature"))


def _band_entries_expr(bands: int, rows_per_band: int):
    """Exploded ``(band_no, band_hash)`` structs over a ``signature``
    array column.

    ``band_hash`` is ``xxhash64(band_no, sig[i..i+r-1])`` taken directly
    over the signature longs — two docs collide in a band iff their
    band slices are equal (modulo the same 2^-64 hash-collision odds
    the previous string-join formulation had).  ``bands`` is a Python
    constant, so the struct array is built as plain column expressions
    (whole-stage codegen) instead of a higher-order ``transform``
    lambda over ``sequence`` (interpreted) — and hashing the longs
    skips the per-band cast-to-string + array_join allocations.
    """
    sig = F.col("signature")
    return F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(bno).alias("band_no"),
                    F.xxhash64(
                        F.lit(bno),
                        *[
                            F.get(sig, bno * rows_per_band + j)
                            for j in range(rows_per_band)
                        ],
                    ).alias("band_hash"),
                )
                for bno in range(bands)
            ]
        )
    )


def minhash_candidates(
    docs: DataFrame,
    threshold: float = 0.3,
    num_hashes: int = 32,
    bands: int = 8,
    n: int = 3,
    text_col: str = "text",
) -> DataFrame:
    """MinHash-LSH candidate pairs with estimated Jaccard ≥ threshold.

    The banded bucket join is the scale path: signatures split into
    ``bands`` bands of ``num_hashes/bands`` rows; docs colliding in any
    band become candidates (equi-join on the band hash — a plain
    shuffle join on a compact key, no cross product), then the full
    signatures estimate similarity.
    """
    rows_per_band = num_hashes // bands
    # Materialize the signature stage once (lazy local checkpoint):
    # four consumers (bucket sides a/b, signature sides sa/sb) would
    # otherwise each re-run the regex-shingle scan — see
    # minhash_verified_pairs for the full rationale.
    sigs = _stage(minhash_signatures(docs, num_hashes, n, text_col))

    buckets = sigs.select(
        "doc_id", _band_entries_expr(bands, rows_per_band).alias("band")
    ).select("doc_id", "band.band_no", "band.band_hash")
    a, b = buckets.alias("a"), buckets.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_no") == F.col("b.band_no"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )
    sa = sigs.select(
        F.col("doc_id").alias("doc_a"), F.col("signature").alias("sig_a")
    )
    sb = sigs.select(
        F.col("doc_id").alias("doc_b"), F.col("signature").alias("sig_b")
    )
    est = F.size(
        F.filter(
            F.zip_with(F.col("sig_a"), F.col("sig_b"), lambda x, y: x == y),
            lambda same: same,
        )
    ).cast("double") / F.lit(float(num_hashes))
    return (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select("doc_a", "doc_b", F.round(est, 6).alias("est_jaccard"))
        .filter(F.col("est_jaccard") >= threshold)
    )


def minhash_verified_pairs(
    docs: DataFrame,
    threshold_num: int = 3,
    threshold_den: int = 5,
    num_hashes: int = 64,
    bands: int = 32,
    n: int = 3,
    text_col: str = "text",
) -> DataFrame:
    """The actual 100 TB fuzzy-dedup recipe: MinHash-LSH candidate
    generation followed by EXACT word-n-gram Jaccard verification on
    the candidates only.

    Candidate generation is the banded bucket equi-join from
    :func:`minhash_candidates` (compact ``(band_no, band_hash)`` key,
    never an all-pairs product); verification then computes the exact
    Jaccard for each candidate and keeps pairs with
    ``jaccard >= threshold_num/threshold_den`` — the threshold test is
    exact integer arithmetic (``inter*den >= union*num``), no float
    edges.  With ``bands`` bands of ``num_hashes/bands`` rows, a pair
    at the threshold is missed with probability
    ``(1 - tau^(num_hashes/bands))^bands`` — at tau=0.6, 64 hashes and
    32 two-row bands that is (1-0.36)^32 < 1e-6, so at test scale the
    output equals the exact all-pairs join (which is what the DuckDB
    oracle computes) while the plan stays equi-join-only.

    Output: ``(doc_a, doc_b, n_inter, n_union, jaccard)`` sorted by
    pair id.
    """
    rows_per_band = num_hashes // bands
    # Single corpus pass: one regex-shingle scan + explode feeds ONE
    # aggregate producing BOTH the num_hashes signature minima and the
    # exact-verify hash set per doc.  All four downstream consumers
    # (bucket sides a/b, verify sides ta/tb) read the same groupBy —
    # their Exchange subtrees are identical, so Spark's ReuseExchange
    # rule runs the scan + shuffle once instead of the three regex
    # scans (signature, ta, tb) the previous formulation paid.  The
    # aggregate still completes map-side (each doc's shingles come
    # from one input row); downstream joins on doc_a/doc_b inherit the
    # doc_id hash partitioning, so no re-shuffle of the arrays.
    #
    # Verification arrays are xxhash64'd longs, not shingle strings
    # (same trade as _blocked_jaccard: exact up to 64-bit collisions,
    # ~35% cheaper intersects) — and, load-bearing at scale: raw
    # shingle text is so repetitive that AQE's compressed-size
    # estimate can pick a broadcast whose deserialized form is GBs
    # (observed with prefix_jaccard_join at 1M docs). Hashed longs
    # compress ~1:1, so AQE's adaptive join choice stays trustworthy.
    # collect_set drops duplicates/nulls: shingle arrays are already
    # distinct and xxhash64 never returns NULL, and array_intersect /
    # size are order-insensitive, so set semantics are exact here.
    p = F.lit(MINHASH_PRIME).cast("long")
    exploded = docs.select(
        "doc_id",
        F.explode_outer(
            F.transform(
                token_shingles_expr(F.col(text_col), n),
                lambda s: F.xxhash64(s),
            )
        ).alias("_h"),
    )
    per_doc = exploded.groupBy("doc_id").agg(
        *[
            F.min(
                F.pmod(F.pmod(F.col("_h"), p) * F.lit(a) + F.lit(b), p)
            ).alias(f"_m{i}")
            for i, (a, b) in enumerate(_MINHASH_PARAMS[:num_hashes])
        ],
        F.collect_set("_h").alias("sh"),
    )
    # Stage separation: materialize the per-doc sketch (64 sig longs +
    # hashed shingle set — tiny next to the text) once and let all four
    # consumers read the stored blocks.  Without it, Catalyst prunes
    # each branch differently (buckets keep mins, verify keeps sh), the
    # canonical subplans diverge, and with broadcast joins the probe
    # sides stream the un-reused aggregate — four full regex-shingle
    # scans of the corpus.  This is the same move a 100 TB pipeline
    # makes by writing the signature stage to a table between jobs;
    # lazy so plan-building stays action-free.
    per_doc = _stage(per_doc)
    sig = F.array(*[F.col(f"_m{i}") for i in range(num_hashes)])
    sigs = per_doc.select("doc_id", sig.alias("signature"))
    sh = per_doc.select("doc_id", "sh", F.size("sh").alias("nsh"))
    buckets = sigs.select(
        "doc_id", _band_entries_expr(bands, rows_per_band).alias("band")
    ).select("doc_id", "band.band_no", "band.band_hash")
    a, b = buckets.alias("a"), buckets.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_no") == F.col("b.band_no"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )
    ta = sh.select(
        F.col("doc_id").alias("doc_a"),
        F.col("sh").alias("sh_a"),
        F.col("nsh").alias("n_a"),
    )
    tb = sh.select(
        F.col("doc_id").alias("doc_b"),
        F.col("sh").alias("sh_b"),
        F.col("nsh").alias("n_b"),
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    return (
        cand.join(ta, "doc_a")
        .join(tb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            inter.alias("n_inter"),
            (F.col("n_a") + F.col("n_b") - inter).alias("n_union"),
        )
        .filter(
            F.col("n_inter") * F.lit(threshold_den)
            >= F.col("n_union") * F.lit(threshold_num)
        )
        .select(
            "doc_a",
            "doc_b",
            "n_inter",
            "n_union",
            F.round(
                F.col("n_inter").cast("double") / F.col("n_union"), 6
            ).alias("jaccard"),
        )
    )


def simhash_signatures(
    docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """64-bit SimHash over whitespace tokens as a hex string.

    Each bit is the sign of the sum of ±1 votes from xxhash64(token)
    bits; near-duplicate texts land within a few bits of Hamming
    distance.

    Execution shape: explode the token hashes and compute the 64 bit
    votes as plain ``sum`` aggregates (bit b votes +1 iff
    ``2*count(bit set) > count(tokens)``).  Plain sums stay inside
    whole-stage codegen with map-side partial aggregation — since every
    doc's tokens come from one input row, the aggregation COMPLETES
    map-side and the exchange carries one finished 64-counter row per
    doc (~0.5 KB).  The previous formulation folded a 64-way
    higher-order ``aggregate`` lambda per document; HOF lambdas are
    interpreted (no codegen), which measured ~20x slower at 50k docs
    (tools/stress.py).  The packed int64 ``sig`` is what pair
    comparisons use: hamming = bit_count(a ^ b), one ALU op per pair.
    """
    tokens = F.filter(
        F.split(F.lower(F.trim(F.col(text_col))), r"\s+"),
        lambda t: t != F.lit(""),
    )
    tok = docs.select(
        "doc_id",
        F.explode_outer(
            F.transform(tokens, lambda t: F.xxhash64(t))
        ).alias("_h"),
    )
    # explode_outer keeps empty/null-text docs as a single null-hash
    # row; count("_h") ignores nulls so their n_tok is 0 and every bit
    # votes 0, matching the fold semantics (empty sum is not > 0).
    counts = tok.groupBy("doc_id").agg(
        F.count("_h").alias("_n_tok"),
        *[
            F.coalesce(
                F.sum(F.shiftright(F.col("_h"), b).bitwiseAND(F.lit(1))),
                F.lit(0),
            ).alias(f"_c{b}")
            for b in range(64)
        ],
    )
    # bit b (MSB-first) is 1 iff set-votes outnumber clear-votes:
    # sum(±1) = 2*c_b - n_tok > 0
    packed = None
    for b in range(63, -1, -1):
        term = F.shiftleft(
            (F.lit(2) * F.col(f"_c{b}") > F.col("_n_tok"))
            .cast("long"),
            b,
        )
        packed = term if packed is None else packed.bitwiseOR(term)
    bits = F.lpad(F.bin("sig"), 64, "0")
    return (
        counts.select("doc_id", packed.alias("sig"))
        .select("doc_id", bits.alias("bits"), "sig")
        .select(
            "doc_id", "bits", F.conv("bits", 2, 16).alias("simhash"), "sig"
        )
    )


def simhash_near_pairs(
    docs: DataFrame, max_hamming: int = 3, text_col: str = "text"
) -> DataFrame:
    """SimHash near-dup pairs within a Hamming radius.

    Scale path: block on 16-bit quarters (a pair within Hamming ≤ 3 of
    64 bits must agree exactly on ≥ 1 of 4 quarters — pigeonhole), so
    candidates come from 4 equi-joins, not a cross product.
    """
    # Materialize signatures once (lazy local checkpoint): both join
    # sides would otherwise re-run the explode+sum signature scan —
    # see minhash_verified_pairs for the stage-sharing rationale.
    sigs = _stage(simhash_signatures(docs, text_col))
    # 16-bit quarters of the packed signature (shift + mask — no string
    # manipulation in the blocking key either)
    quarters = sigs.select(
        "doc_id",
        "sig",
        F.explode(
            F.expr(
                "transform(sequence(0, 3), qi -> struct("
                "  qi AS q_no,"
                "  (shiftright(sig, (3 - qi) * 16) & 65535) AS q_val))"
            )
        ).alias("q"),
    ).select("doc_id", "sig", "q.q_no", "q.q_val")
    a, b = quarters.alias("a"), quarters.alias("b")
    # popcount of the XOR of the packed longs — one codegen'd ALU op per
    # pair vs the former 64-char string zip (~64× less work per pair)
    hamming = F.bit_count(F.col("a.sig").bitwiseXOR(F.col("b.sig")))
    return (
        a.join(
            b,
            (F.col("a.q_no") == F.col("b.q_no"))
            & (F.col("a.q_val") == F.col("b.q_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            hamming.alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


def prefix_jaccard_join(
    docs: DataFrame,
    n: int = 5,
    tau_num: int = 4,
    tau_den: int = 5,
    text_col: str = "text",
) -> DataFrame:
    """EXACT set-similarity self-join via prefix filtering
    (AllPairs/PPJoin family): all document pairs whose distinct word
    ``n``-gram shingle sets have Jaccard >= ``tau_num/tau_den``.

    The scale story, versus the all-pairs / blocked joins above:

    1. Shingle sets are ordered rare-first by the ``(document
       frequency, shingle)`` pair — a consistent total order with NO
       globally-materialized rank: df joins back onto the exploded
       shingles with a plain shuffle equi-join, and the only window is
       per-document.  (A previous version ranked the whole vocabulary
       through one unpartitioned row_number window and broadcast it —
       a single-task sort plus a vocabulary-sized broadcast, both of
       which die at 100 TB.)
    2. Each document emits only its **prefix** — the first
       ``|S| - ceil(tau*|S|) + 1`` shingles under that ordering.  The
       pigeonhole guarantee: two sets with Jaccard >= tau MUST share
       at least one prefix shingle, so the candidate equi-join on the
       prefix shingle loses nothing.  Rare-first ordering makes the
       per-shingle candidate lists short (frequent shingles almost
       never appear in prefixes).
    3. A length filter (``tau*max(|A|,|B|) <= min(|A|,|B|)``, kept in
       exact integer arithmetic) prunes candidates before
       verification; verification is one ``array_intersect`` per
       surviving pair.

    The candidate join is an equi-join on the prefix shingle — a plain
    shuffle-hash/sort-merge join, never a cartesian — and the final
    threshold test ``inter*tau_den >= union*tau_num`` stays in
    integers (no float threshold edge cases).

    Documents with fewer than ``n`` tokens have no n-gram shingles and
    are excluded (mirrors the SQL oracle's ``len >= n`` guard).
    """
    # Token-count guard first (docs with < n tokens have no n-gram
    # shingles and are excluded, mirroring the oracle's len >= n), then
    # the shared regex-scan shingler — for >= n-token docs its
    # whole-text fallback never fires, so it emits exactly the n-gram
    # windows.  The previous inline transform/slice/array_join lambdas
    # were interpreted per position (~0.8 ms/doc); this path took the
    # 100k-doc stress run from 77 s to the join-bound cost.
    n_tokens = F.size(
        F.regexp_extract_all(F.trim(F.col(text_col)), F.lit(r"\S+"), 0)
    )
    # Materialized once (lazy local checkpoint): tok feeds the df agg,
    # the prefix build, and both verify sides — without stage sharing
    # each consumer re-runs the regex-shingle scan (see
    # minhash_verified_pairs for the rationale).
    tok = (
        docs.filter(n_tokens >= n)
        .select(
            "doc_id",
            token_shingles_expr(F.col(text_col), n).alias("sh"),
        )
        .select("doc_id", "sh", F.size("sh").alias("nsh"))
    )
    tok = _stage(tok)
    ex = tok.select("doc_id", "nsh", F.explode("sh").alias("s"))
    # Rare-first ordering comes from the (document-frequency, shingle)
    # pair directly — no global integer rank is materialized.  The old
    # formulation ranked the whole vocabulary through one unpartitioned
    # row_number window and broadcast it (both explode at 100 TB); the
    # pigeonhole argument only needs a consistent total order, and
    # (df, s) already is one.  dfreq joins back via a sort-merge
    # equi-join on the shingle, and the only window left is
    # per-document.
    #
    # Every join side in this operator scales WITH THE CORPUS
    # (vocabulary df, per-doc prefixes, full shingle arrays), so none
    # is ever broadcast-safe — and shingle text is so repetitive that
    # AQE's compressed-shuffle size estimate can sit under the
    # broadcast threshold while the deserialized table is GBs (seen
    # at 1M synthetic docs: a "64 MB" side whose broadcast collect
    # blew spark.driver.maxResultSize).  The merge hints pin every
    # join to sort-merge.
    dfreq = ex.groupBy("s").agg(F.count("*").alias("df")).hint("merge")
    # prefix length L = |S| - ceil(tau*|S|) + 1, in exact integers
    ceil_tau_n = F.floor(
        (F.lit(tau_num) * F.col("nsh") + F.lit(tau_den - 1)) / F.lit(tau_den)
    )
    prefix = (
        ex.join(dfreq, "s")
        .withColumn(
            "pos",
            F.row_number().over(
                Window.partitionBy("doc_id").orderBy("df", "s")
            ),
        )
        .filter(F.col("pos") <= F.col("nsh") - ceil_tau_n + F.lit(1))
        .select("doc_id", "nsh", "s")
    )
    # both candidate-join sides read the prefix stage; materialize it
    # once instead of re-running the df join + per-doc window
    prefix = _stage(prefix)
    a, b = prefix.hint("merge").alias("a"), prefix.hint("merge").alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.s") == F.col("b.s"))
            & (F.col("a.doc_id") < F.col("b.doc_id"))
            & (
                F.lit(tau_num)
                * F.greatest(F.col("a.nsh"), F.col("b.nsh"))
                <= F.lit(tau_den)
                * F.least(F.col("a.nsh"), F.col("b.nsh"))
            ),
        )
        .select(
            F.col("a.doc_id").alias("doc1"),
            F.col("b.doc_id").alias("doc2"),
        )
        .distinct()
    )
    ta = tok.select(
        F.col("doc_id").alias("doc1"),
        F.col("sh").alias("sh1"),
        F.col("nsh").alias("n1"),
    ).hint("merge")
    tb = tok.select(
        F.col("doc_id").alias("doc2"),
        F.col("sh").alias("sh2"),
        F.col("nsh").alias("n2"),
    ).hint("merge")
    inter = F.size(F.array_intersect("sh1", "sh2"))
    return (
        cand.join(ta, "doc1")
        .join(tb, "doc2")
        .select(
            "doc1",
            "doc2",
            inter.alias("n_inter"),
            (F.col("n1") + F.col("n2") - inter).alias("n_union"),
        )
        .filter(
            F.col("n_inter") * F.lit(tau_den)
            >= F.col("n_union") * F.lit(tau_num)
        )
        .select(
            "doc1",
            "doc2",
            "n_inter",
            "n_union",
            F.round(
                F.col("n_inter").cast("double") / F.col("n_union"), 6
            ).alias("jaccard"),
        )
    )
