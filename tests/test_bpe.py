"""BPE tokenizer training: the distributed trainer must reproduce the
pure-Python reference EXACTLY (same merges, same counts, same order),
and encoding must be consistent with the learned merges."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from idn_area_etl_spark.operators.bpe import (
    EOW,
    encode_with_merges,
    reference_bpe,
    train_bpe,
    vocab_from_docs,
)
from idn_area_etl_spark.plans import all_specs, wave31
from idn_area_etl_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def corpus(spark):
    texts = [
        "the lower the newer the newest",
        "lower lowest newer newest",
        "low low lower lowest",
        "new new newer newest wide wider widest",
        "the wide river flows lower and lower",
    ]
    return spark.createDataFrame([(i, t) for i, t in enumerate(texts)], ["doc_id", "text"])


def test_trainer_matches_python_reference_exactly(spark, corpus):
    m_spark = train_bpe(corpus, n_merges=12)
    texts = [r["text"] for r in corpus.select("text").collect()]
    m_ref = reference_bpe(texts, n_merges=12)
    assert m_spark == m_ref
    # merge counts are non-increasing is NOT guaranteed in BPE, but
    # each count must be >= 1 and rounds sequential
    assert [m["round"] for m in m_spark] == list(range(1, len(m_spark) + 1))


def test_trainer_matches_reference_on_real_corpus(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    m_spark = wave31._merges_for(spark, sf_dir)
    texts = [r["text"] for r in docs.select("text").collect()]
    m_ref = reference_bpe(texts, n_merges=wave31.BPE_N_MERGES)
    assert m_spark == m_ref


def test_vocab_symbols_shape(spark, corpus):
    v = vocab_from_docs(corpus).collect()
    by_word = {r["word"]: r for r in v}
    assert by_word["lower"]["symbols"] == ["l", "o", "w", "e", "r", EOW]
    assert by_word["the"]["freq"] == 4


def test_encode_counts_match_reference_encoding(spark, corpus):
    merges = train_bpe(corpus, n_merges=8)
    enc = {
        r["doc_id"]: r["n_tokens"]
        for r in encode_with_merges(corpus, merges).collect()
    }

    # reference encode: same leftmost-first merge application
    def ref_encode(text: str) -> int:
        total = 0
        for w in text.strip().lower().split():
            syms = list(w) + [EOW]
            for m in merges:
                out, i = [], 0
                while i < len(syms):
                    if (
                        i + 1 < len(syms)
                        and syms[i] == m["left"]
                        and syms[i + 1] == m["right"]
                    ):
                        out.append(m["merged"])
                        i += 2
                    else:
                        out.append(syms[i])
                        i += 1
                syms = out
            total += len(syms)
        return total

    for r in corpus.collect():
        assert enc[r["doc_id"]] == ref_encode(r["text"])


def test_encoding_compresses(spark, sf_dir):
    rows = wave31.d_bpe_encode_stats(spark, sf_dir).collect()
    assert len(rows) > 0
    for r in rows:
        # chars per BPE token must beat 1 (chars+EOW baseline ~1)
        assert r["chars_per_token"] > 1.0
        assert r["total_tokens"] > 0


def test_bpe_queries_registered():
    specs = all_specs()
    assert "d_bpe_merges" in specs
    assert specs["d_bpe_merges"].oracle is None
    assert "d_bpe_encode_stats" in specs


def test_planted_merge_sequence_is_forced(spark):
    """d_bpe_merges_planted's oracle claims an exact 10-round merge
    sequence; verify the REAL trainer AND the pure-Python reference
    both produce it on the planted corpus, and that the planted
    frequencies are strictly ordered (the forcing condition)."""
    n = 500
    docs = spark.range(n).select(F.col("id").alias("doc_id")).select(
        wave31._bpe_plant_word().alias("text")
    )
    merges = train_bpe(docs, n_merges=10)
    texts = [r["text"] for r in docs.collect()]
    assert merges == reference_bpe(texts, n_merges=10)
    # frequency plant: strictly decreasing for any n >= 64
    from collections import Counter

    f = Counter(texts)
    freqs = [f[w] for w in wave31._BPE_PLANT_WORDS]
    assert all(a > b for a, b in zip(freqs, freqs[1:]))
    # the forced sequence: (x,y) then (xy,</w>) per word, freq order
    expect = []
    for k, w in enumerate(wave31._BPE_PLANT_WORDS):
        expect.append((w[0], w[1], w, freqs[k]))
        expect.append((w, EOW, w + EOW, freqs[k]))
    got = [(m["left"], m["right"], m["merged"], m["pair_count"])
           for m in merges]
    assert got == expect
