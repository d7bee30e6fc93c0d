"""BPE merge training: Spark trainer == plain-Python reference, exactly.
(The iterative fold has no single-statement DuckDB form, so the gate is
implementation equivalence — the same treatment as the stateful-streaming
operator.)"""

from pyspark.sql import functions as F

from impalatogo_spark.operators import text as X
from impalatogo_spark.session import table


def test_bpe_merges_match_reference_exactly(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    got = X.bpe_merges(docs, n_merges=8)
    wf = {r.w: r.freq for r in X.bpe_word_freqs(docs).collect()}
    want = X.bpe_merges_reference(wf, n_merges=8)
    assert got == want
    assert len(got) == 8  # non-vacuous at sf0.001
    # ranks contiguous, counts non-increasing is NOT required (later merges
    # can count higher than earlier low-tier ones is impossible: argmax is
    # global each round, so counts are non-increasing)
    assert [m[0] for m in got] == list(range(len(got)))
    counts = [m[3] for m in got]
    assert counts == sorted(counts, reverse=True)


def test_bpe_apply_merge_fold_semantics(spark):
    # greedy left-to-right, non-overlapping: aaa + (a,a) -> [aa, a]
    df = spark.createDataFrame(
        [(["a", "a", "a"],), (["a", "a", "a", "a"],), (["b", "a", "a"],),
         (["a",],), ([],)],
        "syms array<string>",
    )
    out = df.select(
        X._bpe_apply_merge(F.col("syms"), "a", "a").alias("m")
    ).collect()
    assert [r.m for r in out] == [
        ["aa", "a"], ["aa", "aa"], ["b", "aa"], ["a"], []]


def test_bpe_reference_tiebreak_is_lexicographic():
    wf = {"ab": 2, "cd": 2}  # equal counts -> (a,b) wins lexicographically
    merges = X.bpe_merges_reference(wf, n_merges=1)
    assert merges == [(0, "a", "b", 2)]


def test_bpe_encode_matches_reference_tokenizer(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    merges = X.bpe_merges(docs, n_merges=8)
    got = {r.doc_id: (r.n_chars, r.n_bpe_tokens)
           for r in X.bpe_encode(docs, merges).collect()}

    def encode_word(w):
        seq = list(w)
        for _, lhs, rhs, _c in sorted(merges):
            out, pending = [], None
            for s in seq:
                if pending is None:
                    pending = s
                elif pending == lhs and s == rhs:
                    out.append(lhs + rhs)
                    pending = None
                else:
                    out.append(pending)
                    pending = s
            if pending is not None:
                out.append(pending)
            seq = out
        return len(seq)

    want = {}
    for row in docs.select("doc_id", "text").collect():
        words = [w for w in row.text.split(" ") if w]
        want[row.doc_id] = (
            sum(len(w) for w in words),
            sum(encode_word(w) for w in words),
        )
    assert got == want
    assert len(got) > 0
