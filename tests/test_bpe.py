"""Distributed BPE training ≡ a pure-Python replay of the identical
algorithm (same tokenizer, same EOW sentinel, same count-desc /
lexicographic tie-break)."""

from __future__ import annotations

from collections import Counter

from graph_loom_spark.ops import bpe as ops_bpe

SF_DIR = "/root/testdata/sf0.001"


def _ref_bpe(texts: list[str], num_merges: int, batch_size: int = 1):
    wc: Counter = Counter()
    for t in texts:
        for w in " ".join((t or "").lower().split()).split(" "):
            if w:
                wc[w] += 1
    words = {w: list(w) + [ops_bpe.EOW] for w in wc}
    merges = []
    while len(merges) < num_merges:
        pc: Counter = Counter()
        for w, sym in words.items():
            f = wc[w]
            for a, b in zip(sym, sym[1:]):
                pc[(a, b)] += f
        cand = sorted(pc.items(), key=lambda kv: (-kv[1], kv[0]))[: 8 * batch_size]
        used: set = set()
        batch = []
        for (l, r), c in cand:
            if c < 2 or len(batch) >= batch_size:
                break
            if len(merges) + len(batch) >= num_merges:
                break
            if l in used or r in used:
                continue
            batch.append((l, r))
            used.update((l, r))
        if not batch:
            break
        merges.extend(batch)
        for l, r in batch:
            for w in words:
                words[w] = ops_bpe._py_apply_merge(words[w], l, r, l + r)
    return merges


def test_bpe_train_matches_python_reference(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    texts = [r["text"] for r in docs.select("text").collect()]
    want = _ref_bpe(texts, 12)
    got = [
        (r["left"], r["right"])
        for r in ops_bpe.bpe_train(docs, num_merges=12)
        .orderBy("rank")
        .collect()
    ]
    assert got == want
    assert len(got) == 12  # the corpus supports at least 12 merges


def test_bpe_train_toy_and_early_stop(spark):
    rows = [(0, "low low low lower lower newest newest newest newest widest")]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    texts = [rows[0][1]]
    want = _ref_bpe(texts, 8)
    got = [
        (r["left"], r["right"], r["merged"])
        for r in ops_bpe.bpe_train(df, num_merges=8).orderBy("rank").collect()
    ]
    assert [(l, r) for l, r, _ in got] == want
    assert all(m == l + r for l, r, m in got)
    # classic first merges for this corpus: ('e','s') or ('s','t')-family
    # dominated by 'newest' x4 — just pin that the top merge count logic
    # picked a pair from 'newest'
    assert got[0][0] + got[0][1] in "newest</w>"


def test_bpe_encode_stats_matches_reference_encode(spark):
    rows = [(0, "low lower lowest"), (1, "new newest")]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    merges = [("l", "o"), ("lo", "w"), ("e", "s"), ("es", "t")]
    out = {
        r["doc_id"]: r["n_bpe_tokens"]
        for r in ops_bpe.bpe_encode_stats(df, merges).collect()
    }

    def enc_len(text):
        total = 0
        for w in " ".join(text.lower().split()).split(" "):
            if not w:
                continue
            sym = list(w) + [ops_bpe.EOW]
            for l, r in merges:
                sym = ops_bpe._py_apply_merge(sym, l, r, l + r)
            total += len(sym)
        return total

    assert out == {0: enc_len(rows[0][1]), 1: enc_len(rows[1][1])}


def test_bpe_train_batched_matches_batched_reference(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    texts = [r["text"] for r in docs.select("text").collect()]
    want = _ref_bpe(texts, 16, batch_size=8)
    got = [
        (r["left"], r["right"])
        for r in ops_bpe.bpe_train(docs, num_merges=16, batch_size=8)
        .orderBy("rank")
        .collect()
    ]
    assert got == want
    assert len(got) == 16


def test_bpe_token_counts_matches_inline_encode(spark):
    """X124: the distinct-word-amortized encode must produce counts
    identical to the per-occurrence inline encode (bpe_encode_stats)
    under the same learned merge list."""
    from graph_loom_spark.ops import bpe as B

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    merges = [
        (r["left"], r["right"])
        for r in B.bpe_train(docs, num_merges=12, batch_size=4)
        .orderBy("rank")
        .collect()
    ]
    fast = {
        r["doc_id"]: r["n_bpe_tokens"]
        for r in B.bpe_token_counts(docs, merges).collect()
    }
    slow = {
        r["doc_id"]: r["n_bpe_tokens"]
        for r in B.bpe_encode_stats(docs, merges).collect()
    }
    assert fast == slow


def test_bpe_token_counts_empty_doc_emits_zero(spark):
    """(ADVICE r9) A document whose text tokenizes to zero words must
    appear with n_bpe_tokens=0 — identical to bpe_encode_stats — not be
    dropped by the occurrence inner join."""
    from graph_loom_spark.ops import bpe as B

    docs = spark.createDataFrame(
        [(0, "low lower lowest"), (1, ""), (2, "   "), (3, "newer new"), (4, None)],
        "doc_id long, text string",
    )
    merges = [("l", "o"), ("lo", "w"), ("e", "r")]
    fast = {
        r["doc_id"]: r["n_bpe_tokens"]
        for r in B.bpe_token_counts(docs, merges).collect()
    }
    slow = {
        r["doc_id"]: r["n_bpe_tokens"]
        for r in B.bpe_encode_stats(docs, merges).collect()
    }
    assert fast == slow
    assert set(fast) == {0, 1, 2, 3, 4}
    assert fast[1] == 0 and fast[2] == 0 and fast[4] == 0
