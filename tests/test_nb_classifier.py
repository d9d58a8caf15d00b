"""X161 trained multinomial Naive Bayes (VERDICT r12 ask #4): the
labeled-model counterpart to the fixed-projection classifier (X72) —
same hashed unigram+bigram features, per-class bucket counts in one
groupBy, integer micro-nat log-odds. Oracle hash is the primary gate;
these pin the arithmetic against a pure-Python replica, the OOV
contract, and the AUC lift over X72 on the same labels."""

from __future__ import annotations

import hashlib
import importlib.util
import math
import os

from graph_loom_spark.ops.text import nb_classify, nb_weights, score_auc

SF_DIR = "/root/testdata/sf0.001"

_spec = importlib.util.spec_from_file_location(
    "spark_entry_nb",
    os.path.join(os.path.dirname(__file__), "..", "__spark_entry__.py"),
)
_entry = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_entry)

B = 4096


def _feats(text: str) -> list[str]:
    toks = text.split(" ")
    bigrams = (
        [f"{a}_{b}" for a, b in zip(toks, toks[1:])] if len(toks) >= 2 else []
    )
    return toks + bigrams


def _bucket(x: str) -> int:
    return int(hashlib.md5(f"w:{x}".encode()).hexdigest()[:8], 16) % B


def _python_nb(rows):
    """Pure-Python replica of nb_weights + nb_classify."""
    cp: dict = {}
    cn: dict = {}
    np_ = nn = 0
    for _, text, y in rows:
        np_ += y
        nn += 1 - y
        for x in _feats(text):
            b = _bucket(x)
            if y:
                cp[b] = cp.get(b, 0) + 1
            else:
                cn[b] = cn.get(b, 0) + 1
    tp, tn = sum(cp.values()), sum(cn.values())
    buckets = set(cp) | set(cn)
    wm = {
        b: round(
            (
                math.log((cp.get(b, 0) + 1.0) / (tp + float(B)))
                - math.log((cn.get(b, 0) + 1.0) / (tn + float(B)))
            )
            * 1e6
        )
        for b in buckets
    }
    prior = round((math.log(max(np_, 1)) - math.log(max(nn, 1))) * 1e6)
    out = {}
    for did, text, _ in rows:
        fs = _feats(text)
        out[did] = (
            len(fs),
            prior + sum(wm.get(_bucket(x), 0) for x in fs),
        )
    return out


def test_nb_classify_matches_pure_python(spark):
    from pyspark.sql import functions as F

    rows = [
        (1, "the quick brown fox jumps over the lazy dog", 1),
        (2, "the slow red fox naps under the busy dog", 1),
        (3, "le renard rapide saute par dessus le chien", 0),
        (4, "der schnelle fuchs springt ueber den hund", 0),
        (5, "the quick brown fox again and again", 1),
    ]
    docs = spark.createDataFrame(
        [(d, t, "en" if y else "xx") for d, t, y in rows],
        "doc_id long, text string, lang string",
    )
    got = {
        r["doc_id"]: (r["n_feats"], r["score_micro"], r["keep"])
        for r in nb_classify(docs).collect()
    }
    want = _python_nb(rows)
    for did, (nf, sc) in want.items():
        assert got[did][0] == nf, did
        assert got[did][1] == sc, did
        assert got[did][2] == (1 if sc > 0 else 0)
    # trained on its own labels, every doc must land on its class side
    for did, _, y in rows:
        assert got[did][2] == y


def test_nb_unseen_buckets_are_neutral(spark):
    """Scoring a NEW corpus with a trained weight frame: features
    hashing to buckets absent from training contribute exactly 0, so
    an all-OOV doc scores exactly the prior."""
    from pyspark.sql import functions as F

    train = spark.createDataFrame(
        [(1, "aaa bbb", "en"), (2, "ccc ddd", "xx"), (3, "aaa eee", "en")],
        "doc_id long, text string, lang string",
    )
    w = nb_weights(train)
    oov = spark.createDataFrame(
        [(9, "zzzz yyyy xxxx", "xx")], "doc_id long, text string, lang string"
    )
    # no trained bucket collides with the OOV features (check in python
    # so the assertion is about the contract, not luck)
    trained_buckets = {r["bucket"] for r in w.collect()}
    oov_buckets = {_bucket(x) for x in _feats("zzzz yyyy xxxx")}
    assert not (trained_buckets & oov_buckets)
    prior = round((math.log(2) - math.log(1)) * 1e6)
    out = nb_classify(oov, weights=w).collect()[0]
    assert out["score_micro"] == prior


def test_trained_auc_beats_fixed_projection(spark):
    """The r12 ask's 'demonstrably above' gate: on the same lang='en'
    labels and the same exact Mann-Whitney statistic, the trained NB
    must out-rank the fixed md5 projection by a wide margin (the
    projection is ~0.5 by construction)."""
    q = _entry.queries()
    trained = q["docs_classifier_trained_auc"](spark, SF_DIR).collect()[0]
    fixed = q["docs_classifier_auc"](spark, SF_DIR).collect()[0]
    assert trained["n_pos"] == fixed["n_pos"]
    assert trained["n_neg"] == fixed["n_neg"]
    assert trained["auc"] > fixed["auc"] + 0.2
    assert trained["auc"] > 0.8
