"""Quality classifier (operators/classify), hard-negative mining,
and the LSH recall report."""

import math

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from pyspark.sql import functions as F


def test_score_logistic_matches_python(spark):
    """Fixed-weight scoring equals the python sigmoid on the same
    features (quantized to 1e-6 per the decimal round-trip)."""
    from sybil_spark.operators import classify
    rows = [(0, 10.0, 0.05, 4.2, 0.1), (1, 500.0, 0.0, 7.5, 0.9),
            (2, 80.0, 0.08, 5.0, 0.0)]
    df = spark.createDataFrame(rows, ["id", "a", "b", "c", "d"])
    w, b = [0.01, 20.0, -0.5, -4.0], 0.3
    got = {r["id"]: (r["prob"], r["pred"]) for r in
           classify.score_logistic(df, ["a", "b", "c", "d"], w, b)
           .collect()}
    for rid, *f in rows:
        z = b + sum(wi * fi for wi, fi in zip(w, f))
        p = 1.0 / (1.0 + math.exp(-z))
        assert got[rid][0] == pytest.approx(p, abs=2e-6)
        assert got[rid][1] == int(got[rid][0] >= 0.5)


def test_train_logistic_separates(spark):
    """LBFGS on linearly separable data: near-perfect accuracy, and
    the learned weights drive score_logistic to the same labels —
    the train→freeze→codegen-score handoff works end to end."""
    from sybil_spark.operators import classify
    import random
    rng = random.Random(7)
    rows = []
    for i in range(200):
        y = i % 2
        # class 1 sits at higher x1, lower x2 — separable with noise
        x1 = (3.0 if y else 1.0) + rng.random() * 0.5
        x2 = (1.0 if y else 3.0) + rng.random() * 0.5
        rows.append((x1, x2, y))
    df = spark.createDataFrame(rows, ["x1", "x2", "label"])
    w, b = classify.train_logistic(df, ["x1", "x2"], "label")
    assert w[0] > 0 and w[1] < 0
    scored = classify.score_logistic(df, ["x1", "x2"], w, b)
    acc = (scored.where(F.col("pred") == F.col("label")).count()
           / float(len(rows)))
    assert acc >= 0.99


def test_quality_features_shape(spark):
    from sybil_spark.operators import classify
    df = spark.createDataFrame([("the cat sat on the mat",)], ["text"])
    row = df.select(classify.quality_features(F.col("text"))
                    .alias("f")).collect()[0]["f"]
    assert row["n_tokens"] == 6.0
    assert row["stop_ratio"] == pytest.approx(2 / 6)
    assert row["mean_word_len"] == pytest.approx((22 - 5) / 6)
    assert row["rep_ratio"] == 0.0


def test_hard_negatives_excludes_gold(spark):
    """Negatives never contain a gold id, ranks are 1..k dense, and
    the kept ids equal brute-force top-k after exclusion."""
    from sybil_spark.operators import similarity
    import itertools
    dim = 4
    vecs = [(i, [float((i * 7 + j * 3) % 11 + 1) for j in range(dim)])
            for i in range(30)]
    emb = spark.createDataFrame(vecs, ["vec_id", "embedding"])
    qs = emb.where(F.col("vec_id") < 3)
    gold = spark.createDataFrame(
        [(q, q) for q in range(3)] + [(q, q + 1) for q in range(3)],
        ["q_id", "gid"])
    k = 4
    out = similarity.hard_negatives(qs, emb, gold, "embedding", k=k)
    rows = out.collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["q_id"], []).append(r)
    golds = {(q, g) for q in range(3) for g in (q, q + 1)}

    def cos(a, b):
        num = sum(x * y for x, y in zip(a, b))
        return num / math.sqrt(sum(x * x for x in a)) \
            / math.sqrt(sum(x * x for x in b))

    vd = dict(vecs)
    for q in range(3):
        got = by_q[q]
        assert [r["rank"] for r in got] == list(range(1, k + 1))
        assert all((q, r["vec_id"]) not in golds for r in got)
        ref = sorted(
            ((cos(vd[q], v), i) for i, v in vecs
             if (q, i) not in golds),
            key=lambda t: (-t[0], t[1]))[:k]
        assert [r["vec_id"] for r in got] == [i for _, i in ref]


def test_lsh_recall_report_counts(spark):
    """On a corpus with exact-duplicate pairs the report's truth set
    matches brute-force jaccard and recall lands in (0, 1]; identical
    docs must be both true and found (recall numerator > 0)."""
    from sybil_spark.operators import dedup
    base = "alpha beta gamma delta epsilon zeta eta theta"
    docs = [(0, base), (1, base),                       # exact dup
            (2, base + " iota"), (3, "totally different words here x"),
            (4, "another unrelated document entirely y z w")]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    row = dedup.lsh_recall_report(df, "doc_id", "text",
                                  threshold=0.5).collect()[0]
    assert row["n_true"] >= 2           # (0,1), (0,2)/(1,2) family
    assert row["n_hit"] >= 1            # identical docs always band
    assert row["n_cand"] >= row["n_hit"]
    assert 0.0 < row["recall"] <= 1.0
    assert 0.0 < row["precision"] <= 1.0


def test_lsh_recall_report_empty_truth(spark):
    """No near-dups at all: n_true == 0 and recall is NULL (never a
    divide-by-zero or a fake 1.0)."""
    from sybil_spark.operators import dedup
    docs = [(i, f"totally unique document number {i} "
                f"with words w{i}a w{i}b w{i}c") for i in range(6)]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    row = dedup.lsh_recall_report(df, "doc_id", "text",
                                  threshold=0.9).collect()[0]
    assert row["n_true"] == 0
    assert row["recall"] is None


def test_ivf_recall_full_probe_is_exact(spark):
    """nprobe == nlist probes every list, so IVF == brute force and
    recall is exactly 1.0 for every query; fewer probes can only
    lower it."""
    from sybil_spark.operators import similarity
    dim = 6
    vecs = [(i, [float((i * 13 + j * 5) % 17 + 1) for j in range(dim)])
            for i in range(40)]
    emb = spark.createDataFrame(vecs, ["vec_id", "embedding"])
    cents = [v for _, v in vecs[:4]]
    qs = emb.where(F.col("vec_id") < 3)
    full = similarity.ivf_recall_report(qs, emb, "embedding", cents,
                                        k=5, nprobe=len(cents))
    rows = full.collect()
    assert len(rows) == 3
    assert all(r["recall"] == 1.0 and r["n_hit"] == 5 for r in rows)
    partial = {r["q_id"]: r["recall"] for r in
               similarity.ivf_recall_report(qs, emb, "embedding",
                                            cents, k=5, nprobe=1)
               .collect()}
    for r in rows:
        assert partial[r["q_id"]] <= r["recall"]


def test_temperature_mixture_flattens(spark):
    """α=0.5 moves the output mixture toward uniform: the dominant
    stratum's share strictly drops, the minority stratum keeps 100%
    of its rows (it is the argmin stratum), and the sample is
    deterministic (same rows on every run)."""
    from sybil_spark.operators import sampling
    rows = [(i, "head") for i in range(900)] + \
           [(i + 1000, "tail") for i in range(100)]
    df = spark.createDataFrame(rows, ["k", "src"])
    out = sampling.temperature_mixture(df, "src", "k", alpha=0.5)
    got = {r["src"]: r["n"] for r in
           out.groupBy("src").agg(F.count(F.lit(1)).alias("n"))
           .collect()}
    # tail is argmin(n/w) under sqrt weights here: kept whole
    assert got["tail"] == 100
    in_share = 900 / 1000
    out_share = got["head"] / (got["head"] + got["tail"])
    assert out_share < in_share
    # expected head rate = sqrt(100/900) = 1/3 → ~300 rows; the
    # 16-bit hash threshold gives binomial-ish scatter around it
    assert 200 < got["head"] < 400
    again = sorted(r["k"] for r in out.collect())
    assert again == sorted(r["k"] for r in out.collect())


def test_temperature_mixture_alpha_one_keeps_nearly_all(spark):
    from sybil_spark.operators import sampling
    rows = [(i, "a" if i % 4 else "b") for i in range(800)]
    df = spark.createDataFrame(rows, ["k", "src"])
    kept = sampling.temperature_mixture(df, "src", "k", alpha=1.0).count()
    # rate-1 thresholds can shave at most the 1/65536 floor sliver
    assert kept >= 798


def test_quality_lr_scoring_is_map_only(spark, sf_dir):
    """The classifier SCORING pass must plan as a pure projection
    over the scan — zero exchanges, zero Python nodes. This is the
    invariant that makes 'classify 100 TB' a map-only job."""
    from sybil_spark.operators import classify
    from sybil_spark.plans import inspect as I
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    feats = (d.withColumn("__f", classify.quality_features(F.col("text")))
              .select("doc_id", "__f.*"))
    scored = classify.score_logistic(
        feats, list(classify.QUALITY_FEATURES),
        [0.004, 30.0, -0.8, -6.0], 1.0)
    plan = I.formatted_plan(scored)
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_hard_negatives_gold_join_broadcasts(spark):
    """The gold-exclusion anti-join must broadcast the (tiny) gold
    frame — never sort-merge the candidate stream."""
    from sybil_spark.operators import similarity
    from sybil_spark.plans import inspect as I
    vecs = [(i, [float(j + i % 5) for j in range(4)]) for i in range(20)]
    emb = spark.createDataFrame(vecs, ["vec_id", "embedding"])
    qs = emb.where(F.col("vec_id") < 2)
    gold = spark.createDataFrame([(0, 0), (1, 1)], ["q_id", "gid"])
    out = similarity.hard_negatives(qs, emb, gold, "embedding", k=3)
    plan = I.formatted_plan(out)
    import re
    assert re.search(r"BroadcastHashJoin.*LeftAnti", plan) \
        or ("LeftAnti" in plan and "BroadcastExchange" in plan)


@pytest.mark.parametrize("seed", [3, 11])
def test_lsh_recall_report_matches_component_sets(spark, seed):
    """The report's counts must equal python-set arithmetic over the
    same ground-truth and candidate frames collected independently —
    pins the full-join/aggregate logic against planted-duplicate
    corpora of varying density."""
    import random
    from sybil_spark.operators import dedup
    rng = random.Random(seed)
    vocab = [f"w{i}" for i in range(30)]
    docs = []
    for i in range(14):
        docs.append((i, " ".join(rng.choice(vocab) for _ in range(12))))
    # plant exact and near duplicates
    docs.append((100, docs[0][1]))
    docs.append((101, docs[1][1] + " extra"))
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    thr = 0.4
    sh = dedup.shingle_hashes(df, "doc_id", "text", 3) \
        .localCheckpoint(eager=True)
    true = {(r["id_a"], r["id_b"]) for r in
            dedup.jaccard_pairs(df, "doc_id", "text", 3,
                                threshold=thr, shingles=sh,
                                max_posting=None).collect()}
    cand = {(r["id_a"], r["id_b"]) for r in
            dedup.minhash_lsh_candidates(df, "doc_id", "text",
                                         shingles=sh).collect()}
    row = dedup.lsh_recall_report(df, "doc_id", "text",
                                  threshold=thr).collect()[0]
    assert row["n_true"] == len(true)
    assert row["n_cand"] == len(cand)
    assert row["n_hit"] == len(true & cand)


def test_ngram_precision_clips(spark):
    """BLEU-style clipping: a candidate repeating an n-gram scores
    only as many matches as the reference contains."""
    from sybil_spark.operators.quality import ngram_precision
    rows = [(0, "the the the", "the x"),
            (1, "x y x y", "x y z"),
            (2, "a b c", "a b c")]
    df = spark.createDataFrame(rows, ["id", "cand", "ref"])
    uni = {r["id"]: (r["n_cand"], r["n_clip"], r["precision"])
           for r in ngram_precision(df, "id", "cand", "ref", n=1)
           .collect()}
    assert uni[0] == (3, 1, pytest.approx(1 / 3))
    bi = {r["id"]: (r["n_cand"], r["n_clip"], r["precision"])
          for r in ngram_precision(df, "id", "cand", "ref", n=2)
          .collect()}
    assert bi[1] == (3, 1, pytest.approx(1 / 3))
    assert bi[2] == (2, 2, 1.0)


def test_char_ngrams_edges(spark):
    from sybil_spark.functions.text import char_ngrams
    df = spark.createDataFrame([("abcd",), ("ab",), ("",)], ["t"])
    got = [r["g"] for r in
           df.select(char_ngrams(F.col("t"), 3).alias("g")).collect()]
    assert got[0] == ["abc", "bcd"]
    assert got[1] == [] and got[2] == []


def test_lang_id_trained_separates_scripts(spark):
    """Documents from two synthetic 'languages' with disjoint
    character inventories classify perfectly; prediction is
    deterministic under reruns."""
    from sybil_spark.operators import classify
    import random
    rng = random.Random(5)
    rows = []
    for i in range(40):
        if i % 2:
            txt = " ".join("".join(rng.choice("abcdef")
                                   for _ in range(6))
                           for _ in range(10))
            rows.append((i, "alpha", txt))
        else:
            txt = " ".join("".join(rng.choice("uvwxyz")
                                   for _ in range(6))
                           for _ in range(10))
            rows.append((i, "omega", txt))
    df = spark.createDataFrame(rows, ["doc_id", "lang", "text"])
    prof = classify.lang_profiles(df, "lang", "text")
    pred = classify.lang_id_trained(df, "doc_id", "text", prof)
    joined = (df.select("doc_id", "lang").join(pred, "doc_id")
              .collect())
    assert len(joined) == 40
    assert all(r["lang"] == r["pred_lang"] for r in joined)


def test_stupid_backoff_matches_python(spark):
    """Stupid Backoff semantics pinned against a python reference:
    first token scores unigram MLE, seen bigrams score their MLE,
    unseen bigrams back off with the 0.4 penalty; per-token scores
    quantized to 1e-6 like the operator."""
    import math
    from decimal import Decimal, ROUND_HALF_UP
    from collections import Counter
    from sybil_spark.operators.quality import stupid_backoff_logprob

    texts = ["a b a b", "b a c", "c c a"]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               ["doc_id", "text"])

    toks = [t.split(" ") for t in texts]
    uni = Counter(w for ws in toks for w in ws)
    n = sum(uni.values())
    bi = Counter((ws[i - 1], ws[i]) for ws in toks
                 for i in range(1, len(ws)))
    ctx = Counter(ws[i - 1] for ws in toks for i in range(1, len(ws)))

    def q(x):
        return float(Decimal(repr(x)).quantize(
            Decimal("0.000001"), rounding=ROUND_HALF_UP))

    def score(ws):
        s = Decimal(0)
        for i, w in enumerate(ws):
            if i == 0:
                v = math.log(uni[w] / n)
            elif (ws[i - 1], w) in bi:
                v = math.log(bi[(ws[i - 1], w)] / ctx[ws[i - 1]])
            else:
                v = math.log(0.4 * (uni[w] / n))
            s += Decimal(repr(q(v)))
        return float(s), float(s) / len(ws)

    got = {r["doc_id"]: (r["n_tokens"], r["sum_score"], r["mean_score"])
           for r in stupid_backoff_logprob(df, "doc_id", "text")
           .collect()}
    for i, ws in enumerate(toks):
        sm, mn = score(ws)
        assert got[i][0] == len(ws)
        assert got[i][1] == pytest.approx(sm, abs=3e-6)
        assert got[i][2] == pytest.approx(mn, abs=3e-6)


@given(texts=st.lists(st.text(alphabet="ab c", min_size=1,
                              max_size=20), min_size=1, max_size=6))
@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_stupid_backoff_fuzz(spark, texts):
    """Random corpora over a tiny alphabet (dense bigram collisions,
    empty-token edge cases from double spaces) against the python
    reference."""
    import math
    from decimal import Decimal, ROUND_HALF_UP
    from collections import Counter
    from sybil_spark.operators.quality import stupid_backoff_logprob

    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               ["doc_id", "text"])
    toks = [t.split(" ") for t in texts]
    uni = Counter(w for ws in toks for w in ws)
    n = sum(uni.values())
    bi = Counter((ws[i - 1], ws[i]) for ws in toks
                 for i in range(1, len(ws)))
    ctx = Counter(ws[i - 1] for ws in toks for i in range(1, len(ws)))

    def q(x):
        return Decimal(repr(float(Decimal(repr(x)).quantize(
            Decimal("0.000001"), rounding=ROUND_HALF_UP))))

    got = {r["doc_id"]: (r["n_tokens"], r["sum_score"])
           for r in stupid_backoff_logprob(df, "doc_id", "text")
           .collect()}
    for i, ws in enumerate(toks):
        s = Decimal(0)
        for j, w in enumerate(ws):
            if j == 0:
                v = math.log(uni[w] / n)
            elif (ws[j - 1], w) in bi:
                v = math.log(bi[(ws[j - 1], w)] / ctx[ws[j - 1]])
            else:
                v = math.log(0.4 * (uni[w] / n))
            s += q(v)
        assert got[i][0] == len(ws)
        assert got[i][1] == pytest.approx(float(s), abs=3e-6), \
            (i, texts[i])


def test_stupid_backoff_empty_corpus(spark):
    """An empty (or all-empty-text) corpus has no model to score
    against: the operator returns an EMPTY frame with the normal
    output schema instead of raising on F.lit(float(None))
    (ADVICE r7)."""
    from sybil_spark.operators.quality import stupid_backoff_logprob

    empty = spark.createDataFrame([], "doc_id bigint, text string")
    out = stupid_backoff_logprob(empty, "doc_id", "text")
    assert out.columns == ["doc_id", "n_tokens", "sum_score",
                           "mean_score"]
    assert out.count() == 0

    # "" tokenizes as [""] (python split-parity, pinned by the fuzz
    # test) so blank docs still score — only a ZERO-token corpus
    # takes the guard; it must keep working
    blank = spark.createDataFrame([(0, ""), (1, "")],
                                  ["doc_id", "text"])
    out2 = stupid_backoff_logprob(blank, "doc_id", "text")
    assert out2.columns == out.columns
    assert out2.count() == 2


def test_ngram_bucket_features_match_python(spark):
    """Bucket ratios replicate the md5-family python computation
    exactly; texts shorter than n yield all-zero features."""
    import hashlib
    from sybil_spark.operators import classify

    texts = ["hello world", "ab", "", "aaaa bbbb cccc"]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               ["doc_id", "text"])
    out = {r["doc_id"]: r for r in
           df.select("doc_id",
                     *classify.ngram_bucket_features(F.col("text")))
             .collect()}

    def py_feats(t, n=3, b=8):
        grams = [t[i:i + n] for i in range(len(t) - n + 1)]
        if not grams:
            return [0.0] * b
        hs = [int(hashlib.md5(g.encode()).hexdigest()[:15], 16) % b
              for g in grams]
        return [hs.count(i) / len(grams) for i in range(b)]

    for i, t in enumerate(texts):
        exp = py_feats(t)
        got = [out[i][f"ng{j}"] for j in range(8)]
        assert got == pytest.approx(exp, abs=1e-12), (i, t)


def test_ngram_features_improve_separation(spark):
    """The point of the fastText-style battery: two classes with
    IDENTICAL length/stopword/repetition statistics but different
    character alphabets — the 4-ratio battery cannot separate them,
    the hashed-trigram buckets can. Train/freeze/score both ways
    and compare training-set accuracy."""
    import random
    from sybil_spark.operators import classify

    rng = random.Random(17)

    def doc(words):
        return " ".join(rng.choice(words) for _ in range(12))

    # concentrated character patterns (repetitive junk vs a second
    # dialect of repetitive junk): few distinct trigrams per class,
    # so the 8-bucket histograms are far apart — the regime the
    # hashed battery detects (diffuse alphabets need more buckets,
    # as fastText's 2M-bin table attests)
    rows = [(i, doc(["ababab", "bababa", "cdcdcd"]), 0)
            for i in range(40)] + \
           [(100 + i, doc(["uvuvuv", "vuvuvu", "xyxyxy"]), 1)
            for i in range(40)]
    df = spark.createDataFrame(rows, ["doc_id", "text", "label"])

    def accuracy(ngram_buckets):
        feats = (df.withColumn(
            "__f", classify.quality_features(F.col("text"),
                                             ngram_buckets=ngram_buckets))
            .select("doc_id", "label", "__f.*"))
        cols = list(classify.QUALITY_FEATURES) + \
            [f"ng{i}" for i in range(ngram_buckets)]
        w, b = classify.train_logistic(feats, cols, "label")
        scored = classify.score_logistic(feats, cols, w, b)
        return (scored.where(F.col("pred") == F.col("label")).count()
                / float(len(rows)))

    base = accuracy(0)
    ng = accuracy(8)
    assert ng >= 0.95, ng
    assert ng > base + 0.2, (base, ng)
