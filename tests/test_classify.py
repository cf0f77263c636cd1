"""In-engine Naive Bayes classifier: exact sufficient statistics, crafted
decisions, determinism across repartitioning, and the quality-filter task.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from ocr_project_spark.classify import nb_classify, nb_predict, nb_train


def test_nb_train_exact_counts(spark):
    train = spark.createDataFrame(
        [("spam", "buy now buy"), ("ham", "hello friend")],
        "label string, text string",
    )
    model, classes = nb_train(train)
    counts = {(r["label"], r["word"]): r["c"] for r in model.collect()}
    assert counts == {
        ("spam", "buy"): 2,
        ("spam", "now"): 1,
        ("ham", "hello"): 1,
        ("ham", "friend"): 1,
    }
    cls = {r["label"]: r for r in classes.collect()}
    assert cls["spam"]["n_tokens"] == 3 and cls["ham"]["n_tokens"] == 2
    assert cls["spam"]["vocab"] == 4 == cls["ham"]["vocab"]
    assert cls["spam"]["n_docs"] == 1


def test_nb_predict_matches_hand_computation(spark):
    """Crafted two-class task where the Laplace-smoothed posterior is easy
    to verify by hand (scores recomputed in Python float, same formula)."""
    train = spark.createDataFrame(
        [("spam", "buy now buy now"), ("ham", "hello dear friend hello")],
        "label string, text string",
    )
    docs = spark.createDataFrame(
        [(1, "buy buy"), (2, "hello friend"), (3, "unseen words only")],
        "doc_id long, text string",
    )
    model, classes = nb_train(train)
    got = {r["doc_id"]: r["pred_label"] for r in nb_predict(docs, model, classes).collect()}
    assert got[1] == "spam" and got[2] == "ham"

    # doc 3: every token OOV for both classes -> matched sum 0 for both;
    # equal priors and totals/vocab -> exact tie -> label-asc tiebreak
    def score(label, n):
        return math.log(1 / 2) + 0.0 - n * math.log(4 + 6)

    assert score("ham", 3) == score("spam", 3)
    assert got[3] == "ham"


def test_nb_classify_quality_task_and_determinism(spark, documents):
    """The driver query's clean-vs-junk task: perfect separation, and the
    prediction set is invariant under repartitioning (count-based training
    has no order dependence; argmax margins are ~12 nats)."""
    docs = documents.select("doc_id", "text")
    gib = F.concat_ws(
        " ",
        *[
            F.concat(F.lit("gib"), F.col("doc_id").cast("string"), F.lit(f"_{i}"))
            for i in range(12)
        ],
    )
    corpus = docs.select(
        "doc_id", F.lit("clean").alias("label_true"), "text"
    ).unionByName(
        docs.select(
            (F.col("doc_id") + 100000).alias("doc_id"),
            F.lit("junk").alias("label_true"),
            gib.alias("text"),
        )
    )
    train = corpus.where("doc_id % 2 = 0").select(
        F.col("label_true").alias("label"), "text"
    )
    preds = {r["doc_id"]: r["pred_label"] for r in nb_classify(train, corpus).collect()}
    truth = {r["doc_id"]: r["label_true"] for r in corpus.collect()}
    assert preds == truth  # 100% on the planted task, train AND held-out

    again = {
        r["doc_id"]: r["pred_label"]
        for r in nb_classify(train.repartition(7), corpus.repartition(5)).collect()
    }
    assert again == preds


def test_nb_train_keeps_class_with_all_null_text(spark):
    """A class whose training docs all have NULL text must survive
    training (prior intact, n_tokens=0) instead of silently vanishing
    from the model and shifting the prior denominator; NULL-labeled rows
    are ignored."""
    from ocr_project_spark.classify import nb_predict, nb_train

    train = spark.createDataFrame(
        [
            ("ham", "good good good good good"),
            ("ham", "good stuff"),
            ("spam", None),
            ("spam", None),
            ("spam", None),
            (None, "label missing"),
        ],
        "label string, text string",
    )
    model, classes = nb_train(train)
    cls = {r["label"]: (r["n_docs"], r["n_tokens"]) for r in classes.collect()}
    assert cls == {"ham": (2, 7), "spam": (3, 0)}

    # the zero-evidence class is predictable (it was not dropped): for a
    # pure-OOV doc spam's smoothed per-token prob 1/V strictly beats
    # ham's 1/(T+V) and the prior favors spam — guaranteed argmax. A doc
    # of ham's high-count word ((c+1)/(T+V) = 7/9 vs 1/2) goes ham.
    docs = spark.createDataFrame(
        [(1, "zz yy xx"), (2, "good good good")], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r["pred_label"]
        for r in nb_predict(docs, model, classes).collect()
    }
    assert got == {1: "spam", 2: "ham"}


def test_nb_predict_null_text_scores_prior_only(spark):
    """A NULL-text doc has 0 tokens: its score must be ln(prior) exactly
    (size(NULL) is NULL under ANSI / -1 legacy — either would corrupt the
    length-normalization term and flip the argmax)."""
    from ocr_project_spark.classify import nb_classify

    train = spark.createDataFrame(
        # class 'big' has a huge token mass but a small prior; 'tiny' the
        # reverse — a corrupted normalization term prefers 'big'
        [("tiny", "one")]
        + [("big", "alpha beta gamma delta epsilon zeta eta theta")] * 3
        + [("tiny", "one")] * 5,
        "label string, text string",
    )
    docs = spark.createDataFrame([(1, None)], "doc_id long, text string")
    rows = nb_classify(train, docs).collect()
    assert len(rows) == 1
    assert rows[0]["pred_label"] == "tiny"  # argmax = highest prior
